"""SparkSession builder tuned for the crawl engine.

Local-mode sandbox settings; on a real cluster the same builder is used with
``--master yarn/k8s`` via spark-submit --py-files (the engine code never
assumes local mode). AQE is on so skewed shuffles (mega-hosts) re-plan at
runtime; Arrow is on because every custom op is a vectorized pandas UDF.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "sparkcrawl",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession.

    cores: local parallelism (defaults to $SPARK_GRAFT_CPUS or '*').
    shuffle_partitions: defaults to cores (local mode — never 200).
    """
    if cores is None:
        cores_s = os.environ.get("SPARK_GRAFT_CPUS", "*")
    else:
        cores_s = str(cores)
    if shuffle_partitions is None:
        shuffle_partitions = int(cores_s) if cores_s.isdigit() else 32

    # Python workers pay 130-220 ms PER TASK re-parsing pyspark.zip's
    # central directory inside the worker preamble's
    # importlib.invalidate_caches() call (the JVM puts the zip on every
    # worker's PYTHONPATH). sparkcrawl/workerenv/sitecustomize.py guards
    # that with an mtime check; inject it ahead of the zips so every
    # spawned worker/daemon picks it up. Must happen BEFORE the JVM
    # gateway launches (the daemon inherits this process's env). See the
    # shim's docstring for the cluster-mode recipe (--py-files +
    # spark.executorEnv.PYTHONPATH).
    workerenv = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "workerenv")
    if os.path.isdir(workerenv):
        pp = os.environ.get("PYTHONPATH", "")
        if workerenv not in pp.split(os.pathsep):
            os.environ["PYTHONPATH"] = (
                workerenv + (os.pathsep + pp if pp else "")
            )

    b = (
        SparkSession.builder.master(f"local[{cores_s}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARKCRAWL_DRIVER_MEM", "8g"))
        # Large heaps GC so rarely that the weak-reference ContextCleaner
        # never fires, so per-job shuffle/broadcast state accumulates and
        # each successive job slows down (measured: identical 8-core passes
        # at 11 -> 23 -> 47 s with a 16g heap; flat at ~5 s with GC forced).
        # An iterative frontier loop runs thousands of jobs per session —
        # periodic driver GC is the standard remedy (default is 30min).
        # Since the engine began unpersisting round checkpoints
        # deterministically at commit (engine._free_scratch), the big
        # per-round garbage no longer depends on this: the interval can be
        # relaxed on large heaps, where each forced full GC walks the whole
        # live set (measured 15-25s pauses at 32g) — SPARKCRAWL_GC_INTERVAL.
        .config("spark.cleaner.periodicGC.interval",
                os.environ.get("SPARKCRAWL_GC_INTERVAL", "45s"))
        .config("spark.ui.enabled", "false")
        # One crawl round compiles ~190 whole-stage codegen sources; the
        # Janino class cache holds 100 entries by default (static conf), so
        # every round evicted the previous round's classes and recompiled
        # them all even when the generated source is round-invariant (the
        # engine keeps it invariant: round scalars ride broadcast columns —
        # engine.round_params). Sizing the cache to hold several rounds of
        # distinct stages makes steady-state rounds compile ~nothing.
        .config("spark.sql.codegen.cache.maxEntries", "4096")
        .config("spark.sql.files.maxPartitionBytes", "128m")
        # single-JVM local mode: every task is PROCESS_LOCAL, so waiting
        # for "better" locality only delays launches when concurrent jobs
        # (the engine's threaded stage writes) contend for slots. A real
        # cluster keeps the 3s default (set via spark-submit conf).
        .config("spark.locality.wait", "0s")
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    # ad-hoc conf overrides for bench A/Bs, e.g.
    # SPARKCRAWL_EXTRA_SPARKCONF='{"spark.sql.adaptive.enabled":"false"}'
    extra_env = os.environ.get("SPARKCRAWL_EXTRA_SPARKCONF")
    if extra_env:
        import json

        for k, v in json.loads(extra_env).items():
            b = b.config(k, str(v))
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
