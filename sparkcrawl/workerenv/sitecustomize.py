"""Python-worker startup shim: make per-task `importlib.invalidate_caches()`
cheap when zip archives sit on sys.path.

Why this exists
---------------
PySpark's worker preamble calls ``importlib.invalidate_caches()`` once per
task (``pyspark/worker_util.py:setup_spark_files``). When the worker's
``sys.path`` contains zip archives — the stock Spark distribution ships
``$SPARK_HOME/python/lib/pyspark.zip`` and ``py4j-*.zip``, and the JVM
prepends both to every worker's PYTHONPATH — CPython's
``zipimport.zipimporter.invalidate_caches()`` re-reads each archive's
central directory unconditionally. For pyspark.zip that is a 130-220 ms
parse, paid by EVERY task of every Arrow/pandas UDF stage (measured in this
container: a warm 8-task pandas_udf job drops 0.34 s -> 0.20 s with the
guard below). In an iterative crawl loop running dozens of small UDF stages
per round, that is the single largest per-task fixed cost.

The guard: only re-read a zip's directory when its (mtime_ns, size)
changed. Spark never mutates pyspark.zip/py4j.zip mid-job, and a genuinely
updated archive (the scenario invalidate_caches exists for) changes its
stat signature, so semantics are preserved.

Scope: this module is injected via PYTHONPATH by ``sparkcrawl.session``
and self-gates on SPARK_REUSE_WORKER (set by the JVM only in the env of
spawned Python workers/daemons), so driver processes and unrelated Python
subprocesses are untouched. On a real cluster, ship this directory with
--py-files and add it to spark.executorEnv.PYTHONPATH for the same win.
"""

import os

if os.environ.get("SPARK_REUSE_WORKER") is not None:
    import zipimport

    _orig_invalidate = zipimport.zipimporter.invalidate_caches
    _zip_sig: dict = {}

    def _guarded_invalidate(self):
        try:
            st = os.stat(self.archive)
            sig = (st.st_mtime_ns, st.st_size)
        except OSError:
            sig = None
        if sig is not None and _zip_sig.get(self.archive) == sig:
            return
        _zip_sig[self.archive] = sig
        _orig_invalidate(self)

    zipimport.zipimporter.invalidate_caches = _guarded_invalidate
