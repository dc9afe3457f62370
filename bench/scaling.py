"""Two-parallelism scaling bench: local[8] vs local[32] (the sandbox
stand-in for N vs 4N executors, per BASELINE.json north_rule).

Runs the SAME crawl job (fixed rounds over the same synthetic web) at both
parallelism levels in separate subprocesses (Spark master is fixed per JVM),
reports throughput at each plus scaling efficiency, and appends the table to
BENCH/BASELINE.md.

Usage: python bench/scaling.py [size] [rounds]
"""

from __future__ import annotations

import datetime as dt
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r"""
import json, os, shutil, sys, time
sys.path.insert(0, {repo!r})
sys.path.insert(0, os.path.join({repo!r}, "tests"))
from sparkcrawl.session import get_spark
from sparkcrawl.engine import CrawlConfig, CrawlEngine
from sparkcrawl.tables import SnapshotStore
from sparkcrawl import schema as S

cores = int(sys.argv[1]); size = sys.argv[2]; rounds = int(sys.argv[3])
web = sys.argv[4]
# Shuffle width 4x cores (a cluster never runs shuffle.partitions == #cores;
# adaptive_shuffle still narrows small rounds below this ceiling). Same
# multiplier on both legs, so the comparison stays symmetric while partitions
# hold ~15-60k rows instead of the 0.5-1.2GB monsters width==cores produces
# at xwide round sizes (which OOM'd the 8-core leg's Tungsten sorts at 8g).
spark = get_spark(f"scale-{{cores}}", cores=cores, shuffle_partitions=4 * cores)
store_dir = f"/tmp/sparkcrawl_scale_{{cores}}_{{os.getpid()}}"
shutil.rmtree(store_dir, ignore_errors=True)
store = SnapshotStore(store_dir)
pages = spark.read.schema(S.PAGES).parquet(f"{{web}}/pages.parquet")
meta = spark.read.schema(S.PAGE_META).parquet(f"{{web}}/page_meta.parquet")
robots = spark.read.schema(S.ROBOTS).parquet(f"{{web}}/robots.parquet")
seeds = spark.read.schema(S.SEEDS).parquet(f"{{web}}/seeds.parquet")
conf_kw = json.loads(os.environ.get("SPARKCRAWL_SCALE_CONF", "{{}}"))
eng = CrawlEngine(spark, store, pages, meta, robots, CrawlConfig(**conf_kw))
t0 = time.time()
eng.run(seeds, max_rounds=rounds)
wall = time.time() - t0
n_traced = store.read(spark, "trace", S.TRACE).count()
n_extracted = store.read(spark, "crawled", S.CRAWLED).count()
# steady-state = rounds 2..n (round 1 pays python-worker + JIT warmup)
mrows = sorted(
    (r["round"], r["n_selected"], r["wall_ms"])
    for r in store.read(spark, "metrics", S.METRICS).collect()
)
ss_urls = sum(n for rd, n, w in mrows if rd > 1)
ss_wall = sum(w for rd, n, w in mrows if rd > 1) / 1000.0
shutil.rmtree(store_dir, ignore_errors=True)
print("RESULT " + json.dumps({{
    "cores": cores, "wall_s": round(wall, 2),
    "n_traced": n_traced, "n_extracted": n_extracted,
    "urls_per_sec": round(n_traced / wall, 2),
    "steady_urls": ss_urls, "steady_wall_s": round(ss_wall, 2),
    "steady_urls_per_sec": round(ss_urls / max(ss_wall, 1e-9), 2),
    "per_round": [{{"round": rd, "n_selected": n, "wall_s": round(w / 1000.0, 1)}}
                  for rd, n, w in mrows],
}}))
"""


def run_at(cores: int, size: str, rounds: int, web: str) -> dict:
    code = WORKER.format(repo=REPO)
    env = dict(os.environ)
    # Heap = 4g/core (override with SPARKCRAWL_SCALE_MEM for equal-heap
    # runs). Per-core memory is the cluster-faithful model: a 4N-executor
    # cluster has 4N× the memory of an N-executor one, so an equal-heap
    # comparison hands the small leg 4× the memory PER CORE — at xwide
    # sizes that let the 2-core leg keep the ~5 GB web cache resident
    # while the 8-core leg's execution memory evicted it every round (a
    # confound in the other direction). bulk_scaling.py has always used
    # 4g/core; both models' runs are recorded in BASELINE.md.
    env.setdefault("SPARKCRAWL_DRIVER_MEM",
                   os.environ.get("SPARKCRAWL_SCALE_MEM", f"{4 * cores}g"))
    argv = [sys.executable, "-c", code, str(cores), size, str(rounds), web]
    if os.environ.get("SPARKCRAWL_SCALE_PIN", "1") == "1":
        # Pin the leg to exactly `cores` physical CPUs. Without this,
        # local[N] is NOT an N-core machine: JVM GC threads, Python UDF
        # workers and the driver all spill onto the host's full core set,
        # inflating the small leg and under-measuring true N->4N scaling
        # (a real N-core executor has N cores for EVERYTHING).
        argv = ["taskset", "-c", f"0-{cores - 1}"] + argv
    out = subprocess.run(
        argv,
        capture_output=True, text=True,
        timeout=int(os.environ.get("SPARKCRAWL_SCALE_TIMEOUT", "3600")),
        env=env,
    )
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            print(line, flush=True)  # surface each leg as it lands
            return json.loads(line[len("RESULT "):])
    # keep the full worker output — the interesting exception is usually
    # thousands of lines above the tail
    dump = f"/tmp/sparkcrawl_scale_fail_{cores}.log"
    with open(dump, "w") as f:
        f.write(out.stdout)
        f.write("\n===== STDERR =====\n")
        f.write(out.stderr)
    raise RuntimeError(
        f"no RESULT from cores={cores} (full output: {dump}):\n"
        f"{out.stdout[-2000:]}\n{out.stderr[-2000:]}"
    )


def main():
    size = sys.argv[1] if len(sys.argv) > 1 else "t2"
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 6

    sys.path.insert(0, REPO)
    sys.path.insert(0, os.path.join(REPO, "tests"))
    from gen_web_sharded import ensure_web

    web = ensure_web(size, f"/tmp/sparkcrawl_benchweb_{size}")

    n_lo = int(os.environ.get("SPARKCRAWL_SCALE_N", "2"))
    n_hi = 4 * n_lo
    lo = run_at(n_lo, size, rounds, web)
    hi = run_at(n_hi, size, rounds, web)
    assert lo["n_traced"] == hi["n_traced"], "determinism violated across parallelism"
    assert lo["n_extracted"] == hi["n_extracted"]
    speedup = lo["wall_s"] / hi["wall_s"]
    efficiency = speedup / 4
    ss_speedup = lo["steady_wall_s"] / max(hi["steady_wall_s"], 1e-9)
    result = {
        "size": size, "rounds": rounds, "n_lo": n_lo, "n_hi": n_hi,
        "lo": lo, "hi": hi,
        "speedup": round(speedup, 3),
        "scaling_efficiency": round(efficiency, 3),
        "steady_speedup": round(ss_speedup, 3),
        "steady_scaling_efficiency": round(ss_speedup / 4, 3),
    }
    print(json.dumps(result))

    md = os.path.join(REPO, "BENCH", "BASELINE.md")
    stamp = dt.datetime.now(dt.timezone.utc).strftime("%Y-%m-%d %H:%M UTC")
    conf_note = os.environ.get("SPARKCRAWL_SCALE_CONF", "")
    conf_note = f", conf={conf_note}" if conf_note else ""
    if os.environ.get("SPARKCRAWL_SCALE_PIN", "1") == "1":
        conf_note += ", CPU-pinned (taskset 0..N-1 per leg)"
    with open(md, "a") as f:
        f.write(
            f"\n## Scaling run {stamp} (size={size}, rounds={rounds}, "
            f"N={n_lo} vs 4N={n_hi} cores{conf_note})\n\n"
            "| parallelism | wall s | URLs traced | extracted | URLs/sec | "
            "steady URLs/sec |\n"
            "|---|---|---|---|---|---|\n"
            f"| local[{n_lo}] | {lo['wall_s']} | {lo['n_traced']} | "
            f"{lo['n_extracted']} | {lo['urls_per_sec']} | "
            f"{lo['steady_urls_per_sec']} |\n"
            f"| local[{n_hi}] | {hi['wall_s']} | {hi['n_traced']} | "
            f"{hi['n_extracted']} | {hi['urls_per_sec']} | "
            f"{hi['steady_urls_per_sec']} |\n\n"
            f"N->4N speedup **{result['speedup']}x** (efficiency "
            f"**{result['scaling_efficiency']}**); steady-state (excl. "
            f"warmup round 1) speedup **{result['steady_speedup']}x** "
            f"(efficiency **{result['steady_scaling_efficiency']}**; "
            f"north-rule target >= 0.8). Identical traced/extracted counts "
            f"at both levels = cross-parallelism determinism check.\n"
        )
    return result


if __name__ == "__main__":
    main()
