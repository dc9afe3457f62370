"""Interleaved-leg N-vs-4N scaling bench for hosts with unstable memory
bandwidth.

bench/scaling.py runs the whole lo leg, then the whole hi leg — 20-40
minutes apart. bench/hostprobe.py showed this sandbox's multi-core
streaming bandwidth swings 15x minute-to-minute (hypervisor throttling),
so sequential legs can land in different host regimes and the ratio then
measures the box, not the engine.

This harness interleaves at ROUND granularity: for each crawl round r it
runs round r at N cores (resuming store A) and then round r at 4N cores
(resuming store B), so the two measurements of the same round sit minutes
— not tens of minutes — apart and share the host's throttle state as
closely as a sequential method can. Cross-parallelism determinism (a
tested engine property: identical per-round selections at any width)
guarantees both stores present identical inputs at every round, so the
pairing is exact.

Each (round, width) runs in a fresh subprocess (Spark master is fixed per
JVM) pinned to cores 0..N-1 like every other scaling bench. To keep the
timed round free of process cold-start, the worker first runs a WARMUP
mini-crawl (2 rounds of the small `scale` web on a scratch store — same
plans, operators, codegen, and Python-worker pool as the real round) and
only then times `engine.run` for the single target round. A hostprobe
streaming-memory sample (2t + 8t aggregate GB/s) is taken after each
round pair and recorded next to it, so every ratio carries
contemporaneous host-health evidence.

Usage: python bench/interleaved_scaling.py [size=huge] [rounds=6]
Env: SPARKCRAWL_SCALE_N (default 2), SPARKCRAWL_SCALE_CONF,
     SPARKCRAWL_SCALE_PIN, SPARKCRAWL_SCALE_MEM, SPARKCRAWL_SCALE_TIMEOUT.
"""

from __future__ import annotations

import datetime as dt
import json
import os
import shutil
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))
sys.path.insert(0, os.path.join(REPO, "bench"))

WORKER = r"""
import json, os, shutil, sys, time
sys.path.insert(0, {repo!r})
sys.path.insert(0, os.path.join({repo!r}, "tests"))
from sparkcrawl.session import get_spark
from sparkcrawl.engine import CrawlConfig, CrawlEngine
from sparkcrawl.tables import SnapshotStore
from sparkcrawl import schema as S

cores = int(sys.argv[1]); web = sys.argv[2]; store_dir = sys.argv[3]
round_no = int(sys.argv[4]); warm_web = sys.argv[5]

spark = get_spark(f"inter-{{cores}}", cores=cores,
                  shuffle_partitions=4 * cores)
conf_kw = json.loads(os.environ.get("SPARKCRAWL_SCALE_CONF", "{{}}"))


def load(webdir):
    pages = spark.read.schema(S.PAGES).parquet(f"{{webdir}}/pages.parquet")
    meta = spark.read.schema(S.PAGE_META).parquet(
        f"{{webdir}}/page_meta.parquet")
    robots = spark.read.schema(S.ROBOTS).parquet(
        f"{{webdir}}/robots.parquet")
    seeds = spark.read.schema(S.SEEDS).parquet(f"{{webdir}}/seeds.parquet")
    return pages, meta, robots, seeds


# --- warmup: a 2-round mini-crawl on a scratch store exercises the real
# round plans (parquet scan, politeness top-k, fetch join, extract pandas
# UDFs, link canon, seen filter, snapshot commit) so JVM JIT, codegen and
# the Python worker pool are hot before the timed round. Not timed.
wp, wm, wr, ws = load(warm_web)
warm_store_dir = f"{{store_dir}}_warm"
shutil.rmtree(warm_store_dir, ignore_errors=True)
warm_eng = CrawlEngine(spark, SnapshotStore(warm_store_dir), wp, wm, wr,
                       CrawlConfig())
warm_eng.run(ws, max_rounds=2)
shutil.rmtree(warm_store_dir, ignore_errors=True)

# --- timed: exactly round `round_no` of the real store
pages, meta, robots, seeds = load(web)
store = SnapshotStore(store_dir)
eng = CrawlEngine(spark, store, pages, meta, robots, CrawlConfig(**conf_kw))
t0 = time.time()
eng.run(seeds if round_no == 1 else None, max_rounds=round_no)
wall = time.time() - t0
mrows = {{r["round"]: (r["n_selected"], r["wall_ms"])
          for r in store.read(spark, "metrics", S.METRICS).collect()}}
n_sel = mrows.get(round_no, (0, 0))[0]
out = {{"cores": cores, "round": round_no, "wall_s": round(wall, 2),
        "n_selected": n_sel}}
if round_no == int(os.environ.get("SPARKCRAWL_INTER_LAST", "0")):
    out["n_traced"] = store.read(spark, "trace", S.TRACE).count()
    out["n_extracted"] = store.read(spark, "crawled", S.CRAWLED).count()
print("RESULT " + json.dumps(out))
"""


def run_leg(cores: int, web: str, store_dir: str, round_no: int,
            warm_web: str) -> dict:
    code = WORKER.format(repo=REPO)
    env = dict(os.environ)
    env.setdefault("SPARKCRAWL_DRIVER_MEM",
                   os.environ.get("SPARKCRAWL_SCALE_MEM", f"{4 * cores}g"))
    argv = [sys.executable, "-c", code, str(cores), web, store_dir,
            str(round_no), warm_web]
    if os.environ.get("SPARKCRAWL_SCALE_PIN", "1") == "1":
        argv = ["taskset", "-c", f"0-{cores - 1}"] + argv
    out = subprocess.run(
        argv, capture_output=True, text=True, env=env,
        timeout=int(os.environ.get("SPARKCRAWL_SCALE_TIMEOUT", "3600")))
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            print(line, flush=True)
            return json.loads(line[len("RESULT "):])
    dump = f"/tmp/sparkcrawl_inter_fail_{cores}_{round_no}.log"
    with open(dump, "w") as f:
        f.write(out.stdout + "\n===== STDERR =====\n" + out.stderr)
    raise RuntimeError(
        f"no RESULT from cores={cores} round={round_no} "
        f"(full output: {dump}):\n{out.stdout[-1500:]}\n{out.stderr[-1500:]}")


def main():
    size = sys.argv[1] if len(sys.argv) > 1 else "huge"
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 6

    from gen_web_sharded import ensure_web
    import hostprobe

    web = ensure_web(size, f"/tmp/sparkcrawl_benchweb_{size}")
    warm_web = ensure_web("scale", "/tmp/sparkcrawl_benchweb_scale")

    n_lo = int(os.environ.get("SPARKCRAWL_SCALE_N", "2"))
    n_hi = 4 * n_lo
    os.environ["SPARKCRAWL_INTER_LAST"] = str(rounds)

    stores = {n: f"/tmp/sparkcrawl_inter_{n}" for n in (n_lo, n_hi)}
    for d in stores.values():
        shutil.rmtree(d, ignore_errors=True)

    per_round = []
    finals = {}
    for r in range(1, rounds + 1):
        row = {"round": r}
        for n in (n_lo, n_hi):
            res = run_leg(n, web, stores[n], r, warm_web)
            row[f"wall_{n}"] = res["wall_s"]
            row["n_selected"] = res["n_selected"]
            if "n_traced" in res:
                finals[n] = (res["n_traced"], res["n_extracted"])
        probe_lo = hostprobe.leg("mem", 2, 4.0) / 1e9
        probe_hi = hostprobe.leg("mem", 8, 4.0) / 1e9
        row["host_mem_2t"] = round(probe_lo, 1)
        row["host_mem_8t"] = round(probe_hi, 1)
        row["ratio"] = round(row[f"wall_{n_lo}"] / row[f"wall_{n_hi}"], 2)
        print("PAIR " + json.dumps(row), flush=True)
        per_round.append(row)

    assert finals[n_lo] == finals[n_hi], (
        f"determinism violated across parallelism: {finals}")
    lo_wall = sum(p[f"wall_{n_lo}"] for p in per_round)
    hi_wall = sum(p[f"wall_{n_hi}"] for p in per_round)
    ss = [p for p in per_round if p["round"] > 1]
    ss_lo = sum(p[f"wall_{n_lo}"] for p in ss)
    ss_hi = sum(p[f"wall_{n_hi}"] for p in ss)
    result = {
        "size": size, "rounds": rounds, "n_lo": n_lo, "n_hi": n_hi,
        "per_round": per_round,
        "n_traced": finals[n_lo][0], "n_extracted": finals[n_lo][1],
        "speedup": round(lo_wall / hi_wall, 3),
        "scaling_efficiency": round(lo_wall / hi_wall / 4, 3),
        "steady_speedup": round(ss_lo / ss_hi, 3),
        "steady_scaling_efficiency": round(ss_lo / ss_hi / 4, 3),
    }
    print(json.dumps(result))

    md = os.path.join(REPO, "BENCH", "BASELINE.md")
    stamp = dt.datetime.now(dt.timezone.utc).strftime("%Y-%m-%d %H:%M UTC")
    conf_note = os.environ.get("SPARKCRAWL_SCALE_CONF", "")
    conf_note = f", conf={conf_note}" if conf_note else ""
    with open(md, "a") as f:
        f.write(
            f"\n## INTERLEAVED scaling run {stamp} (size={size}, "
            f"rounds={rounds}, N={n_lo} vs 4N={n_hi} cores{conf_note}, "
            "round-granularity leg interleave, per-process mini-crawl "
            "warmup, CPU-pinned)\n\n"
            "| round | n_selected | wall N | wall 4N | ratio | "
            "host GB/s (2t/8t) |\n|---|---|---|---|---|---|\n")
        for p in per_round:
            f.write(
                f"| {p['round']} | {p['n_selected']} | "
                f"{p[f'wall_{n_lo}']} | {p[f'wall_{n_hi}']} | "
                f"{p['ratio']} | {p['host_mem_2t']}/{p['host_mem_8t']} |\n")
        f.write(
            f"\nN->4N speedup **{result['speedup']}x** (efficiency "
            f"**{result['scaling_efficiency']}**); steady-state (excl. "
            f"round 1) speedup **{result['steady_speedup']}x** (efficiency "
            f"**{result['steady_scaling_efficiency']}**; north-rule target "
            f">= 0.8). Totals {result['n_traced']}/"
            f"{result['n_extracted']} identical at both widths "
            "(cross-parallelism determinism). Host GB/s columns are "
            "streaming-memcpy aggregates sampled right after each pair "
            "(bench/hostprobe.py); pairs whose samples sit in a throttled "
            "window (8t < 2t) are contaminated by the box, not the "
            "engine.\n")
    return result


if __name__ == "__main__":
    main()
