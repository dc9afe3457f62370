"""Data-plane scaling bench: the crawl's bulk fetch+extract+dedup pipeline
(everything the engine does to a URL, minus the round-loop scheduler) over
the full synthetic web, at N vs 4N cores.

This isolates the throughput component the north-star metric measures
("URLs fetched+extracted/sec"): one pass of
  scan pages -> admission parts -> extract (Arrow UDF) -> content hash ->
  exact dedup winners -> lang gate -> quality-ish agg
Run twice per level; the second (warm python workers, compiled plans) is the
steady-state number. Appends results to BENCH/BASELINE.md.

Usage: python bench/bulk_scaling.py [size] [n_lo]
"""

from __future__ import annotations

import datetime as dt
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r"""
import json, os, sys, time
sys.path.insert(0, {repo!r})
from sparkcrawl.session import get_spark
from sparkcrawl.extract import with_extracted
from sparkcrawl.urlnorm import with_url_parts
from sparkcrawl.filters import admission_predicate
from sparkcrawl import schema as S
from pyspark.sql import functions as F, Window as W

cores = int(sys.argv[1]); web = sys.argv[2]
spark = get_spark(f"bulk{{cores}}", cores=cores, shuffle_partitions=cores,
                  extra_conf={{"spark.sql.files.maxPartitionBytes": "8m"}})
pages = spark.read.schema(S.PAGES).parquet(f"{{web}}/pages.parquet")
n_pages = pages.count()  # warms FS cache

def pipeline():
    p = pages.select(F.col("url").alias("url_norm"), "html")
    p = with_url_parts(p)
    p = p.filter(admission_predicate())
    p = p.withColumn("content_hash", F.xxhash64("html"))
    e = with_extracted(p).drop("html")
    w = W.partitionBy("content_hash").orderBy("url_norm")
    d = e.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1)
    d = d.filter((F.col("ex_lang") == "") | (F.col("ex_lang") == "en"))
    return d.select(
        F.count("*").alias("docs"),
        F.sum(F.length("ex_text")).alias("chars"),
        F.sum(F.size("ex_links")).alias("links"),
    )

walls = []
for run in (1, 2):
    t0 = time.time()
    row = pipeline().collect()[0]
    walls.append(round(time.time() - t0, 2))
print("RESULT " + json.dumps({{
    "cores": cores, "n_pages": n_pages, "docs": row["docs"],
    "chars": int(row["chars"]), "wall_warmup_s": walls[0],
    "wall_steady_s": walls[1],
    "pages_per_sec_steady": round(n_pages / walls[1], 1),
}}))
"""


def run_at(cores: int, web: str) -> dict:
    env = dict(os.environ)
    # constant memory per core, as cluster scale-out would provide — see
    # bench/scaling.py note (fixed heap starves the high-parallelism leg)
    env.setdefault("SPARKCRAWL_DRIVER_MEM", f"{4 * cores}g")
    argv = [sys.executable, "-c", WORKER.format(repo=REPO), str(cores), web]
    if os.environ.get("SPARKCRAWL_SCALE_PIN", "1") == "1":
        # pin the leg to exactly `cores` CPUs — see bench/scaling.py
        argv = ["taskset", "-c", f"0-{cores - 1}"] + argv
    out = subprocess.run(
        argv,
        capture_output=True, text=True,
        timeout=int(os.environ.get("SPARKCRAWL_SCALE_TIMEOUT", "1800")),
        env=env,
    )
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[7:])
    raise RuntimeError(out.stdout[-1500:] + out.stderr[-1500:])


def main():
    size = sys.argv[1] if len(sys.argv) > 1 else "scale"
    n_lo = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    web = f"/tmp/sparkcrawl_benchweb_{size}"
    assert os.path.exists(web), f"generate first: python tests/gen_fixtures.py {size} {web}"
    lo = run_at(n_lo, web)
    hi = run_at(4 * n_lo, web)
    assert lo["docs"] == hi["docs"] and lo["chars"] == hi["chars"]
    sp = lo["wall_steady_s"] / hi["wall_steady_s"]
    res = {
        "size": size, "n_lo": n_lo, "n_hi": 4 * n_lo, "lo": lo, "hi": hi,
        "steady_speedup": round(sp, 3),
        "steady_scaling_efficiency": round(sp / 4, 3),
    }
    print(json.dumps(res))
    stamp = dt.datetime.now(dt.timezone.utc).strftime("%Y-%m-%d %H:%M UTC")
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "a") as f:
        f.write(
            f"\n## Bulk data-plane scaling {stamp} (size={size}, "
            f"N={n_lo} vs 4N={4*n_lo} cores)\n\n"
            "One-pass fetch+extract+dedup+lang over the full synthetic web "
            "(steady-state = 2nd run, warm workers/plans):\n\n"
            "| parallelism | steady wall s | pages/sec |\n|---|---|---|\n"
            f"| local[{n_lo}] | {lo['wall_steady_s']} | "
            f"{lo['pages_per_sec_steady']} |\n"
            f"| local[{4*n_lo}] | {hi['wall_steady_s']} | "
            f"{hi['pages_per_sec_steady']} |\n\n"
            f"steady N->4N speedup **{res['steady_speedup']}x**, efficiency "
            f"**{res['steady_scaling_efficiency']}** (target >= 0.8). "
            "Identical doc/char counts at both levels (determinism).\n"
        )
    return res


if __name__ == "__main__":
    main()
