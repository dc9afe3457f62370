"""Benchmark harness (driver contract).

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] plus a fixed-round crawl
of the synthetic web, and prints ONE JSON line:
  {"metric": ..., "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ..., "crawl_urls_per_sec": ...}

The per-query timing materializes results with a noop write (no driver
collect). The crawl benchmark reports URLs fetched+extracted/sec — the
BASELINE.md north-star metric; scaling evidence (local[8] vs local[32])
lives in bench/scaling.py -> BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "tests"))

HEADLINE = [
    "frontier_host_cap",
    "url_admission",
    "seen_anti_join",
    "content_dedup",
    "corpus_export",
    "sessionize",
    "tpch_pricing",
    "revenue_per_nation",
    "dedup_exact",
    "minhash_signatures",
    "jaccard_pairs",
    "simhash_pairs",
    "ann_cosine",
    "ann_buckets",
    "ann_ivf",
    "embedding_near_dup",
    "lang_id",
    "quality",
    "fingerprint",
]

CRAWL_SIZE = os.environ.get("SPARKCRAWL_BENCH_SIZE", "t2")
CRAWL_ROUNDS = int(os.environ.get("SPARKCRAWL_BENCH_ROUNDS", "6"))
# Round-4 VERDICT task #8: record BOTH crawl regimes per round — the t2
# leg keeps the r2/r3 series apples-to-apples (its wall time is part of
# "value"); the wide leg (150k hosts, 150k-500k-URL rounds, ~85% parallel
# data plane) is the design-scale regime and rides as extra top-level
# keys WITHOUT entering "value". Set SPARKCRAWL_BENCH_WIDE=0 to skip.
CRAWL_WIDE_SIZE = os.environ.get("SPARKCRAWL_BENCH_WIDE", "wide")
CRAWL_WIDE_ROUNDS = int(os.environ.get("SPARKCRAWL_BENCH_WIDE_ROUNDS", "6"))


def _materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def bench_queries(spark, sf_dir: str) -> tuple[dict[str, float], float]:
    """Per-query steady times (2nd run: warm FS cache / compiled plans /
    Python workers) plus the cold first-pass total for reference."""
    from sparkcrawl.queries import QUERIES

    cold_total = 0.0
    for name in HEADLINE:
        fn, _ = QUERIES[name]
        t0 = time.time()
        _materialize(fn(spark, sf_dir))
        cold_total += time.time() - t0
    times: dict[str, float] = {}
    for name in HEADLINE:
        fn, _ = QUERIES[name]
        t0 = time.time()
        _materialize(fn(spark, sf_dir))
        times[name] = round(time.time() - t0, 3)
    return times, round(cold_total, 3)


def _ensure_crawl_web(size: str) -> str:
    """Generate (once) and cache the synthetic web for the crawl bench."""
    out = f"/tmp/sparkcrawl_benchweb_{size}"
    marker = os.path.join(out, "_DONE")
    if not os.path.exists(marker):
        from gen_fixtures import generate, write_parquet

        shutil.rmtree(out, ignore_errors=True)
        fx = generate(size, seed=42)
        write_parquet(fx, out)
        with open(marker, "w") as f:
            f.write("ok")
    return out


def bench_crawl(spark, size: str, rounds: int) -> dict:
    """Run `rounds` crawl rounds; return wall sec + URLs processed/sec
    (total and steady-state, i.e. excluding the round-1 JIT/cache warmup).

    'Processed' = selected+traced URLs (each got the full politeness/robots/
    fetch/extract/admission treatment) — the reference's links/sec analogue
    (WorkerMonitor.java:20-42)."""
    from sparkcrawl import schema as S
    from sparkcrawl.engine import CrawlConfig, CrawlEngine
    from sparkcrawl.tables import SnapshotStore

    web = _ensure_crawl_web(size)
    store_dir = f"/tmp/sparkcrawl_benchstore_{size}_{os.getpid()}"
    shutil.rmtree(store_dir, ignore_errors=True)
    store = SnapshotStore(store_dir)
    pages = spark.read.schema(S.PAGES).parquet(f"{web}/pages.parquet")
    meta = spark.read.schema(S.PAGE_META).parquet(f"{web}/page_meta.parquet")
    robots = spark.read.schema(S.ROBOTS).parquet(f"{web}/robots.parquet")
    seeds = spark.read.schema(S.SEEDS).parquet(f"{web}/seeds.parquet")
    # per-round shuffle sizing is the engine's job now (CrawlConfig
    # .adaptive_shuffle): it clamps spark.sql.shuffle.partitions to
    # ceil(n_frontier/4096) each round and restores the session value —
    # the manual "set 8 for the small web" override this replaced measured
    # 117 s -> 27 s; adaptive reproduces that without hand-tuning.
    eng = CrawlEngine(spark, store, pages, meta, robots, CrawlConfig())
    t0 = time.time()
    eng.run(seeds, max_rounds=rounds)
    wall = time.time() - t0
    n_traced = store.read(spark, "trace", S.TRACE).count()
    mrows = [
        (r["round"], r["n_selected"], r["wall_ms"])
        for r in store.read(spark, "metrics", S.METRICS).collect()
    ]
    ss_urls = sum(n for rd, n, _ in mrows if rd > 1)
    ss_wall = sum(w for rd, _, w in mrows if rd > 1) / 1000.0
    shutil.rmtree(store_dir, ignore_errors=True)
    return {
        "crawl_wall_s": round(wall, 3),
        "crawl_urls_per_sec": round(n_traced / wall, 2),
        "crawl_steady_urls_per_sec": round(ss_urls / ss_wall, 2)
        if ss_wall > 0 else 0.0,
    }


def bench_bulk(spark, size: str) -> float:
    """Data-plane pages/sec: admission+extract+dedup+lang over the whole
    bench web, steady state. The loop-free component of the north-star
    metric.

    Estimator (round 5): TWO warmup passes, then the MEDIAN of three
    timed passes. The r4 "bulk drift" (20,580 -> ~19,000 p/s vs r3)
    root-caused to measurement variance, not the pipeline: the bulk code
    path is byte-identical r3..r4 (git diff of extract/urlnorm/filters/
    session), and bench/bulk_context_ab.py showed a single warmup pass
    under-warms the 32-core Python worker pool / codegen (pass series
    13.9k, 16.0k, 20.5k, 21.1k, 21.2k, 20.9k on a throttled host —
    steady state needs ~3 passes and then matches/beats r3 even with
    host memcpy at 1-14 GB/s vs >50 healthy)."""
    from pyspark.sql import Window as W, functions as F

    from sparkcrawl import schema as S
    from sparkcrawl.extract import with_extracted
    from sparkcrawl.filters import admission_predicate
    from sparkcrawl.urlnorm import with_url_parts

    web = _ensure_crawl_web(size)
    pages = spark.read.schema(S.PAGES).parquet(f"{web}/pages.parquet")
    n_pages = pages.count()

    n_part = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))

    def one_pass() -> None:
        p = pages.select(F.col("url").alias("url_norm"), "html")
        # single-file fixture parquet yields few scan splits; spread the
        # Arrow-UDF extraction across all cores (url-hash, skew-free)
        p = with_url_parts(p.repartition(n_part, "url_norm"))
        p = p.filter(admission_predicate())
        p = p.withColumn("content_hash", F.xxhash64("html"))
        e = with_extracted(p).drop("html")
        w = W.partitionBy("content_hash").orderBy("url_norm")
        d = e.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1)
        d = d.filter((F.col("ex_lang") == "") | (F.col("ex_lang") == "en"))
        d.select(
            F.count("*").alias("docs"), F.sum(F.length("ex_text")).alias("chars")
        ).collect()

    one_pass()
    one_pass()
    rates = []
    for _ in range(3):
        t0 = time.time()
        one_pass()
        rates.append(n_pages / (time.time() - t0))
    return round(sorted(rates)[1], 1)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    os.environ["SPARK_GRAFT_CPUS"] = cpus

    from sparkcrawl.session import get_spark

    spark = get_spark("sparkcrawl-bench", cores=int(cpus),
                      shuffle_partitions=int(cpus))

    times, cold_total = bench_queries(spark, sf_dir)
    crawl = bench_crawl(spark, CRAWL_SIZE, CRAWL_ROUNDS)
    bulk_rate = bench_bulk(spark, CRAWL_SIZE)
    times["crawl_rounds"] = crawl["crawl_wall_s"]
    total = round(sum(times.values()), 3)
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    out = {
        "metric": "headline query suite (steady) + crawl rounds wall time",
        "value": total,
        "unit": "sec",
        "queries": times,
        "queries_cold_total": cold_total,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "crawl_urls_per_sec": crawl["crawl_urls_per_sec"],
        "crawl_steady_urls_per_sec": crawl["crawl_steady_urls_per_sec"],
        "bulk_pages_per_sec": bulk_rate,
        "crawl_size": CRAWL_SIZE,
        "crawl_rounds": CRAWL_ROUNDS,
        "cpus": int(cpus),
    }
    if CRAWL_WIDE_SIZE not in ("", "0") and CRAWL_WIDE_SIZE != CRAWL_SIZE:
        wide = bench_crawl(spark, CRAWL_WIDE_SIZE, CRAWL_WIDE_ROUNDS)
        out.update(
            {
                "crawl_wide_size": CRAWL_WIDE_SIZE,
                "crawl_wide_rounds": CRAWL_WIDE_ROUNDS,
                "crawl_wide_wall_s": wide["crawl_wall_s"],
                "crawl_wide_urls_per_sec": wide["crawl_urls_per_sec"],
                "crawl_wide_steady_urls_per_sec": wide[
                    "crawl_steady_urls_per_sec"
                ],
            }
        )
    try:
        # Contemporaneous host-health evidence: this sandbox's multi-core
        # streaming bandwidth is hypervisor-throttled in minute-scale
        # windows (15x swings; see BENCH/BASELINE.md "Host bandwidth
        # instability diagnosis"). A run whose sample shows 8t < 2t
        # aggregate ran throttled — interpret absolute walls against the
        # r2/r3 series with that in mind; ratios within one run remain
        # comparable.
        sys.path.insert(
            0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "bench"))
        import hostprobe

        out["host_mem_2t_gbps"] = round(hostprobe.leg("mem", 2, 3.0) / 1e9, 1)
        out["host_mem_8t_gbps"] = round(hostprobe.leg("mem", 8, 3.0) / 1e9, 1)
    except Exception as e:  # noqa: BLE001 — probe is best-effort evidence
        # Stamp the failure explicitly: an artifact missing host_mem_* keys
        # must be distinguishable from an intentionally probe-free run.
        out["host_probe_err"] = repr(e)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
