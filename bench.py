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
    "lang_id",
    "quality",
    "fingerprint",
]

CRAWL_SIZE = os.environ.get("SPARKCRAWL_BENCH_SIZE", "t2")
CRAWL_ROUNDS = int(os.environ.get("SPARKCRAWL_BENCH_ROUNDS", "6"))


def _materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def bench_queries(spark, sf_dir: str) -> dict[str, float]:
    from sparkcrawl.queries import QUERIES

    times: dict[str, float] = {}
    for name in HEADLINE:
        fn, _ = QUERIES[name]
        t0 = time.time()
        _materialize(fn(spark, sf_dir))
        times[name] = round(time.time() - t0, 3)
    return times


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


def bench_crawl(spark, size: str, rounds: int) -> tuple[float, float]:
    """Run `rounds` crawl rounds; return (wall sec, urls processed/sec).

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
    eng = CrawlEngine(spark, store, pages, meta, robots, CrawlConfig())
    t0 = time.time()
    eng.run(seeds, max_rounds=rounds)
    wall = time.time() - t0
    n_traced = store.read(spark, "trace", S.TRACE).count()
    shutil.rmtree(store_dir, ignore_errors=True)
    return round(wall, 3), round(n_traced / wall, 2)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    os.environ["SPARK_GRAFT_CPUS"] = cpus

    from sparkcrawl.session import get_spark

    spark = get_spark("sparkcrawl-bench", cores=int(cpus),
                      shuffle_partitions=int(cpus))

    times = bench_queries(spark, sf_dir)
    crawl_wall, crawl_rate = bench_crawl(spark, CRAWL_SIZE, CRAWL_ROUNDS)
    times["crawl_rounds"] = crawl_wall
    total = round(sum(times.values()), 3)
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "headline query suite + crawl rounds wall time",
                "value": total,
                "unit": "sec",
                "queries": times,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                "crawl_urls_per_sec": crawl_rate,
                "crawl_size": CRAWL_SIZE,
                "crawl_rounds": CRAWL_ROUNDS,
                "cpus": int(cpus),
            }
        )
    )


if __name__ == "__main__":
    main()
