"""Cross-partitioning determinism: the same crawl at different
shuffle-partition counts must produce identical traces, seen sets, and
extracted text — the engine's core ordering claim (ARCHITECTURE.md §2)."""

from __future__ import annotations

from conftest import load_inputs
from sparkcrawl import schema as S
from sparkcrawl.engine import CrawlConfig, CrawlEngine
from sparkcrawl.tables import SnapshotStore


def _run(spark, fixture_paths, tmp_path, tag: str, partitions: int):
    pages, meta, robots_df, seeds = load_inputs(spark, fixture_paths)
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(partitions))
    try:
        store = SnapshotStore(str(tmp_path / f"store_{tag}"))
        eng = CrawlEngine(
            spark, store, pages, meta, robots_df,
            # adaptive sizing off: this test pins DIFFERENT explicit
            # partition counts per run, which adaptivity would equalize
            CrawlConfig(cache_web=False, adaptive_shuffle=False),
        )
        eng.run(seeds, max_rounds=4)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    trace = sorted(
        (r["round"], r["ord"], r["url_norm"], r["action"])
        for r in store.read(spark, "trace", S.TRACE).collect()
    )
    seen = sorted(
        r["url_norm"] for r in store.read(spark, "seen", S.SEEN).collect()
    )
    crawled = sorted(
        (r["url_norm"], r["text"])
        for r in store.read(spark, "crawled", S.CRAWLED).collect()
    )
    return trace, seen, crawled


def test_identical_results_across_partitionings(spark, fixture_paths, tmp_path):
    a = _run(spark, fixture_paths, tmp_path, "p3", 3)
    b = _run(spark, fixture_paths, tmp_path, "p13", 13)
    assert a[0] == b[0], "trace differs across partitionings"
    assert a[1] == b[1], "seen set differs across partitionings"
    assert a[2] == b[2], "extracted text differs across partitionings"
    assert len(a[0]) > 0 and len(a[2]) > 0


def test_new_query_catalog_identical_across_widths(spark):
    """The rank/iterative/k-means query family must return identical rows
    at different shuffle widths — the catalog-level version of the
    engine's ordering claim. Covers every round-3 op whose plan contains
    a global rank, trained cells, or an iterative sweep."""
    from sparkcrawl.queries import QUERIES

    import sparkcrawl.queries as Q

    names = (
        "hits", "dsir_weights", "semantic_dedup", "ann_join",
        "perplexity_buckets", "corpus_shuffle", "quality_pipeline",
        # round 4: trained merges (iterative), global token rank, global
        # (url, ts) shard rank
        "bpe_merges", "token_shard_packing", "warc_roundtrip",
        # round 4 batch 2: iterative closure + integer accounting, and
        # a quantized-float global top-k
        "dedup_survivors", "dsir_resample",
    )
    sf = "/root/testdata/sf0.001"
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        results = {}
        for w in ("3", "13"):
            spark.conf.set("spark.sql.shuffle.partitions", w)
            # force an honest re-train at each width (the per-session
            # memo would otherwise make the BPE rows trivially equal)
            Q._BPE_TRAIN_MEMO.clear()
            for n in names:
                rows = sorted(map(tuple, QUERIES[n][0](spark, sf).collect()))
                assert rows, (n, w)
                results.setdefault(n, []).append(rows)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    for n, (a, b) in results.items():
        assert a == b, f"{n} differs across shuffle widths"
