"""WARC end-to-end (round-4 VERDICT task #6): the Common-Crawl-shaped
input contract drives the full engine.

Path A: parquet pages -> crawl -> curation gate -> WARC sink.
Path B: pages rendered to WARC shard FILES -> warc_to_pages (binaryFile
        source + record parser + the engine extractor) -> the same crawl
        -> the same curation gate -> WARC sink.

Asserts the WARC-sourced pages table reproduces the parquet table on all
five columns, the two crawls produce identical traces/seen sets/corpora,
and the exported shard blobs are byte-identical — closing the last
untested seam between the WARC interchange format and the engine."""

from __future__ import annotations

import pytest

from conftest import load_inputs

from pyspark.sql import functions as F

from sparkcrawl import curation, schema as S, warc
from sparkcrawl.engine import CrawlConfig, CrawlEngine
from sparkcrawl.filters import FilterConfig
from sparkcrawl.tables import SnapshotStore


@pytest.fixture(scope="module")
def warc_dir(spark, fixture_paths, tmp_path_factory):
    pages = spark.read.schema(S.PAGES).parquet(fixture_paths["pages"])
    out = tmp_path_factory.mktemp("warcsrc")
    shards = warc.render_warc_shards(pages, records_per_shard=16).collect()
    for r in shards:
        (out / f"shard-{r['shard_id']:05d}.warc").write_bytes(
            bytes(r["warc_bytes"])
        )
    return str(out)


def _crawl(spark, fixtures, fixture_paths, pages, store_dir):
    _, meta, robots, seeds = load_inputs(spark, fixture_paths)
    cfg = CrawlConfig(
        filters=FilterConfig(banned_hosts=fixtures["banned_hosts"])
    )
    store = SnapshotStore(store_dir)
    CrawlEngine(spark, store, pages, meta, robots, cfg).run(seeds)
    return store


def _export_shards(spark, store, pages):
    """Crawl corpus -> curation gate -> WARC shard blobs (html re-joined
    from the source web, since the corpus stores extracted text)."""
    crawled = store.read(spark, "crawled", S.CRAWLED)
    docs = crawled.join(
        pages.select(F.col("url").alias("url_norm"), "html"), "url_norm"
    )
    # the fixture vocabulary contains no Gopher stopwords and its texts
    # are all shorter than the 50-word floor, so the full passes_gopher
    # gate would keep nothing; gate on the n_words feature at the
    # fixture's median instead — still a real curation stage (features
    # computed by gopher_rules, a strict non-empty subset kept)
    gated = curation.gopher_rules(docs).filter(F.col("n_words") >= 45)
    return (
        {
            r["shard_id"]: (r["n_records"], bytes(r["warc_bytes"]))
            for r in warc.render_warc_shards(
                gated.select(
                    F.col("url_norm").alias("url"), "warc_ts", "html"
                ),
                records_per_shard=8,
            ).collect()
        },
        gated.count(),
        docs.count(),
    )


def test_warc_sourced_crawl_matches_parquet_path(
    spark, fixtures, fixture_paths, warc_dir, tmp_path
):
    pq_pages = spark.read.schema(S.PAGES).parquet(fixture_paths["pages"])
    wc_pages = warc.warc_to_pages(spark, warc_dir)

    # the source seam itself: all five columns round-trip exactly
    cols = ["url", "warc_ts", "html", "text", "lang"]
    assert sorted(map(tuple, pq_pages.select(cols).collect())) == sorted(
        map(tuple, wc_pages.select(cols).collect())
    )

    sa = _crawl(spark, fixtures, fixture_paths, pq_pages,
                str(tmp_path / "a"))
    sb = _crawl(spark, fixtures, fixture_paths, wc_pages,
                str(tmp_path / "b"))

    def trace(store):
        return [
            tuple(r)
            for r in store.read(spark, "trace", S.TRACE)
            .orderBy("round", "ord").collect()
        ]

    def seen(store):
        return {
            r["url_norm"]
            for r in store.read(spark, "seen", S.SEEN).collect()
        }

    assert trace(sa) == trace(sb)
    assert seen(sa) == seen(sb)

    shards_a, kept_a, all_a = _export_shards(spark, sa, pq_pages)
    shards_b, kept_b, all_b = _export_shards(spark, sb, wc_pages)
    # the curation gate does real work: non-empty proper subset
    assert 0 < kept_a < all_a
    assert (kept_a, all_a) == (kept_b, all_b)
    # byte-identical export shards across the two source paths
    assert shards_a == shards_b
    assert sum(n for n, _ in shards_a.values()) == kept_a
