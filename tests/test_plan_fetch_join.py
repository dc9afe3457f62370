"""Physical-plan guard for the fetch join: the html-bearing pages side must
be pruned by a broadcast semi-join and must never pass through an Exchange
or Sort before the pruning (the no-wholesale-html-shuffle property that
doubled loop throughput — see ARCHITECTURE.md §3)."""

from __future__ import annotations

import shutil

from conftest import load_inputs
from sparkcrawl.engine import CrawlConfig, CrawlEngine
from sparkcrawl.tables import SnapshotStore


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_fetch_join_prunes_pages_before_any_exchange(
    spark, fixture_paths, tmp_path
):
    pages, meta, robots_df, seeds = load_inputs(spark, fixture_paths)
    store = SnapshotStore(str(tmp_path / "store"))
    eng = CrawlEngine(
        spark, store, pages, meta, robots_df, CrawlConfig(cache_web=False)
    )
    sel = spark.createDataFrame(
        [("http://h0.example.com:80/", "h0.example.com", "/", 1, 1)],
        "url_norm string, host string, path string, depth int, seq long",
    )
    from pyspark.sql import functions as F

    sel_keys = F.broadcast(sel.select("url_norm"))
    pg_hits = eng._pg.join(sel_keys, "url_norm", "left_semi")
    plan = _plan(pg_hits)
    # the pruning join itself is a broadcast semi-join...
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan
    # ...and nothing exchanges or sorts the pages scan before it
    assert "Exchange hashpartitioning(url_norm" not in plan
    assert "Sort [" not in plan

    fx = sel.join(pg_hits, "url_norm", "left")
    plan_fx = _plan(fx)
    # the outer join may shuffle, but only AFTER the semi-prune: the join
    # operates on pg_hits (pruned), never the raw pages relation
    assert "LeftSemi" in plan_fx
    shutil.rmtree(str(tmp_path / "store"), ignore_errors=True)
