"""Spark-vs-Python parity for admission filters (D1-D3) and robots (R1-R2)."""

from __future__ import annotations

from pyspark.sql import functions as F

from conftest import load_inputs
from sparkcrawl.filters import FilterConfig, admission_predicate, admit
from sparkcrawl.robots import (
    denied_predicate,
    denied_py,
    effective_rules,
    effective_rules_py,
    join_rules,
)
from sparkcrawl.urlnorm import depth_of, host_of, path_of, with_url_parts

URLS = [
    "http://ok.example.com:80/a/b.html",
    "http://ok.example.com:80/" + "x" * 1200,  # D1 too long
    "http://deep.example.com:80/a/b/c/d/e/f.html",  # D2 too deep
    "http://xxx.com:80/page.html",  # D3 banned
    "http://banned.xxx.com:80/page.html",  # NOT banned (exact host match)
    "http://de.wikipedia.org:80/wiki.html",  # D3b lang-gated
    "http://en.wikipedia.org:80/wiki.html",  # passes lang gate... host starts 'en'
]


def test_filter_parity(spark):
    cfg = FilterConfig()
    df = spark.createDataFrame([(u,) for u in URLS], "url_norm string")
    df = with_url_parts(df)
    got = {
        r["url_norm"]: r["ok"]
        for r in df.withColumn("ok", admission_predicate(cfg)).collect()
    }
    for u in URLS:
        assert got[u] == admit(u, host_of(u), depth_of(u), cfg), u
    # spot checks
    assert got[URLS[0]] is True
    assert got[URLS[1]] is False
    assert got[URLS[2]] is False
    assert got[URLS[3]] is False
    assert got[URLS[4]] is True
    assert got[URLS[5]] is False
    assert got[URLS[6]] is True


def test_robots_parity(spark, fixtures, fixture_paths):
    _, _, robots_df, _ = load_inputs(spark, fixture_paths)
    rules_py = effective_rules_py(fixtures["robots"])
    rules_spark = {
        r["host"]: (list(r["disallow_prefixes"]), r["crawl_delay"])
        for r in effective_rules(robots_df).collect()
    }
    assert set(rules_spark) == set(rules_py)
    for h in rules_py:
        assert rules_spark[h][0] == rules_py[h][0], h
        assert rules_spark[h][1] == rules_py[h][1], h

    # denied predicate parity over fixture urls
    urls = [r["url"] for r in fixtures["pages"][:500]]
    df = with_url_parts(
        spark.createDataFrame([(u,) for u in urls], "url_norm string")
    )
    joined = join_rules(df, effective_rules(robots_df))
    got = {
        r["url_norm"]: r["denied"]
        for r in joined.withColumn("denied", denied_predicate()).collect()
    }
    for u in urls:
        assert got[u] == denied_py(rules_py, host_of(u), path_of(u)), u
