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
        r["host"]: (list(r["disallow_prefixes"]), r["crawl_delay"],
                    r["agent_specific"])
        for r in effective_rules(robots_df, with_agent_flag=True).collect()
    }
    assert set(rules_spark) == set(rules_py)
    for h in rules_py:
        assert rules_spark[h][0] == rules_py[h][0], h
        assert rules_spark[h][1] == rules_py[h][1], h
        assert rules_spark[h][2] == rules_py[h][2], h  # agent_specific

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


def test_distributed_filter_preset():
    """FilterConfig.distributed replays DistributedURLFilterBolt.java:45,95
    exactly: URL cap 100, wiki/wiktionary/stackoverflow lang gates."""
    from sparkcrawl.filters import FilterConfig, admit

    cfg = FilterConfig.distributed()
    assert cfg.max_url_length == 100
    assert cfg.lang_gated_substrings == (
        "wiki", "wiktionary", "stackoverflow"
    )
    assert not admit("http://h:80/" + "x" * 100, "h", 1, cfg)  # len > 100
    assert admit("http://en.wikipedia.org:80/", "en.wikipedia.org", 1, cfg)
    assert not admit("http://de.wikipedia.org:80/", "de.wikipedia.org", 1,
                     cfg)
    assert not admit("http://de.wiktionary.org:80/", "de.wiktionary.org", 1,
                     cfg)
    assert not admit("http://stackoverflow.com:80/", "stackoverflow.com", 1,
                     cfg)  # gate requires the 'en' prefix, as in the bolt
    assert admit("http://h.example.com:80/", "h.example.com", 1, cfg)


def test_reference_priority_hosts_constant():
    """politeness.REFERENCE_PRIORITY_HOSTS == URLFrontier.java:32-39."""
    from sparkcrawl.politeness import REFERENCE_PRIORITY_HOSTS

    d = dict(REFERENCE_PRIORITY_HOSTS)
    assert {h for h, p in d.items() if p == 1} == {
        "en.wikipedia.org", "upenn.edu", "cnn.com"
    }
    assert {h for h, p in d.items() if p == 2} == {
        "stackoverflow.com", "reddit.com", "bbc.com", "wsj.com"
    }
