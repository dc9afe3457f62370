"""Raw robots.txt parsing (reference R1, CrawlerBolt.java:302-355): block
semantics goldens + the Spark corpus parser feeding effective_rules."""

from __future__ import annotations

from sparkcrawl.robots import (
    effective_rules,
    parse_robots_corpus,
    parse_robots_txt,
)

MULTI_AGENT = """# example corpus
User-agent: cis455crawler
User-agent: googlebot
Disallow: /private
Crawl-delay: 3

User-agent: *
Disallow: /tmp
Allow: /tmp/ok
"""


def test_multi_agent_block_shares_rules():
    rows = parse_robots_txt(MULTI_AGENT, host="h.com")
    dis = {(r["agent"], r["path_prefix"]) for r in rows if r["rule"] == "disallow"}
    assert dis == {
        ("cis455crawler", "/private"),
        ("googlebot", "/private"),
        ("*", "/tmp"),
    }
    delays = {(r["agent"], r["crawl_delay"]) for r in rows if r["rule"] == "crawl_delay"}
    assert delays == {("cis455crawler", 3), ("googlebot", 3)}
    allows = {(r["agent"], r["path_prefix"]) for r in rows if r["rule"] == "allow"}
    assert allows == {("*", "/tmp/ok")}


def test_malformed_line_ends_block():
    # the Sitemap URL splits into 3 parts on ':' -> ends the block, so the
    # Disallow after it is NOT attached (reference inner-loop break)
    text = "User-agent: a\nSitemap: http://h/x.xml\nDisallow: /late\n"
    rows = parse_robots_txt(text)
    assert rows == []


def test_unknown_two_part_directive_keeps_block_open():
    text = "User-agent: a\nHost: example\nDisallow: /x\n"
    rows = parse_robots_txt(text)
    assert [(r["agent"], r["rule"], r["path_prefix"]) for r in rows] == [
        ("a", "disallow", "/x")
    ]


def test_bad_crawl_delay_aborts_keeping_partial():
    text = (
        "User-agent: a\nDisallow: /kept\nCrawl-delay: soon\n"
        "\nUser-agent: b\nDisallow: /never\n"
    )
    rows = parse_robots_txt(text)
    assert [(r["agent"], r["path_prefix"]) for r in rows] == [("a", "/kept")]


def test_comment_and_blank_handling():
    text = "# top\n\nUser-agent: a\nDisallow: /x\n\n# tail\n"
    rows = parse_robots_txt(text)
    assert len(rows) == 1 and rows[0]["path_prefix"] == "/x"


def test_corpus_parse_feeds_effective_rules(spark):
    corpus = spark.createDataFrame(
        [
            ("h1.com", MULTI_AGENT),
            ("h2.com", "User-agent: *\nDisallow: /all\n"),
            ("h3.com", None),
        ],
        "host string, robots_txt string",
    )
    rules = parse_robots_corpus(corpus)
    eff = {
        r["host"]: (list(r["disallow_prefixes"]), r["crawl_delay"])
        for r in effective_rules(rules, agent="cis455crawler").collect()
    }
    # h1: our agent's block shadows '*' entirely
    assert eff["h1.com"] == (["/private"], 3)
    assert eff["h2.com"] == (["/all"], None)
    assert "h3.com" not in eff
