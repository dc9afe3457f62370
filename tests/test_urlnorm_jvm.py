"""Differential tests: urlnorm_jvm.canonicalize_jvm must be
byte-identical to urlnorm.canonicalize (the spec) on guard-clean rows,
and the split mode exact on ANY input."""

from __future__ import annotations

import os
import sys

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sparkcrawl.urlnorm import canonicalize  # noqa: E402
from sparkcrawl.urlnorm_jvm import (  # noqa: E402
    canon_guard,
    with_canonicalized,
)

CANON_BASES = [
    "http://mega.example.com:80/",
    "http://mega.example.com:80/s0/page6.html",
    "https://h3.example.com:443/a/b/c.html",
    "http://h0.example.com:8080/deep/path/index",
    "http://x.org:80/p?q=1&r=2",
]

HREFS = [
    "http://other.example.com/x.html",
    "HTTP://UPPER.Example.COM:81/Y",
    "https://sec.example.com:443/z",
    "//cdn.example.com/lib.js",
    "//cdn.example.com:8443/lib.js",
    "/rooted/path.html",
    "/",
    "relative.html",
    "sub/dir/page",
    "?only=query",
    "?",
    "#frag",
    "#",
    "",
    "   ",
    "  /spaces/trimmed  ",
    "mailto:someone@example.com",
    "javascript:void(0)",
    "ftp://files.example.com/f",
    "tel:+15551234567",
    "http://host.only",
    "http://host.only?q=1",
    "http://host.only#f",
    "http://h:0/zero-port",
    "http://h:080/leading-zero",
    "http://h:65535/max-port",
    "http://h:65536/over-port",
    "http://h:/empty-port",
    "x?a=1#f",
    "x#f",
    "trailing/slash/",
    "///triple",
    "////quad",
    "a//double//inner",
    "UPPER/Case/Path",
    # guard-tripping inputs: exactness must still hold via the udf branch
    "../up/one.html",
    "./here.html",
    "..",
    ".",
    "a/../b",
    "a/./b",
    "http:relative-with-scheme",
    "https:foo",
    "http://user:pw@host/secret",
    "?email=a@b.com",
    "http://[::1]:80/ipv6",
    "caf\u00e9/unicode",
    "tab\there",
    "line\nbreak",
    "http://h\t:80/tab-in-authority",
]


def _py(rows):
    return sorted(
        (i, canonicalize(b, h)) for i, (b, h) in enumerate(rows)
    )


def _spark(spark, rows, mode):
    df = spark.createDataFrame(
        [(i, b, h) for i, (b, h) in enumerate(rows)],
        "i long, base string, href string",
    )
    out = with_canonicalized(df, "base", "href", "u", mode=mode)
    return sorted((r["i"], r["u"]) for r in out.select("i", "u").collect())


def test_split_exact_on_edge_matrix(spark):
    rows = [(b, h) for b in CANON_BASES for h in HREFS]
    assert _spark(spark, rows, "split") == _py(rows)


def test_jvm_exact_on_guard_clean_rows(spark):
    rows = [(b, h) for b in CANON_BASES for h in HREFS]
    df = spark.createDataFrame(rows, "base string, href string")
    clean = df.filter(~canon_guard(F.col("base"), F.col("href")))
    clean_rows = [(r["base"], r["href"]) for r in clean.collect()]
    # the matrix must actually exercise the JVM path broadly
    assert len(clean_rows) >= len(rows) // 2
    assert _spark(spark, clean_rows, "jvm") == _py(clean_rows)


def test_python_mode_is_reference(spark):
    rows = [(CANON_BASES[0], h) for h in HREFS]
    assert _spark(spark, rows, "python") == _py(rows)


@settings(max_examples=30, deadline=None)
@given(
    base=st.sampled_from(CANON_BASES),
    href=st.text(
        alphabet=st.characters(
            min_codepoint=32, max_codepoint=126
        ),
        max_size=60,
    ),
)
def test_split_exact_on_random_ascii_hrefs(spark, base, href):
    rows = [(base, href)]
    assert _spark(spark, rows, "split") == _py(rows)


def test_fixture_link_corpus_identical(spark, tmp_path_factory):
    """Every (page url, extracted href) pair of the tiny fixture web:
    split == jvm == python byte-for-byte, and the corpus is guard-clean
    (the precondition the engine's jvm fast path would rely on)."""
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import gen_fixtures as GF

    from sparkcrawl.extract import with_extracted

    out = str(tmp_path_factory.mktemp("canonweb"))
    GF.write_parquet(GF.generate("tiny", seed=42), out)
    pages = spark.read.parquet(f"{out}/pages.parquet")
    links = (
        with_extracted(pages)
        .select(F.col("url").alias("base"),
                F.explode("ex_links").alias("href"))
    )
    rows = [(r["base"], r["href"]) for r in links.collect()]
    assert rows
    n_guard = links.filter(
        canon_guard(F.col("base"), F.col("href"))
    ).count()
    assert n_guard == 0
    assert (
        _spark(spark, rows, "split")
        == _spark(spark, rows, "jvm")
        == _py(rows)
    )
