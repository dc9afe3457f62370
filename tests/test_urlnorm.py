"""Canonicalization spec + Spark parity (reference O1-O4 semantics)."""

from __future__ import annotations

import pytest
from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from sparkcrawl.urlnorm import (
    canonicalize,
    canonicalize_udf,
    depth_of,
    host_of,
    path_of,
    with_url_parts,
)


CASES = [
    # explicit default port inserted (URLSpout.java:152-184)
    (None, "http://a.com/x", "http://a.com:80/x"),
    (None, "https://a.com/x", "https://a.com:443/x"),
    (None, "http://a.com", "http://a.com:80/"),
    (None, "HTTP://A.COM/Path", "http://a.com:80/Path"),  # case: scheme+host only
    (None, "http://a.com:8080/x", "http://a.com:8080/x"),  # explicit kept
    # relative resolution against base truncated at last '/' (O1)
    ("http://a.com:80/dir/page.html", "other.html", "http://a.com:80/dir/other.html"),
    ("http://a.com:80/dir/page.html", "/root.html", "http://a.com:80/root.html"),
    ("http://a.com:80/dir/page.html", "../up.html", "http://a.com:80/up.html"),
    ("http://a.com:80/dir/sub/", "./here.html", "http://a.com:80/dir/sub/here.html"),
    # absolute href ignores base
    ("http://a.com:80/", "https://b.org/y", "https://b.org:443/y"),
    # query kept, fragment dropped
    (None, "http://a.com/x?q=1#frag", "http://a.com:80/x?q=1"),
    # non-http schemes rejected
    (None, "mailto:x@y.com", None),
    (None, "javascript:void(0)", None),
    (None, "ftp://a.com/x", None),
    (None, "", None),
    (None, None, None),
    # relative with no base -> no host -> rejected
    (None, "/just/a/path", None),
]


@pytest.mark.parametrize("base,href,want", CASES)
def test_canonicalize_cases(base, href, want):
    assert canonicalize(base, href) == want


def test_canonicalize_udf_parity(spark):
    rows = [(b, h) for b, h, _ in CASES]
    df = spark.createDataFrame(rows, "base string, href string")
    got = [
        r[0]
        for r in df.select(
            canonicalize_udf(F.col("base"), F.col("href"))
        ).collect()
    ]
    want = [w for _, _, w in CASES]
    assert got == want


def test_with_url_parts_parity(spark):
    urls = [
        "http://a.com:80/",
        "http://a.com:80/x/y.html",
        "https://b.org:443/a/b/c?q=1",
        "http://mega.example.com:80/s1/s2/page3",
    ]
    df = spark.createDataFrame([(u,) for u in urls], "url_norm string")
    out = {
        r["url_norm"]: (r["host"], r["path"], r["path_depth"])
        for r in with_url_parts(df).collect()
    }
    for u in urls:
        assert out[u] == (host_of(u), path_of(u), depth_of(u)), u


@given(
    host=st.from_regex(r"[a-z]{1,8}(\.[a-z]{2,5}){1,2}", fullmatch=True),
    segs=st.lists(
        st.from_regex(r"[a-zA-Z0-9_\-]{1,10}", fullmatch=True), max_size=4
    ),
    scheme=st.sampled_from(["http", "https"]),
)
@settings(max_examples=200, deadline=None)
def test_canonicalize_idempotent(host, segs, scheme):
    """canonicalize is idempotent on its own output (a fixpoint)."""
    url = f"{scheme}://{host}/" + "/".join(segs)
    once = canonicalize(None, url)
    assert once is not None
    assert canonicalize(None, once) == once
    # and parts round-trip
    assert host_of(once) == host
