"""Differential tests: the JVM extraction (extract_jvm) must be
byte-identical to BOTH reference implementations — extract.py (regex,
Arrow UDF) and htmlspec.py (html.parser spec impl) — over every fixture
corpus, and the split mode must be exact on adversarial inputs that trip
the JVM guard (entities, non-ASCII)."""

from __future__ import annotations

import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sparkcrawl.extract import _extract_one, with_extracted  # noqa: E402
from sparkcrawl.extract_jvm import (  # noqa: E402
    corpus_is_jvm_clean,
    jvm_guard,
    with_extracted_jvm,
    with_extracted_split,
)

EX_COLS = ["ex_text", "ex_links", "ex_lang", "ex_title"]


def _rows(df):
    return sorted(
        (
            r["url"],
            r["ex_text"],
            tuple(r["ex_links"] or ()),
            r["ex_lang"],
            r["ex_title"],
        )
        for r in df.select("url", *EX_COLS).collect()
    )


@pytest.fixture(scope="module")
def fixture_web(spark, tmp_path_factory):
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from gen_fixtures import generate, write_parquet

    out = str(tmp_path_factory.mktemp("jvmweb"))
    os.environ.setdefault("SPARKCRAWL_FIXTURE_OUT", out)
    import gen_fixtures as GF
    GF.write_parquet(generate("tiny", seed=42), out)
    return out


def test_jvm_matches_python_on_fixture_corpus(spark, fixture_web):
    pages = spark.read.parquet(f"{fixture_web}/pages.parquet")
    assert corpus_is_jvm_clean(pages)
    py = _rows(with_extracted(pages))
    jvm = _rows(with_extracted_jvm(pages))
    split = _rows(with_extracted_split(pages))
    assert jvm == py
    assert split == py
    # non-trivial corpus: texts, links, langs and titles all exercised
    assert any(r[1] for r in py)
    assert any(r[2] for r in py)
    assert any(r[3] for r in py)
    assert any(r[4] for r in py)


def test_jvm_matches_htmlspec_on_fixture_corpus(spark, fixture_web):
    from sparkcrawl.htmlspec import extract as spec_extract

    pages = spark.read.parquet(f"{fixture_web}/pages.parquet")
    rows = pages.select("url", "html").collect()
    spec = sorted(
        (
            r["url"],
            d["text"],
            tuple(d["links"]),
            d["lang"],
            d["title"],
        )
        for r in rows
        for d in (spec_extract(r["html"]),)
    )
    assert _rows(with_extracted_jvm(pages)) == spec


ADVERSARIAL = [
    ("u0", None),
    ("u1", b""),
    ("u2", b"<html><body>plain words</body></html>"),
    ("u3", b'<html lang="EN-us"><head><title>T  i</title></head>'
           b'<body>a  b\tc\nd</body></html>'),
    ("u4", b"<script>var x = 1;</script><p>kept</p><style>p{}</style>"),
    ("u5", b"<!-- gone --><p>kept too</p>"),
    ("u6", b'<a href="http://x/a">A</a> <A HREF="http://x/b">B</A>'),
    # entity-bearing rows: must trip the guard and route to Python
    ("u7", b"<p>fish &amp; chips &lt;tag&gt; &#65; &nbsp;end</p>"),
    ("u8", b'<a href="http://x/?a=1&amp;b=2">q</a>'),
    ("u9", b"<p>caf\xc3\xa9 non-ascii</p>"),  # utf-8 e-acute
    ("u10", b"<p>unterminated &am</p>"),
    # mixed-case script tag: the Python impl's guard misses "<Script",
    # so the tag body SURVIVES tag-stripping semantics-wise (only the
    # <...> markers are removed) — JVM must replicate that exactly
    ("u11", b"<Script>var y;</Script><p>after</p>"),
    ("u12", b"<p>trailing space </p> "),
    ("u13", "<p> nbsp literal em-space</p>".encode()),
]


def test_split_exact_on_adversarial_inputs(spark):
    df = spark.createDataFrame(ADVERSARIAL, "url string, html binary")
    py = _rows(with_extracted(df))
    split = _rows(with_extracted_split(df))
    assert split == py
    # the reference impl agrees row-by-row with _extract_one directly
    direct = sorted(
        (u, t[0], tuple(t[1]), t[2], t[3])
        for u, t in ((u, _extract_one(h)) for u, h in ADVERSARIAL)
    )
    assert py == direct


def test_guard_classifies_entity_and_nonascii_rows(spark):
    df = spark.createDataFrame(ADVERSARIAL, "url string, html binary")
    flagged = {
        r["url"] for r in df.filter(jvm_guard(F.col("html"))).collect()
    }
    assert flagged == {"u7", "u8", "u9", "u10", "u13"}
    assert not corpus_is_jvm_clean(df)
    clean = df.filter(~F.col("url").isin(*flagged))
    assert corpus_is_jvm_clean(clean)
    # and on the clean subset pure JVM already equals Python
    assert _rows(with_extracted_jvm(clean)) == _rows(with_extracted(clean))
