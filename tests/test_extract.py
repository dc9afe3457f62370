"""Two-implementation extraction cross-check: htmlspec (html.parser, the
SPEC reference) vs extract (regex, the engine) must agree BYTE-IDENTICALLY —
the driver's per-row invariant."""

from __future__ import annotations

from pyspark.sql import functions as F

from gen_fixtures import generate
from sparkcrawl.extract import _extract_one, with_extracted
from sparkcrawl.htmlspec import extract as spec_extract

EDGE_CASES = [
    b"",
    b"<html></html>",
    b'<html lang="EN"><body>Hi</body></html>',
    b"<html><body>a<script>var x=1;</script>b</body></html>",
    b"<html><body>a<style>p{}</style>b</body></html>",
    b"<html><body><!-- comment -->text</body></html>",
    b"<html><body>&amp; &lt; &gt; &quot; &#39;</body></html>",
    b'<html><body><a href="/x?a=1&amp;b=2">link</a></body></html>',
    b"<html><body>  lots\n\t of \r\n space  </body></html>",
    b"<html><head><title> A  B </title></head><body>C</body></html>",
    "<html><body>unicodé 中文</body></html>".encode(),
    b'<html><body><A HREF="/UP.html">caps tag</A></body></html>',
]


def test_edge_cases_agree():
    for html in EDGE_CASES:
        spec = spec_extract(html)
        text, links, lang, title = _extract_one(html)
        assert text == spec["text"], html
        assert links == spec["links"], html
        assert lang == spec["lang"], html
        assert title == spec["title"], html


def test_fixture_pages_agree():
    fx = generate("tiny", seed=42)
    for row in fx["pages"]:
        spec = spec_extract(row["html"])
        text, links, lang, _ = _extract_one(row["html"])
        assert text == spec["text"] == row["text"], row["url"]
        assert links == spec["links"], row["url"]
        assert lang == spec["lang"], row["url"]


def test_spark_udf_byte_identical(spark, fixture_paths):
    """Engine UDF output == golden text column for every fixture page."""
    from sparkcrawl import schema as S

    pages = spark.read.schema(S.PAGES).parquet(fixture_paths["pages"])
    out = with_extracted(pages)
    bad = out.filter(
        (F.col("ex_text") != F.col("text"))
        | (F.col("ex_lang") != F.col("lang"))
    )
    assert bad.count() == 0
