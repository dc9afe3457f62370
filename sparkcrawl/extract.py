"""Engine-side extraction: vectorized (Arrow-batched) pandas UDF.

Independent implementation of the SPEC in htmlspec.py (which is the oracle's
reference implementation built on html.parser) — this one is regex-based so
the byte-identical-text test in tests/test_extract.py is a real two-impl
cross-check, mirroring how the reference's Jsoup output would be validated.

Replaces DocumentParserBolt P3 (Jsoup parse), P4 (lang detect — we read the
``<html lang>`` attribute, the branch at DocumentParserBolt.java:182-194),
and P5 (link extraction, DocumentParserBolt.java:195-216).
"""

from __future__ import annotations

import re
from html import unescape

import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T
from pyspark.sql.functions import pandas_udf

_SCRIPT_STYLE = re.compile(r"<(script|style)\b[^>]*>.*?</\1\s*>", re.S | re.I)
_COMMENT = re.compile(r"<!--.*?-->", re.S)
_TAG = re.compile(r"<[^>]*>")
_WS = re.compile(r"\s+")
_HREF = re.compile(r"<a\b[^>]*?\shref\s*=\s*\"([^\"]*)\"", re.I)
_LANG = re.compile(r"<html\b[^>]*?\slang\s*=\s*\"([^\"]*)\"", re.I)
_TITLE = re.compile(r"<title\b[^>]*>(.*?)</title\s*>", re.S | re.I)

EXTRACT_SCHEMA = T.StructType(
    [
        T.StructField("text", T.StringType()),
        T.StructField("links", T.ArrayType(T.StringType())),
        T.StructField("lang", T.StringType()),
        T.StructField("title", T.StringType()),
    ]
)


def _unescape(s: str) -> str:
    # html.unescape is expensive; the '&' guard skips it for the common case
    return unescape(s) if "&" in s else s


def _extract_one(html: bytes | str | None) -> tuple:
    if html is None:
        return ("", [], "", "")
    if isinstance(html, (bytes, bytearray)):
        html = bytes(html).decode("utf-8", errors="replace")
    body = html
    if "<script" in body or "<style" in body or "<SCRIPT" in body:
        body = _SCRIPT_STYLE.sub("", body)
    if "<!--" in body:
        body = _COMMENT.sub("", body)
    # " ".join(split()) == collapse-\s+-and-strip (same Unicode whitespace
    # set as re \s) but runs in C without a third regex pass
    text = " ".join(_unescape(_TAG.sub("", body)).split())
    links = [_unescape(m) for m in _HREF.findall(body)]
    lang_m = _LANG.search(body)
    lang = lang_m.group(1).lower() if lang_m else ""
    title_m = _TITLE.search(body)
    title = (
        " ".join(_unescape(_TAG.sub("", title_m.group(1))).split())
        if title_m
        else ""
    )
    return (text, links, lang, title)


@pandas_udf(EXTRACT_SCHEMA)
def extract_udf(html: pd.Series) -> pd.DataFrame:
    rows = [_extract_one(h) for h in html]
    return pd.DataFrame(rows, columns=["text", "links", "lang", "title"])


def with_extracted(df: DataFrame, html_col: str = "html") -> DataFrame:
    """Add ex_text / ex_links / ex_lang / ex_title columns.

    One Arrow batch per ~10k rows flows Python-side; everything before and
    after stays JVM. At scale the input is repartitioned by url hash (uniform)
    beforehand so a mega-host cannot skew extraction partitions.
    """
    e = extract_udf(F.col(html_col))
    return (
        df.withColumn("_ex", e)
        .withColumn("ex_text", F.col("_ex.text"))
        .withColumn("ex_links", F.col("_ex.links"))
        .withColumn("ex_lang", F.col("_ex.lang"))
        .withColumn("ex_title", F.col("_ex.title"))
        .drop("_ex")
    )
