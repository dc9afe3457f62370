"""JVM-side extraction: the whole-stage-codegen translation of
extract._extract_one (P3-P5, DocumentParserBolt.java:155-216).

Why: the Arrow-batched Python extract is the dominant CPU on the bulk
fetch+extract path AND adds a fixed ~100-150 ms ArrowEvalPython stage
cost to every crawl round (measured: a warm 1-partition pandas_udf job
runs ~180 ms vs ~80 ms for the identical JVM-only job — the per-task
Python round-trip is ~50 ms even for 1 KB batches). This module keeps
every expression inside WholeStageCodegen: regexp_replace / regexp_
extract_all / lower / trim, no Python anywhere.

Byte-identity contract (the north rule's "byte-identical extracted text
per url"): on html that contains NO '&' and NO non-ASCII bytes, these
expressions produce byte-identical (text, links, lang, title) to BOTH
reference implementations (extract.py's regex impl and htmlspec.py's
html.parser spec impl) — proved by tests/test_extract_jvm.py over every
fixture web. The two preconditions exist because Python's html.unescape
implements the full HTML5 entity table (not JVM-expressible) and
Python's bytes.decode(errors="replace") differs from Spark's binary->
string cast on invalid UTF-8. Rows that trip either guard are routed to
the Python UDF by the "split" mode below, so the hybrid is exact on ANY
input; the engine sniffs its (cached) web once at init and picks pure
JVM when the corpus is clean — one cheap aggregate, zero Python stages
in every round after.

Scale note: at 100 TB the sniff is one metadata-cheap column aggregate
over data the fetch join scans anyway, and real Common-Crawl html WILL
trip the guard — production runs on "split", where the JVM side still
absorbs the (typically large) clean fraction and only guard rows pay
the Python boundary.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# Python reference: _SCRIPT_STYLE / _COMMENT / _TAG / _HREF / _LANG /
# _TITLE in extract.py — same patterns, Java regex dialect (inline
# (?i)(?s)(?U) flags; \1 backreference works in regexp_replace).
_RE_SCRIPT_STYLE = r"(?is)<(script|style)\b[^>]*>.*?</\1\s*>"
_RE_COMMENT = r"(?s)<!--.*?-->"
_RE_TAG = r"<[^>]*>"
# (?U) makes Java's \s the Unicode whitespace set, matching what
# Python's str.split() splits on (" ".join(s.split()) is the reference
# collapse) — without it Java \s is ASCII-only and \xa0 would survive.
_RE_WS = r"(?U)\s+"
_RE_HREF = r'(?i)<a\b[^>]*?\shref\s*=\s*"([^"]*)"'
_RE_LANG = r'(?i)<html\b[^>]*?\slang\s*=\s*"([^"]*)"'
_RE_TITLE = r"(?is)<title\b[^>]*>(.*?)</title\s*>"


def jvm_guard(html_col: Column) -> Column:
    """True for rows the JVM path must NOT handle: any '&' (entity
    unescape needs Python's html.unescape) or non-ASCII (decode
    semantics differ). Matches extract._unescape's own '&' guard, so on
    guard-false rows Python provably never unescapes either."""
    h = html_col.cast("string")
    return h.contains("&") | h.rlike("[^\\x00-\\x7F]")


def _collapse(col: Column) -> Column:
    # " ".join(s.split()): collapse all whitespace runs to one space and
    # strip the ends.  trim() only strips ' ' but the \s+ replace has
    # already turned any edge whitespace run into exactly one ' '.
    return F.trim(F.regexp_replace(col, _RE_WS, " "))


def with_extracted_jvm(df: DataFrame, html_col: str = "html") -> DataFrame:
    """Pure-JVM ex_text / ex_links / ex_lang / ex_title. Byte-identical
    to extract.with_extracted on rows where jvm_guard is false; callers
    own that precondition (engine sniffs at init; "split" mode routes)."""
    h = F.col(html_col).cast("string")
    # guards replicate extract._extract_one EXACTLY (e.g. a "<Script>"
    # tag is NOT stripped by the Python impl because its substring guard
    # only checks "<script"/"<style"/"<SCRIPT" — so neither do we)
    ss_guard = (
        h.contains("<script") | h.contains("<style") | h.contains("<SCRIPT")
    )
    body1 = F.when(
        ss_guard, F.regexp_replace(h, _RE_SCRIPT_STYLE, "")
    ).otherwise(h)
    body = F.when(
        body1.contains("<!--"), F.regexp_replace(body1, _RE_COMMENT, "")
    ).otherwise(body1)
    title_raw = F.regexp_extract(body, _RE_TITLE, 1)
    ex = F.when(
        F.col(html_col).isNull(),
        F.struct(
            F.lit("").alias("text"),
            F.array().cast("array<string>").alias("links"),
            F.lit("").alias("lang"),
            F.lit("").alias("title"),
        ),
    ).otherwise(
        F.struct(
            _collapse(F.regexp_replace(body, _RE_TAG, "")).alias("text"),
            F.regexp_extract_all(body, F.lit(_RE_HREF), F.lit(1)).alias(
                "links"
            ),
            F.lower(F.regexp_extract(body, _RE_LANG, 1)).alias("lang"),
            _collapse(F.regexp_replace(title_raw, _RE_TAG, "")).alias(
                "title"
            ),
        )
    )
    return (
        df.withColumn("_ex", ex)
        .withColumn("ex_text", F.col("_ex.text"))
        .withColumn("ex_links", F.col("_ex.links"))
        .withColumn("ex_lang", F.col("_ex.lang"))
        .withColumn("ex_title", F.col("_ex.title"))
        .drop("_ex")
    )


def with_extracted_split(df: DataFrame, html_col: str = "html") -> DataFrame:
    """Exact on ANY input: guard rows take the Python UDF, the rest the
    JVM expressions, unioned. Column order/schema match with_extracted.
    The union is narrow (no shuffle); downstream engine stages never
    depend on encounter order (determinism contract, §2)."""
    from sparkcrawl.extract import with_extracted

    g = jvm_guard(F.col(html_col))
    cols = None
    jvm_part = with_extracted_jvm(df.filter(~g | g.isNull()), html_col)
    py_part = with_extracted(df.filter(g), html_col)
    cols = jvm_part.columns
    return jvm_part.unionByName(py_part.select(*cols))


def corpus_is_jvm_clean(df: DataFrame, html_col: str = "html") -> bool:
    """One aggregate over the corpus: True iff no row trips jvm_guard —
    the engine's init-time sniff that licenses pure-JVM extraction for
    every round of the crawl."""
    n = df.filter(jvm_guard(F.col(html_col))).limit(1).count()
    return n == 0
