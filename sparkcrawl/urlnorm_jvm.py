"""JVM-side URL canonicalization: the whole-stage-codegen translation of
urlnorm.canonicalize for the guard-clean common case.

Why: canonicalize_udf is one of the two Arrow-Python stages left on the
round's critical path (~100-150 ms fixed per round regardless of row
count — see BENCH/BASELINE.md round-5 census), and at design scale it
runs on every extracted link (billions of rows), paying the Arrow
serialization hop both ways. Unlike HTML extraction (where Java's regex
engine lost 2x to CPython on 3 KB documents), URLs are ~60-char strings
and the engine's ``base`` is ALWAYS the engine's own canonical url_norm
— so the resolution algebra collapses to a handful of tiny regexes and
concats that codegen compiles into the surrounding stage.

Exactness contract: on rows where ``canon_guard`` is false, the
expression is byte-identical to urlnorm.canonicalize (differentially
tested: hypothesis + fixture corpora + targeted edges). Guard-true rows
— dot segments, userinfo/IPv6 brackets, non-ASCII, embedded control
chars, http(s) hrefs without ``//``, non-canonical bases, '@'/'['
anywhere (overbroad on purpose: '?email=a@b' routes to Python — a
performance choice, never a correctness one) — take the Arrow UDF in
"split" mode, so the hybrid is exact on ANY input. "jvm" mode skips the
Python branch entirely and is for corpora proven guard-clean.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

_HTTP = "http"
_HTTPS = "https"


def canon_guard(base: Column, href: Column) -> Column:
    """True for (base, href) rows the JVM expression must NOT handle."""
    h = href
    # authority candidate of an absolute / protocol-relative href
    auth = F.regexp_extract(h, r"^(?i)(?:https?:)?//([^/?#]*)", 1)
    hpath = F.regexp_extract(
        F.regexp_extract(h, r"^(?i)(?:[a-z][a-z0-9+.\-]*:)?(?://[^/?#]*)?(.*)$", 1),
        r"^([^?#]*)", 1,
    )
    has_scheme = h.rlike(r"^[A-Za-z][A-Za-z0-9+.\-]*:")
    scheme = F.lower(F.regexp_extract(h, r"^([A-Za-z][A-Za-z0-9+.\-]*):", 1))
    return (
        base.isNull()
        | href.isNull()
        # base must be this engine's canonical shape (guaranteed on the
        # crawl path; arbitrary bases from tests/spec calls go Python)
        | ~base.rlike(r"^https?://[a-z0-9.\-]+:\d+(/[^?#]*)?(\?[^#]*)?$")
        | base.rlike(r"(^|/)\.{1,2}(/|$)")
        # control chars anywhere (urlsplit strips \t\r\n mid-string) or
        # non-ASCII (IRI semantics) -> Python
        | h.rlike(r"[\x00-\x1f\x7f]")
        | h.rlike(r"[^\x00-\x7f]")
        # '@' or brackets in an AUTHORITY: userinfo / IPv6 parsing ->
        # Python. In a path, query, or a non-http ref ('mailto:a@b',
        # '?email=a@b') these chars are inert and the expression is
        # exact, so only authority-bearing hrefs are guarded.
        | auth.rlike(r"[@\[\]]")
        # http(s) scheme NOT followed by // (urljoin treats it relative)
        | (has_scheme & scheme.isin(_HTTP, _HTTPS)
           & ~h.rlike(r"^(?i)https?://"))
        # authority with a non-digit port shape
        | ~auth.rlike(r"^[^:]*(:\d*)?$")
        # dot segments in the href path -> RFC 5.2.4 fold -> Python
        | hpath.rlike(r"(^|/)\.{1,2}(/|$)")
        # ';' anywhere: urlparse splits path params and urljoin's merge
        # consults them -> Python
        | h.contains(";") | base.contains(";")
    )


def canonicalize_jvm(base: Column, href: Column) -> Column:
    """Pure-expression canonicalizer, byte-identical to
    urlnorm.canonicalize on guard-false rows. Returns null for
    non-fetchable results exactly like the spec."""
    b = base
    h = F.trim(href)  # guard-clean rows can only carry plain-space ends

    b_scheme = F.regexp_extract(b, r"^([a-z]+)://", 1)
    b_auth = F.regexp_extract(b, r"^[a-z]+://([^/?#]+)", 1)
    b_path0 = F.regexp_extract(b, r"^[a-z]+://[^/?#]+([^?#]*)", 1)
    b_path = F.when(b_path0 == "", F.lit("/")).otherwise(b_path0)
    b_dir = F.regexp_replace(b_path, r"[^/]*$", "")

    has_scheme = h.rlike(r"^[A-Za-z][A-Za-z0-9+.\-]*:")
    abs_http = h.rlike(r"^(?i)https?://")
    proto_rel = h.startswith("//") & ~abs_http
    root_rel = h.startswith("/") & ~h.startswith("//")
    query_only = h.startswith("?")
    frag_only = h.startswith("#")

    abs_scheme = F.lower(F.regexp_extract(h, r"^([A-Za-z]+)://", 1))
    abs_tail = F.regexp_extract(h, r"^(?i)https?://(.*)$", 1)
    pr_tail = F.substring(h, 3, 1_000_000)

    def split_authority(tail: Column, scheme_t: Column) -> Column:
        # urljoin quirk: an EMPTY authority ('http:///x', '///x')
        # inherits the base netloc when the scheme matches the base's
        # ('if netloc: ... else netloc = bnetloc'); a mismatched scheme
        # returns the href untouched, whose empty hostname then nulls.
        auth0 = F.regexp_extract(tail, r"^([^/?#]*)", 1)
        auth = F.when(
            (auth0 == "") & (scheme_t == b_scheme), b_auth
        ).otherwise(auth0)
        pathq = F.substring(tail, F.length(auth0) + 1, F.lit(1_000_000))
        return F.struct(
            scheme_t.alias("s"), auth.alias("a"), pathq.alias("pq")
        )

    # relative merge (RFC 3986 5.3 as urljoin implements it): base dir +
    # href path, with INTERIOR empty segments filtered ('a//b' -> 'a/b')
    # — urljoin applies filter(None, segments[1:-1]) only on this branch,
    # never on rooted/absolute paths. The merged path always starts '/'
    # (canonical base), so a plain '/{2,}' collapse is equivalent.
    h_path = F.regexp_extract(h, r"^([^?#]*)", 1)
    h_suffix = F.substring(h, F.length(h_path) + 1, F.lit(1_000_000))
    merged = F.regexp_replace(
        F.concat(b_dir, h_path), r"/{2,}", "/"
    )
    # query-only href with an EMPTY query ('?', '?#f') keeps the base's
    # own query (urljoin: 'if not query: query = bquery') == base itself
    q_of_h = F.regexp_extract(h, r"^[^#]*\?([^#]*)", 1)

    parts = (
        F.when(abs_http, split_authority(abs_tail, abs_scheme))
        .when(proto_rel, split_authority(pr_tail, b_scheme))
        .when(root_rel, F.struct(
            b_scheme.alias("s"), b_auth.alias("a"), h.alias("pq")))
        .when(query_only, F.struct(
            b_scheme.alias("s"), b_auth.alias("a"),
            F.concat(b_path, h).alias("pq")))
        .otherwise(F.struct(  # relative path (the merge)
            b_scheme.alias("s"), b_auth.alias("a"),
            F.concat(merged, h_suffix).alias("pq")))
    )

    host = F.lower(F.regexp_extract(parts["a"], r"^([^:]*)", 1))
    port_s = F.regexp_extract(parts["a"], r":(\d*)$", 1)
    default_port = F.when(parts["s"] == _HTTP, F.lit(80)).otherwise(
        F.lit(443)
    )
    port0 = F.when(port_s == "", default_port).otherwise(
        port_s.cast("long")
    )
    # spec quirk: 'parts.port or default' treats port 0 as falsy
    port = F.when(port0 == 0, default_port).otherwise(port0)
    path0 = F.regexp_extract(parts["pq"], r"^([^?#]*)", 1)
    path = F.when(path0 == "", F.lit("/")).otherwise(path0)
    query = F.regexp_extract(parts["pq"], r"^[^?#]*\?([^#]*)", 1)

    built = F.concat(
        parts["s"], F.lit("://"), host, F.lit(":"),
        port.cast("string"), path,
        F.when(query != "", F.concat(F.lit("?"), query)).otherwise(
            F.lit("")
        ),
    )

    return (
        F.when(href.isNull() | (h == ""), F.lit(None).cast("string"))
        # fragment-only ref resolves to the (already canonical) base
        # minus its fragment — i.e. the base itself
        .when(frag_only, b)
        # query-only with an empty query inherits the base query == base
        .when(query_only & (q_of_h == ""), b)
        # any non-http(s) scheme is unfetchable (mailto:, javascript:,
        # ...). Guard-clean rows with an http(s) scheme always carry
        # '//', so abs_http covers them.
        .when(has_scheme & ~abs_http, F.lit(None).cast("string"))
        .when(host == "", F.lit(None).cast("string"))
        .when(port > 65535, F.lit(None).cast("string"))  # ValueError path
        .otherwise(built)
    )


def with_canonicalized(
    df: DataFrame,
    base_col: str,
    href_col: str,
    out_col: str = "url_norm",
    mode: str = "python",
) -> DataFrame:
    """Attach ``out_col`` per the chosen mode.

    python — the Arrow UDF for every row (today's default path).
    split  — guard rows via the Arrow UDF, the rest via the JVM
             expression, unioned: exact on ANY input; the Python stage
             survives only for the (typically empty) guard slice.
    jvm    — pure expression for every row; callers own the guard-clean
             precondition (asserted cheap via a guard-count if needed).
    """
    from sparkcrawl.urlnorm import canonicalize_udf

    b, h = F.col(base_col), F.col(href_col)
    if mode == "python":
        return df.withColumn(out_col, canonicalize_udf(b, h))
    if mode == "jvm":
        return df.withColumn(out_col, canonicalize_jvm(b, h))
    if mode != "split":
        raise ValueError(f"unknown canonicalize mode: {mode!r}")
    g = canon_guard(b, h)
    clean = df.filter(~g).withColumn(out_col, canonicalize_jvm(b, h))
    dirty = df.filter(g).withColumn(out_col, canonicalize_udf(b, h))
    return clean.unionByName(dirty)
