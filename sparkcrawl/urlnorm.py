"""URL canonicalization — the engine's single normalizer.

The reference has FOUR divergent copies of `normalize`/`normalizeHttps`
(CrawlerBolt.java:210-263, DocumentParserBolt.java:75-101,
DistributedCrawlerBolt.java:213-239, DistributedDocumentParserBolt.java:77-103)
plus spout-side port insertion (URLSpout.java:152-184). This module replaces
all of them with one specified pure function, exposed three ways:

* ``canonicalize(base, href)``       — pure Python (the SPEC; oracle uses it)
* ``canonicalize_udf``               — Arrow-batched pandas UDF (engine hot path)
* ``with_url_parts(df, col)``        — JVM-side host/path/depth columns via
                                       ``parse_url`` (no Python at all)

Spec (reference-derived):
  - only http/https survive; anything else (mailto:, javascript:, ...) -> null
  - scheme and host lowercased
  - explicit port ALWAYS present (http -> :80, https -> :443) unless given
    (URLSpout.java:152-184 behavior)
  - empty path -> '/'; dot-segments resolved; fragment dropped; query kept
  - relative refs resolved against the base truncated at the last '/'
    (CrawlerBolt.java:223-233 behavior == RFC 3986 merge, via urljoin)
"""

from __future__ import annotations

from urllib.parse import urljoin, urlsplit, urlunsplit

import pandas as pd
from pyspark.sql import functions as F, types as T
from pyspark.sql.functions import pandas_udf

_DEFAULT_PORT = {"http": 80, "https": 443}


def canonicalize(base: str | None, href: str | None) -> str | None:
    """Resolve ``href`` against ``base`` and normalize. Returns None if the
    result is not a fetchable http(s) URL. Pure and deterministic."""
    if href is None:
        return None
    href = href.strip()
    if not href:
        return None
    try:
        if base:
            target = urljoin(base, href)
        else:
            target = href
        parts = urlsplit(target)
    except ValueError:
        return None
    scheme = (parts.scheme or "").lower()
    if scheme not in _DEFAULT_PORT:
        return None
    host = (parts.hostname or "").lower()
    if not host:
        return None
    try:
        port = parts.port or _DEFAULT_PORT[scheme]
    except ValueError:
        return None
    path = parts.path or "/"
    path = _resolve_dots(path)
    netloc = f"{host}:{port}"
    return urlunsplit((scheme, netloc, path, parts.query, ""))


def _resolve_dots(path: str) -> str:
    """RFC 3986 §5.2.4 remove_dot_segments (exactly; shared spec)."""
    out: list[str] = []
    for seg in path.split("/"):
        if seg == ".":
            continue
        if seg == "..":
            if len(out) > 1:
                out.pop()
            continue
        out.append(seg)
    if path.endswith(("/.", "/..")) and (not out or out[-1] != ""):
        out.append("")
    res = "/".join(out)
    if not res.startswith("/"):
        res = "/" + res
    return res


@pandas_udf(T.StringType())
def canonicalize_udf(base: pd.Series, href: pd.Series) -> pd.Series:
    """Arrow-batched canonicalizer: (base_url, href) -> url_norm|null."""
    return pd.Series(
        [canonicalize(b, h) for b, h in zip(base, href)], dtype="object"
    )


def host_of(url: str) -> str:
    """Hostname without port (the reference's grouping/robots key —
    URLInfo.java:13-50 hostName)."""
    p = urlsplit(url)
    return (p.hostname or "").lower()


def path_of(url: str) -> str:
    return urlsplit(url).path or "/"


def depth_of(url: str) -> int:
    """Path depth as the reference counts it: len(path.split('/')) over the
    raw path (URLFilterBolt.java:89-95 splits the full path string)."""
    return len(path_of(url).split("/"))


def with_url_parts(df, url_col: str = "url_norm"):
    """Add host / path / path_depth columns JVM-side (parse_url + split —
    whole-stage-codegen'd, no Python). host includes the explicit port
    because url_norm always carries one."""
    c = F.col(url_col)
    # url_norm shape is scheme://host:port/path?query — hostname is between
    # '://' and the ':port'. Pure regexp: codegen'd, no Python.
    host = F.regexp_extract(c, r"^[a-z]+://([^/:]+)", 1)
    path = F.coalesce(
        F.nullif(F.parse_url(c, F.lit("PATH")), F.lit("")), F.lit("/")
    )
    return (
        df.withColumn("host", host)
        .withColumn("path", path)
        .withColumn("path_depth", F.size(F.split(path, "/")))
    )
