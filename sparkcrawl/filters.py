"""Frontier admission filters (reference D1–D3).

All pure Column expressions — codegen'd, pushed before any shuffle/join so
rejected URLs never reach the seen-set anti-join (the reference runs the same
checks before its seen-store get-or-put, URLFilterBolt.java:84-107).

D1: URL length cap            (URLFilterBolt.java:46,84-87; 1000 local)
D2: path depth cap            (URLFilterBolt.java:47,89-95; split('/') > 5)
D3: banned hosts + wiki-lang  (XPathCrawler.java:106-108; URLFilterBolt.java:97)
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, functions as F

MAX_URL_LENGTH = 1000
MAX_PATH_DEPTH = 5
DEFAULT_BANNED_HOSTS = ("xxx.com",)


@dataclass(frozen=True)
class FilterConfig:
    max_url_length: int = MAX_URL_LENGTH
    max_path_depth: int = MAX_PATH_DEPTH
    banned_hosts: tuple[str, ...] = DEFAULT_BANNED_HOSTS
    # hosts matching *wikipedia.org* must start with the crawl language
    # (URLFilterBolt.java:97: contains 'wikipedia.org' and not startswith 'en')
    lang_gated_substrings: tuple[str, ...] = ("wikipedia.org",)
    lang_prefix: str = "en"

    @classmethod
    def distributed(cls, banned_hosts: tuple[str, ...] = DEFAULT_BANNED_HOSTS
                    ) -> "FilterConfig":
        """The DISTRIBUTED variant's presets: MAX_URL_LENGTH = 100
        (DistributedURLFilterBolt.java:45) and the wider lang gate — hosts
        containing 'wiki' OR 'wiktionary' OR 'stackoverflow' must start
        with the crawl language (DistributedURLFilterBolt.java:95).
        Depth cap is 5 in both variants."""
        return cls(
            max_url_length=100,
            banned_hosts=banned_hosts,
            lang_gated_substrings=("wiki", "wiktionary", "stackoverflow"),
        )


def admission_predicate(cfg: FilterConfig = FilterConfig()) -> Column:
    """Boolean Column over (url_norm, host, path_depth): True = admit.

    banned_hosts is a literal isin (broadcast-set semantics — tiny list);
    everything is a whole-stage-codegen expression, zero Python.
    """
    url, host, depth = F.col("url_norm"), F.col("host"), F.col("path_depth")
    pred = F.length(url) <= cfg.max_url_length  # D1
    pred = pred & (depth <= cfg.max_path_depth)  # D2
    if cfg.banned_hosts:  # D3a
        pred = pred & ~host.isin(*cfg.banned_hosts)
    for sub in cfg.lang_gated_substrings:  # D3b
        pred = pred & (~host.contains(sub) | host.startswith(cfg.lang_prefix))
    return pred


# ---- pure-Python twin (the spec; used by tests/oracle.py) -------------------


def admit(url_norm: str, host: str, path_depth: int,
          cfg: FilterConfig = FilterConfig()) -> bool:
    if len(url_norm) > cfg.max_url_length:
        return False
    if path_depth > cfg.max_path_depth:
        return False
    if host in cfg.banned_hosts:
        return False
    for sub in cfg.lang_gated_substrings:
        if sub in host and not host.startswith(cfg.lang_prefix):
            return False
    return True
