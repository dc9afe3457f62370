"""robots.txt rules: effective-block resolution + disallow / crawl-delay.

Reference semantics (CrawlerBolt.java:179-203, 302-355 + RobotsTxtInfo.java):
  * rules are grouped per (host, agent); if a host has a block for OUR agent,
    that block fully shadows the '*' block (even if emptier);
  * a path is denied iff it starts with any disallow prefix of the effective
    block (exact or prefix match — canCrawl at CrawlerBolt.java:179-203);
  * crawl-delay comes from the effective block.

Spark shape: the rules table is tiny relative to the corpus (one row per
rule), so the per-host effective block is aggregated once per run into
``(host, disallow_prefixes array<string>, crawl_delay int)`` and BROADCAST
to the frontier join — the analogue of the reference's in-memory robotMap
cache (CrawlerBolt.java:396-427), but cluster-wide and immutable.

The disallow test itself is ``F.exists(prefixes, p -> startswith)`` — a JVM
higher-order function, no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

USER_AGENT = "cis455crawler"  # the reference's UA (CrawlerBolt.java:75)


def effective_rules(robots: DataFrame, agent: str = USER_AGENT) -> DataFrame:
    """(host, agent, rule, path_prefix, crawl_delay) -> per-host effective
    block: (host, disallow_prefixes, crawl_delay)."""
    ours = robots.filter(F.col("agent") == agent)
    star = robots.filter(F.col("agent") == "*")
    hosts_with_ours = ours.select("host").distinct()
    effective = ours.unionByName(
        star.join(hosts_with_ours, "host", "left_anti")
    )
    return effective.groupBy("host").agg(
        F.sort_array(
            F.collect_list(
                F.when(F.col("rule") == "disallow", F.col("path_prefix"))
            )
        ).alias("disallow_prefixes"),
        F.max("crawl_delay").alias("crawl_delay"),
    )


def join_rules(frontier: DataFrame, host_rules: DataFrame) -> DataFrame:
    """Broadcast-join the effective rules onto frontier rows by host."""
    return frontier.join(F.broadcast(host_rules), "host", "left")


def denied_predicate() -> Column:
    """True where the row's path is disallowed by the joined rules."""
    return F.coalesce(
        F.exists(
            F.col("disallow_prefixes"),
            lambda p: F.col("path").startswith(p),
        ),
        F.lit(False),
    )


# ---- pure-Python twin (the spec; used by tests/oracle.py) -------------------


def effective_rules_py(rows: list[dict], agent: str = USER_AGENT) -> dict:
    """rows of the robots table -> {host: (sorted disallow prefixes, delay)}."""
    by_host: dict[str, dict[str, list[dict]]] = {}
    for r in rows:
        by_host.setdefault(r["host"], {}).setdefault(r["agent"], []).append(r)
    out: dict[str, tuple[list[str], int | None]] = {}
    for host, blocks in by_host.items():
        block = blocks.get(agent) or blocks.get("*") or []
        prefixes = sorted(
            r["path_prefix"]
            for r in block
            if r["rule"] == "disallow" and r["path_prefix"] is not None
        )
        delays = [r["crawl_delay"] for r in block if r["crawl_delay"] is not None]
        out[host] = (prefixes, max(delays) if delays else None)
    return out


def denied_py(rules: dict, host: str, path: str) -> bool:
    prefixes, _ = rules.get(host, ([], None))
    return any(path.startswith(p) for p in prefixes)


def delay_py(rules: dict, host: str) -> int | None:
    return rules.get(host, ([], None))[1]
