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

import pandas as pd  # module-level: pandas_udf type hints resolve here
from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.functions import pandas_udf

USER_AGENT = "cis455crawler"  # the reference's UA (CrawlerBolt.java:75)


def effective_rules(robots: DataFrame, agent: str = USER_AGENT,
                    with_agent_flag: bool = False) -> DataFrame:
    """(host, agent, rule, path_prefix, crawl_delay) -> per-host effective
    block: (host, disallow_prefixes, crawl_delay).

    with_agent_flag adds ``agent_specific`` (did the effective block come
    from OUR agent rather than '*'?) — the input to the local variant's
    default-1s crawl-delay gate (politeness.eligible_hosts_filter)."""
    ours = robots.filter(F.col("agent") == agent)
    star = robots.filter(F.col("agent") == "*")
    hosts_with_ours = ours.select("host").distinct()
    effective = ours.unionByName(
        star.join(hosts_with_ours, "host", "left_anti")
    )
    aggs = [
        F.sort_array(
            F.collect_list(
                F.when(F.col("rule") == "disallow", F.col("path_prefix"))
            )
        ).alias("disallow_prefixes"),
        F.max("crawl_delay").alias("crawl_delay"),
    ]
    if with_agent_flag:
        aggs.append(
            F.max((F.col("agent") == agent).cast("int"))
            .cast("boolean").alias("agent_specific")
        )
    return effective.groupBy("host").agg(*aggs)


def join_rules(frontier: DataFrame, host_rules: DataFrame,
               hint_broadcast: bool = True) -> DataFrame:
    """Join the effective rules onto frontier rows by host.

    hint_broadcast forces a broadcast (the robotMap-cache analogue — right
    whenever the rules side fits executor memory). Past ~10^8 robots-bearing
    hosts it cannot fit: pass False and the equi-join plans as a shuffled
    join on host (co-partitioned with the frontier's host partitioning; AQE
    may still pick broadcast from runtime stats)."""
    r = F.broadcast(host_rules) if hint_broadcast else host_rules
    return frontier.join(r, "host", "left")


def denied_predicate() -> Column:
    """True where the row's path is disallowed by the joined rules."""
    return F.coalesce(
        F.exists(
            F.col("disallow_prefixes"),
            lambda p: F.col("path").startswith(p),
        ),
        F.lit(False),
    )


# ---- raw robots.txt text parsing (reference R1) -----------------------------


def parse_robots_txt(text: str, host: str = "") -> list[dict]:
    """Parse raw robots.txt text into rule rows, with the REFERENCE's exact
    block semantics (CrawlerBolt.java:302-355):

    * a ``User-agent:`` line opens a block; further ``User-agent`` lines
      before a blank line ADD agents — every Disallow/Allow/Crawl-delay in
      the block applies to ALL of the block's agents;
    * blank lines end the block; so does any line that doesn't split on
      ':' into exactly two parts (comments and Sitemap URLs inside a block
      therefore END it, as in the reference's inner-loop break);
    * unknown two-part directives inside a block are ignored but keep the
      block open (the reference's else-if chain falls through);
    * a non-integer Crawl-delay aborts the remaining parse, keeping rows
      collected so far (the reference's NumberFormatException unwinds to
      the outer catch);
    * directive names are case-sensitive, values are trimmed.

    Returns rows shaped for the rules table:
    (host, agent, rule, path_prefix, crawl_delay).
    """
    rows: list[dict] = []

    def emit(agent, rule, prefix=None, delay=None):
        rows.append(
            dict(host=host, agent=agent, rule=rule,
                 path_prefix=prefix, crawl_delay=delay)
        )

    lines = text.splitlines()
    i, n = 0, len(lines)
    while i < n:
        line = lines[i]
        i += 1
        if not line.strip() or line.startswith("#"):
            continue
        parts = line.split(":")
        if len(parts) != 2 or parts[0] != "User-agent":
            continue
        agents = [parts[1].strip()]
        while i < n:
            inner = lines[i]
            i += 1
            if not inner.strip():
                break
            m = inner.split(":")
            if len(m) != 2:
                break
            key, val = m[0], m[1].strip()
            if key == "User-agent":
                if val not in agents:
                    agents.append(val)
            elif key == "Disallow":
                for a in agents:
                    emit(a, "disallow", prefix=val)
            elif key == "Allow":
                for a in agents:
                    emit(a, "allow", prefix=val)
            elif key == "Crawl-delay":
                try:
                    d = int(val)
                except ValueError:
                    return rows  # reference: parse aborts, partial kept
                for a in agents:
                    emit(a, "crawl_delay", delay=d)
            # unknown two-part directive: ignored, block stays open
    return rows


def parse_robots_corpus(robots_texts: DataFrame,
                        host_col: str = "host",
                        text_col: str = "robots_txt") -> DataFrame:
    """(host, robots_txt) corpus -> rules table rows, via one Arrow pass
    (the distributed form of the reference's per-host parse+cache)."""

    @pandas_udf(
        "array<struct<host:string,agent:string,rule:string,"
        "path_prefix:string,crawl_delay:int>>"
    )
    def _parse(hosts: pd.Series, texts: pd.Series) -> pd.Series:
        return pd.Series(
            [
                [
                    (r["host"], r["agent"], r["rule"],
                     r["path_prefix"], r["crawl_delay"])
                    for r in parse_robots_txt(t or "", h)
                ]
                for h, t in zip(hosts, texts)
            ]
        )

    return (
        robots_texts.select(
            F.explode(_parse(F.col(host_col), F.col(text_col))).alias("r")
        )
        .select("r.host", "r.agent", "r.rule", "r.path_prefix",
                "r.crawl_delay")
    )


# ---- pure-Python twin (the spec; used by tests/oracle.py) -------------------


def effective_rules_py(rows: list[dict], agent: str = USER_AGENT) -> dict:
    """rows of the robots table ->
    {host: (sorted disallow prefixes, delay, agent_specific)}."""
    by_host: dict[str, dict[str, list[dict]]] = {}
    for r in rows:
        by_host.setdefault(r["host"], {}).setdefault(r["agent"], []).append(r)
    out: dict[str, tuple[list[str], int | None, bool]] = {}
    for host, blocks in by_host.items():
        block = blocks.get(agent) or blocks.get("*") or []
        prefixes = sorted(
            r["path_prefix"]
            for r in block
            if r["rule"] == "disallow" and r["path_prefix"] is not None
        )
        delays = [r["crawl_delay"] for r in block if r["crawl_delay"] is not None]
        out[host] = (prefixes, max(delays) if delays else None, agent in blocks)
    return out


def denied_py(rules: dict, host: str, path: str) -> bool:
    prefixes = rules.get(host, ([], None, False))[0]
    return any(path.startswith(p) for p in prefixes)


def delay_py(rules: dict, host: str) -> int | None:
    """Explicit effective crawl delay (None if the block has none).

    The LOCAL variant's 1s default (CrawlerBolt.java:442-444) is NOT a
    deferral: under the 1-round = 1-virtual-second mapping a 1-round
    delay never defers (a host fetched in round r is always eligible at
    r+1), so the default maps to a per-round cap of 1 instead —
    politeness.select_per_host(default_delay_hosts=...). Note the
    reference's own default is dead code: the gate at
    CrawlerBolt.java:439 tests crawlDelays membership, not block
    existence, so delay is never -1 inside it (and the distributed
    variant comments the default out, DistributedCrawlerBolt.java:
    441-446); we model the comment's stated intent behind
    CrawlConfig.default_delay_1, off by default."""
    return rules.get(host, ([], None, False))[1]


def default_delay_host_py(rules: dict, host: str) -> bool:
    """Is this host in the local variant's default-1s set (agent-specific
    block, no explicit Crawl-delay)?"""
    prefixes, delay, agent_specific = rules.get(host, ([], None, False))
    return agent_specific and delay is None
