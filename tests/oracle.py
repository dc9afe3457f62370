"""Pure-Python oracle simulator for the crawl engine (SURVEY.md §5).

Implements the SPECIFIED round semantics (SURVEY §7.2) sequentially and
independently of Spark: same seeds + same synthetic web => the engine must
produce an IDENTICAL trace, seen-set, crawled-set, and byte-identical
extracted text. Uses the spec modules (urlnorm.canonicalize, filters.admit,
robots.*_py, politeness.select_py, htmlspec.extract — the html.parser
reference extractor, NOT the engine's regex one).

Semantics mirrored from the reference:
  round select   = URLFrontier.dequeue run caps (URLFrontier.java:59-138)
  delay gate     = CrawlerBolt.java:439-457 (delay in rounds)
  robots denied  = canCrawl prefix check (CrawlerBolt.java:179-203)
  fetch branches = CrawlerBolt.java:460-553 (3xx/404/5xx/type/size)
  content dedup  = md5 get-or-put first-wins (DocumentParserBolt.java:155-159)
  lang filter    = <html lang> attr (DocumentParserBolt.java:182-194)
  admission      = D1-D4 (URLFilterBolt.java:84-120)
"""

from __future__ import annotations

from dataclasses import dataclass, field

from sparkcrawl.filters import FilterConfig, admit
from sparkcrawl.htmlspec import extract
from sparkcrawl.politeness import CAPS, DEFAULT_PRIORITY
from sparkcrawl.robots import (
    default_delay_host_py,
    delay_py,
    denied_py,
    effective_rules_py,
)
from sparkcrawl.urlnorm import canonicalize, depth_of, host_of, path_of

ROUND_SHIFT = 32


@dataclass
class OracleResult:
    trace: list[tuple] = field(default_factory=list)  # (round, ord, url, host, action)
    seen: set = field(default_factory=set)
    crawled: dict = field(default_factory=dict)  # url_norm -> (round, text)
    rounds: int = 0
    metrics: list[dict] = field(default_factory=list)


def run_oracle(
    fixtures: dict,
    max_rounds: int = 10**6,
    max_file_num: int = 10**9,
    max_doc_size: int = 5_000_000,
    fcfg: FilterConfig | None = None,
    doc_cache: dict | None = None,
    default_delay_1: bool = False,
    priority_hosts: dict | None = None,
) -> OracleResult:
    """doc_cache: {url_norm: cached_ts} from a previous pass — enables the
    304/If-Modified-Since branch (CrawlerBolt.java:460-485): a cached url
    whose page warc_ts <= cached_ts traces `not_modified`, updates the host
    clock, re-extracts links, and is neither re-stored nor content-hashed."""
    fcfg = fcfg or FilterConfig(banned_hosts=fixtures.get("banned_hosts", ("xxx.com",)))
    pages = {r["url"]: r for r in fixtures["pages"]}
    meta = {r["url"]: r for r in fixtures["page_meta"]}
    rules = effective_rules_py(fixtures["robots"])
    # literal priority classes (URLFrontier.java:32-39) min-merge with the
    # seeds-derived ones below
    priorities: dict[str, int] = dict(priority_hosts or {})

    res = OracleResult()
    frontier: list[dict] = []  # rows: url_norm host path depth seq
    clock: dict[str, int] = {}
    content_seen: dict[bytes, str] = {}

    # --- seeds: bypass admission filters; per url_norm keep the row with the
    # lexicographically smallest raw url; seq = rank of raw url ---
    by_norm: dict[str, dict] = {}
    for srow in fixtures["seeds"]:
        un = canonicalize(None, srow["url"])
        if un is None:
            continue
        cur = by_norm.get(un)
        if cur is None or srow["url"] < cur["url"]:
            by_norm[un] = dict(
                url=srow["url"], url_norm=un, host=host_of(un),
                path=path_of(un), depth=0, priority=srow["priority"],
            )
    seed_rows = sorted(by_norm.values(), key=lambda r: r["url"])
    for i, r in enumerate(seed_rows):
        r["seq"] = i + 1
        res.seen.add(r["url_norm"])
        priorities[r["host"]] = min(
            priorities.get(r["host"], 99), r["priority"]
        )
        frontier.append(
            {k: r[k] for k in ("url_norm", "host", "path", "depth", "seq")}
        )

    n_crawled = 0
    r = 0
    stall = 0
    while r < max_rounds and frontier and n_crawled < max_file_num:
        r += 1
        # 1-2. delay gate + per-host caps, in seq order
        taken: dict[str, int] = {}
        selected = []
        for row in sorted(frontier, key=lambda x: x["seq"]):
            host = row["host"]
            d = delay_py(rules, host)
            if d is not None and host in clock and r - clock[host] < d:
                continue
            cap = CAPS.get(priorities.get(host, DEFAULT_PRIORITY), CAPS[3])
            if default_delay_1 and default_delay_host_py(rules, host):
                cap = 1  # local 1s default == 1 fetch per virtual second
            if taken.get(host, 0) >= cap:
                continue
            taken[host] = taken.get(host, 0) + 1
            selected.append(row)
        if not selected:
            stall += 1
            res.metrics.append(dict(round=r, n_selected=0))
            if stall > 64:
                break
            continue
        stall = 0
        sel_set = {row["url_norm"] for row in selected}
        frontier = [row for row in frontier if row["url_norm"] not in sel_set]

        traced = []  # (seq, url_norm, host, action)
        candidates = []  # (parent_seq, link_idx, base, parent_depth, href)
        got_hosts = set()
        for row in selected:
            un, host, path = row["url_norm"], row["host"], row["path"]
            seq, depth = row["seq"], row["depth"]
            if denied_py(rules, host, path):
                traced.append((seq, un, host, "robots_denied"))
                continue
            m = meta.get(un)
            pg = pages.get(un)
            if m is None and pg is None:
                traced.append((seq, un, host, "not_found"))
                continue
            status = m["http_status"] if m else 200
            if 300 <= status < 400:
                traced.append((seq, un, host, "redirect"))
                if m and m.get("redirect_to"):
                    candidates.append((seq, -1, un, depth, m["redirect_to"]))
                continue
            if status == 404:
                traced.append((seq, un, host, "not_found"))
                continue
            if status >= 400:
                traced.append((seq, un, host, "server_error"))
                continue
            # 304: cached copy still fresh -> HEAD answers 304 before the
            # client-side type/size checks (CrawlerBolt.java:476-485).
            # Links re-extracted from the (unchanged) body; doc not
            # re-stored; content_seen untouched; host clock updates.
            if doc_cache is not None:
                cts = doc_cache.get(un)
                wts = pg["warc_ts"] if pg else None
                if cts is not None and wts is not None and wts <= cts:
                    traced.append((seq, un, host, "not_modified"))
                    got_hosts.add(host)
                    ex = extract(pg["html"] if pg["html"] is not None else b"")
                    for li, href in enumerate(ex["links"]):
                        candidates.append((seq, li, un, depth, href))
                    continue
            ctype = (m["content_type"] if m else None) or "text/html"
            if "text/html" not in ctype and not un.endswith(".html"):
                traced.append((seq, un, host, "bad_type"))
                continue
            html = pg["html"] if pg else None
            clen = m["content_length"] if m and m["content_length"] is not None \
                else (len(html) if html is not None else 0)
            if clen > max_doc_size:
                traced.append((seq, un, host, "too_big"))
                continue
            # --- GET happened ---
            got_hosts.add(host)
            body = html if html is not None else b""
            ex = extract(body)
            if body in content_seen:
                traced.append((seq, un, host, "dup_content"))
                continue
            content_seen[body] = un
            lang = ex["lang"]
            if lang not in ("", fcfg.lang_prefix):
                traced.append((seq, un, host, "not_html_lang"))
                continue
            traced.append((seq, un, host, "fetched"))
            res.crawled[un] = (r, ex["text"])
            n_crawled += 1
            for li, href in enumerate(ex["links"]):
                candidates.append((seq, li, un, depth, href))

        # trace ordering within round
        traced.sort(key=lambda t: t[0])
        for i, (seq, un, host, action) in enumerate(traced):
            res.trace.append((r, i + 1, un, host, action))

        # admission: canonicalize -> filters -> batch dedup keep-first ->
        # seen anti-join -> dense seq by (parent_seq, link_idx)
        admitted: dict[str, tuple] = {}
        for parent_seq, link_idx, base, pdepth, href in candidates:
            un = canonicalize(base, href)
            if un is None:
                continue
            host, path = host_of(un), path_of(un)
            if not admit(un, host, depth_of(un), fcfg):
                continue
            key = (parent_seq, link_idx)
            if un in admitted and admitted[un][0] <= key:
                continue
            admitted[un] = (key, host, path, pdepth + 1)
        new_rows = [
            (key, un, host, path, nd)
            for un, (key, host, path, nd) in admitted.items()
            if un not in res.seen
        ]
        new_rows.sort(key=lambda t: t[0])
        base_seq = r << ROUND_SHIFT
        for i, (key, un, host, path, nd) in enumerate(new_rows):
            res.seen.add(un)
            frontier.append(
                dict(url_norm=un, host=host, path=path, depth=nd,
                     seq=base_seq + i + 1)
            )
        for h in got_hosts:
            clock[h] = r
        res.metrics.append(
            dict(round=r, n_selected=len(selected),
                 n_admitted=len(new_rows))
        )
    res.rounds = r
    return res
