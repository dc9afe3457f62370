"""Deterministic synthetic-web generator (FIXTURES.md §1-3). Seed=42.

Builds the four input tables the engine needs — pages, page_meta, robots,
seeds — as parquet, plus returns them as Python dicts for the oracle.
Everything is a pure function of (seed, size profile): no timestamps, no
randomness outside random.Random(seed).

The web it builds exercises every reference branch:
  * Zipf-ish host sizes with one mega-host holding ~30% of pages (skew/salting)
  * relative + absolute links, links to 404s, >1000-char URLs, deep paths,
    mailto:/javascript: hrefs, cross-host links
  * duplicate-content page groups (content dedup P1)
  * non-English pages (<html lang> filter P4)
  * redirects (3xx), server errors (5xx), non-HTML content types, oversized
    docs (fetch branches F1)
  * robots: disallow prefixes, disallow-all hosts, agent-specific blocks
    that shadow '*', crawl-delays 1-3 (R1-R3)
  * banned hosts + a 'de.wikipedia.org'-style lang-gated host (D3)
"""

from __future__ import annotations

import datetime as dt
import os
import random
import sys

import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sparkcrawl.htmlspec import extract  # noqa: E402

SIZES = {
    # seed_hosts: how many hosts get a seed URL (a real crawl seeds wide —
    # narrow seeding makes early rounds tiny and benchmarks overhead-bound);
    # n_para/para_words: page body size knobs (bench sizes get real bodies
    # so extraction, the actual 100 TB cost center, dominates the round).
    "tiny": dict(n_hosts=12, mean_pages=6, mega_pages=40,
                 seed_hosts=8, n_para=(1, 4), para_words=(6, 18)),
    "t1": dict(n_hosts=200, mean_pages=18, mega_pages=1500,
               seed_hosts=60, n_para=(1, 4), para_words=(6, 18)),
    "t2": dict(n_hosts=1000, mean_pages=35, mega_pages=15000,
               seed_hosts=500, n_para=(6, 14), para_words=(30, 60)),
    "bench": dict(n_hosts=5000, mean_pages=70, mega_pages=150000,
                  seed_hosts=2500, n_para=(6, 14), para_words=(30, 60)),
    # scale: very wide host fan-out, every host seeded -> ~200k URLs/round;
    # per-round compute dominates fixed overhead (the scaling-bench profile)
    "scale": dict(n_hosts=50_000, mean_pages=8, mega_pages=30_000,
                  seed_hosts=50_000, n_para=(6, 12), para_words=(40, 80)),
    # wide: 3x the host fan-out of `scale` -> rounds of 150k-500k URLs,
    # where per-round compute dwarfs the fixed per-round latency — the
    # profile that exhibits the loop's compute-bound scaling regime
    "wide": dict(n_hosts=150_000, mean_pages=8, mega_pages=30_000,
                 seed_hosts=150_000, n_para=(6, 12), para_words=(40, 80)),
    # xwide: deep per-host page trees (mean 30) keep every host alive for
    # several rounds at its cap -> SUSTAINED ~10^6-URL steady rounds
    # (~2.3M pages, ~4.5 GB parquet) — the design-scale round-size regime
    # for the north-rule loop-efficiency profile
    "xwide": dict(n_hosts=200_000, mean_pages=30, mega_pages=30_000,
                  seed_hosts=200_000, n_para=(6, 12), para_words=(40, 80)),
}

WORDS = (
    "spark crawl frontier page link host robots delay queue fetch parse "
    "extract text corpus index shard round seed depth filter dedup hash "
    "anchor title body lang batch shuffle partition scale bloom merge"
).split()


def _para(rng: random.Random, n: int) -> str:
    return " ".join(rng.choice(WORDS) for _ in range(n))


def _page_html(rng, url, lang, links, n_para=(1, 4), para_words=(6, 18)):
    """Deterministic page body."""
    title = f"Title {_para(rng, 3)}"
    paras = "\n".join(
        f"<p>{_para(rng, rng.randint(*para_words))}</p>"
        for _ in range(rng.randint(*n_para))
    )
    anchors = "\n".join(
        f'<a href="{h}">{_para(rng, 2)}</a>' for h in links
    )
    return (
        f'<html lang="{lang}"><head><title>{title}</title></head>\n'
        f"<body>\n<h1>{title}</h1>\n{paras}\n{anchors}\n</body></html>"
    )


def generate(size: str = "tiny", seed: int = 42) -> dict:
    p = SIZES[size]
    rng = random.Random(seed)
    n_hosts, mean_pages, mega_pages = (
        p["n_hosts"], p["mean_pages"], p["mega_pages"]
    )

    hosts = [f"h{i}.example.com" for i in range(n_hosts)]
    hosts[0] = "mega.example.com"
    hosts[1] = "banned.xxx.com"  # not actually banned (suffix!), control
    banned = ["xxx.com"]
    if n_hosts > 3:
        hosts[2] = "xxx.com"  # banned host (D3)
        hosts[3] = "de.wikipedia.org"  # lang-gated host (D3b)

    # page counts: zipf-ish tail + mega head
    counts = {}
    for i, h in enumerate(hosts):
        if h == "mega.example.com":
            counts[h] = mega_pages
        else:
            counts[h] = max(2, int(mean_pages / (1 + (i % 17) * 0.35)))

    # --- build URLs per host (tree paths, some deep) ---
    urls_by_host: dict[str, list[str]] = {}
    for h in hosts:
        urls = [f"http://{h}:80/"]
        for j in range(counts[h] - 1):
            d = rng.choice([1, 1, 1, 2, 2, 3])
            segs = [f"s{rng.randint(0, 5)}" for _ in range(d - 1)]
            leaf = f"page{j}.html" if rng.random() < 0.8 else f"page{j}"
            path = "/" + "/".join(segs + [leaf])
            urls.append(f"http://{h}:80{path}")
        urls_by_host[h] = sorted(set(urls))

    all_urls = [u for h in hosts for u in urls_by_host[h]]
    url_set = set(all_urls)

    # --- choose special roles ---
    rng2 = random.Random(seed + 1)
    specials: dict[str, str] = {}
    pool = [u for u in all_urls if not u.endswith(":80/")]
    rng2.shuffle(pool)
    n_sp = max(4, len(pool) // 20)
    for kind in ("redirect", "server_error", "bad_type", "too_big"):
        for u in pool[:n_sp]:
            specials[u] = kind
        pool = pool[n_sp:]
    # index-walk instead of re-slicing pool each iteration (the slice form
    # is O(groups x pool) — hours at xwide scale); output is byte-identical
    dup_groups = []
    cap_groups = max(2, len(all_urls) // 40)
    i = 0
    while len(pool) - i >= 3 and len(dup_groups) < cap_groups:
        dup_groups.append(pool[i:i + 3])
        i += 3
    pool = pool[i:]
    non_en = set(pool[: max(2, len(pool) // 10)])

    dup_body_of = {}
    for gi, grp in enumerate(dup_groups):
        body = None
        for u in grp:
            dup_body_of[u] = gi

    # --- robots ---
    robots_rows = []
    delay_hosts = {}
    for i, h in enumerate(hosts):
        r = i % 10
        if r == 0 and h != "mega.example.com":
            robots_rows.append(
                dict(host=h, agent="*", rule="disallow",
                     path_prefix="/s0", crawl_delay=None)
            )
        elif r == 1:
            robots_rows.append(
                dict(host=h, agent="*", rule="disallow",
                     path_prefix="/", crawl_delay=None)
            )  # disallow-all
        elif r == 2:
            d = 1 + (i % 3)
            delay_hosts[h] = d
            robots_rows.append(
                dict(host=h, agent="*", rule="disallow",
                     path_prefix="/private", crawl_delay=d)
            )
        elif r == 3:
            # '*' disallows everything but OUR agent's block allows all —
            # agent block shadows '*' (CrawlerBolt.java:179-203)
            robots_rows.append(
                dict(host=h, agent="*", rule="disallow",
                     path_prefix="/", crawl_delay=None)
            )
            robots_rows.append(
                dict(host=h, agent="cis455crawler", rule="allow",
                     path_prefix="/", crawl_delay=None)
            )
        elif r == 4:
            # agent-specific disallow while '*' is open
            robots_rows.append(
                dict(host=h, agent="cis455crawler", rule="disallow",
                     path_prefix="/s1", crawl_delay=None)
            )

    # --- links + html per page ---
    pages_rows, meta_rows = [], []
    epoch = dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc)
    dup_bodies: dict[int, str] = {}
    for h in hosts:
        urls = urls_by_host[h]
        for u in urls:
            prng = random.Random(f"{seed}:{u}")  # str-seeded: process-stable
            kind = specials.get(u, "ok")
            warc = epoch + dt.timedelta(seconds=prng.randint(0, 10**6))
            if kind == "redirect":
                tgt = prng.choice(all_urls)
                meta_rows.append(
                    dict(url=u, http_status=301, redirect_to=tgt,
                         content_type="text/html", content_length=0)
                )
                continue
            if kind == "server_error":
                meta_rows.append(
                    dict(url=u, http_status=500, redirect_to=None,
                         content_type="text/html", content_length=0)
                )
                continue
            # build outlinks
            n_links = prng.randint(2, 6)
            links = []
            for _ in range(n_links):
                t = prng.random()
                if t < 0.55:  # same-host relative
                    tgt = prng.choice(urls)
                    links.append(tgt.split(":80", 1)[1] or "/")
                elif t < 0.80:  # cross-host absolute
                    links.append(prng.choice(all_urls))
                elif t < 0.87:  # 404-analogue
                    links.append(f"http://{h}:80/missing{prng.randint(0,999)}.html")
                elif t < 0.91:  # too deep (D2)
                    links.append(f"/a/b/c/d/e/f/deep{prng.randint(0,99)}.html")
                elif t < 0.95:  # too long (D1)
                    links.append("/long/" + "x" * 1100 + ".html")
                elif t < 0.98:  # non-http scheme
                    links.append("mailto:someone@example.com")
                else:
                    links.append("javascript:void(0)")
            lang = "en"
            if u in non_en:
                lang = prng.choice(["de", "fr", "es"])
            if h == "de.wikipedia.org":
                lang = "de"
            gi = dup_body_of.get(u)
            if gi is not None:
                if gi not in dup_bodies:
                    dup_bodies[gi] = _page_html(
                        prng, u, "en", ["/dup_common.html"],
                        p["n_para"], p["para_words"],
                    )
                html = dup_bodies[gi]
            else:
                html = _page_html(
                    prng, u, lang, links, p["n_para"], p["para_words"]
                )
            ex = extract(html)  # golden text via the SPEC reference impl
            pages_rows.append(
                dict(url=u, warc_ts=warc, html=html.encode("utf-8"),
                     text=ex["text"], lang=ex["lang"] or "en")
            )
            ml = len(html.encode("utf-8"))
            if kind == "bad_type":
                ct = "application/pdf"
            else:
                ct = "text/html; charset=utf-8"
            if kind == "too_big":
                ml = 50_000_000
            meta_rows.append(
                dict(url=u, http_status=200, redirect_to=None,
                     content_type=ct, content_length=ml)
            )

    # --- seeds: wide seeding (priority mix 1/2/3 by index) ---
    seeds_rows = [
        dict(url="http://mega.example.com:80/", priority=1),
        dict(url=f"http://{hosts[4 % n_hosts]}:80/", priority=2),
        dict(url=f"http://{hosts[5 % n_hosts]}:80/", priority=2),
    ]
    n_seed = min(n_hosts, p["seed_hosts"])
    for i in range(6, max(6, n_seed)):
        pr = 3 if i % 5 else 2
        seeds_rows.append(dict(url=f"http://{hosts[i]}:80/", priority=pr))
    if n_hosts > 3:
        seeds_rows.append(dict(url="http://xxx.com:80/", priority=3))

    return dict(
        pages=pages_rows, page_meta=meta_rows, robots=robots_rows,
        seeds=seeds_rows, banned_hosts=tuple(banned),
    )


def mutate(fixtures: dict, seed: int = 43, frac_modified: float = 0.25,
           frac_touched: float = 0.05) -> dict:
    """Deterministically evolve a synthetic web for incremental-recrawl
    tests (the 304/If-Modified-Since branch, CrawlerBolt.java:460-485):

    * ``frac_modified`` of OK pages get a new body paragraph + warc_ts
      bumped 30 days (true modification -> re-fetch + re-store);
    * ``frac_touched`` get ONLY the warc_ts bump (server claims modified,
      content identical -> re-fetch, content-dedup interplay);
    * everything else keeps identical bytes AND warc_ts -> HEAD says 304.

    Links are never changed, so the link graph (and the politeness
    schedule) stays comparable across passes."""
    rng = random.Random(seed)
    out = dict(fixtures)
    pages = []
    for r in fixtures["pages"]:
        r = dict(r)
        t = rng.random()
        if t < frac_modified:
            prng = random.Random(f"{seed}:mut:{r['url']}")
            html = r["html"].decode("utf-8")
            extra = f"<p>updated {_para(prng, 8)}</p>\n"
            html2 = html.replace("</body>", extra + "</body>", 1)
            ex = extract(html2.encode("utf-8"))
            r["html"] = html2.encode("utf-8")
            r["text"] = ex["text"]
            r["warc_ts"] = r["warc_ts"] + dt.timedelta(days=30)
        elif t < frac_modified + frac_touched:
            r["warc_ts"] = r["warc_ts"] + dt.timedelta(days=30)
        pages.append(r)
    out["pages"] = pages
    return out


_SCHEMAS = {
    "pages": pa.schema(
        [("url", pa.string()), ("warc_ts", pa.timestamp("us", tz="UTC")),
         ("html", pa.binary()), ("text", pa.string()), ("lang", pa.string())]
    ),
    "page_meta": pa.schema(
        [("url", pa.string()), ("http_status", pa.int32()),
         ("redirect_to", pa.string()), ("content_type", pa.string()),
         ("content_length", pa.int64())]
    ),
    "robots": pa.schema(
        [("host", pa.string()), ("agent", pa.string()), ("rule", pa.string()),
         ("path_prefix", pa.string()), ("crawl_delay", pa.int32())]
    ),
    "seeds": pa.schema([("url", pa.string()), ("priority", pa.int32())]),
}


def write_parquet(fixtures: dict, out_dir: str) -> dict:
    """Write the four tables; returns {name: path}."""
    os.makedirs(out_dir, exist_ok=True)
    paths = {}
    for name in ("pages", "page_meta", "robots", "seeds"):
        rows = fixtures[name]
        schema = _SCHEMAS[name]
        cols = {
            f.name: [r.get(f.name) for r in rows] for f in schema
        }
        table = pa.table(cols, schema=schema)
        path = os.path.join(out_dir, f"{name}.parquet")
        # small row groups: Spark parallelizes parquet scans at row-group
        # granularity — one giant row group serializes every downstream scan
        pq.write_table(table, path, row_group_size=20_000)
        paths[name] = path
    return paths


if __name__ == "__main__":
    import sys

    size = sys.argv[1] if len(sys.argv) > 1 else "tiny"
    out = sys.argv[2] if len(sys.argv) > 2 else f"/tmp/sparkcrawl_fixtures_{size}"
    fx = generate(size)
    print(write_parquet(fx, out))
    print({k: len(v) for k, v in fx.items() if isinstance(v, list)})
