"""Sharded deterministic synthetic-web generator for scaling-bench fixtures
too big for the serial generator (gen_fixtures.generate is a single-process
loop — ~27 min for the 2.3M-page xwide; the north-rule loop-efficiency
profile needs ~4x that).

Same table schemas and reference-branch mix as gen_fixtures.generate
(FIXTURES.md §1-3), but every random draw is keyed HOST-LOCALLY
(``random.Random(f"{seed}:<kind>:{host}")`` / per-url ``f"{seed}:{url}"``),
so host shards generate independently and in parallel, and the output is a
pure function of (size, seed) — independent of worker count:

* cross-host links target the destination host's ROOT url (real webs'
  cross-site links skew heavily to home pages; roots exist by construction,
  so the broken-link branch stays the explicit /missing... case)
* specials (redirect / 5xx / bad content-type / oversized), dup-content
  groups and non-English pages are drawn host-locally at the same global
  fractions the serial generator uses
* dup-content groups are within-host (3 urls sharing one body keyed by the
  group, not by whichever member iterates first)

Output layout: each table is a DIRECTORY of parquet parts
(pages.parquet/part-00000.parquet ...), keyed by a fixed shard count so
bytes-on-disk do not depend on parallelism. Spark reads the directory
identically to a single file.
"""

from __future__ import annotations

import datetime as dt
import os
import random
import sys
from multiprocessing import Pool

import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from sparkcrawl.htmlspec import extract  # noqa: E402
from gen_fixtures import _SCHEMAS, _page_html  # noqa: E402

SHARDED_SIZES = {
    # huge: ~4x xwide (800k hosts, deep mean-30 trees -> ~8.4M pages,
    # ~15 GB parquet). Steady rounds of ~1.3-1.8M selected URLs — the
    # round-size regime where per-round compute dwarfs the ~15 s/round
    # core-count-independent floor, i.e. where the north-rule >=0.8
    # N->4N efficiency is demonstrable in-sandbox.
    "huge": dict(n_hosts=800_000, mean_pages=30, mega_pages=30_000,
                 n_para=(6, 12), para_words=(40, 80), n_shards=256),
}

EPOCH = dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc)


def _host_name(i: int) -> str:
    if i == 0:
        return "mega.example.com"
    if i == 1:
        return "banned.xxx.com"  # suffix-control, not actually banned
    if i == 2:
        return "xxx.com"  # banned host (D3)
    if i == 3:
        return "de.wikipedia.org"  # lang-gated host (D3b)
    return f"h{i}.example.com"


def _host_urls(p: dict, seed: int, i: int, host: str) -> list[str]:
    """The host's url tree — same shape as the serial generator's."""
    n = (
        p["mega_pages"] if i == 0
        else max(2, int(p["mean_pages"] / (1 + (i % 17) * 0.35)))
    )
    rng = random.Random(f"{seed}:urls:{host}")
    urls = [f"http://{host}:80/"]
    for j in range(n - 1):
        d = rng.choice([1, 1, 1, 2, 2, 3])
        segs = [f"s{rng.randint(0, 5)}" for _ in range(d - 1)]
        leaf = f"page{j}.html" if rng.random() < 0.8 else f"page{j}"
        urls.append(f"http://{host}:80/" + "/".join(segs + [leaf]))
    return sorted(set(urls))


def _host_rows(p: dict, seed: int, n_hosts: int, i: int) -> tuple[list, list]:
    """(pages_rows, meta_rows) for host index i — fully host-local."""
    host = _host_name(i)
    urls = _host_urls(p, seed, i, host)
    pool = [u for u in urls if not u.endswith(":80/")]
    sprng = random.Random(f"{seed}:sp:{host}")
    sprng.shuffle(pool)
    n_sp = len(pool) // 20  # same 1/20-per-kind fraction as the serial gen
    specials: dict[str, str] = {}
    for kind in ("redirect", "server_error", "bad_type", "too_big"):
        for u in pool[:n_sp]:
            specials[u] = kind
        pool = pool[n_sp:]
    dup_body_of: dict[str, int] = {}
    n_grp = min(len(pool) // 3, max(0, len(urls) // 40))
    for gi in range(n_grp):
        for u in pool[gi * 3:gi * 3 + 3]:
            dup_body_of[u] = gi
    pool = pool[n_grp * 3:]
    non_en = set(pool[: len(pool) // 10])

    pages_rows, meta_rows = [], []
    dup_bodies: dict[int, str] = {}
    for u in urls:
        prng = random.Random(f"{seed}:{u}")
        kind = specials.get(u, "ok")
        warc = EPOCH + dt.timedelta(seconds=prng.randint(0, 10**6))
        if kind == "redirect":
            if prng.random() < 0.5:
                tgt = prng.choice(urls)
            else:
                tgt = f"http://{_host_name(prng.randrange(n_hosts))}:80/"
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
        n_links = prng.randint(2, 6)
        links = []
        for _ in range(n_links):
            t = prng.random()
            if t < 0.55:  # same-host relative
                tgt = prng.choice(urls)
                links.append(tgt.split(":80", 1)[1] or "/")
            elif t < 0.80:  # cross-host absolute -> destination root
                links.append(
                    f"http://{_host_name(prng.randrange(n_hosts))}:80/"
                )
            elif t < 0.87:  # broken link
                links.append(
                    f"http://{host}:80/missing{prng.randint(0, 999)}.html"
                )
            elif t < 0.91:  # too deep (D2)
                links.append(f"/a/b/c/d/e/f/deep{prng.randint(0, 99)}.html")
            elif t < 0.95:  # too long (D1)
                links.append("/long/" + "x" * 1100 + ".html")
            elif t < 0.98:
                links.append("mailto:someone@example.com")
            else:
                links.append("javascript:void(0)")
        lang = "en"
        if u in non_en:
            lang = prng.choice(["de", "fr", "es"])
        if host == "de.wikipedia.org":
            lang = "de"
        gi = dup_body_of.get(u)
        if gi is not None:
            if gi not in dup_bodies:
                grng = random.Random(f"{seed}:dup:{host}:{gi}")
                dup_bodies[gi] = _page_html(
                    grng, u, "en", ["/dup_common.html"],
                    p["n_para"], p["para_words"],
                )
            html = dup_bodies[gi]
        else:
            html = _page_html(prng, u, lang, links,
                              p["n_para"], p["para_words"])
        ex = extract(html)  # golden text via the spec reference impl
        pages_rows.append(
            dict(url=u, warc_ts=warc, html=html.encode("utf-8"),
                 text=ex["text"], lang=ex["lang"] or "en")
        )
        ml = len(html.encode("utf-8"))
        ct = "application/pdf" if kind == "bad_type" \
            else "text/html; charset=utf-8"
        if kind == "too_big":
            ml = 50_000_000
        meta_rows.append(
            dict(url=u, http_status=200, redirect_to=None,
                 content_type=ct, content_length=ml)
        )
    return pages_rows, meta_rows


def _host_robots(seed: int, i: int) -> list[dict]:
    """Same i%10 robots scheme as the serial generator."""
    host = _host_name(i)
    r = i % 10
    if r == 0 and host != "mega.example.com":
        return [dict(host=host, agent="*", rule="disallow",
                     path_prefix="/s0", crawl_delay=None)]
    if r == 1:
        return [dict(host=host, agent="*", rule="disallow",
                     path_prefix="/", crawl_delay=None)]
    if r == 2:
        return [dict(host=host, agent="*", rule="disallow",
                     path_prefix="/private", crawl_delay=1 + (i % 3))]
    if r == 3:
        return [
            dict(host=host, agent="*", rule="disallow",
                 path_prefix="/", crawl_delay=None),
            dict(host=host, agent="cis455crawler", rule="allow",
                 path_prefix="/", crawl_delay=None),
        ]
    if r == 4:
        return [dict(host=host, agent="cis455crawler", rule="disallow",
                     path_prefix="/s1", crawl_delay=None)]
    return []


def _write_part(out_dir: str, table: str, shard: int, rows: list) -> None:
    schema = _SCHEMAS[table]
    d = os.path.join(out_dir, f"{table}.parquet")
    os.makedirs(d, exist_ok=True)
    cols = {f.name: [r.get(f.name) for r in rows] for f in schema}
    pq.write_table(
        pa.table(cols, schema=schema),
        os.path.join(d, f"part-{shard:05d}.parquet"),
        row_group_size=20_000,
    )


def _gen_shard(args) -> tuple[int, list, list, int]:
    size, seed, shard, out_dir = args
    p = SHARDED_SIZES[size]
    n_hosts, n_shards = p["n_hosts"], p["n_shards"]
    pages, metas, robots, seeds_rows = [], [], [], []
    for i in range(shard, n_hosts, n_shards):
        pr, mr = _host_rows(p, seed, n_hosts, i)
        pages.extend(pr)
        metas.extend(mr)
        robots.extend(_host_robots(seed, i))
        host = _host_name(i)
        if i == 0:
            seeds_rows.append(dict(url=f"http://{host}:80/", priority=1))
        elif i in (4, 5):
            seeds_rows.append(dict(url=f"http://{host}:80/", priority=2))
        elif i == 2:
            seeds_rows.append(dict(url=f"http://{host}:80/", priority=3))
        elif i >= 6:
            seeds_rows.append(dict(
                url=f"http://{host}:80/", priority=3 if i % 5 else 2
            ))
    _write_part(out_dir, "pages", shard, pages)
    _write_part(out_dir, "page_meta", shard, metas)
    return shard, robots, seeds_rows, len(pages)


def generate_to_dir(size: str, out_dir: str, seed: int = 42,
                    workers: int | None = None) -> int:
    """Generate a sharded web into out_dir; returns total page count."""
    p = SHARDED_SIZES[size]
    os.makedirs(out_dir, exist_ok=True)
    robots, seeds_rows, total = [], [], 0
    jobs = [(size, seed, s, out_dir) for s in range(p["n_shards"])]
    with Pool(workers or max(1, (os.cpu_count() or 8) - 2)) as pool:
        for shard, rb, sd, n in pool.imap_unordered(_gen_shard, jobs):
            robots.extend(rb)
            seeds_rows.extend(sd)
            total += n
    # robots + seeds are small: one deterministic file each (sorted)
    robots.sort(key=lambda r: (r["host"], r["agent"], r["path_prefix"]))
    seeds_rows.sort(key=lambda r: r["url"])
    _write_part(out_dir, "robots", 0, robots)
    _write_part(out_dir, "seeds", 0, seeds_rows)
    return total


def ensure_web(size: str, out_dir: str, seed: int = 42) -> str:
    """Idempotent fixture materialization for bench drivers: serial sizes
    go through gen_fixtures.generate, sharded sizes through this module."""
    done = os.path.join(out_dir, "_DONE")
    if os.path.exists(done):
        return out_dir
    import shutil

    shutil.rmtree(out_dir, ignore_errors=True)
    if size in SHARDED_SIZES:
        generate_to_dir(size, out_dir, seed)
    else:
        from gen_fixtures import generate, write_parquet

        write_parquet(generate(size, seed=seed), out_dir)
    with open(done, "w") as f:
        f.write("ok")
    return out_dir


if __name__ == "__main__":
    import time

    size = sys.argv[1] if len(sys.argv) > 1 else "huge"
    out = sys.argv[2] if len(sys.argv) > 2 else f"/tmp/sparkcrawl_benchweb_{size}"
    t0 = time.time()
    n = generate_to_dir(size, out)
    print(f"{size}: {n} pages in {time.time() - t0:.0f}s -> {out}")
