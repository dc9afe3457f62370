"""WARC ingestion (sparkcrawl/warc.py): record framing, HTTP payload
split, gzip shards, and the pages-table adapter (byte-identical text via
the shared extractor)."""

from __future__ import annotations

import gzip

from sparkcrawl.warc import parse_warc_bytes, read_warc_records, warc_to_pages

HTML_A = (b"<html lang=\"en\"><title>A</title><body>alpha beta "
          b"<a href=\"http://x.org/b\">link</a></body></html>")
HTML_B = b"<html lang=\"de\"><body>gamma\n\ndelta</body></html>"


def _record(rtype: str, headers: dict[str, str], payload: bytes) -> bytes:
    head = [f"WARC/1.0", f"WARC-Type: {rtype}"]
    head += [f"{k}: {v}" for k, v in headers.items()]
    head += [f"Content-Length: {len(payload)}"]
    return ("\r\n".join(head) + "\r\n\r\n").encode() + payload + b"\r\n\r\n"


def _shard() -> bytes:
    http_ok = (b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"
               + HTML_B)
    http_404 = b"HTTP/1.1 404 Not Found\r\n\r\nmissing"
    return b"".join([
        _record("warcinfo", {}, b"software: test\r\n"),
        _record("response",
                {"WARC-Target-URI": "http://x.org/a",
                 "WARC-Date": "2026-01-02T03:04:05Z"}, HTML_A),
        _record("response",
                {"WARC-Target-URI": "http://x.org/b",
                 "WARC-Date": "2026-01-02T03:04:06Z"}, http_ok),
        _record("response",
                {"WARC-Target-URI": "http://x.org/gone",
                 "WARC-Date": "2026-01-02T03:04:07Z"}, http_404),
        _record("request",
                {"WARC-Target-URI": "http://x.org/a"}, b"GET /a"),
    ])


def test_parse_warc_bytes_framing_and_http_split():
    recs = list(parse_warc_bytes(_shard(), "s0"))
    assert [r[2] for r in recs] == [
        "warcinfo", "response", "response", "response", "request"
    ]
    # raw-HTML payload: no status, body = payload verbatim
    assert recs[1][3] == "http://x.org/a" and recs[1][5] is None
    assert recs[1][7] == HTML_A
    # HTTP payload: status + content-type parsed, body stripped of headers
    assert recs[2][5] == 200 and recs[2][6] == "text/html"
    assert recs[2][7] == HTML_B  # blank line INSIDE body never desyncs
    assert recs[3][5] == 404
    # offsets strictly increase (framing is length-driven)
    offs = [r[1] for r in recs]
    assert offs == sorted(offs) and len(set(offs)) == len(offs)
    # gzipped shard parses identically (CC on-disk format)
    gz = list(parse_warc_bytes(gzip.compress(_shard()), "s0"))
    assert [r[2:] for r in gz] == [r[2:] for r in recs]
    # member-PER-RECORD gzip (the Common-Crawl offset-index layout):
    # gzip.decompress handles concatenated members, so record content
    # survives; offsets differ (they index the decompressed stream)
    members = b"".join(
        gzip.compress(m) for m in (
            _record("warcinfo", {}, b"software: test\r\n"),
            _record("response",
                    {"WARC-Target-URI": "http://x.org/a",
                     "WARC-Date": "2026-01-02T03:04:05Z"}, HTML_A),
        )
    )
    mem = list(parse_warc_bytes(members, "s1"))
    assert [r[2] for r in mem] == ["warcinfo", "response"]
    assert mem[1][3] == "http://x.org/a" and mem[1][7] == HTML_A


def test_warc_to_pages_roundtrip(spark, tmp_path):
    (tmp_path / "shard0.warc").write_bytes(_shard())
    (tmp_path / "shard1.warc.gz").write_bytes(gzip.compress(_shard()))

    recs = read_warc_records(spark, str(tmp_path)).collect()
    assert len(recs) == 10  # 5 per shard, both shards parsed

    pages = {
        (r["url"], r["warc_ts"].isoformat()): (r["text"], r["lang"])
        for r in warc_to_pages(spark, str(tmp_path)).collect()
    }
    # 200s kept (raw-html record counts as 200), 404 + request dropped;
    # both shards collapse to the same 2 urls x 2 shard copies
    assert len(pages) == 2
    assert pages[("http://x.org/a", "2026-01-02T03:04:05")][1] == "en"
    assert "alpha beta" in pages[("http://x.org/a", "2026-01-02T03:04:05")][0]
    assert pages[("http://x.org/b", "2026-01-02T03:04:06")] == (
        "gamma delta", "de"
    )


def test_render_warc_shards_roundtrip_and_determinism(spark):
    """pages -> render_warc_shards -> parse_warc_bytes recovers the exact
    records; shard bytes are identical across shuffle widths and shard
    boundaries land on the global (url, ts) rank."""
    import datetime as dt

    from sparkcrawl.warc import render_warc_shards

    t0 = dt.datetime(2026, 1, 2, 3, 4, 5)
    rows = [
        (f"http://h{i % 3}.org/p{i}", t0 + dt.timedelta(seconds=i),
         f"<html><body>doc {i}</body></html>".encode())
        for i in range(23)
    ]
    pages = spark.createDataFrame(
        rows, "url string, warc_ts timestamp, html binary"
    )

    def shard_map(width):
        orig = spark.conf.get("spark.sql.shuffle.partitions")
        try:
            spark.conf.set("spark.sql.shuffle.partitions", width)
            return {
                r["shard_id"]: (r["n_records"], bytes(r["warc_bytes"]))
                for r in render_warc_shards(
                    pages, records_per_shard=10
                ).collect()
            }
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", orig)

    got = shard_map("4")
    assert shard_map("1") == got  # byte-identical across widths
    assert sorted(got) == [0, 1, 2]
    assert [got[s][0] for s in (0, 1, 2)] == [10, 10, 3]

    parsed = []
    for sid in (0, 1, 2):
        parsed.extend(parse_warc_bytes(got[sid][1], f"s{sid}"))
    want = sorted(
        (u, ts.strftime("%Y-%m-%dT%H:%M:%SZ"), h) for u, ts, h in rows
    )
    assert [(r[3], r[4], r[7]) for r in parsed] == want
    assert all(r[2] == "response" for r in parsed)


def test_render_warc_shards_whole_even_when_arrow_batches_are_tiny(spark):
    """A shard must come out as ONE row even when Arrow batches are far
    smaller than records_per_shard. The old repartition+mapInPandas
    implementation re-batched partitions at arrow.maxRecordsPerBatch and
    emitted partial warc_bytes rows per batch; groupBy().applyInPandas
    delivers each shard whole regardless of batch size."""
    import datetime as dt

    from sparkcrawl.warc import render_warc_shards

    t0 = dt.datetime(2026, 1, 2, 3, 4, 5)
    rows = [
        (f"http://h{i % 5}.org/p{i:03d}", t0 + dt.timedelta(seconds=i),
         f"<html><body>tiny batch doc {i}</body></html>".encode())
        for i in range(40)
    ]
    pages = spark.createDataFrame(
        rows, "url string, warc_ts timestamp, html binary"
    )
    orig = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    try:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "5")
        got = render_warc_shards(pages, records_per_shard=16).collect()
    finally:
        spark.conf.set(
            "spark.sql.execution.arrow.maxRecordsPerBatch", orig
        )
    by_sid = {}
    for r in got:
        assert r["shard_id"] not in by_sid, "shard split across rows"
        by_sid[r["shard_id"]] = (r["n_records"], bytes(r["warc_bytes"]))
    assert sorted(by_sid) == [0, 1, 2]
    assert [by_sid[s][0] for s in (0, 1, 2)] == [16, 16, 8]
    parsed = []
    for sid in (0, 1, 2):
        parsed.extend(parse_warc_bytes(by_sid[sid][1], f"s{sid}"))
    assert len(parsed) == 40


def test_render_warc_shards_same_second_refetch_ties_are_deterministic(
    spark,
):
    """Two fetches of the same URL in the same formatted second differ
    only by body; the md5(html) tiebreaker must order them (and therefore
    the shard bytes) identically at any shuffle width."""
    import datetime as dt

    from sparkcrawl.warc import render_warc_shards

    t0 = dt.datetime(2026, 1, 2, 3, 4, 5)
    rows = []
    for i in range(12):
        url = f"http://dup.org/p{i % 4}"  # 3 re-fetches per url
        rows.append((url, t0, f"<html>body variant {i}</html>".encode()))

    pages = spark.createDataFrame(
        rows, "url string, warc_ts timestamp, html binary"
    )

    def shard_bytes(width):
        orig = spark.conf.get("spark.sql.shuffle.partitions")
        try:
            spark.conf.set("spark.sql.shuffle.partitions", width)
            return {
                r["shard_id"]: bytes(r["warc_bytes"])
                for r in render_warc_shards(
                    pages, records_per_shard=5
                ).collect()
            }
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", orig)

    a = shard_bytes("7")
    assert shard_bytes("2") == a
    assert shard_bytes("32") == a


def test_parse_warc_bytes_malformed_content_length_skips_not_crashes():
    """A malformed Content-Length stops the shard's parse at that record
    (framing is unrecoverable) instead of raising through the task."""
    good = _record("response", {"WARC-Target-URI": "http://ok.org/a"},
                   b"fine body")
    bad = (
        b"WARC/1.0\r\n"
        b"WARC-Type: response\r\n"
        b"WARC-Target-URI: http://bad.org/x\r\n"
        b"Content-Length: 12 bytes\r\n\r\n"
        b"whatever body\r\n\r\n"
    )
    recs = list(parse_warc_bytes(good + bad, "s0"))
    assert [r[3] for r in recs] == ["http://ok.org/a"]
    # negative length is equally unrecoverable
    neg = bad.replace(b"12 bytes", b"-7")
    recs2 = list(parse_warc_bytes(good + neg, "s0"))
    assert [r[3] for r in recs2] == ["http://ok.org/a"]
