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
