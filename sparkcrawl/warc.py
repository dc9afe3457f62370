"""WARC ingestion: Common-Crawl-style WARC files -> the engine's pages
table (url, warc_ts, html, text, lang) — the missing source edge between
"a pile of WARC shards" and every operator in this repo.

Format: the plain-text record framing of ISO 28500 (WARC/1.x) — version
line, header block (Name: value), blank line, Content-Length payload
bytes, blank-line record separator. ``response`` records may carry either
a raw HTML payload or a full HTTP response (status line + headers +
body); both are handled, matching how Common Crawl WARCs store fetches.

Scale shape: Spark's ``binaryFile`` source gives one row per WARC shard
(Common Crawl ships ~1 GB shards — the natural task granularity), and the
record parser runs as an Arrow-batched ``mapInPandas`` over those rows,
so shard parallelism is file parallelism and no driver-side IO exists.
Gzipped shards (the Common-Crawl on-disk format) are decompressed
per-file with the stdlib; member-per-record gzip (the CC offset-index
layout) also decompresses correctly via gzip's multi-member support.
Parsing is pure bytes -> rows with deterministic output ordering within a
shard (record order), so ingestion is reproducible on any cluster.
"""

from __future__ import annotations

import gzip
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

WARC_RECORD_SCHEMA = (
    "warc_file string, record_offset long, warc_type string, url string, "
    "warc_ts string, http_status int, content_type string, html binary"
)


def _parse_http_payload(payload: bytes) -> tuple[int | None, str | None, bytes]:
    """Split an HTTP-response payload into (status, content-type, body);
    a non-HTTP payload passes through as the body."""
    if not payload.startswith(b"HTTP/"):
        return None, None, payload
    head, sep, body = payload.partition(b"\r\n\r\n")
    if not sep:
        head, sep, body = payload.partition(b"\n\n")
        if not sep:
            return None, None, payload
    lines = head.replace(b"\r\n", b"\n").split(b"\n")
    try:
        status = int(lines[0].split()[1])
    except (IndexError, ValueError):
        status = None
    ctype = None
    for ln in lines[1:]:
        name, _, val = ln.partition(b":")
        if name.strip().lower() == b"content-type":
            ctype = val.strip().decode("latin-1") or None
            break
    return status, ctype, body


def parse_warc_bytes(data: bytes, fname: str = "") -> Iterator[tuple]:
    """Yield one tuple per WARC record (WARC_RECORD_SCHEMA order).

    Framing only depends on Content-Length, so payloads containing blank
    lines or stray 'WARC/' strings never desync the parser.
    """
    if data[:2] == b"\x1f\x8b":  # gzipped shard (multi-member safe)
        data = gzip.decompress(data)
    pos, n = 0, len(data)
    while pos < n:
        # skip the previous record's blank-line separator without copying
        # the remaining buffer (an lstrip() of data[pos:] here would make
        # shard parsing O(shard_bytes * records))
        while pos < n and data[pos] in (0x0D, 0x0A):
            pos += 1
        if data[pos : pos + 5] != b"WARC/":
            break
        offset = pos
        head_end = data.find(b"\r\n\r\n", pos)
        sep_len = 4
        if head_end == -1:
            head_end = data.find(b"\n\n", pos)
            sep_len = 2
        if head_end == -1:
            break
        headers: dict[str, str] = {}
        head = data[pos:head_end].replace(b"\r\n", b"\n").split(b"\n")
        for ln in head[1:]:  # head[0] is the version line
            name, _, val = ln.partition(b":")
            headers[name.strip().decode("latin-1").lower()] = (
                val.strip().decode("latin-1")
            )
        # Real Common-Crawl shards contain occasional malformed records; a
        # non-numeric Content-Length means the framing is unrecoverable
        # from this point (the next record boundary is unknown), so stop
        # parsing the shard instead of crashing the whole task.
        try:
            length = int(headers.get("content-length", "0"))
        except ValueError:
            break
        if length < 0:
            break
        body_start = head_end + sep_len
        payload = data[body_start : body_start + length]
        pos = body_start + length
        status, ctype, body = _parse_http_payload(payload)
        yield (
            fname,
            offset,
            headers.get("warc-type", ""),
            headers.get("warc-target-uri") or None,
            headers.get("warc-date") or None,
            status,
            ctype or headers.get("content-type") or None,
            bytes(body),
        )


def read_warc_records(spark: SparkSession, path: str) -> DataFrame:
    """WARC shards under ``path`` -> one row per record.

    binaryFile scan (one task per shard) + Arrow-batched mapInPandas —
    the parse never touches the driver. Whole-shard rows are the right
    granularity for CC-style ~1 GB shards; for pathological single-file
    inputs, split the file upstream (record framing is self-contained,
    but binaryFile intentionally never splits).
    """
    files = spark.read.format("binaryFile").load(path)

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [
            "warc_file", "record_offset", "warc_type", "url",
            "warc_ts", "http_status", "content_type", "html",
        ]
        for pdf in batches:
            rows = []
            for fpath, content in zip(pdf["path"], pdf["content"]):
                rows.extend(parse_warc_bytes(bytes(content), str(fpath)))
            yield pd.DataFrame(rows, columns=cols)

    return files.select("path", "content").mapInPandas(
        parse, WARC_RECORD_SCHEMA
    )


def records_from_shard_blobs(
    shards: DataFrame,
    blob_col: str = "warc_bytes",
    shard_col: str = "shard_id",
) -> DataFrame:
    """Parse rendered shard BLOBS in-flight (render_warc_shards output or
    any (shard_id, warc_bytes) frame) — the same record parser as
    read_warc_records without the filesystem hop, so a source->sink
    round trip is testable as one plan. One Arrow batch row = one shard,
    same task granularity as the file path."""
    schema = (
        "shard_id long, record_offset long, warc_type string, url string, "
        "warc_ts string, http_status int, content_type string, html binary"
    )

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [
            "shard_id", "record_offset", "warc_type", "url",
            "warc_ts", "http_status", "content_type", "html",
        ]
        for pdf in batches:
            rows = []
            for sid, blob in zip(pdf[shard_col], pdf[blob_col]):
                for rec in parse_warc_bytes(bytes(blob)):
                    rows.append((int(sid),) + rec[1:])
            yield pd.DataFrame(rows, columns=cols)

    return shards.select(shard_col, blob_col).mapInPandas(parse, schema)


def warc_to_pages(spark: SparkSession, path: str) -> DataFrame:
    """WARC shards -> the engine input table (url, warc_ts, html, text,
    lang): keep HTTP-200 HTML ``response`` records and run the same
    Arrow-batched extractor the crawl loop uses (byte-identical text
    contract), casting WARC-Date to a timestamp."""
    from sparkcrawl.extract import with_extracted

    recs = read_warc_records(spark, path).filter(
        (F.col("warc_type") == "response")
        & (F.coalesce(F.col("http_status"), F.lit(200)) == 200)
    )
    ex = with_extracted(
        recs.withColumn("_html_str", F.col("html").cast("string")),
        html_col="_html_str",
    )
    return ex.select(
        "url",
        F.to_timestamp(F.col("warc_ts")).alias("warc_ts"),
        "html",
        F.col("ex_text").alias("text"),
        F.col("ex_lang").alias("lang"),
    )


def render_warc_shards(
    pages: DataFrame,
    records_per_shard: int = 10_000,
    url_col: str = "url",
    ts_col: str = "warc_ts",
    html_col: str = "html",
) -> DataFrame:
    """Pages -> WARC shard blobs: the sink matching read_warc_records, so
    a crawl corpus round-trips through the standard archive format
    (export side of the Common-Crawl interchange).

    Shard assignment and record order are pure functions of the data —
    records sort by (url, ts, md5(html)) globally (the md5 tiebreaker
    makes re-fetches of the same URL within the same formatted second
    order deterministically too), shard = rank div records_per_shard via
    the partition-free running total (pack_shards' machinery), and each
    shard's bytes concatenate its records in order. Re-running, or
    running at any cluster width, produces byte-identical shards.

    The render step is ``groupBy(shard_id).applyInPandas`` — groups are
    delivered whole, one pandas frame per shard, so a shard can never be
    split across Arrow batches (``mapInPandas`` re-batches partitions at
    arrow.maxRecordsPerBatch — default 10k, exactly records_per_shard —
    which would emit partial warc_bytes rows for a shard straddling a
    batch boundary). Per-group memory is bounded by shard size — the
    same ~1 GB unit the read path assumes. Returns
    (shard_id, n_records, warc_bytes).
    """
    from sparkcrawl.curation import with_running_total

    d = pages.select(
        F.col(url_col).alias("url"),
        F.date_format(
            F.col(ts_col), "yyyy-MM-dd'T'HH:mm:ss'Z'"
        ).alias("ts"),
        F.col(html_col).cast("binary").alias("html"),
        F.lit(1).alias("_one"),
    ).withColumn(
        "_tie", F.coalesce(F.md5(F.col("html")), F.lit(""))
    )
    ranked = with_running_total(
        d, "_one", ["url", "ts", "_tie"], out_col="_rank"
    )
    sharded = ranked.withColumn(
        "shard_id",
        F.expr(f"(_rank - 1) div {int(records_per_shard)}").cast("long"),
    )

    def render(pdf: pd.DataFrame) -> pd.DataFrame:
        grp = pdf.sort_values(["url", "ts", "_tie"])
        buf = []
        for url, ts, html in zip(grp["url"], grp["ts"], grp["html"]):
            body = bytes(html) if html is not None else b""
            head = (
                "WARC/1.0\r\n"
                "WARC-Type: response\r\n"
                f"WARC-Target-URI: {url}\r\n"
                f"WARC-Date: {ts}\r\n"
                f"Content-Length: {len(body)}\r\n\r\n"
            ).encode()
            buf.append(head + body + b"\r\n\r\n")
        return pd.DataFrame(
            [(int(pdf["shard_id"].iloc[0]), len(grp), b"".join(buf))],
            columns=["shard_id", "n_records", "warc_bytes"],
        )

    return sharded.groupBy("shard_id").applyInPandas(
        render, "shard_id long, n_records long, warc_bytes binary"
    )
