"""Schemas for every table the engine reads or writes.

The page-table shape is the driver's ``input_hint``:
``(url string, warc_ts timestamp, html binary, text string, lang string)``.
State-table shapes mirror FIXTURES.md §4. In the reference all of this is a
Java ``Tuple``/``Fields`` pair with no types (stormlite/tuple/Tuple.java:29-46);
here every stream is a typed DataFrame.
"""

from __future__ import annotations

from pyspark.sql import types as T

# ---- input tables -----------------------------------------------------------

PAGES = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), True),
        T.StructField("html", T.BinaryType(), True),
        T.StructField("text", T.StringType(), True),  # golden extracted text
        T.StructField("lang", T.StringType(), True),
    ]
)

# Sidecar encoding what live HTTP told the reference (CrawlerBolt.java:460-534):
# status / redirect / content-type / size drive the fetch branches F1.
PAGE_META = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("http_status", T.IntegerType(), False),
        T.StructField("redirect_to", T.StringType(), True),
        T.StructField("content_type", T.StringType(), True),
        T.StructField("content_length", T.LongType(), True),
    ]
)

# robots.txt corpus, one row per rule (parsed form of RobotsTxtInfo.java:8-112)
ROBOTS = T.StructType(
    [
        T.StructField("host", T.StringType(), False),
        T.StructField("agent", T.StringType(), False),  # our UA or '*'
        T.StructField("rule", T.StringType(), False),  # 'disallow' | 'allow'
        T.StructField("path_prefix", T.StringType(), True),
        T.StructField("crawl_delay", T.IntegerType(), True),  # seconds -> rounds
    ]
)

SEEDS = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("priority", T.IntegerType(), False),  # 1/2/3 -> caps 15/10/5
    ]
)

# ---- engine state tables ----------------------------------------------------

FRONTIER = T.StructType(
    [
        T.StructField("url_norm", T.StringType(), False),
        T.StructField("host", T.StringType(), False),
        T.StructField("path", T.StringType(), False),
        T.StructField("depth", T.IntegerType(), False),  # link hops from seed
        T.StructField("seq", T.LongType(), False),  # deterministic admission order
        T.StructField("round_added", T.IntegerType(), False),
    ]
)

# Merge-on-read tombstones for the delta frontier (CrawlConfig
# .frontier_mode="delta"): keys of rows a round SELECTED out of the
# frontier. Live frontier = frontier dirs anti-join this table; a
# threshold-triggered compaction folds them back in (engine.
# _compact_frontier). The Iceberg analogue is a position/equality
# delete file attached to the frontier table's snapshot.
FRONTIER_CONSUMED = T.StructType(
    [T.StructField("url_norm", T.StringType(), False)]
)

SEEN = T.StructType(
    [
        T.StructField("url_norm", T.StringType(), False),
        T.StructField("url_hash", T.LongType(), False),  # xxhash64(url_norm)
        T.StructField("round_added", T.IntegerType(), False),
    ]
)

CONTENT_SEEN = T.StructType(
    [
        T.StructField("content_hash", T.LongType(), False),
        T.StructField("first_url", T.StringType(), False),
    ]
)

CRAWLED = T.StructType(
    [
        T.StructField("url_norm", T.StringType(), False),
        T.StructField("host", T.StringType(), False),
        T.StructField("round", T.IntegerType(), False),
        T.StructField("content_hash", T.LongType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
        T.StructField("warc_ts", T.TimestampType(), True),
    ]
)

# incremental-recrawl doc cache: the previous pass's stored docs, used as
# the If-Modified-Since clock (reference DocVal.getLastChecked(),
# CrawlerBolt.java:460-485). cached_ts is the page's warc_ts at the time it
# was crawled; a page whose current warc_ts <= cached_ts HEADs to 304.
DOC_CACHE = T.StructType(
    [
        T.StructField("url_norm", T.StringType(), False),
        T.StructField("cached_ts", T.TimestampType(), True),
        T.StructField("content_hash", T.LongType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
    ]
)

# host politeness clock: last round in which the host was fetched
HOST_CLOCK = T.StructType(
    [
        T.StructField("host", T.StringType(), False),
        T.StructField("last_round", T.IntegerType(), False),
    ]
)

TRACE = T.StructType(
    [
        T.StructField("round", T.IntegerType(), False),
        T.StructField("ord", T.IntegerType(), False),  # order within round (by seq)
        T.StructField("url_norm", T.StringType(), False),
        T.StructField("host", T.StringType(), False),
        # fetched | redirect | not_found | server_error | bad_type | too_big |
        # not_html_lang | dup_content | robots_denied | not_modified
        T.StructField("action", T.StringType(), False),
    ]
)

LINEAGE = T.StructType(
    [
        T.StructField("round", T.IntegerType(), False),
        T.StructField("partition_id", T.IntegerType(), False),
        T.StructField("n_rows", T.LongType(), False),
    ]
)

METRICS = T.StructType(
    [
        T.StructField("round", T.IntegerType(), False),
        T.StructField("n_selected", T.LongType(), False),
        T.StructField("n_fetched", T.LongType(), False),
        T.StructField("n_extracted", T.LongType(), False),
        T.StructField("n_links", T.LongType(), False),
        T.StructField("n_admitted", T.LongType(), False),
        T.StructField("n_dup_content", T.LongType(), False),
        T.StructField("n_robots_denied", T.LongType(), False),
        T.StructField("wall_ms", T.LongType(), False),
    ]
)
