"""Structured Streaming surfaces: streaming analogues of the metrics and
export operators.

The reference computes crawl rates from a 10-second polling loop over
mutable counters (WorkerMonitor.java:20-42,44-80) and exports the corpus in
a single post-crawl pass (StorageServer.java:183-246). The batch engine
covers both (metrics.crawl_rates, export.export_corpus); this module is the
continuous variant for deployments where crawl output lands as appended
files (the natural shape of SnapshotStore/Iceberg appends): ``readStream``
over the table directory, event-time windows with a watermark for late
rows, ``writeStream`` to the corpus sink.

All functions return unstarted DataFrames/queries so tests can drive them
with Trigger.AvailableNow against a directory fixture and compare against
the batch computation (exact equality — the windowing logic is shared).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

__all__ = [
    "read_event_stream",
    "windowed_rates",
    "corpus_lines",
    "start_corpus_export",
]


def read_event_stream(
    spark: SparkSession, path: str, schema: str,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """File-source stream over a directory of parquet appends (the
    streaming read of a SnapshotStore/Iceberg table's data files)."""
    r = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        r = r.option("maxFilesPerTrigger", max_files_per_trigger)
    return r.parquet(path)


def windowed_rates(
    events: DataFrame,
    ts_col: str = "ts",
    key_col: str = "action",
    window: str = "10 seconds",
    watermark: str = "30 seconds",
) -> DataFrame:
    """Tumbling-window event counts per key with late-data watermark — the
    streaming A2 (WorkerMonitor's 10-second crawl-rate deltas). Works on
    both streaming and batch frames (tests exploit this for equality)."""
    w = events.withWatermark(ts_col, watermark) if events.isStreaming else events
    return (
        w.groupBy(F.window(F.col(ts_col), window).alias("win"), key_col)
        .agg(F.count("*").alias("n"))
        .select(
            F.col("win.start").alias("win_start"),
            F.col("win.end").alias("win_end"),
            key_col,
            "n",
        )
    )


def corpus_lines(crawled: DataFrame) -> DataFrame:
    """K1 corpus line format (url + '$$$' + newline-stripped body,
    StorageServer.java:219-221) as a projection usable on a stream."""
    return crawled.select(
        F.concat(
            F.col("url_norm"),
            F.lit("$$$"),
            F.regexp_replace(F.col("text"), "[\\n\\r]", ""),
        ).alias("value")
    )


def start_corpus_export(
    crawled_stream: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    max_records_per_file: int = 10_000,
    available_now: bool = True,
):
    """writeStream text sink with the reference's 10k-lines-per-file
    rotation (StorageServer.java:210-216 -> maxRecordsPerFile). Returns the
    started StreamingQuery; AvailableNow processes the current table
    contents then stops (the batch-parity mode tests use)."""
    w = (
        corpus_lines(crawled_stream)
        .writeStream.format("text")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .option("maxRecordsPerFile", max_records_per_file)
    )
    if available_now:
        w = w.trigger(availableNow=True)
    return w.start()
