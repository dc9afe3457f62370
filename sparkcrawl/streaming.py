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
    "stateful_sessionize",
    "streaming_dedup",
    "streaming_lsh_pairs",
    "lsh_bucket_sets",
    "lsh_bucket_drops",
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


SESSION_STATE_SCHEMA = (
    "last_epoch long, session_idx long, n_events long, first_event long"
)
SESSION_OUT_SCHEMA = (
    "user_id long, session_idx long, n_events long, first_event long"
)


def stateful_sessionize(events: DataFrame, gap_s: int = 1800) -> DataFrame:
    """Custom stateful streaming operator (``applyInPandasWithState``):
    per-user session assignment with a ``gap_s`` inactivity gap — the
    continuous analogue of the batch ``sessionize`` query (lag + cumulative
    sum windows) and of the reference's per-host lastCrawled clock state
    (XPathCrawler.java:32,162-164: a mutable map keyed by host, carried
    across tuples — here carried across micro-batches as GroupState).

    State per user: (last_epoch, session_idx, n_events, first_event) of the
    open session. Each micro-batch emits the updated aggregate row for every
    session it touched (update semantics): downstream keeps the latest row
    per (user_id, session_idx), which — once input is drained — equals the
    batch computation exactly (the parity test drives both).

    Ordering contract: rows are sorted by (ts, event_id) *within* each
    micro-batch; across batches the file source must deliver a key's rows in
    non-decreasing event-time order (true for the SnapshotStore/Iceberg
    append pattern where each round's files are strictly later than the
    last). The contract is GUARDED: a row older than the state's
    last_epoch raises instead of silently mis-splitting sessions (use a
    watermarked window variant if the source can reorder). Arrow-batched
    per group — no per-row Python on the hot path."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def fn(key, pdfs, state: GroupState):
        frames = list(pdfs)
        rows = (
            pd.concat(frames, ignore_index=True)
            if frames
            else pd.DataFrame(columns=["ts", "event_id"])
        )  # timeout modes can invoke with zero batches; concat([]) raises
        if len(rows):
            rows = rows.sort_values(["ts", "event_id"])
        if state.exists:
            last_epoch, sidx, n, first = state.get
        else:
            last_epoch, sidx, n, first = None, 0, 0, None
        touched: dict[int, tuple[int, int]] = {}
        for ts, eid in zip(rows["ts"], rows["event_id"]):
            epoch = int(ts.timestamp())
            if last_epoch is not None and epoch < last_epoch:
                raise ValueError(
                    f"stateful_sessionize ordering contract violated for "
                    f"user {key[0]}: event {eid} at epoch {epoch} arrived "
                    f"after state had advanced to {last_epoch}"
                )
            if last_epoch is not None and epoch - last_epoch > gap_s:
                sidx += 1
                n = 0
                first = None
            n += 1
            if first is None:
                first = int(eid)
            last_epoch = epoch
            touched[sidx] = (n, first)
        if last_epoch is not None:
            state.update((int(last_epoch), int(sidx), int(n), int(first)))
        yield pd.DataFrame(
            [(key[0], s, cnt, fe) for s, (cnt, fe) in sorted(touched.items())],
            columns=["user_id", "session_idx", "n_events", "first_event"],
        )

    return events.groupBy("user_id").applyInPandasWithState(
        fn,
        SESSION_OUT_SCHEMA,
        SESSION_STATE_SCHEMA,
        "update",
        GroupStateTimeout.NoTimeout,
    )


def streaming_dedup(
    docs: DataFrame,
    text_col: str = "text",
    ts_col: str = "ts",
    watermark: str = "30 seconds",
) -> DataFrame:
    """Streaming content dedup — the continuous P1 (DocumentParserBolt.java
    content-seen check; batch analogue textops.dedup_exact): as crawl
    output appends, keep the FIRST document per content hash and drop
    re-fetches arriving within the watermark horizon.

    Built on ``dropDuplicatesWithinWatermark`` keyed by md5(text): exact
    duplicates are suppressed as long as they arrive within ``watermark``
    of the kept row's event time; state for a hash is evicted once the
    watermark passes it, so state size is bounded by the dedup horizon ×
    arrival rate, never by corpus size — the only state contract that
    holds on an unbounded crawl. (A crawl re-fetching the same content
    MONTHS later is the recrawl path, engine.init_recrawl — not this
    operator's job.) On a batch frame, falls back to an explicit
    min-first selection for parity testing: the kept row per hash is the
    minimum over (event time, then every remaining column), NOT a bare
    ``dropDuplicates`` — that keeps an arbitrary encounter-order row, so
    which doc survives would vary with partitioning and the parity
    contract would only hold by accident.
    """
    d = docs.withColumn("content_md5", F.md5(F.col(text_col)))
    if d.isStreaming:
        return d.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
            ["content_md5"]
        )
    others = [c for c in d.columns if c not in (ts_col, "content_md5")]
    tie = F.struct(F.col(ts_col), *[F.col(c) for c in others])
    return (
        d.groupBy("content_md5")
        .agg(F.min_by(F.struct(*d.columns), tie).alias("_row"))
        .select("_row.*")
    )


def lsh_bucket_sets(
    docs: DataFrame,
    ts_col: str = "ts",
    window: str = "60 seconds",
    watermark: str = "30 seconds",
    n_hashes: int = 16,
    bands: int = 8,
    shingle_n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    hash_fn: str = "md5",
    max_bucket_ids: int = 1024,
) -> DataFrame:
    """Stage 1 of the streaming LSH pipeline: per (event-time window, band,
    bucket) sorted id set, CAPPED at ``max_bucket_ids`` members.

    The cap bounds the one state cell that is otherwise unbounded: an
    adversarial window (e.g. 1e5 boilerplate docs sharing a band hash
    inside one watermark horizon) would build a 1e5-id set and a 1e10-pair
    explode downstream. With the cap, state per cell is O(K) and the pair
    explode O(K^2) worst-case. The kept members are the K SMALLEST ids in
    sort order — deterministic and partition-invariant, so capped output
    is still reproducible (never "first K to arrive"). The drop is NOT
    silent: ``n_ids`` carries the true pre-cap cardinality, so
    ``n_ids > size(ids)`` marks a capped bucket (see lsh_bucket_drops) —
    on buckets within the cap the ids are exactly the uncapped set, which
    is what keeps the `windowed_lsh_pairs` oracle equality intact.
    """
    from sparkcrawl.textops import band_buckets

    d = docs.withWatermark(ts_col, watermark) if docs.isStreaming else docs
    b = band_buckets(
        d, n_hashes, bands, shingle_n, text_col, id_col, hash_fn,
        extra_cols=(ts_col,),
    )
    return (
        b.groupBy(
            F.window(F.col(ts_col), window).alias("win"), "band", "bucket"
        )
        .agg(F.sort_array(F.collect_set("id")).alias("ids_full"))
        .select(
            "win",
            "band",
            "bucket",
            F.size("ids_full").cast("long").alias("n_ids"),
            F.slice("ids_full", 1, max_bucket_ids).alias("ids"),
        )
    )


def lsh_bucket_drops(bucket_sets: DataFrame) -> DataFrame:
    """The non-silent side of lsh_bucket_sets' cap: one row per capped
    (window, band, bucket) with the true cardinality and the number of ids
    excluded from candidate pairing. Empty whenever no bucket exceeded the
    cap. Attach as a monitoring sink (or assert empty in tests) so capped
    recall is observable, never silently absorbed."""
    return bucket_sets.filter(F.col("n_ids") > F.size("ids")).select(
        F.col("win.start").alias("win_start"),
        F.col("win.end").alias("win_end"),
        "band",
        "bucket",
        "n_ids",
        (F.col("n_ids") - F.size("ids")).cast("long").alias("n_dropped"),
    )


def streaming_lsh_pairs(
    docs: DataFrame,
    ts_col: str = "ts",
    window: str = "60 seconds",
    watermark: str = "30 seconds",
    n_hashes: int = 16,
    bands: int = 8,
    shingle_n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    hash_fn: str = "md5",
    max_bucket_ids: int = 1024,
) -> DataFrame:
    """Streaming NEAR-dup candidates — MinHash-LSH as documents arrive.

    The batch path (textops.lsh_candidate_pairs) self-joins band buckets;
    a stream can't self-join its whole history, so the streaming
    formulation windows the bucket instead: docs landing in the same
    tumbling event-time ``window`` with an equal (band, bucket) key are
    near-dup candidates. Two chained stateful operators, both
    watermark-bounded (Spark's supported multi-stateful append shape):

      1. window x (band, bucket) -> sort_array(collect_set(id)) — the
         signature/banding projection above it is per-row JVM expressions
         only (textops.band_buckets), so the ONLY state is the per-bucket
         id set inside the live window horizon: LSH's premise is that
         buckets are small, and state evicts as the watermark passes.
      2. explode the i<j pairs, then window(window_time(...)) x pair ->
         count(bands agreeing) — dedups across bands exactly like the
         batch path's ``distinct``, and n_bands is the agreement strength
         (rows/bands Jaccard evidence) for free.

    Works identically on a batch frame (same expressions, watermark
    skipped) — tests replay the same files both ways and require exact
    equality; the driver catalog's `windowed_lsh_pairs` runs the batch
    shape against a DuckDB oracle, so stream == batch == oracle chains.

    State bound: the per-bucket id set is capped at ``max_bucket_ids``
    (lsh_bucket_sets), so the worst adversarial bucket costs O(K) state
    and O(K^2) pairs instead of O(n)/O(n^2). Capped buckets pair only the
    K smallest ids; surface the drops via
    ``lsh_bucket_drops(lsh_bucket_sets(docs, ...))`` — never silent. On
    data where no bucket exceeds the cap (every test web and the driver
    oracle), output is bit-identical to the uncapped formulation.

    Recall caveat (documented, by design): only docs landing in the SAME
    tumbling ``window`` are candidates — near-dups straddling a window
    boundary (t=59s vs t=61s on a 60s window) are never paired. Callers
    comparing stream output against full-history batch dedup should
    expect that gap; the batch path (textops.lsh_candidate_pairs) has no
    window and is the full-recall tool.
    """
    g = lsh_bucket_sets(
        docs, ts_col, window, watermark, n_hashes, bands, shingle_n,
        text_col, id_col, hash_fn, max_bucket_ids,
    ).filter(F.size("ids") > 1)
    e1 = g.select("win", "ids", F.posexplode("ids").alias("i", "doc_a"))
    e2 = e1.select(
        "win",
        "doc_a",
        F.explode(
            F.slice("ids", F.col("i") + 2, F.size("ids"))
        ).alias("doc_b"),
    )
    return (
        e2.groupBy(
            F.window(F.window_time("win"), window).alias("win"),
            "doc_a",
            "doc_b",
        )
        .agg(F.count("*").alias("n_bands"))
        .select(
            F.col("win.start").alias("win_start"),
            F.col("win.end").alias("win_end"),
            "doc_a",
            "doc_b",
            "n_bands",
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
