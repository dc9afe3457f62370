"""Structured Streaming surfaces: AvailableNow streams must equal the batch
computation on the same files (shared logic, exact equality)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from sparkcrawl.streaming import (
    read_event_stream,
    start_corpus_export,
    stateful_sessionize,
    windowed_rates,
)

EVENTS_SCHEMA = "ts timestamp, action string, url string"


def _write_events(spark, path):
    rows = [
        ("2026-01-01 00:00:%02d" % (i % 60), "fetched" if i % 3 else "redirect",
         f"http://h{i % 7}.example.com/p{i}")
        for i in range(200)
    ]
    df = spark.createDataFrame(rows, "ts_s string, action string, url string")
    df = df.select(F.to_timestamp("ts_s").alias("ts"), "action", "url")
    # several files so the stream sees multiple input splits
    df.repartition(4).write.mode("overwrite").parquet(path)
    return df


def test_windowed_rates_stream_equals_batch(spark, tmp_path):
    src = str(tmp_path / "events")
    _write_events(spark, src)

    batch = windowed_rates(
        spark.read.schema(EVENTS_SCHEMA).parquet(src)
    )
    stream = windowed_rates(
        read_event_stream(spark, src, EVENTS_SCHEMA, max_files_per_trigger=2)
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("rates_test")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120), "streaming query did not finish in 120s"
    got = {
        (r["win_start"], r["action"]): r["n"]
        for r in spark.table("rates_test").collect()
    }
    want = {
        (r["win_start"], r["action"]): r["n"] for r in batch.collect()
    }
    assert got == want and len(want) > 0


SESS_SCHEMA = "user_id long, event_id long, ts timestamp"


def test_stateful_sessionize_stream_equals_batch(spark, tmp_path):
    """applyInPandasWithState sessionizer == batch lag+cumsum sessionizer.

    Three time-ordered files streamed one per micro-batch, with sessions
    deliberately crossing the batch boundary for even users (100 s gap at
    the boundary, within the 1800 s session gap) and breaking at it for odd
    users (5000 s gap) — so the GroupState carry genuinely matters."""
    import datetime
    import time

    from pyspark.sql import Window as W

    src = str(tmp_path / "sess_events")
    base = datetime.datetime(2026, 1, 1)
    for chunk in range(3):
        rows = []
        for u in range(6):
            offsets = (
                # even users: gaps of 1500 s inside the chunk and 1000 s at
                # the chunk boundary — one session spanning all micro-batches
                list(range(0, 10000, 1500))
                if u % 2 == 0
                else [0, 100, 200, 5000]
            )
            for j, off in enumerate(offsets):
                rows.append(
                    (
                        u,
                        chunk * 1000 + u * 100 + j,
                        base + datetime.timedelta(seconds=chunk * 10000 + off),
                    )
                )
        spark.createDataFrame(rows, SESS_SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(src)
        time.sleep(1.1)  # distinct mod-times: file source replays in order

    stream = stateful_sessionize(
        spark.readStream.schema(SESS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("sess_test")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120), "streaming query did not finish in 120s"
    # update-mode sink holds every emitted version; the final state of each
    # session is the row with the largest n_events (monotone within session)
    got = {
        (r["user_id"], r["session_idx"]): (r["n_events"], r["first_event"])
        for r in spark.table("sess_test")
        .groupBy("user_id", "session_idx")
        .agg(
            F.max("n_events").alias("n_events"),
            F.min("first_event").alias("first_event"),
        )
        .collect()
    }

    e = spark.read.schema(SESS_SCHEMA).parquet(src)
    wu = W.partitionBy("user_id").orderBy("ts", "event_id")
    epoch = F.unix_timestamp(F.col("ts"))
    gap = F.when(epoch - F.lag(epoch).over(wu) > 1800, 1).otherwise(0)
    batch = (
        e.withColumn("new_sess", gap)
        .withColumn(
            "session_idx",
            F.sum("new_sess").over(wu.rowsBetween(W.unboundedPreceding, 0)),
        )
        .groupBy("user_id", "session_idx")
        .agg(
            F.count("*").alias("n_events"),
            F.min("event_id").alias("first_event"),
        )
    )
    want = {
        (r["user_id"], r["session_idx"]): (r["n_events"], r["first_event"])
        for r in batch.collect()
    }
    assert got == want
    # the boundary-crossing construction produced multi-batch sessions
    assert any(n > 4 for n, _ in want.values())


def test_streaming_corpus_export(spark, tmp_path):
    src = str(tmp_path / "crawled")
    rows = [
        (f"http://h{i}.example.com:80/p{i}.html", f"body {i}\nline2\rline3")
        for i in range(50)
    ]
    spark.createDataFrame(rows, "url_norm string, text string").repartition(
        2
    ).write.mode("overwrite").parquet(src)

    out = str(tmp_path / "corpus")
    q = start_corpus_export(
        spark.readStream.schema("url_norm string, text string").parquet(src),
        out,
        str(tmp_path / "ckpt"),
        max_records_per_file=20,
    )
    assert q.awaitTermination(120), "streaming query did not finish in 120s"

    lines = []
    for name in os.listdir(out):
        if name.startswith("part-") and name.endswith(".txt"):
            with open(os.path.join(out, name)) as f:
                lines += [ln.rstrip("\n") for ln in f]
    assert len(lines) == 50
    assert all("$$$" in ln and "\r" not in ln for ln in lines)
    # K1 parity: newline-stripped body after the $$$ separator
    sample = {ln.split("$$$")[0]: ln.split("$$$")[1] for ln in lines}
    assert sample["http://h7.example.com:80/p7.html"] == "body 7line2line3"


DOCS_SCHEMA = "doc_id long, text string, ts timestamp"


def test_streaming_dedup_suppresses_within_watermark(spark, tmp_path):
    """streaming_dedup: exact re-fetches arriving within the watermark are
    dropped, first arrival wins (file order = arrival order with
    maxFilesPerTrigger=1); the kept hash set equals the batch distinct
    set."""
    import datetime as dt

    from sparkcrawl.streaming import read_event_stream, streaming_dedup

    t0 = dt.datetime(2026, 1, 1, 12, 0, 0)
    src = str(tmp_path / "docs")
    batches = [
        [(0, "alpha body", t0), (1, "beta body", t0)],
        # re-fetch of doc 0's content 5s later (inside the 30s watermark)
        # + one new content
        [(2, "alpha body", t0 + dt.timedelta(seconds=5)),
         (3, "gamma body", t0 + dt.timedelta(seconds=6))],
        [(4, "beta body", t0 + dt.timedelta(seconds=10))],
    ]
    for i, rows in enumerate(batches):
        spark.createDataFrame(rows, DOCS_SCHEMA).coalesce(1).write.parquet(
            f"{src}/b{i}"
        )
    # register the directory as one globbed source
    stream = streaming_dedup(
        read_event_stream(
            spark, f"{src}/b*", DOCS_SCHEMA, max_files_per_trigger=1
        )
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("dedup_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120), "streaming query did not finish in 120s"
    got = spark.table("dedup_test").collect()

    all_rows = [r for b in batches for r in b]
    batch_df = spark.createDataFrame(all_rows, DOCS_SCHEMA)
    want_hashes = {
        r["content_md5"]
        for r in streaming_dedup(batch_df).collect()
    }
    assert {r["content_md5"] for r in got} == want_hashes
    assert len(got) == 3  # one row per distinct content
    # first arrival won: the kept doc_ids are the originals, not re-fetches
    assert {r["doc_id"] for r in got} == {0, 1, 3}


def test_streaming_dedup_batch_fallback_is_min_first_and_stable(spark):
    """The batch fallback keeps the minimum-(ts, remaining cols) row per
    content hash — explicitly, not via dropDuplicates' arbitrary
    encounter-order keep — so the survivor set is identical at any
    partitioning."""
    import datetime as dt

    from sparkcrawl.streaming import streaming_dedup

    t0 = dt.datetime(2026, 1, 1, 12, 0, 0)
    rows = [
        (10, "same body", t0 + dt.timedelta(seconds=3)),
        (2, "same body", t0),          # earliest ts -> survives
        (7, "same body", t0),          # ts tie -> doc_id 2 wins (min)
        (5, "other body", t0 + dt.timedelta(seconds=1)),
    ]

    def survivors(n_parts):
        df = spark.createDataFrame(rows, DOCS_SCHEMA).repartition(n_parts)
        return sorted(
            (r["doc_id"], r["content_md5"])
            for r in streaming_dedup(df).collect()
        )

    got = survivors(1)
    assert survivors(7) == got
    assert survivors(32) == got
    assert {d for d, _ in got} == {2, 5}


def test_streaming_lsh_pairs_stream_equals_batch(spark, tmp_path):
    """streaming_lsh_pairs: the chained windowed-agg near-dup candidates
    are identical replayed as an AvailableNow stream (append mode, both
    stateful operators watermark-bounded) and computed in batch on the
    same files. A far-future sentinel doc in the last file pushes the
    watermark past every real window so append mode finalizes them; its
    text shares no shingles, so it adds no pairs to either side."""
    import datetime as dt

    from sparkcrawl.streaming import read_event_stream, streaming_lsh_pairs

    t0 = dt.datetime(2026, 1, 1, 12, 0, 0)
    dup = "the quick brown fox jumps over the lazy dog today"
    near = "the quick brown fox jumps over the lazy dog tonight"
    batches = [
        [(0, dup, t0), (1, dup, t0),
         (2, "completely unrelated words in this document body", t0)],
        # same content re-arriving in the NEXT window: pairs only with
        # its window-mates, never across windows
        [(3, dup, t0 + dt.timedelta(seconds=90)),
         (4, near, t0 + dt.timedelta(seconds=95))],
        [(999, "watermark sentinel advancing event time only",
          t0 + dt.timedelta(hours=1))],
    ]
    src = str(tmp_path / "docs")
    for i, rows in enumerate(batches):
        spark.createDataFrame(rows, DOCS_SCHEMA).coalesce(1).write.parquet(
            f"{src}/b{i}"
        )

    stream = streaming_lsh_pairs(
        read_event_stream(
            spark, f"{src}/b*", DOCS_SCHEMA, max_files_per_trigger=1
        )
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("lsh_pairs_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120), "streaming query did not finish in 120s"
    got = sorted(
        map(tuple, spark.table("lsh_pairs_test").collect())
    )

    all_rows = [r for b in batches for r in b]
    want = sorted(
        map(
            tuple,
            streaming_lsh_pairs(
                spark.createDataFrame(all_rows, DOCS_SCHEMA)
            ).collect(),
        )
    )
    assert got == want
    # the duplicate pair is found in its own window with all 8 bands
    # agreeing; doc 3's identical content never pairs across windows
    by_pair = {(r[2], r[3]): r[4] for r in got}
    assert by_pair[(0, 1)] == 8
    assert (0, 3) not in by_pair and (1, 3) not in by_pair
    assert by_pair[(3, 4)] >= 1


def test_streaming_lsh_hot_bucket_cap_bounds_state(spark):
    """Adversarial hot bucket: 10^4 near-identical docs inside ONE window
    share every band bucket. Uncapped, stage 1 builds a 10^4-id state cell
    and stage 2 a ~4x10^7-pair explode; with max_bucket_ids=K the pair
    count is bounded by bands*C(K,2), the kept members are the K SMALLEST
    ids (deterministic at any partitioning), and the truncation surfaces
    in lsh_bucket_drops — never silent. Batch shape (the expressions are
    shared with the stream verbatim; stream==batch is proved by
    test_streaming_lsh_pairs_stream_equals_batch)."""
    import datetime as dt

    from sparkcrawl.streaming import (
        lsh_bucket_drops,
        lsh_bucket_sets,
        streaming_lsh_pairs,
    )

    n, k, bands = 10_000, 32, 8
    t0 = dt.datetime(2026, 1, 1, 12, 0, 0)
    boiler = "identical boilerplate body repeated across the whole batch"
    d = spark.createDataFrame(
        [(i, boiler, t0) for i in range(n)], DOCS_SCHEMA
    ).repartition(16)

    sets = lsh_bucket_sets(d, max_bucket_ids=k)
    cells = sets.collect()
    # bounded state: every materialized cell holds exactly K ids but
    # reports the true pre-cap cardinality
    assert len(cells) == bands
    assert all(len(r["ids"]) == k and r["n_ids"] == n for r in cells)
    # deterministic keep rule: the K smallest ids, not arrival order
    assert all(r["ids"] == sorted(r["ids"])[:k] for r in cells)
    assert all(r["ids"][-1] == str(k - 1) or r["ids"][-1] == k - 1
               for r in cells) or all(
        max(int(x) if isinstance(x, str) else x for x in r["ids"]) == k - 1
        for r in cells
    )

    # non-silent: the drop surface carries one row per capped cell
    drops = lsh_bucket_drops(sets).collect()
    assert len(drops) == bands
    assert all(r["n_dropped"] == n - k and r["n_ids"] == n for r in drops)

    # bounded pair output: C(K,2) pairs, all bands agreeing, only the K
    # smallest doc ids participate
    pairs = streaming_lsh_pairs(d, max_bucket_ids=k).collect()
    assert len(pairs) == k * (k - 1) // 2
    assert all(r["n_bands"] == bands for r in pairs)
    assert max(max(r["doc_a"], r["doc_b"]) for r in pairs) == k - 1

    # partition invariance of the capped result
    pairs1 = sorted(
        map(tuple, streaming_lsh_pairs(
            d.repartition(3), max_bucket_ids=k).collect())
    )
    assert pairs1 == sorted(map(tuple, pairs))


def test_streaming_lsh_cap_noop_below_threshold(spark):
    """On data where no bucket exceeds the cap, the capped formulation is
    bit-identical to an effectively-uncapped one and the drop surface is
    empty — the oracle-equality guarantee for `windowed_lsh_pairs`."""
    import datetime as dt

    from sparkcrawl.streaming import (
        lsh_bucket_drops,
        lsh_bucket_sets,
        streaming_lsh_pairs,
    )

    t0 = dt.datetime(2026, 1, 1, 12, 0, 0)
    dup = "the quick brown fox jumps over the lazy dog today"
    rows = [
        (0, dup, t0),
        (1, dup, t0),
        (2, "completely unrelated words in this document body", t0),
        (3, dup + " tonight", t0),
    ]
    d = spark.createDataFrame(rows, DOCS_SCHEMA)
    capped = sorted(
        map(tuple, streaming_lsh_pairs(d, max_bucket_ids=8).collect())
    )
    uncapped = sorted(
        map(tuple, streaming_lsh_pairs(d, max_bucket_ids=1 << 30).collect())
    )
    assert capped == uncapped and len(capped) > 0
    assert lsh_bucket_drops(lsh_bucket_sets(d, max_bucket_ids=8)).count() == 0
