"""Structured Streaming surfaces: AvailableNow streams must equal the batch
computation on the same files (shared logic, exact equality)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from sparkcrawl.streaming import (
    read_event_stream,
    start_corpus_export,
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
    q.awaitTermination(120)
    got = {
        (r["win_start"], r["action"]): r["n"]
        for r in spark.table("rates_test").collect()
    }
    want = {
        (r["win_start"], r["action"]): r["n"] for r in batch.collect()
    }
    assert got == want and len(want) > 0


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
    q.awaitTermination(120)

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
