"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video decode libraries are NOT in this container, so the decode
kernels are STUBS (deterministic fakes clearly marked), but the Spark-side
plumbing is real and tested: schema, Arrow batch shape, mapInPandas
signatures, partitioning. Swapping a stub for PIL/torchaudio is a one-line
change inside the UDF body.
(Re-verified round 5, 2026-08-21: ``import PIL`` still raises
ModuleNotFoundError in this container; the stubs stay, clearly marked.)
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),  # opaque bytes
        T.StructField("mime", T.StringType(), True),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType()), True),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("feature", T.ArrayType(T.DoubleType()), True),
    ]
)


def _stub_decode_features(payload: bytes, dim: int = 8) -> list[float]:
    """STUB decoder: deterministic byte-histogram 'features'.

    A real deployment replaces this with e.g. PIL.Image.open + resize +
    channel means. NotImplementedError is NOT raised because the pipeline
    must flow end-to-end; the fake is clearly deterministic (byte buckets).
    """
    if payload is None or len(payload) == 0:
        return [0.0] * dim
    arr = np.frombuffer(payload, dtype=np.uint8)
    hist = np.bincount(arr >> 5, minlength=dim)[:dim]
    return (hist / max(1, len(arr))).round(6).tolist()


def decode_features(media: DataFrame, dim: int = 8) -> DataFrame:
    """mapInPandas feature extraction: Arrow batches in, feature rows out.

    Repartitioned by media_id hash so one huge video cannot skew a
    partition's byte volume (the binary column dominates memory)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": [
                        len(p) if p is not None else 0 for p in pdf["payload"]
                    ],
                    "feature": [
                        _stub_decode_features(p, dim) for p in pdf["payload"]
                    ],
                }
            )

    return (
        media.repartition(F.xxhash64("media_id"))
        .mapInPandas(gen, FEATURE_SCHEMA)
    )


THUMB_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("out_w", T.IntegerType(), False),
        T.StructField("out_h", T.IntegerType(), False),
        T.StructField("n_bytes_in", T.LongType(), False),
        T.StructField("thumb", T.BinaryType(), True),  # opaque resized bytes
    ]
)


def _stub_resize(payload: bytes | None, w: int, h: int) -> bytes:
    """STUB resample: nearest-neighbor byte stride to exactly w*h bytes.

    A real deployment replaces this with PIL.Image.open(...).resize((w, h))
    and channel packing; the deterministic stride keeps the pipeline
    end-to-end testable without image libs."""
    size = w * h
    if not payload:
        return bytes(size)
    n = len(payload)
    return bytes(payload[(k * n) // size] for k in range(size))


def resize_thumbs(media: DataFrame, width: int = 4,
                  height: int = 4) -> DataFrame:
    """mapInPandas image resize: binary payload in, fixed-size binary thumb
    out (decode/resample kernel stubbed; Arrow batch shape, binary-in/
    binary-out plumbing, and skew-free media_id-hash partitioning real).
    Only image rows are decoded — the filter prunes before any Python."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "out_w": width,
                    "out_h": height,
                    "n_bytes_in": [
                        len(p) if p is not None else 0 for p in pdf["payload"]
                    ],
                    "thumb": [
                        _stub_resize(p, width, height)
                        for p in pdf["payload"]
                    ],
                }
            )

    return (
        media.filter(F.col("kind") == "image")
        .repartition(F.xxhash64("media_id"))
        .mapInPandas(gen, THUMB_SCHEMA)
    )


def frame_sample_plan(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame-sampling PLAN: computes (media_id, frame_idx) rows from
    metadata without decoding — the explode happens JVM-side so the decode
    UDF downstream receives one row per frame (uniform partitions)."""
    n_frames = F.coalesce(
        F.element_at(F.col("meta"), "n_frames").cast("int"), F.lit(0)
    )
    idxs = F.sequence(
        F.lit(0), F.greatest(n_frames - 1, F.lit(0)), F.lit(every_n)
    )
    return (
        media.filter(F.col("kind") == "video")
        .select(
            "media_id",
            F.explode(
                F.when(n_frames > 0, idxs).otherwise(
                    F.array().cast(T.ArrayType(T.IntegerType()))
                )
            ).alias("frame_idx"),
        )
    )


def synth_media(spark, n: int = 64) -> DataFrame:
    """Deterministic fake media table for tests (payload = seeded bytes)."""
    rows = []
    for i in range(n):
        kind = ("image", "audio", "video")[i % 3]
        payload = bytes(((i * 131 + j * 17) % 256) for j in range(64 + i))
        meta = {"n_frames": str(30 * (i % 5))} if kind == "video" else {}
        rows.append((i, kind, payload, f"{kind}/x-fake", meta))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
