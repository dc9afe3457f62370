"""Metrics & lineage queries over the engine's state tables.

The reference exposes crawl rates via a heartbeat dashboard
(WorkerMonitor.java:20-42 computes 10s-delta links/sec; MasterNode.java:80-125
renders per-worker status). Here the same observability is plain queries
over the committed ``metrics`` and ``lineage`` tables — no control plane.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F


def crawl_rates(metrics: DataFrame) -> DataFrame:
    """Per-round URLs/sec + running totals (A2: WorkerMonitor rate math —
    delta per interval, max and average)."""
    w = W.orderBy("round").rowsBetween(W.unboundedPreceding, 0)
    rate = F.round(
        F.col("n_fetched") / F.greatest(F.col("wall_ms"), F.lit(1)) * 1000, 2
    )
    return metrics.select(
        "round",
        "n_selected",
        "n_fetched",
        "n_admitted",
        "wall_ms",
        rate.alias("fetched_per_sec"),
        F.sum("n_fetched").over(w).alias("total_fetched"),
        F.sum("n_admitted").over(w).alias("total_admitted"),
    )


def summary(metrics: DataFrame) -> DataFrame:
    """Whole-crawl dashboard row (A3/A4: MasterNode status table analogue)."""
    return metrics.agg(
        F.count("*").alias("rounds"),
        F.sum("n_selected").alias("total_selected"),
        F.sum("n_fetched").alias("total_fetched"),
        F.sum("n_admitted").alias("total_admitted"),
        F.sum("n_dup_content").alias("total_dup_content"),
        F.sum("n_robots_denied").alias("total_robots_denied"),
        F.sum("wall_ms").alias("total_wall_ms"),
        F.round(
            F.sum("n_fetched")
            / F.greatest(F.sum("wall_ms"), F.lit(1)) * 1000,
            2,
        ).alias("avg_fetched_per_sec"),
        F.round(
            F.max(
                F.col("n_fetched") / F.greatest(F.col("wall_ms"), F.lit(1))
                * 1000
            ),
            2,
        ).alias("max_fetched_per_sec"),
    )


def lineage_skew(lineage: DataFrame) -> DataFrame:
    """Per-round partition skew from the lineage table: max/mean rows per
    partition — the signal that would trigger salting changes at scale."""
    per_round = lineage.groupBy("round").agg(
        F.count("*").alias("n_partitions"),
        F.sum("n_rows").alias("rows"),
        F.max("n_rows").alias("max_rows"),
        F.round(F.avg("n_rows"), 2).alias("mean_rows"),
    )
    return per_round.withColumn(
        "skew_ratio",
        F.round(F.col("max_rows") / F.greatest(F.col("mean_rows"), F.lit(1)), 2),
    )
