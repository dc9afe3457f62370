"""Relational operators Spark's built-ins don't ship directly.

as-of join: match each left row to the nearest right row at-or-before
(backward) / at-or-after (forward) its key time, per equality key — the
time-series attribution join (click -> latest preceding view, trade ->
prevailing quote). Spark has no ASOF JOIN; the scalable formulation is
the tagged-union carry-forward:

    union(left tagged 1, right tagged 0)
      -> window partitionBy(by) orderBy(on, tag)
      -> last(right_payload, ignorenulls=True) carried forward
      -> keep left rows, unpack the carried payload

One shuffle total (on the equality key), partial nothing — the window
scans each key group once. A sort-merge join formulation would shuffle
BOTH sides the same way and then pay an O(matches) range probe; the
carry-forward is the shape pandas/kdb use, expressed distributively.
Right-side rows must be unique per (by, on) for a deterministic result —
callers dedup first (the query does: max event_id per (user, ts)).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: list[str] | tuple[str, ...],
    direction: str = "backward",
    suffix: str = "_r",
) -> DataFrame:
    """Left as-of join: every left row, plus the right row with the
    greatest ``on <= left.on`` (backward) or smallest ``on >= left.on``
    (forward) within the same ``by`` group; right columns (except
    ``by``/``on``) come back suffixed, NULL when no right row qualifies.
    Exact ``on`` matches are included, as in pandas ``merge_asof``.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward: {direction}")
    by = list(by)
    rcols = [c for c in right.columns if c not in by]
    lstruct = F.struct(*[F.col(c) for c in left.columns]).alias("_l")
    rstruct = F.struct(*[F.col(c) for c in rcols]).alias("_r")
    ltype = left.select(lstruct).schema["_l"].dataType
    rtype = right.select(rstruct).schema["_r"].dataType

    # tag orders an exact-time right row BEFORE (backward) / AFTER
    # (forward) the left row so equality matches are picked up
    l2 = left.select(
        *by, F.col(on).alias("_on"), F.lit(1).alias("_t"), lstruct,
        F.lit(None).cast(rtype).alias("_r"),
    )
    r2 = right.select(
        *by, F.col(on).alias("_on"),
        F.lit(0 if direction == "backward" else 2).alias("_t"),
        F.lit(None).cast(ltype).alias("_l"), rstruct,
    )
    u = l2.unionByName(r2)
    order = [F.col("_on"), F.col("_t")]
    if direction == "forward":
        order = [c.desc() for c in order]
    w = (
        W.partitionBy(*by)
        .orderBy(*order)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    carried = F.last("_r", ignorenulls=True).over(w)
    out = u.withColumn("_rc", carried).filter(F.col("_l").isNotNull())
    cols = [F.col(f"_l.{c}").alias(c) for c in left.columns]
    cols += [
        F.col(f"_rc.{c}").alias(c + suffix if c in left.columns else c)
        for c in rcols
    ]
    return out.select(*cols)
