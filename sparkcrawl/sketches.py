"""Distributed sketches with DETERMINISTIC, oracle-reproducible layouts.

HyperLogLog (Flajolet et al. 2007) estimates distinct cardinality in one
pass with m = 2^p registers: hash each value, use the first p bits as the
register index and the position of the first 1-bit in the rest as the
register candidate, keep the per-register MAX, and combine with the
bias-corrected harmonic mean (plus the linear-counting small-range
correction). Spark ships approx_count_distinct (a denser HLL++), but its
register layout is opaque to external systems; this implementation keys
everything off md5 HEX DIGITS so a SQL oracle (DuckDB) rebuilds the exact
same registers and the exact same estimate — an *approximate* sketch with
an *exact* cross-engine contract, the property the whole query catalog is
built on.

Scale shape: one partial-combined groupBy per level — (group, register)
max, then (group) aggregation of 2^-register sums. Register traffic is at
most |groups| * m rows regardless of input size; merging sketches across
partitions/days is the same MAX, which is why HLL is the standard
distinct-URL / distinct-user counter at crawl scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# leading zero bits inside one hex digit (digit 0 handled by the
# first-nonzero scan, never looked up here)
_LZ = {1: 3, 2: 2, 3: 2, 4: 1, 5: 1, 6: 1, 7: 1}  # 8..15 -> 0
_HEX = "0123456789abcdef"


def _hexval(col):
    """Hex digit -> int via position lookup (no engine-specific conv)."""
    return F.instr(F.lit(_HEX), F.lower(col)) - 1


def _alpha(m: int) -> float:
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1 + 1.079 / m)


def hll_registers(df: DataFrame, value_col: str, group_cols: list[str],
                  p: int = 12) -> DataFrame:
    """(group_cols..., bucket, register) — max first-1-bit rank per bucket.

    bucket = first p bits (p/4 hex chars) of md5(value); the rank scans
    the NEXT 12 hex chars (48 bits): rank = 4*leading_zero_chars +
    lz(first nonzero digit) + 1, or 49 when all 48 bits are zero.
    p must be a multiple of 4 so the bucket is a whole-hex-char prefix
    (what keeps the layout reproducible in any SQL dialect).
    """
    if p % 4 != 0 or not 4 <= p <= 16:
        raise ValueError(f"p must be a multiple of 4 in [4, 16]: {p}")
    pc = p // 4
    h = F.md5(F.col(value_col).cast("string"))
    bucket = F.conv(F.substring(h, 1, pc), 16, 10).cast("int")
    tail = F.substring(h, pc + 1, 12)
    zeros = F.length(F.regexp_extract(tail, "^(0*)", 1))
    first = _hexval(F.substring(tail, (zeros + 1).cast("int"), 1))
    lz = F.coalesce(
        *[F.when(first == k, F.lit(v)) for k, v in _LZ.items()],
        F.lit(0),
    )
    register = F.when(zeros == 12, F.lit(49)).otherwise(
        zeros * 4 + lz + 1
    ).cast("int")
    return (
        df.select(*group_cols, bucket.alias("bucket"),
                  register.alias("register"))
        .groupBy(*group_cols, "bucket")
        .agg(F.max("register").alias("register"))
    )


def hll_distinct(df: DataFrame, value_col: str, group_cols: list[str],
                 p: int = 12) -> DataFrame:
    """Per-group HLL cardinality estimate.

    Returns (group_cols..., n_buckets, estimate) where estimate is the
    bias-corrected HLL estimate with the linear-counting small-range
    branch, rounded to 2dp (the raw double agrees across engines to
    ~1e-10 relative; rounding just normalizes the display value).
    """
    m = 1 << p
    regs = hll_registers(df, value_col, group_cols, p)
    agg = regs.groupBy(*group_cols).agg(
        F.count("*").alias("n_buckets"),
        F.sum(F.pow(F.lit(2.0), -F.col("register"))).alias("_s"),
    )
    raw = F.lit(_alpha(m) * m * m) / (
        F.col("_s") + F.lit(float(m)) - F.col("n_buckets")
    )
    zeros = F.lit(float(m)) - F.col("n_buckets")
    linear = F.lit(float(m)) * (F.log(F.lit(float(m))) - F.log(zeros))
    est = F.when(
        (raw <= F.lit(2.5 * m)) & (zeros > 0), linear
    ).otherwise(raw)
    return agg.select(
        *group_cols,
        F.col("n_buckets").cast("long").alias("n_buckets"),
        F.round(est, 2).alias("estimate"),
    )
