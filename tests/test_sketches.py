"""HyperLogLog sketch (sparkcrawl/sketches.py): accuracy vs exact
distinct, register mergeability (the property that makes it a sketch),
and partitioning independence. Cross-engine value parity is pinned by the
duckdb `hll_distinct` oracle."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sparkcrawl.sketches import hll_distinct, hll_registers


@pytest.fixture(scope="module")
def vals(spark):
    # 3 groups with known cardinalities 1000 / 100 / 1
    rows = (
        [("g0", f"v{i % 1000}") for i in range(5000)]
        + [("g1", f"v{i % 100}") for i in range(1000)]
        + [("g2", "solo")] * 50
    )
    return spark.createDataFrame(rows, "g string, v string")


def test_hll_estimate_within_standard_error(spark, vals):
    got = {r["g"]: r["estimate"]
           for r in hll_distinct(vals, "v", ["g"], p=12).collect()}
    # sigma ~= 1.04/sqrt(4096) ~ 1.6%; allow 4 sigma + small-range slack
    for g, true in (("g0", 1000), ("g1", 100), ("g2", 1)):
        assert abs(got[g] - true) / true < 0.10, (g, got[g], true)


def test_hll_registers_merge_is_max(spark, vals):
    """sketch(A ∪ B) == register-wise max(sketch(A), sketch(B)) — the
    distributed-merge property (cross-day / cross-partition combine)."""
    a = vals.filter(F.crc32("v") % 2 == 0)
    b = vals.filter(F.crc32("v") % 2 == 1)
    whole = {(r["g"], r["bucket"]): r["register"]
             for r in hll_registers(vals, "v", ["g"]).collect()}
    merged: dict = {}
    for part in (a, b):
        for r in hll_registers(part, "v", ["g"]).collect():
            k = (r["g"], r["bucket"])
            merged[k] = max(merged.get(k, 0), r["register"])
    assert merged == whole


def test_hll_partitioning_independent(spark, vals):
    one = sorted(hll_distinct(vals, "v", ["g"], p=8).collect())
    other = sorted(
        hll_distinct(vals.repartition(13), "v", ["g"], p=8).collect()
    )
    assert one == other


def test_hll_rejects_bad_precision(spark, vals):
    for bad in (3, 10, 20):
        with pytest.raises(ValueError):
            hll_registers(vals, "v", ["g"], p=bad)
