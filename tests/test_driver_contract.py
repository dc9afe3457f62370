"""Driver-contract surface smoke: entry() runs and returns a stable schema;
queries()/oracle_sql() stay consistent; every query builds a DataFrame plan
against sf0.001 without executing (cheap analysis-only check)."""

from __future__ import annotations

import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import __spark_entry__ as entrymod

SF = "/root/testdata/sf0.001"


def test_entry_runs(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert df.columns == [
        "host", "n_fetched", "n_unique_content", "first_seq"
    ]


def test_queries_and_oracles_consistent(spark):
    qs = entrymod.queries()
    sqls = entrymod.oracle_sql()
    # every catalog query carries a full value-hash DuckDB oracle — no
    # rows-only checks (the k-means IVF trainer is deterministic by
    # construction precisely so its 4 sweeps unroll into SQL)
    assert set(sqls) == set(qs)
    assert len(qs) >= 30
    # every query must at least ANALYZE against the real tables (schema
    # resolution; no job execution)
    for name, fn in qs.items():
        df = fn(spark, SF)
        assert df.columns, name
