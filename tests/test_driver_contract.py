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
    """entry() drives two REAL CrawlEngine rounds over a web synthesized
    from sf0.001 documents; per-host metrics are deterministic across
    calls (fresh store each run, no randomness/wall-clock inputs)."""
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert df.columns == [
        "host", "n_crawled", "n_unique_content", "first_round", "last_round"
    ]
    # both engine rounds actually stored documents
    assert {r["first_round"] for r in rows} == {1, 2} or {
        r["last_round"] for r in rows
    } >= {1, 2}
    assert [tuple(r) for r in entrymod.entry(spark).collect()] == [
        tuple(r) for r in rows
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


def test_docs_track_query_catalog():
    """Doc-drift guard: COVERAGE.md's duckdb citations must reference only
    real catalog queries AND cover every one of them, and no prose doc may
    state a literal 'N queries' count that disagrees with len(QUERIES) —
    counts stay unnumbered or auto-derived, never hand-maintained."""
    import re

    from sparkcrawl.queries import QUERIES

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cov = open(os.path.join(repo, "COVERAGE.md")).read()

    cited: set[str] = set()
    for grp in re.findall(r"duckdb ((?:`[a-z0-9_]+`(?:,\s*)?)+)", cov):
        cited |= set(re.findall(r"`([a-z0-9_]+)`", grp))
    unknown = cited - set(QUERIES)
    assert not unknown, f"COVERAGE.md cites unknown queries: {sorted(unknown)}"
    undocumented = set(QUERIES) - cited
    assert not undocumented, (
        f"catalog queries missing from COVERAGE.md: {sorted(undocumented)}"
    )

    for fname in ("README.md", "COVERAGE.md", "ARCHITECTURE.md"):
        text = open(os.path.join(repo, fname)).read()
        for n in re.findall(
            r"\b(\d+)\s+(?:oracle-checked\s+|catalog\s+|headline\s+)?"
            r"quer(?:y|ies)\b", text
        ):
            assert int(n) == len(QUERIES), (
                f"{fname} states '{n} queries' but catalog has "
                f"{len(QUERIES)}"
            )
