"""SnapshotStore compaction: many append dirs rewrite to one with
identical content; commits stay atomic; resume state unaffected."""

from __future__ import annotations

from pyspark.sql import types as T

from sparkcrawl.tables import SnapshotStore

SCHEMA = T.StructType(
    [
        T.StructField("k", T.LongType()),
        T.StructField("v", T.StringType()),
    ]
)


def test_compact_rewrites_append_dirs(spark, tmp_path):
    store = SnapshotStore(str(tmp_path / "store"))
    for i in range(20):
        store.stage_append(
            "t", spark.createDataFrame([(i, f"row{i}")], SCHEMA)
        )
        store.commit({"round": i})
    assert store.n_dirs("t") == 20

    before = sorted(
        (r["k"], r["v"]) for r in store.read(spark, "t", SCHEMA).collect()
    )
    assert store.compact(spark, "t", SCHEMA, min_dirs=16)
    store.commit(dict(store.meta))
    assert store.n_dirs("t") == 1
    after = sorted(
        (r["k"], r["v"]) for r in store.read(spark, "t", SCHEMA).collect()
    )
    assert after == before
    assert store.committed_round == 19  # meta preserved

    # resume sees the compacted layout with the same content
    store2 = SnapshotStore(str(tmp_path / "store"))
    assert store2.n_dirs("t") == 1
    again = sorted(
        (r["k"], r["v"]) for r in store2.read(spark, "t", SCHEMA).collect()
    )
    assert again == before


def test_compact_skips_small_tables(spark, tmp_path):
    store = SnapshotStore(str(tmp_path / "store2"))
    store.stage_append("t", spark.createDataFrame([(1, "a")], SCHEMA))
    store.commit({"round": 0})
    assert not store.compact(spark, "t", SCHEMA, min_dirs=16)


def test_stage_drop_truncates_atomically(spark, tmp_path):
    store = SnapshotStore(str(tmp_path / "store3"))
    store.stage_append("t", spark.createDataFrame([(1, "a")], SCHEMA))
    store.commit({"round": 0})
    # staged but uncommitted: reads still see the old state
    store.stage_drop("t")
    assert store.exists("t")
    assert store.read(spark, "t", SCHEMA).count() == 1
    store.commit({"round": 1})
    assert not store.exists("t")
    assert store.read(spark, "t", SCHEMA).count() == 0
    # resume sees the truncation; re-appending works
    store2 = SnapshotStore(str(tmp_path / "store3"))
    assert not store2.exists("t")
    store2.stage_append("t", spark.createDataFrame([(2, "b")], SCHEMA))
    store2.commit({"round": 2})
    assert [(r["k"], r["v"]) for r in
            store2.read(spark, "t", SCHEMA).collect()] == [(2, "b")]
