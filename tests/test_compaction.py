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


def _data_dirs(store):
    import os

    out = set()
    for t in os.listdir(store.data_dir):
        tdir = os.path.join(store.data_dir, t)
        if os.path.isdir(tdir):
            out.update(os.path.join(tdir, tok) for tok in os.listdir(tdir))
    return out


def test_expire_snapshots_removes_superseded_and_orphans(spark, tmp_path):
    """expire_snapshots drops (a) dirs only expired manifests reference
    (superseded by overwrite/compaction) and (b) dirs staged by a killed
    round (never committed) — while current content and resume are
    untouched."""
    import os

    root = str(tmp_path / "store")
    store = SnapshotStore(root)
    for i in range(12):
        store.stage_append(
            "t", spark.createDataFrame([(i, f"row{i}")], SCHEMA)
        )
        store.commit({"round": i})
    # supersede all 12 append dirs via compaction
    assert store.compact(spark, "t", SCHEMA, min_dirs=2)
    store.commit(dict(store.meta))
    # simulate a killed round: staged dir, process dies before commit
    store.stage_append(
        "t", spark.createDataFrame([(99, "orphan")], SCHEMA)
    )
    store._pending = {}  # "new process": staging state lost, dir remains

    before = sorted(
        (r["k"], r["v"]) for r in store.read(spark, "t", SCHEMA).collect()
    )
    n_before = len(_data_dirs(store))
    # keep_last=1: only the post-compaction manifest survives, so the 12
    # superseded append dirs become unreferenced along with the orphan
    out = store.expire_snapshots(keep_last=1)
    # 12 superseded + 1 orphan gone; the compacted dir remains
    assert out["removed_dirs"] == 13
    assert len(_data_dirs(store)) == n_before - 13
    assert out["removed_snapshots"] > 0

    # content identical, and a fresh store (resume) reads the same rows
    after = sorted(
        (r["k"], r["v"]) for r in store.read(spark, "t", SCHEMA).collect()
    )
    assert after == before
    resumed = SnapshotStore(root)
    assert sorted(
        (r["k"], r["v"]) for r in resumed.read(spark, "t", SCHEMA).collect()
    ) == before
    # CURRENT's manifest file survived
    with open(os.path.join(store.snap_dir, "CURRENT")) as f:
        cur = f.read().strip()
    assert os.path.exists(os.path.join(store.snap_dir, cur + ".json"))


def test_expire_never_touches_pending_or_newer_manifests(spark, tmp_path):
    """Dirs staged by the LIVE store survive expiry, and a manifest newer
    than CURRENT (crash between manifest write and CURRENT swap) is kept
    along with its dirs."""
    import json as _json
    import os

    root = str(tmp_path / "store")
    store = SnapshotStore(root)
    for i in range(4):
        store.stage_append(
            "t", spark.createDataFrame([(i, f"row{i}")], SCHEMA)
        )
        store.commit({"round": i})
    # live pending stage must survive
    store.stage_append("t", spark.createDataFrame([(7, "live")], SCHEMA))
    pending_dirs = {d for p in store._pending.values() for d in p["dirs"]}
    # fabricate a newer-than-CURRENT manifest referencing a fresh dir
    extra = os.path.join(store.data_dir, "t", "r999-deadbeef")
    os.makedirs(extra)
    with open(os.path.join(store.snap_dir, "v99999999.json"), "w") as f:
        _json.dump({"version": 99999999, "meta": {},
                    "tables": {"t": [extra]}}, f)

    store.expire_snapshots(keep_last=1)
    dirs = _data_dirs(store)
    assert pending_dirs <= dirs
    assert extra in dirs
    assert os.path.exists(os.path.join(store.snap_dir, "v99999999.json"))
    store.abort()
