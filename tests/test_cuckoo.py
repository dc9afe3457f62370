"""Cuckoo-filter seen-prefilter: no false negatives, fpp bound, deletion,
sharded persistence roundtrip, and engine-level exactness (cuckoo == bloom
== no-prefilter traces, resume included)."""

from __future__ import annotations

import numpy as np
import pytest

from conftest import load_inputs
from oracle import run_oracle

from pyspark.sql import functions as F

from sparkcrawl import schema as S
from sparkcrawl.cuckoo import SLOTS, CuckooState
from sparkcrawl.engine import CrawlConfig, CrawlEngine
from sparkcrawl.filters import FilterConfig
from sparkcrawl.tables import SnapshotStore

RNG = np.random.default_rng(7)


def _hashes(n: int, lo: int = 0) -> np.ndarray:
    # distinct signed-64 hashes, reproducible
    return (RNG.integers(-(2**62), 2**62, size=n) + lo).astype(np.int64)


def test_no_false_negatives_and_fpp():
    c = CuckooState(n_bits=1 << 22, shards=4)  # 65536 slots
    members = np.unique(_hashes(50_000))
    c.add_hashes(members)
    shard, fp, b1, b2 = _cf_derive(c, members)
    assert c._contains(shard, fp, b1, b2).all(), "false negative"
    others = np.setdiff1d(np.unique(_hashes(50_000, lo=3)), members)
    s2, f2, a2, d2 = _cf_derive(c, others)
    fpp = c._contains(s2, f2, a2, d2).mean()
    # 16-bit fp, 4 slots -> theoretical ~2*4/65536 ~= 0.012%; allow 10x
    assert fpp < 0.005, f"fpp {fpp} too high"


def _cf_derive(c: CuckooState, hs: np.ndarray):
    from sparkcrawl.cuckoo import _derive

    return _derive(hs, c.shards, c.sb)


def test_delete_removes_members():
    c = CuckooState(n_bits=1 << 20, shards=2)
    members = np.unique(_hashes(8_000))
    c.add_hashes(members)
    gone, kept = members[::2], members[1::2]
    c.delete_hashes(gone)
    # kept members must still ALL hit (no false negatives survive deletes)
    sk, fk, ak, bk = _cf_derive(c, kept)
    assert c._contains(sk, fk, ak, bk).all()
    # deleted members mostly miss (residual hits = fp collisions only)
    sg, fg, ag, bg = _cf_derive(c, gone)
    assert c._contains(sg, fg, ag, bg).mean() < 0.01


def test_high_load_relocation_and_stash():
    c = CuckooState(n_bits=1 << 18, shards=1)  # 16384 slots
    members = np.unique(_hashes(15_000))  # ~92% load: forces kick loop
    c.add_hashes(members)
    s, f, a, b = _cf_derive(c, members)
    assert c._contains(s, f, a, b).all(), "false negative under high load"
    # occupancy never exceeds SLOTS and matches nonzero slots (compactness)
    t = c.table.reshape(-1, SLOTS)
    assert (c.occ <= SLOTS).all()
    assert ((t != 0).sum(axis=1) == c.occ).all()


def test_save_load_roundtrip(tmp_path):
    c = CuckooState(n_bits=1 << 18, shards=1)
    members = np.unique(_hashes(15_000))  # high load -> nonempty stash likely
    c.add_hashes(members)
    p = str(tmp_path / "cf")
    c.save(p)
    c2 = CuckooState.load(p, 1 << 18, shards=1)
    assert (c2.table == c.table).all()
    assert (c2.occ == c.occ).all()
    assert c2.stash == c.stash


def test_hit_udf_matches_contains(spark):
    c = CuckooState(n_bits=1 << 20, shards=4)
    members = np.unique(_hashes(5_000))
    c.add_hashes(members)
    probe = np.concatenate([members[:2_000], _hashes(2_000, lo=9)])
    s, f, a, b = _cf_derive(c, probe)
    want = c._contains(s, f, a, b)
    df = spark.createDataFrame(
        [(int(h),) for h in probe], "url_hash long"
    )
    got = {
        r["url_hash"]: r["hit"]
        for r in df.withColumn("hit", c.hit_udf()(df.url_hash)).collect()
    }
    assert [got[int(h)] for h in probe] == want.tolist()


# ---- engine-level exactness: cuckoo prefilter changes nothing ----


def _run(spark, fixtures, fixture_paths, store_dir, resume_break=None):
    pages, meta, robots, seeds = load_inputs(spark, fixture_paths)
    cfg = CrawlConfig(
        seen_filter="cuckoo",
        filters=FilterConfig(banned_hosts=fixtures["banned_hosts"]),
    )
    store = SnapshotStore(store_dir)
    eng = CrawlEngine(spark, store, pages, meta, robots, cfg)
    if resume_break is not None:
        eng.run(seeds, max_rounds=resume_break)
        store = SnapshotStore(store_dir)  # simulate kill + reopen
        eng = CrawlEngine(spark, store, pages, meta, robots, cfg)
        eng.run(None, max_rounds=1000)
    else:
        eng.run(seeds, max_rounds=1000)
    return store


def _collect(spark, store):
    trace = [
        (r["round"], r["ord"], r["url_norm"], r["host"], r["action"])
        for r in store.read(spark, "trace", S.TRACE)
        .orderBy("round", "ord").collect()
    ]
    seen = {r["url_norm"] for r in store.read(spark, "seen", S.SEEN).collect()}
    return trace, seen


@pytest.fixture(scope="module")
def oracle_result(fixtures):
    return run_oracle(fixtures)


def test_engine_cuckoo_identical(spark, fixtures, fixture_paths, tmp_path,
                                 oracle_result):
    store = _run(spark, fixtures, fixture_paths, str(tmp_path / "cf"))
    trace, seen = _collect(spark, store)
    assert seen == oracle_result.seen
    assert trace == oracle_result.trace
    # the filter choice is recorded for resume
    assert store.meta["seen_filter"] == "cuckoo"


def test_engine_cuckoo_resume_identical(spark, fixtures, fixture_paths,
                                        tmp_path, oracle_result):
    store = _run(
        spark, fixtures, fixture_paths, str(tmp_path / "cfr"), resume_break=2
    )
    trace, seen = _collect(spark, store)
    assert seen == oracle_result.seen
    assert trace == oracle_result.trace


def test_cuckoo_file_state_matches_memory(spark, tmp_path):
    """CuckooFileState: executor-side per-shard add/delete produce the
    same membership answers as the in-memory kernel; files persist across
    reopen; save() is a no-op; driver holds no table."""
    import numpy as np

    from sparkcrawl.cuckoo import CuckooFileState

    def mk(a, b):
        return spark.range(a, b).select(
            F.xxhash64(F.concat(F.lit("u"), F.col("id"))).alias("url_hash")
        )

    bits, shards = 1 << 20, 4
    path = str(tmp_path / "cfile")
    cf = CuckooFileState.create(path, bits, shards)
    cf.add_hashes_df(mk(0, 4_000))
    cf.add_hashes_df(mk(4_000, 6_000))
    cf.delete_hashes_df(mk(0, 1_000))
    assert not hasattr(cf, "table")  # nothing driver-resident
    cf.save(path)  # no-op

    cm = CuckooState(bits, shards)
    h_all = (
        mk(0, 6_000).toPandas()["url_hash"].to_numpy(dtype=np.int64)
    )
    cm.add_hashes(h_all[:4_000])
    cm.add_hashes(h_all[4_000:])
    cm.delete_hashes(h_all[:1_000])

    probe = mk(0, 7_000)  # includes 1k deleted + 1k never-added
    cf2 = CuckooFileState.load(path, bits, shards)  # reopen
    got = {
        r["url_hash"]: r["hit"]
        for r in probe.withColumn(
            "hit", cf2.hit_udf()(F.col("url_hash"))
        ).collect()
    }
    hp = probe.toPandas()["url_hash"].to_numpy(dtype=np.int64)
    want = cm._contains(*_cf_derive(cm, hp))
    assert [got[int(h)] for h in hp] == want.tolist()
    # deleted keys no longer hit; present keys all hit (no false negatives)
    assert all(got[int(h)] for h in h_all[1_000:])


def test_cuckoo_legacy_stash_migration(tmp_path):
    """A round-2 store's global stash.bin splits into per-shard sidecars on
    CuckooFileState.load, and CuckooState.load reads the NEW layout back to
    the same global stash set."""
    import numpy as np
    import os

    bits, shards = 1 << 18, 2
    c = CuckooState(bits, shards)
    c.stash = {(0 << 16) | 7, (1 << 16) | 9, (1 << 16) | 11}
    path = str(tmp_path / "legacy")
    c.save(path)  # writes shard-*.bin + global stash.bin
    assert os.path.exists(os.path.join(path, "stash.bin"))

    from sparkcrawl.cuckoo import CuckooFileState

    cf = CuckooFileState.load(path, bits, shards)
    assert cf is not None
    assert not os.path.exists(os.path.join(path, "stash.bin"))
    s0 = np.fromfile(os.path.join(path, "stash-0000.bin"), dtype=np.int64)
    s1 = np.fromfile(os.path.join(path, "stash-0001.bin"), dtype=np.int64)
    assert s0.tolist() == [7] and s1.tolist() == [9, 11]
    c2 = CuckooState.load(path, bits, shards)
    assert c2.stash == c.stash
