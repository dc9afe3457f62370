"""Cuckoo-filter seen-prefilter: no false negatives, fpp bound, deletion,
sharded persistence roundtrip, and engine-level exactness (cuckoo == bloom
== no-prefilter traces, resume included)."""

from __future__ import annotations

import numpy as np
import pytest

from conftest import load_inputs
from oracle import run_oracle

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
