"""Cuckoo-filter URL-seen prefilter — the deletable alternative to the Bloom.

The north-rule names a "bloom/cuckoo URL-seen" set; `seen.BloomState` is the
default, this module is the cuckoo option (CrawlConfig.seen_filter="cuckoo").
Same contract: a probabilistic prefilter in front of the EXACT anti-join
(seen.anti_join_with_bloom is duck-typed over either state), so exactness
never depends on it. What the cuckoo adds over the Bloom:

  * deletion — `delete_hashes_df` removes keys (fingerprint swap-with-last),
    so re-crawl passes can EVICT stale URLs instead of rebuilding the filter
    (a Bloom can only grow); and
  * lower false-positive rate per bit at this sizing — 16-bit fingerprints in
    4-slot buckets give fpp ~= 2*4/2^16 ~= 0.012% vs the Bloom's ~0.8%.

Layout (Fan et al., "Cuckoo Filter: Practically Better Than Bloom",
CoNEXT'14): per-shard table of 2^k buckets x 4 slots of uint16 fingerprints
(0 = empty); partial-key cuckoo hashing, bucket2 = bucket1 XOR g(fp) with
power-of-two buckets so the alternate is computable from (bucket, fp) alone.
Inserts are wave-vectorized in numpy (sort-by-bucket + within-bucket rank
against free-slot counts — two waves cover ~all items below 90% load); the
rare relocation tail runs the classic kick loop per item with a
DETERMINISTIC victim slot (kick mod 4) so filter state is reproducible, and
overflow lands in a (shard, fp) stash checked by membership.

Sharding mirrors BloomState: shard = url_hash mod B, co-partitioned with the
seen table's bucket(url_hash) layout, one immutable file per shard, so at
10^10 URLs each executor loads only its buckets' shards. The engine uses
CuckooFileState (below): insert/delete deltas are grouped by shard and each
shard's merge runs the same numpy kernels INSIDE its executor task — the
driver never materializes the table. The in-memory CuckooState remains the
kernel implementation (a shard merge is a single-shard CuckooState) and the
unit-test surface.

Reference parity: same role as seen.BloomState — the D4 get-or-put
(URLFilterBolt.java:107-120) short-circuit; exactness still comes from the
anti-join against the seen table.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.functions import col, pandas_udf

SLOTS = 4
FP_BITS = 16
MAX_KICKS = 500
_G = np.uint64(0x5BD1E995)  # fp -> alternate-bucket offset multiplier


def _splitmix(h: np.ndarray) -> np.ndarray:
    with np.errstate(over="ignore"):
        z = (h.astype(np.uint64) + np.uint64(0x9E3779B97F4A7C15))
        z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        return z ^ (z >> np.uint64(31))


def _derive(hashes: np.ndarray, shards: int, sb: int):
    """(n,) int64 url_hashes -> (shard, fp, b1, b2) arrays; sb = buckets per
    shard (power of two). fp is uint16 nonzero; b1/b2 are WITHIN-shard."""
    h = hashes.astype(np.uint64)
    x = _splitmix(h)
    fp = (x & np.uint64(0xFFFF)).astype(np.uint16)
    fp = np.where(fp == 0, np.uint16(1), fp)
    mask = np.uint64(sb - 1)
    b1 = ((x >> np.uint64(16)) & mask).astype(np.int64)
    with np.errstate(over="ignore"):
        g = ((fp.astype(np.uint64) * _G) & mask).astype(np.int64)
    b2 = b1 ^ g
    shard = (h % np.uint64(shards)).astype(np.int64)
    return shard, fp, b1, b2


def _alt(bucket: np.ndarray | int, fp, sb: int):
    """Alternate within-shard bucket of (bucket, fp)."""
    mask = np.uint64(sb - 1)
    with np.errstate(over="ignore"):
        g = (np.uint64(fp) * _G) & mask
    return int(np.uint64(bucket) ^ g) if np.isscalar(bucket) else (
        bucket ^ g.astype(bucket.dtype)
    )


class CuckooState:
    """Sharded cuckoo filter with the BloomState interface (n_bits = total
    memory budget in bits, so configs are drop-in comparable): add_hashes_df /
    hit_udf / save / load / load_shard, plus delete_hashes_df."""

    def __init__(self, n_bits: int = 1 << 23, shards: int = 1):
        total_buckets = n_bits // (FP_BITS * SLOTS)
        sb = total_buckets // shards
        assert sb >= 1 and (sb & (sb - 1)) == 0, (
            "buckets per shard must be a power of two "
            f"(n_bits={n_bits}, shards={shards} -> {sb})"
        )
        self.n_bits = n_bits
        self.shards = shards
        self.sb = sb
        self.total_buckets = sb * shards
        # flat (total_buckets * SLOTS,) fp table; bucket slots stay COMPACT
        # (occupied prefix) — inserts fill at occ, deletes swap-with-last
        self.table = np.zeros(self.total_buckets * SLOTS, dtype=np.uint16)
        self.occ = np.zeros(self.total_buckets, dtype=np.uint8)
        self.stash: set[int] = set()  # overflow keys: shard << 16 | fp

    # ---- core numpy kernels ----

    def _global(self, shard: np.ndarray, b: np.ndarray) -> np.ndarray:
        return shard * self.sb + b

    def _contains(self, shard, fp, b1, b2) -> np.ndarray:
        t = self.table.reshape(-1, SLOTS)
        g1, g2 = self._global(shard, b1), self._global(shard, b2)
        hit = (t[g1] == fp[:, None]).any(1) | (t[g2] == fp[:, None]).any(1)
        if self.stash:
            keys = (shard.astype(np.int64) << 16) | fp.astype(np.int64)
            hit |= np.isin(keys, np.fromiter(
                self.stash, dtype=np.int64, count=len(self.stash)
            ))
        return hit

    def _place_wave(self, gb: np.ndarray, fp: np.ndarray) -> np.ndarray:
        """Try to place each (global bucket, fp) into a free slot —
        vectorized: sort by bucket, rank within bucket, place rank < free.
        Returns placed mask (input order)."""
        if gb.size == 0:
            return np.zeros(0, dtype=bool)
        order = np.argsort(gb, kind="stable")
        sg, sf = gb[order], fp[order]
        first = np.ones(sg.size, dtype=bool)
        first[1:] = sg[1:] != sg[:-1]
        starts = np.where(first, np.arange(sg.size), 0)
        rank = np.arange(sg.size) - np.maximum.accumulate(starts)
        occ = self.occ[sg]
        can = rank < (SLOTS - occ.astype(np.int64))
        tgt, slot = sg[can], occ[can].astype(np.int64) + rank[can]
        self.table[tgt * SLOTS + slot] = sf[can]
        np.add.at(self.occ, tgt, np.uint8(1))
        placed = np.zeros(gb.size, dtype=bool)
        placed[order] = can
        return placed

    def _insert_one(self, shard: int, fp: int, b: int) -> None:
        """Relocation tail: classic cuckoo kicks, deterministic victim."""
        cur_fp, cur_b = np.uint16(fp), int(b)
        base = shard * self.sb
        for kick in range(MAX_KICKS):
            g = base + cur_b
            if self.occ[g] < SLOTS:
                self.table[g * SLOTS + self.occ[g]] = cur_fp
                self.occ[g] += 1
                return
            v = kick % SLOTS
            vfp = self.table[g * SLOTS + v]
            self.table[g * SLOTS + v] = cur_fp
            cur_fp = vfp
            cur_b = _alt(cur_b, cur_fp, self.sb)
        self.stash.add((shard << 16) | int(cur_fp))

    def add_hashes(self, hashes: np.ndarray) -> None:
        if hashes.size == 0:
            return
        shard, fp, b1, b2 = _derive(hashes, self.shards, self.sb)
        # canonical key dedup: pair {b1,b2} is (fp, min(b1,b2))-determined
        key = (
            (shard.astype(np.int64) << 48)
            | (fp.astype(np.int64) << 32)
            | np.minimum(b1, b2)
        )
        _, keep = np.unique(key, return_index=True)
        shard, fp, b1, b2 = shard[keep], fp[keep], b1[keep], b2[keep]
        fresh = ~self._contains(shard, fp, b1, b2)
        shard, fp, b1, b2 = shard[fresh], fp[fresh], b1[fresh], b2[fresh]
        placed = self._place_wave(self._global(shard, b1), fp)
        r = ~placed
        placed2 = self._place_wave(self._global(shard[r], b2[r]), fp[r])
        rs, rf, rb = shard[r][~placed2], fp[r][~placed2], b1[r][~placed2]
        for s, f, b in zip(rs.tolist(), rf.tolist(), rb.tolist()):
            self._insert_one(s, f, b)

    def delete_hashes(self, hashes: np.ndarray) -> None:
        """Remove one stored fingerprint per distinct key (no-op for keys
        never inserted). Buckets stay compact: swap-with-last."""
        if hashes.size == 0:
            return
        shard, fp, b1, b2 = _derive(hashes, self.shards, self.sb)
        key = (
            (shard.astype(np.int64) << 48)
            | (fp.astype(np.int64) << 32)
            | np.minimum(b1, b2)
        )
        _, keep = np.unique(key, return_index=True)
        t = self.table
        for i in keep.tolist():
            s, f = int(shard[i]), int(fp[i])
            removed = False
            for b in (int(b1[i]), int(b2[i])):
                g = s * self.sb + b
                n = int(self.occ[g])
                for sl in range(n):
                    if t[g * SLOTS + sl] == f:
                        t[g * SLOTS + sl] = t[g * SLOTS + n - 1]
                        t[g * SLOTS + n - 1] = 0
                        self.occ[g] -= 1
                        removed = True
                        break
                if removed:
                    break
            if not removed:
                self.stash.discard((s << 16) | f)

    # NOTE: no DataFrame interface here by design. CuckooState is the
    # numpy kernel + unit-test surface; every engine-reachable cuckoo
    # config goes through CuckooFileState below, whose add/delete merges
    # run per-shard INSIDE executor tasks. (The old
    # add_hashes_df/delete_hashes_df convenience methods round-tripped the
    # delta through driver toPandas — removed so the driver-resident hop
    # can't be reintroduced by picking the wrong class.)

    def hit_udf(self):
        """pandas UDF: url_hash -> bool (True = maybe seen)."""
        table, shards, sb = self.table.tobytes(), self.shards, self.sb
        stash = np.fromiter(
            self.stash, dtype=np.int64, count=len(self.stash)
        )

        @pandas_udf("boolean")
        def _hit(h: pd.Series) -> pd.Series:
            t = np.frombuffer(table, dtype=np.uint16).reshape(-1, SLOTS)
            shard, fp, b1, b2 = _derive(
                h.to_numpy(dtype=np.int64), shards, sb
            )
            g1, g2 = shard * sb + b1, shard * sb + b2
            hit = (t[g1] == fp[:, None]).any(1) | (
                t[g2] == fp[:, None]
            ).any(1)
            if stash.size:
                keys = (shard.astype(np.int64) << 16) | fp.astype(np.int64)
                hit |= np.isin(keys, stash)
            return pd.Series(hit)

        return _hit

    # ---- persistence: one immutable file per shard + stash sidecar ----

    def save(self, path: str) -> None:
        os.makedirs(path, exist_ok=True)
        n = self.sb * SLOTS
        for s in range(self.shards):
            with open(os.path.join(path, f"shard-{s:04d}.bin"), "wb") as f:
                f.write(self.table[s * n:(s + 1) * n].tobytes())
        stash = np.fromiter(
            sorted(self.stash), dtype=np.int64, count=len(self.stash)
        )
        with open(os.path.join(path, "stash.bin"), "wb") as f:
            f.write(stash.tobytes())

    @staticmethod
    def load_shard(path: str, s: int) -> np.ndarray:
        """Read ONE shard's fp table — the executor-side load unit."""
        return np.fromfile(
            os.path.join(path, f"shard-{s:04d}.bin"), dtype=np.uint16
        )

    @classmethod
    def load(cls, path: str, n_bits: int, shards: int = 1) -> "CuckooState":
        c = cls(n_bits, shards)
        n = c.sb * SLOTS
        for s in range(shards):
            arr = cls.load_shard(path, s)
            assert arr.size == n, f"cuckoo shard {s} size mismatch"
            c.table[s * n:(s + 1) * n] = arr
        # deletes keep buckets compact, so occupancy is recoverable as the
        # nonzero count per bucket
        c.occ = (
            c.table.reshape(-1, SLOTS) != 0
        ).sum(axis=1).astype(np.uint8)
        sp = os.path.join(path, "stash.bin")
        if os.path.exists(sp):
            c.stash = set(np.fromfile(sp, dtype=np.int64).tolist())
        else:
            # per-shard stash sidecars (CuckooFileState layout)
            for s in range(shards):
                fp = os.path.join(path, f"stash-{s:04d}.bin")
                if os.path.exists(fp):
                    for v in np.fromfile(fp, dtype=np.int64).tolist():
                        c.stash.add((s << 16) | int(v))
        return c


class CuckooFileState:
    """Sharded cuckoo filter maintained EXECUTOR-SIDE — the deletable
    counterpart of seen.BloomFileState (see that module's section comment
    for the architecture: one immutable file per shard, per-shard merges run
    inside executor tasks via groupBy(shard).applyInPandas, the driver never
    materializes the table, membership lazy-loads only the shard slices a
    task touches, memoized per worker).

    File layout: ``shard-XXXX.bin`` (the shard's uint16 fp-table slice,
    byte-identical to CuckooState.save) plus ``stash-XXXX.bin`` (int64
    fingerprints that overflowed that shard's kick loop) — the per-shard
    split of CuckooState's global ``stash.bin``, so each shard's merge task
    owns ALL of its state. CuckooState.load reads either layout; load()
    here migrates a legacy global stash.bin into the per-shard files once
    (driver-side, tiny)."""

    def __init__(self, path: str, n_bits: int, shards: int = 1):
        total_buckets = n_bits // (FP_BITS * SLOTS)
        sb = total_buckets // shards
        assert sb >= 1 and (sb & (sb - 1)) == 0, (
            "buckets per shard must be a power of two "
            f"(n_bits={n_bits}, shards={shards} -> {sb})"
        )
        import uuid as _uuid

        self.path = path
        self.n_bits = n_bits
        self.shards = shards
        self.sb = sb
        self._ver = _uuid.uuid4().hex[:12]

    @classmethod
    def create(cls, path: str, n_bits: int, shards: int = 1):
        """Initialize an EMPTY filter at path (wipes any previous one)."""
        import shutil

        from sparkcrawl.seen import _atomic_write

        c = cls(path, n_bits, shards)
        if os.path.isdir(path):
            shutil.rmtree(path)
        elif os.path.exists(path):
            os.remove(path)
        os.makedirs(path)
        zero = np.zeros(c.sb * SLOTS, dtype=np.uint16).tobytes()
        for s in range(shards):
            _atomic_write(os.path.join(path, f"shard-{s:04d}.bin"), zero)
            _atomic_write(os.path.join(path, f"stash-{s:04d}.bin"), b"")
        return c

    @classmethod
    def load(cls, path: str, n_bits: int, shards: int = 1):
        """Open an existing filter; driver reads nothing but a legacy
        global stash.bin (migrated once into the per-shard sidecars)."""
        from sparkcrawl.seen import _atomic_write

        c = cls(path, n_bits, shards)
        nb = c.sb * SLOTS * 2  # uint16 bytes
        for s in range(shards):
            f = os.path.join(path, f"shard-{s:04d}.bin")
            assert os.path.getsize(f) == nb, f"cuckoo shard {s} size mismatch"
        legacy = os.path.join(path, "stash.bin")
        if os.path.exists(legacy):
            keys = np.fromfile(legacy, dtype=np.int64)
            for s in range(shards):
                fps = keys[(keys >> 16) == s] & 0xFFFF
                _atomic_write(
                    os.path.join(path, f"stash-{s:04d}.bin"),
                    np.sort(fps).astype(np.int64).tobytes(),
                )
            os.remove(legacy)
        else:
            for s in range(shards):
                f = os.path.join(path, f"stash-{s:04d}.bin")
                if not os.path.exists(f):
                    _atomic_write(f, b"")
        return c

    # ---- per-shard merge machinery ----

    def _shard_state(self, s: int) -> CuckooState:
        """Materialize ONE shard as a single-shard in-memory CuckooState
        (identical geometry: fp/bucket derivation is shard-independent, and
        a shard-local stash key is just the fingerprint)."""
        local = CuckooState(self.n_bits // self.shards, shards=1)
        local.table = np.array(CuckooState.load_shard(self.path, s))
        local.occ = (
            local.table.reshape(-1, SLOTS) != 0
        ).sum(axis=1).astype(np.uint8)
        sp = os.path.join(self.path, f"stash-{s:04d}.bin")
        if os.path.exists(sp):
            local.stash = set(np.fromfile(sp, dtype=np.int64).tolist())
        return local

    def _apply_per_shard(self, df: DataFrame, op: str) -> None:
        from sparkcrawl.seen import _atomic_write, shard_udf

        path, n_bits, shards = self.path, self.n_bits, self.shards
        me = CuckooFileState  # rebind for the closure (self not shipped)

        def _merge(key, pdf):
            s = int(key[0])
            hs = pdf["url_hash"].to_numpy(dtype=np.int64)
            local = me(path, n_bits, shards)._shard_state(s)
            if op == "add":
                local.add_hashes(hs)
            else:
                local.delete_hashes(hs)
            _atomic_write(
                os.path.join(path, f"shard-{s:04d}.bin"),
                local.table.tobytes(),
            )
            stash = np.fromiter(
                sorted(local.stash), dtype=np.int64, count=len(local.stash)
            )
            _atomic_write(
                os.path.join(path, f"stash-{s:04d}.bin"), stash.tobytes()
            )
            return pd.DataFrame({"shard": [s], "n": [hs.size]})

        (
            df.select("url_hash")
            .withColumn("_shard", shard_udf(shards)(col("url_hash")))
            .groupBy("_shard")
            .applyInPandas(_merge, "shard int, n long")
            .collect()
        )
        import uuid as _uuid

        self._ver = _uuid.uuid4().hex[:12]

    def add_hashes_df(self, df: DataFrame) -> None:
        self._apply_per_shard(df, "add")

    def delete_hashes_df(self, df: DataFrame) -> None:
        self._apply_per_shard(df, "delete")

    def hit_udf(self):
        """pandas UDF: url_hash -> bool. Lazy per-shard table+stash loads,
        memoized per worker (seen._cached_shard)."""
        from sparkcrawl.seen import _cached_shard

        path, shards, sb, ver = self.path, self.shards, self.sb, self._ver

        @pandas_udf("boolean")
        def _hit(h: pd.Series) -> pd.Series:
            hv = h.to_numpy(dtype=np.int64)
            shard, fp, b1, b2 = _derive(hv, shards, sb)
            out = np.zeros(hv.size, dtype=bool)
            for s in np.unique(shard):
                t = _cached_shard(
                    path, "shard", int(s), ver, np.uint16
                ).reshape(-1, SLOTS)
                stash = _cached_shard(path, "stash", int(s), ver, np.int64)
                m = shard == s
                f = fp[m]
                hit = (t[b1[m]] == f[:, None]).any(1) | (
                    t[b2[m]] == f[:, None]
                ).any(1)
                if stash.size:
                    hit |= np.isin(f.astype(np.int64), stash)
                out[m] = hit
            return pd.Series(out)

        return _hit

    def save(self, path: str) -> None:
        """No-op — every merge already replaced the shard files in place."""
        assert path == self.path, "file-backed filter is bound to its path"

    load_shard = staticmethod(CuckooState.load_shard)  # same layout
