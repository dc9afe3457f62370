"""connected_components (large/small-star) vs a plain union-find reference."""

from __future__ import annotations

import random

import pytest

from sparkcrawl.components import connected_components, dedup_clusters

PAIRS = "doc_a long, doc_b long"


def _union_find(n_nodes, edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # min-id label per node (the unique fixpoint the Spark job must reach)
    return {x: find(x) for x in parent}


def _cc(spark, edges):
    df = spark.createDataFrame(edges, PAIRS)
    out = connected_components(df)
    return {r["node"]: r["component"] for r in out.collect()}


def test_two_components_and_chain(spark):
    # a 6-node chain (worst case for diameter-bound propagation) + a triangle
    edges = [(1, 2), (2, 3), (3, 4), (4, 5), (5, 6), (10, 11), (11, 12),
             (10, 12)]
    got = _cc(spark, edges)
    assert got == _union_find(12, edges)
    assert set(got.values()) == {1, 10}


def test_matches_union_find_on_random_graphs(spark):
    rng = random.Random(7)
    for trial in range(3):
        n = 60
        edges = [
            (rng.randrange(n), rng.randrange(n)) for _ in range(40 + 20 * trial)
        ]
        edges = [(a, b) for a, b in edges if a != b]
        got = _cc(spark, edges)
        assert got == _union_find(n, edges), f"trial {trial}"


def test_empty_and_self_loop_pairs(spark):
    assert _cc(spark, [(5, 5)]) == {}
    df = spark.createDataFrame([], PAIRS)
    assert connected_components(df).count() == 0


def test_long_chain_converges_fast(spark, monkeypatch):
    """A 64-node chain has diameter 63; large/small-star must still converge
    within the O(log^2 n) rail (naive propagation would need 63 rounds)."""
    edges = [(i, i + 1) for i in range(63)]
    got = _cc(spark, edges)
    assert set(got.values()) == {0}
    assert len(got) == 64


def test_nonconvergence_raises(spark):
    df = spark.createDataFrame([(1, 2), (2, 3)], PAIRS)
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(df, max_iter=0)


def test_dedup_clusters_covers_all_docs(spark):
    docs = spark.createDataFrame([(i,) for i in range(8)], "doc_id long")
    pairs = spark.createDataFrame([(1, 3), (3, 5), (6, 7)], PAIRS)
    rows = {r["doc_id"]: r for r in dedup_clusters(docs, pairs).collect()}
    assert len(rows) == 8
    assert rows[5]["cluster_id"] == 1 and not rows[5]["is_canonical"]
    assert rows[1]["is_canonical"]
    assert rows[7]["cluster_id"] == 6
    # unpaired docs are their own (kept) cluster
    assert rows[0]["cluster_id"] == 0 and rows[0]["is_canonical"]


def test_dedup_survivors_accounting(spark):
    """Survivors = the canonical docs; sizes partition the corpus; char
    accounting is exact vs a plain-Python union-find reference."""
    from sparkcrawl.components import dedup_survivors

    texts = {i: "x" * (10 + 3 * i) for i in range(8)}
    docs = spark.createDataFrame(
        [(i, t) for i, t in texts.items()], "doc_id long, text string"
    )
    pairs = spark.createDataFrame([(1, 3), (3, 5), (6, 7)], PAIRS)
    rows = {r["doc_id"]: r for r in dedup_survivors(docs, pairs).collect()}
    # survivors: 0,1,2,4,6 (clusters {1,3,5} and {6,7}; rest singletons)
    assert set(rows) == {0, 1, 2, 4, 6}
    assert rows[1]["cluster_size"] == 3
    assert rows[1]["cluster_chars"] == sum(len(texts[i]) for i in (1, 3, 5))
    assert rows[1]["chars_dropped"] == len(texts[3]) + len(texts[5])
    assert rows[6]["cluster_size"] == 2
    assert rows[6]["chars_dropped"] == len(texts[7])
    assert rows[0]["cluster_size"] == 1 and rows[0]["chars_dropped"] == 0
    assert sum(r["cluster_size"] for r in rows.values()) == 8


# ---------------------------------------------------------------------------
# PageRank
# ---------------------------------------------------------------------------


def test_pagerank_hand_computed(spark):
    """2-node cycle + a dangling-in node: ranks match the closed-form
    power iteration computed in plain Python."""
    from sparkcrawl.components import pagerank

    e = spark.createDataFrame([(0, 1), (1, 0), (2, 0)], "src long, dst long")
    got = {r["v"]: r["pagerank"]
           for r in pagerank(e, iters=5, damping=0.85).collect()}

    n, d = 3, 0.85
    r = {v: 1 / n for v in range(3)}
    deg = {0: 1, 1: 1, 2: 1}
    edges = [(0, 1), (1, 0), (2, 0)]
    for _ in range(5):
        s = {v: 0.0 for v in range(3)}
        for u, v in edges:
            s[v] += r[u] / deg[u]
        r = {v: (1 - d) / n + d * s[v] for v in range(3)}
    assert got == {v: round(r[v], 6) for v in range(3)}


def test_pagerank_mass_conserved_and_width_independent(spark):
    """No dangling nodes -> total rank mass stays 1; result is identical
    across input partitioning (the determinism contract every engine
    table op carries)."""
    from sparkcrawl.components import pagerank

    n = 40
    rows = [(i, (i * 7 + 13 * j + 1) % n) for i in range(n) for j in range(3)]
    e1 = spark.createDataFrame(rows, "src long, dst long")
    e2 = e1.repartition(7)
    r1 = sorted(pagerank(e1, iters=4).collect())
    r2 = sorted(pagerank(e2, iters=4).collect())
    assert r1 == r2
    assert abs(sum(r["pagerank"] for r in r1) - 1.0) < 1e-4


def test_hits_hand_computed(spark):
    """Hub/authority scores on a small directed graph match the plain
    Python power iteration with the same max-normalization; the pure hub
    (links out, nothing in) and pure authority (linked to by all) land
    at the extremes."""
    from sparkcrawl.components import hits

    # 0,1,2 all link to 3; 0 also links to 1 -> 3 is the authority,
    # 0 the strongest hub; 3 has no out-links (hub 0)
    edges = [(0, 3), (1, 3), (2, 3), (0, 1)]
    e = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r["v"]: (r["hub"], r["authority"]) for r in hits(e, iters=5).collect()
    }

    nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
    a = {v: 1.0 for v in nodes}
    h = {}
    for _ in range(5):
        h = {v: sum(a[d] for s, d in edges if s == v) for v in nodes}
        mx = max(h.values())
        h = {v: x / mx for v, x in h.items()}
        a = {v: sum(h[s] for s, d in edges if d == v) for v in nodes}
        mx = max(a.values())
        a = {v: x / mx for v, x in a.items()}
    expect = {v: (round(h[v], 6), round(a[v], 6)) for v in nodes}
    assert got == expect
    assert got[3] == (0.0, 1.0)          # pure authority
    assert got[0][0] == 1.0              # strongest hub
    assert got[0][1] == 0.0              # nothing links to 0
