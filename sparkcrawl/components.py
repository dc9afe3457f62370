"""Distributed connected components — dedup-cluster resolution at scale.

Near-dup detection (MinHash-LSH / SimHash, textops.py) emits PAIRS; a
training-data pipeline needs CLUSTERS: the transitive closure of the pair
graph, with one canonical document kept per cluster. At 100 TB the pair
graph does not fit anywhere, so the closure must itself be a distributed
iterative job.

Algorithm: alternating large-star / small-star (Kiveris, Lattanzi, Mirrokni,
Rastogi, Vassilvitskii — "Connected Components in MapReduce and Beyond",
SoCC'14). Each operation is one shuffle keyed by node id; the edge set
converges to a star forest (every node → its component's minimum id) in
O(log^2 n) rounds (O(log n) observed). Per round the working set only
shrinks toward n edges, unlike naive label propagation whose round count is
the graph DIAMETER — adversarial near-dup chains (doc_i ~ doc_{i+1}) make
diameter O(n), which is why large/small-star is the published choice for
web-corpus dedup.

Every step is a plain DataFrame groupBy/join (JVM-side, no Python); the
driver only runs the convergence check (a 2-value aggregate per round) and
``localCheckpoint`` to truncate the iterative plan — at cluster scale the
same loop runs with reliable ``checkpoint`` against the snapshot volume.

Reference parity: the reference crawler dedups content by exact MD5 only
(DocumentParserBolt.java:150-165 get-or-put); clusters are part of the
training-data op family (near-dup keep-one) this engine adds on top.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["connected_components", "dedup_clusters", "dedup_survivors"]

def _digest():
    """Convergence digest: sum of per-edge hashes folded into 2^31 buckets
    so the int64 sum cannot overflow below ~4e9 edges (ANSI mode would
    raise, not wrap). Built lazily — Column construction needs a session."""
    return F.sum(
        F.pmod(F.xxhash64(F.concat_ws(",", "u", "v")), F.lit(1 << 31))
    )


def _large_star(sym: DataFrame) -> DataFrame:
    """For each node u: connect every STRICTLY LARGER neighbor to
    m = min(N(u) ∪ {u}). Input is the symmetric edge list."""
    mins = (
        sym.groupBy("u")
        .agg(F.min("v").alias("mn"))
        .select("u", F.least("u", "mn").alias("m"))
    )
    return (
        sym.filter(F.col("v") > F.col("u"))
        .join(mins, "u")
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .distinct()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """Orient every edge large→small; for each node u connect all its
    (smaller) neighbors AND u itself to the minimum neighbor."""
    oriented = (
        edges.select(
            F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    mins = oriented.groupBy("u").agg(F.min("v").alias("m"))
    star = (
        oriented.join(mins, "u")
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .unionByName(mins.select("u", F.col("m").alias("v")))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    return star


def connected_components(
    pairs: DataFrame,
    src: str = "doc_a",
    dst: str = "doc_b",
    max_iter: int = 32,
) -> DataFrame:
    """(node, component) for every node appearing in ``pairs``; component =
    the minimum node id reachable from it. Deterministic regardless of
    iteration order — min-id labeling has a unique fixpoint.

    max_iter is a safety rail, not a tuning knob: large/small-star converges
    in O(log^2 n) alternations (a 2^32-node graph needs ~10); hitting the
    rail raises rather than returning a half-merged clustering.
    """
    edges = (
        pairs.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    digest = tuple(edges.agg(F.count("*"), _digest()).collect()[0])
    for _ in range(max_iter):
        nxt = _small_star(_large_star(edges.union(edges.select("v", "u"))))
        nxt = nxt.localCheckpoint(eager=True)
        nd = tuple(nxt.agg(F.count("*"), _digest()).collect()[0])
        converged = nd == digest
        edges, digest = nxt, nd
        if converged:
            break
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds"
        )
    # converged star forest: every edge is (node, root); roots map to
    # themselves so the output covers every input node exactly once
    comp = edges.select(F.col("u").alias("node"), F.col("v").alias("component"))
    roots = edges.select(F.col("v").alias("node")).distinct().withColumn(
        "component", F.col("node")
    )
    return comp.unionByName(roots)


def dedup_clusters(docs: DataFrame, pairs: DataFrame,
                   id_col: str = "doc_id") -> DataFrame:
    """Full dedup decision table: every document labeled with its near-dup
    cluster id (min doc_id in its component; itself if unpaired) and the
    keep/drop verdict (canonical = the cluster minimum). Downstream keeps
    ``is_canonical`` rows — the standard keep-one-per-cluster policy."""
    cc = connected_components(pairs, src="doc_a", dst="doc_b")
    out = docs.select(F.col(id_col)).join(
        cc, docs[id_col] == cc["node"], "left"
    )
    cluster = F.coalesce(F.col("component"), F.col(id_col))
    return out.select(
        F.col(id_col),
        cluster.alias("cluster_id"),
        (cluster == F.col(id_col)).alias("is_canonical"),
    )


def dedup_survivors(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """APPLY the keep-one-per-cluster policy: one row per surviving
    (canonical) document with the cluster's size and character accounting
    — the corpus-shrink report a dedup run actually ships (how many docs
    and chars each survivor absorbed).

    Output: ``doc_id`` (the survivor == cluster min id), ``cluster_size``
    (members incl. the survivor), ``cluster_chars`` (total chars across
    members), ``chars_dropped`` (chars removed from the corpus).

    Scale shape: the cluster labels come from the large/small-star closure
    (shuffles keyed by node id); the accounting is ONE join on doc_id plus
    ONE partial-combined agg keyed by cluster_id. Integer math only — no
    float summation order anywhere.
    """
    labels = dedup_clusters(docs, pairs, id_col=id_col)
    sized = labels.join(
        docs.select(id_col, F.length(F.col(text_col)).alias("_len")), id_col
    )
    return (
        sized.groupBy("cluster_id")
        .agg(
            F.count("*").cast("long").alias("cluster_size"),
            F.sum("_len").cast("long").alias("cluster_chars"),
            F.sum(
                F.when(~F.col("is_canonical"), F.col("_len")).otherwise(
                    F.lit(0)
                )
            )
            .cast("long")
            .alias("chars_dropped"),
        )
        .select(
            F.col("cluster_id").alias(id_col),
            "cluster_size",
            "cluster_chars",
            "chars_dropped",
        )
    )


def pagerank(
    edges: DataFrame,
    nodes: DataFrame | None = None,
    iters: int = 5,
    damping: float = 0.85,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Power-iteration PageRank over a link graph — the webgraph companion
    to connected_components (crawl-frontier prioritization, corpus
    influence weighting).

    ``nodes`` (one ``v`` column) defaults to distinct src ∪ dst. Fixed
    ``iters`` sweeps: r' = (1-d)/N + d * Σ_{u→v} r(u)/deg(u), computed as
    two joins + one partial-combined aggregation per sweep, everything
    shuffled on node id — the only join shape that holds on a 10^10-edge
    web graph (GraphX/Pregel run the identical dataflow). Zero in-degree
    nodes keep the teleport term via the left join from ``nodes``.
    Deterministic given (edges, iters, damping): the per-node Σ is a
    float sum with ≤ in-degree terms whose association error (~1e-16
    relative) sits far below the 6dp the result is rounded to.

    Ranks persist each sweep (localCheckpoint at local scale; the cluster
    analogue checkpoints to the snapshot volume like connected_components)
    so the plan stays one-sweep deep instead of growing with ``iters``.

    Returns (v, pagerank) with pagerank rounded to 6dp.
    """
    e = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    )
    if nodes is None:
        nodes = (
            e.select(F.col("src").alias("v"))
            .union(e.select(F.col("dst").alias("v")))
            .distinct()
        )
    nodes = nodes.select("v").localCheckpoint(eager=True)
    n = nodes.count()
    deg = e.groupBy("src").agg(F.count("*").alias("deg"))
    # edges carry their out-degree once, not per sweep
    ed = e.join(deg, "src").localCheckpoint(eager=True)
    ranks = nodes.select("v", F.lit(1.0 / n).alias("r"))
    for _ in range(iters):
        contrib = (
            ed.join(ranks, ed["src"] == ranks["v"])
            .select("dst", (F.col("r") / F.col("deg")).alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("s"))
        )
        ranks = (
            nodes.join(contrib, nodes["v"] == contrib["dst"], "left")
            .select(
                "v",
                (
                    F.lit((1.0 - damping) / n)
                    + F.lit(damping) * F.coalesce(F.col("s"), F.lit(0.0))
                ).alias("r"),
            )
            .localCheckpoint(eager=True)
        )
    return ranks.select("v", F.round("r", 6).alias("pagerank"))


def hits(
    edges: DataFrame,
    nodes: DataFrame | None = None,
    iters: int = 5,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """HITS hubs & authorities (Kleinberg 1999) — the second classical
    webgraph score next to pagerank (reference context: the crawl corpus
    feeds a search engine; HITS ranks link-heavy directories vs linked-to
    content).

    Fixed ``iters`` sweeps of h = Σ_{u→v} a(v), a = Σ_{u→v} h(u), each
    normalized by its MAX instead of the usual L2 norm: max of doubles is
    associativity-free (unlike a global float sum), so the normalizer is
    bit-identical on any partitioning or engine, and L∞ scaling converges
    to the same principal-eigenvector direction. Per-node sums carry
    ≤ degree terms whose association error sits far below the 6dp
    rounding, the same contract as pagerank.

    Scale shape per sweep: two node-keyed joins + one partial-combined
    agg + a 1-row broadcast for the max — the pagerank dataflow. Scores
    localCheckpoint per sweep so the plan stays one-sweep deep.
    Returns (v, hub, authority) rounded to 6dp.
    """
    e = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    ).localCheckpoint(eager=True)
    if nodes is None:
        nodes = (
            e.select(F.col("src").alias("v"))
            .union(e.select(F.col("dst").alias("v")))
            .distinct()
        )
    nodes = nodes.select("v").localCheckpoint(eager=True)

    def _norm(df: DataFrame) -> DataFrame:
        mx = df.agg(F.max("x").alias("_mx")).withColumn("_one", F.lit(1))
        return (
            df.withColumn("_one", F.lit(1))
            .join(F.broadcast(mx), "_one")
            .select("v", (F.col("x") / F.col("_mx")).alias("x"))
            .localCheckpoint(eager=True)
        )

    auth = nodes.select("v", F.lit(1.0).alias("x"))
    hub = None
    for _ in range(iters):
        hs = (
            e.join(auth, e["dst"] == auth["v"])
            .groupBy("src")
            .agg(F.sum("x").alias("s"))
        )
        hub = _norm(
            nodes.join(hs, nodes["v"] == hs["src"], "left").select(
                "v", F.coalesce(F.col("s"), F.lit(0.0)).alias("x")
            )
        )
        as_ = (
            e.join(hub, e["src"] == hub["v"])
            .groupBy("dst")
            .agg(F.sum("x").alias("s"))
        )
        auth = _norm(
            nodes.join(as_, nodes["v"] == as_["dst"], "left").select(
                "v", F.coalesce(F.col("s"), F.lit(0.0)).alias("x")
            )
        )
    return (
        hub.select("v", F.round("x", 6).alias("hub"))
        .join(auth.select("v", F.round("x", 6).alias("authority")), "v")
    )
