"""Embedding similarity search over an array<double> column.

Two paths:
  * brute_force_topk — exact cosine top-k against a broadcast query vector;
    the dot product is a JVM-side F.aggregate/F.zip_with fold (no Python).
  * lsh_bucketed   — sign-bit LSH over fixed dimensions (axis-aligned
    hyperplanes): bucket key = 8 sign bits; candidates searched only within
    the query's bucket (and optionally neighboring buckets). The scale path:
    the shuffle is by bucket, never all-pairs.
  * ivf_topk       — IVF-style: k-means-free variant using bucket centroids
    from the LSH partition as coarse cells; probes the closest cells only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F

LSH_DIMS = tuple(range(8))  # dimensions whose sign forms the bucket key


def _dot(col_a, col_b):
    """JVM-side dot product of two equal-length array<double> columns."""
    return F.aggregate(
        F.zip_with(col_a, col_b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(col):
    return F.sqrt(
        F.aggregate(col, F.lit(0.0), lambda acc, v: acc + v * v)
    )


def with_cosine(df: DataFrame, qvec: list[float],
                vec_col: str = "embedding") -> DataFrame:
    q = F.array(*[F.lit(float(x)) for x in qvec])
    cos = _dot(F.col(vec_col), q) / (
        _norm(F.col(vec_col)) * _norm(q)
    )
    return df.withColumn("cosine", F.round(cos, 4))


def brute_force_topk(df: DataFrame, qvec: list[float], k: int = 10,
                     vec_col: str = "embedding",
                     id_col: str = "vec_id") -> DataFrame:
    """Exact top-k by cosine (desc), tie-broken by id. orderBy+limit is a
    distributed TakeOrdered — only k rows per partition reach the driver."""
    return (
        with_cosine(df, qvec, vec_col)
        .select(id_col, "cosine")
        .orderBy(F.desc("cosine"), F.asc(id_col))
        .limit(k)
    )


def sign_bucket(vec_col, dims=LSH_DIMS):
    """Bucket id from the sign bits of fixed dimensions (deterministic,
    oracle-reproducible axis-aligned LSH)."""
    b = F.lit(0)
    for i, d in enumerate(dims):
        bit = (F.element_at(vec_col, d + 1) > 0).cast("int")
        b = b + bit * F.lit(2**i)
    return b


def with_sign_bucket(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    return df.withColumn("bucket", sign_bucket(F.col(vec_col)))


def lsh_bucketed_topk(df: DataFrame, qvec: list[float], k: int = 10,
                      vec_col: str = "embedding",
                      id_col: str = "vec_id") -> DataFrame:
    """ANN: search only the query's sign bucket. Recall < 1 by design; the
    exactness baseline is brute_force_topk (tests compare recall)."""
    qbucket = 0
    for i, d in enumerate(LSH_DIMS):
        if qvec[d] > 0:
            qbucket += 2**i
    cand = with_sign_bucket(df, vec_col).filter(F.col("bucket") == qbucket)
    return brute_force_topk(cand, qvec, k, vec_col, id_col)


def banded_sign_buckets(df: DataFrame, n_bands: int = 4, band_bits: int = 4,
                        vec_col: str = "embedding",
                        id_col: str = "vec_id") -> DataFrame:
    """(id, band, bucket) rows: one sign-bit bucket per band, bands over
    disjoint leading dimensions. The banded analogue of minhash LSH banding
    (textops.lsh_candidate_pairs) for dense embeddings: a near-dup pair
    collides in SOME band with high probability, so the candidate join
    shuffles by (band, bucket) — never all-pairs."""
    # all bands in ONE projection + explode (a union of per-band selects
    # would re-scan the source n_bands times)
    pairs = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                sign_bucket(
                    F.col(vec_col),
                    tuple(range(b * band_bits, (b + 1) * band_bits)),
                ).alias("bucket"),
            )
            for b in range(n_bands)
        ]
    )
    return df.select(F.col(id_col), F.explode(pairs).alias("_bb")).select(
        id_col,
        F.col("_bb.band").alias("band"),
        F.col("_bb.bucket").alias("bucket"),
    )


def embedding_near_dup(df: DataFrame, threshold: float = 0.35,
                       n_bands: int = 4, band_bits: int = 4,
                       vec_col: str = "embedding",
                       id_col: str = "vec_id") -> DataFrame:
    """Embedding-cosine near-duplicate pairs via banded sign-LSH.

    Candidates = distinct id pairs sharing any band bucket (equi-join on
    (band, bucket) — the shuffle key; at 10^10 rows this is the only join
    shape that avoids a quadratic exchange). Exact cosine (JVM fold) then
    keeps pairs >= threshold. Approximate by design: recall vs the
    brute-force all-pairs baseline is measured in tests; the oracle
    reproduces the SAME banded candidate generation."""
    b = banded_sign_buckets(df, n_bands, band_bits, vec_col, id_col)
    # user repartition on the join key: AQE's byte-based coalesce floor
    # would squeeze this CPU-dense self-join + cosine verify into 1-3
    # tasks (measured 5.2 s of CPU in 3 tasks at sf0.1 on 32 cores); the
    # explicit exchange is AQE-exempt and shared by both aliases
    # (ReusedExchange). See textops.ensure_width for the full argument.
    w = int(b.sparkSession.conf.get("spark.sql.shuffle.partitions", "32"))
    b = b.repartition(w, F.col("band"), F.col("bucket"))
    a = b.select(F.col(id_col).alias("id_a"), "band", "bucket")
    c = b.select(F.col(id_col).alias("id_b"), "band", "bucket")
    cand = (
        a.join(c, ["band", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .dropDuplicates(["id_a", "id_b"])
        .repartition(w, F.col("id_a"))  # verify-join width (cosine fold)
    )
    emb_d = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    ea = df.select(F.col(id_col).alias("id_a"), emb_d.alias("_ea"))
    eb = df.select(F.col(id_col).alias("id_b"), emb_d.alias("_eb"))
    j = cand.join(ea, "id_a").join(eb, "id_b")
    cos = _dot(F.col("_ea"), F.col("_eb")) / (
        _norm(F.col("_ea")) * _norm(F.col("_eb"))
    )
    return (
        j.withColumn("cosine", F.round(cos, 4))
        .filter(cos >= threshold)
        .select("id_a", "id_b", "cosine")
    )


def _quantized_centroids(d: DataFrame, key_col: str, emb_col: str = "_e",
                         quant: int = 1_000_000) -> DataFrame:
    """(key, centroid array<double>) per key — order-free exact mean.

    Components are quantized to integers before aggregation (integer sums
    are exact regardless of partitioning/order), then divided once; see
    label_centroid_cosine for the determinism rationale. Shared by the
    label-centroid and IVF cell builds."""
    dims = d.select(key_col, F.posexplode(emb_col).alias("dim", "v"))
    qv = F.round(F.col("v") * quant).cast("long")
    cent = dims.groupBy(key_col, "dim").agg(
        F.sum(qv).alias("s"), F.count("*").alias("n")
    )
    comp = F.col("s").cast("double") / (F.col("n") * F.lit(float(quant)))
    return (
        cent.select(key_col, "dim", comp.alias("c"))
        .groupBy(key_col)
        .agg(F.array_sort(F.collect_list(F.struct("dim", "c"))).alias("dc"))
        .select(
            key_col, F.transform("dc", lambda s: s["c"]).alias("centroid")
        )
    )


def ivf_topk(df: DataFrame, qvec: list[float], k: int = 10, nprobe: int = 4,
             vec_col: str = "embedding", id_col: str = "vec_id") -> DataFrame:
    """IVF-style ANN: coarse cells = sign buckets, cell centroids built with
    exact integer-quantized means (order-free, oracle-reproducible — see
    label_centroid_cosine), probe the `nprobe` cells whose centroids are
    closest to the query by cosine, exact search within probed cells only.

    Fully declarative — cell ranking is a broadcast-joined top-nprobe plan,
    no driver collect; at scale the scan reads only the probed cells
    (bucket is the partition column of a real IVF layout)."""
    d = with_sign_bucket(df, vec_col).withColumn(
        "_e", F.transform(F.col(vec_col), lambda x: x.cast("double"))
    )
    centroids = _quantized_centroids(d, "bucket")
    q = F.array(*[F.lit(float(x)) for x in qvec])
    # probe ranking is rounded to 6 dp before the top-nprobe cut: near-tied
    # cells must not flip the probe set on last-ulp float differences
    # between engines (the bucket tiebreak then decides deterministically)
    ccos = F.round(
        _dot(F.col("centroid"), q) / (_norm(F.col("centroid")) * _norm(q)), 6
    )
    probed = (
        centroids.withColumn("_ccos", ccos)
        .orderBy(F.desc("_ccos"), F.asc("bucket"))
        .limit(nprobe)
        .select("bucket")
    )
    cand = d.join(F.broadcast(probed), "bucket")
    cos = _dot(F.col("_e"), q) / (_norm(F.col("_e")) * _norm(q))
    return (
        cand.withColumn("cosine", F.round(cos, 4))
        .select(id_col, F.col("bucket").cast("long").alias("bucket"), "cosine")
        .orderBy(F.desc("cosine"), F.asc(id_col))
        .limit(k)
    )


def _cell_cosines(cents: list[list[float]]):
    """Column: array of 6-dp-rounded cosines of `_e` vs each centroid.
    Zero-norm guards: a degenerate vector/centroid scores -2 (below any
    real cosine) instead of poisoning the argmax with nulls."""
    cols = []
    for c in cents:
        cv = F.array(*[F.lit(float(x)) for x in c])
        cos = _dot(F.col("_e"), cv) / (_norm(F.col("_e")) * _norm(cv))
        cols.append(F.coalesce(F.round(cos, 6), F.lit(-2.0)))
    return F.array(*cols)


# above this many centroids, assignment switches from the fused literal
# expression (zero-shuffle, but the generated code embeds k_cells x dim
# literals — Janino compile time explodes past ~10^4 literals) to a
# broadcast-join + partial-combined argmax aggregation
ASSIGN_JOIN_THRESHOLD = 64


def assign_cells(
    d: DataFrame, cents: list[list[float]], id_col: str | None = None
) -> DataFrame:
    """`cell` = argmax cosine over the centroid list (6-dp-rounded, ties ->
    smallest cell id) — deterministic for any partitioning. ``d`` must
    carry `_e` (array<double>).

    Two physical paths with IDENTICAL semantics (A/B-tested):
    - <= ASSIGN_JOIN_THRESHOLD centroids (or no ``id_col``): one fused
      JVM expression over a literal centroid array — no shuffle at all.
    - larger centroid sets (SemDeDup sizes cells to the corpus): the
      centroid table rides a broadcast, each vector meets every centroid
      in a map-side crossJoin, and a partial-combined max_by over
      (rounded cosine, -cell) picks the argmax — generated code stays
      O(1) in k_cells. Requires ``id_col`` as the unique rejoin key.
    """
    if id_col is None or len(cents) <= ASSIGN_JOIN_THRESHOLD:
        arr = _cell_cosines(cents)
        return d.withColumn(
            "cell",
            (F.array_position(arr, F.array_max(arr)) - 1).cast("int"),
        )
    spark = d.sparkSession
    # one-slice parallelize: the default createDataFrame would pickle the
    # k rows over default-parallelism slices, paying ~32 empty
    # Python-worker round-trips per evaluation (same pathology as
    # engine.round_params, round-5 census)
    centroids = spark.createDataFrame(
        spark.sparkContext.parallelize(
            [(i, list(map(float, c))) for i, c in enumerate(cents)], 1
        ),
        "cell int, centroid array<double>",
    )
    cos = F.coalesce(
        F.round(
            _dot(F.col("_e"), F.col("centroid"))
            / (_norm(F.col("_e")) * _norm(F.col("centroid"))),
            6,
        ),
        F.lit(-2.0),
    )
    pick = (
        d.select(id_col, "_e")
        .join(F.broadcast(centroids))
        .groupBy(id_col)
        .agg(
            F.max_by(
                "cell",
                F.struct(cos.alias("c"), (-F.col("cell")).alias("nc")),
            ).alias("cell")
        )
    )
    return d.join(pick, id_col)


def kmeans_cells(df: DataFrame, k_cells: int = 32, iters: int = 4,
                 vec_col: str = "embedding", id_col: str = "vec_id",
                 quant: int = 1_000_000,
                 sample_frac: float | None = None) -> list[list[float]]:
    """Deterministic distributed k-means for IVF coarse cells.

    Every step is order/partitioning-free: init = the vectors with the
    k_cells smallest ids (fixed, seed-independent); assignment = rounded-
    cosine argmax with smallest-cell tie-break (assign_cells); update =
    integer-quantized exact means (_quantized_centroids — the same
    determinism trick as label_centroid_cosine); empty cells keep their
    previous centroid. Fixed ``iters`` sweeps, no convergence check — so
    two runs (or two cluster sizes) produce bit-identical centroids.

    The projected (id, _e) frame is persisted for the loop's duration
    (and unpersisted before returning), so the init pick + ``iters``
    assignment sweeps cost ONE source scan, not iters+1 — round-4
    VERDICT task #5; measured in bench/profile_embed_scale.py via
    filesystem read-byte counters. Only the k_cells x dim centroid
    table ever reaches the driver.

    ``sample_frac`` trains on a deterministic hash sample of the
    vectors (pmod(xxhash64(id), 2^20) < frac*2^20) — the corpus-scale
    knob: at 100 TB nothing about centroid quality needs every vector,
    and the sample is a pure function of the ids, so two runs or two
    cluster sizes still produce bit-identical centroids. Off (None) by
    default: every oracle-verified query trains on the full table."""
    d = df.select(
        id_col,
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("_e"),
    )
    if sample_frac is not None:
        m = 1 << 20
        d = d.filter(
            F.pmod(F.xxhash64(F.col(id_col)), F.lit(m))
            < F.lit(int(sample_frac * m))
        )
    d = d.persist()
    try:
        init = d.orderBy(id_col).limit(k_cells).collect()
        cents = [list(r["_e"]) for r in init]
        for _ in range(iters):
            assigned = assign_cells(d, cents, id_col=id_col)
            got = {
                r["cell"]: list(r["centroid"])
                for r in _quantized_centroids(
                    assigned, "cell", quant=quant
                ).collect()
            }
            cents = [got.get(i, cents[i]) for i in range(len(cents))]
    finally:
        d.unpersist()
    return cents


def ivf_topk_kmeans(df: DataFrame, qvec: list[float], k: int = 10,
                    nprobe: int = 4, k_cells: int = 32, iters: int = 4,
                    vec_col: str = "embedding", id_col: str = "vec_id",
                    sample_frac: float | None = None) -> DataFrame:
    """IVF ANN over TRAINED cells (kmeans_cells) instead of sign buckets:
    same probe shape as ivf_topk — rank cells by 6-dp-rounded centroid
    cosine, search the top-nprobe cells exactly. Trained centroids adapt
    to the data distribution, so recall per probed row beats the
    data-oblivious sign buckets (measured in tests/test_textops_ann.py).

    At scale: training is kmeans_cells' fixed number of scans; the final
    assignment becomes the partition column of the IVF layout, so the
    query-time scan reads only the probed cells."""
    cents = kmeans_cells(df, k_cells, iters, vec_col, id_col,
                         sample_frac=sample_frac)
    d = df.withColumn(
        "_e", F.transform(F.col(vec_col), lambda x: x.cast("double"))
    )
    d = assign_cells(d, cents, id_col=id_col)
    spark = df.sparkSession
    # one-slice parallelize: the default createDataFrame would pickle the
    # k rows over default-parallelism slices, paying ~32 empty
    # Python-worker round-trips per evaluation (same pathology as
    # engine.round_params, round-5 census)
    centroids = spark.createDataFrame(
        spark.sparkContext.parallelize(
            [(i, list(map(float, c))) for i, c in enumerate(cents)], 1
        ),
        "cell int, centroid array<double>",
    )
    q = F.array(*[F.lit(float(x)) for x in qvec])
    ccos = F.round(
        _dot(F.col("centroid"), q) / (_norm(F.col("centroid")) * _norm(q)), 6
    )
    probed = (
        centroids.withColumn("_ccos", F.coalesce(ccos, F.lit(-2.0)))
        .orderBy(F.desc("_ccos"), F.asc("cell"))
        .limit(nprobe)
        .select("cell")
    )
    cand = d.join(F.broadcast(probed), "cell")
    cos = _dot(F.col("_e"), q) / (_norm(F.col("_e")) * _norm(q))
    return (
        cand.withColumn("cosine", F.round(cos, 4))
        .select(id_col, F.col("cell").cast("long").alias("cell"), "cosine")
        .orderBy(F.desc("cosine"), F.asc(id_col))
        .limit(k)
    )


def label_centroid_cosine(df: DataFrame,
                          vec_col: str = "embedding",
                          id_col: str = "vec_id",
                          quant: int = 1_000_000) -> DataFrame:
    """Deterministic per-label centroid cosine.

    Float means are summation-order-dependent, so a naive centroid differs
    across partitionings/engines. Components are quantized to integers
    (round(v * quant)) before aggregation: integer sums are exact and
    order-free, and centroid = s / (n * quant) is then a single double
    division — bit-identical everywhere, hence oracle-verifiable. The
    quantization error (<= 0.5/quant per component) is far below the 4-dp
    output rounding."""
    emb_d = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    d = df.withColumn("_e", emb_d)
    centroids = _quantized_centroids(d, "label", quant=quant)
    j = d.join(F.broadcast(centroids), "label")
    cos = _dot(F.col("_e"), F.col("centroid")) / (
        _norm(F.col("_e")) * _norm(F.col("centroid"))
    )
    return j.select(
        id_col, "label", F.round(cos, 4).alias("centroid_cosine")
    )


def pairwise_topk_per_label(df: DataFrame, k: int = 5,
                            vec_col: str = "embedding",
                            id_col: str = "vec_id") -> DataFrame:
    """Per-label centroid similarity: mean vector per label (JVM agg via
    posexplode + groupBy), then each vector's cosine to its label centroid.
    Demonstrates the aggregate-then-broadcast pattern for IVF cell builds."""
    dims = df.select(
        F.col(id_col), F.col("label"),
        F.posexplode(F.col(vec_col)).alias("dim", "v"),
    )
    cent = dims.groupBy("label", "dim").agg(F.avg("v").alias("c"))
    centroids = cent.groupBy("label").agg(
        F.array_sort(
            F.collect_list(F.struct("dim", "c"))
        ).alias("dc")
    ).select(
        "label", F.transform("dc", lambda s: s["c"]).alias("centroid")
    )
    j = df.join(F.broadcast(centroids), "label")
    cos = _dot(F.col(vec_col), F.col("centroid")) / (
        _norm(F.col(vec_col)) * _norm(F.col("centroid"))
    )
    return j.select(
        id_col, "label", F.round(cos, 4).alias("centroid_cosine")
    )


def semantic_dedup(df: DataFrame, threshold: float = 0.5,
                   k_cells: int = 32, iters: int = 4,
                   vec_col: str = "embedding", id_col: str = "vec_id",
                   sample_frac: float | None = None) -> DataFrame:
    """SemDeDup (Abbas et al. 2023): semantic near-duplicate removal by
    clustering embeddings (kmeans_cells — deterministic k-means) and
    dropping, WITHIN each cluster, every vector that has a smaller-id
    neighbor with cosine >= threshold. The min-id convention replaces the
    paper's keep-farthest-from-centroid pick so the kept set is a pure
    deterministic function of the data (and SQL-expressible; the oracle
    replays the unrolled training + the same pair rule).

    Scale shape: the pairwise test runs only WITHIN a cell — the shuffle
    keys on the cell id, never all-pairs across the corpus, and per-cell
    work is bounded by sizing k_cells to the corpus (the paper's setup:
    cluster count grows with N so cluster size stays manageable). Returns
    one row per input vector: (vec_id, cell, is_kept)."""
    cents = kmeans_cells(df, k_cells, iters, vec_col, id_col,
                         sample_frac=sample_frac)
    d = df.select(
        F.col(id_col).alias("vec_id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("_e"),
    )
    d = assign_cells(d, cents, id_col="vec_id")
    w = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32"))
    d = d.repartition(w, F.col("cell"))
    a = d.select(F.col("vec_id").alias("id_a"), F.col("_e").alias("_ea"),
                 "cell")
    b = d.select(F.col("vec_id").alias("id_b"), F.col("_e").alias("_eb"),
                 "cell")
    cos = F.round(
        _dot(F.col("_ea"), F.col("_eb"))
        / (_norm(F.col("_ea")) * _norm(F.col("_eb"))),
        6,
    )
    dropped = (
        a.join(b, "cell")
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(cos >= threshold)
        .select(F.col("id_b").alias("vec_id"))
        .distinct()
        .withColumn("_dup", F.lit(True))
    )
    return (
        d.select("vec_id", F.col("cell").cast("long").alias("cell"))
        .join(dropped, "vec_id", "left")
        .select(
            "vec_id",
            "cell",
            (~F.coalesce(F.col("_dup"), F.lit(False))).alias("is_kept"),
        )
    )


def ann_join_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    nprobe: int = 2,
    k_cells: int = 32,
    iters: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    sample_frac: float | None = None,
) -> DataFrame:
    """Batch ANN join: top-k corpus neighbors for EVERY query vector — the
    retrieval shape real pipelines run (dedup-against-index, RAG corpus
    lookup), vs the single-vector probes (ivf_topk*). IVF with trained
    k-means cells: queries rank the shared centroid table (broadcast,
    k_cells rows) and probe their top-``nprobe`` cells; candidates join on
    the cell id and verify exactly.

    Scale shape: the only corpus-sized shuffle keys on the cell id; the
    per-query cell ranking and the final top-k are windows PARTITIONED BY
    the query id (keyed — never a global sort); the centroid table rides a
    broadcast. Works for |Q| from 1 to corpus-sized. Determinism: cell
    ranking and cosines round to 6 dp with id tie-breaks, so the result
    set is engine-exact (oracle replays the unrolled training + the same
    probe/top-k rules).

    Returns (query_id, vec_id, cosine, rank) with rank 1..k per query.
    """
    cents = kmeans_cells(corpus, k_cells, iters, vec_col, id_col,
                         sample_frac=sample_frac)
    d = corpus.select(
        F.col(id_col).alias("vec_id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("_e"),
    )
    d = assign_cells(d, cents, id_col="vec_id")
    spark = corpus.sparkSession
    # one-slice parallelize: the default createDataFrame would pickle the
    # k rows over default-parallelism slices, paying ~32 empty
    # Python-worker round-trips per evaluation (same pathology as
    # engine.round_params, round-5 census)
    centroids = spark.createDataFrame(
        spark.sparkContext.parallelize(
            [(i, list(map(float, c))) for i, c in enumerate(cents)], 1
        ),
        "cell int, centroid array<double>",
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("_qe"),
    )
    ccos = F.coalesce(
        F.round(
            _dot(F.col("_qe"), F.col("centroid"))
            / (_norm(F.col("_qe")) * _norm(F.col("centroid"))),
            6,
        ),
        F.lit(-2.0),
    )
    wq = W.partitionBy("query_id")
    probes = (
        q.join(F.broadcast(centroids))
        .withColumn("_ccos", ccos)
        .withColumn(
            "_rn",
            F.row_number().over(wq.orderBy(F.desc("_ccos"), F.asc("cell"))),
        )
        .filter(F.col("_rn") <= nprobe)
        .select("query_id", "_qe", "cell")
    )
    cos = F.round(
        _dot(F.col("_qe"), F.col("_e"))
        / (_norm(F.col("_qe")) * _norm(F.col("_e"))),
        6,
    )
    return (
        probes.join(d, "cell")
        .withColumn("cosine", cos)
        .withColumn(
            "rank",
            F.row_number().over(
                wq.orderBy(F.desc("cosine"), F.asc("vec_id"))
            ),
        )
        .filter(F.col("rank") <= k)
        .select(
            "query_id", "vec_id", "cosine",
            F.col("rank").cast("long").alias("rank"),
        )
    )
