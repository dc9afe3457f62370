"""Training-data text operators over a documents table (doc_id, text, ...).

The large-scale-pipeline ops a crawl corpus feeds: deduplication families,
language ID, quality scoring, token counting, fingerprinting. All built on
JVM-side column functions wherever possible; Python appears only in
Arrow-batched pandas UDFs (simhash/minhash bit-mixing).

Dedup hierarchy (cheapest first — the order a 100 TB pipeline runs them):
  1. exact          md5(text) group-by                        (shuffle on hash)
  2. simhash        64-bit near-dup signature, hamming buckets (no pairwise)
  3. minhash + LSH  shingle -> minhash sig -> band buckets -> candidate pairs
                    (pairwise work only WITHIN buckets)
  4. n-gram jaccard exact verify of candidate pairs
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window as W, functions as F, types as T
from pyspark.sql.functions import pandas_udf

def ensure_width(df: DataFrame, *cols: str) -> DataFrame:
    """Spread a CPU-dense transform or self-join across the session's full
    shuffle width when the incoming plan is narrower.

    Two narrow-plan sources this corrects:
    - single-file local scans (one parquet file under maxPartitionBytes
      -> a 1-task stage, serializing per-row shingle/signature compute);
    - AQE post-shuffle coalescing, whose 1 MB minPartitionSize floor is
      calibrated for IO-bound stages and squeezes byte-small but CPU-dense
      pair-verification exchanges into 1-3 tasks (measured: the sf0.1
      embedding verify ran 5.2 s of CPU in 3 tasks on a 32-core session).

    An explicit repartition is exempt from AQE coalescing, and aliasing
    the repartitioned frame on both sides of a self-join makes the second
    branch a ReusedExchange (the signature pass computes once, not per
    branch). At design scale scans and exchanges are already wide, the
    partition-count check short-circuits, and this is a no-op.
    """
    if df.isStreaming:
        # no static partition count to inspect (.rdd is illegal on a
        # stream), and micro-batch width is the source's planning concern
        return df
    spark = df.sparkSession
    w = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    if df.rdd.getNumPartitions() >= w:
        return df
    return df.repartition(w, *[F.col(c) for c in cols]) if cols \
        else df.repartition(w)


# ---------------------------------------------------------------------------
# exact dedup (P1 at corpus scale)
# ---------------------------------------------------------------------------


def exact_dup_groups(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Group byte-identical docs by md5; one row per group.

    md5 (not xxhash64) so external systems (DuckDB oracle) reproduce it.
    Map-side partial agg collapses dups before the shuffle.
    """
    return (
        docs.withColumn("content_md5", F.md5(F.col(text_col)))
        .groupBy("content_md5")
        .agg(
            F.count("*").alias("n_docs"),
            F.min("doc_id").alias("keep_doc_id"),
        )
    )


def dedup_exact(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Keep the min-doc_id representative of every exact-duplicate class."""
    w = W.partitionBy(F.md5(F.col(text_col))).orderBy("doc_id")
    return (
        docs.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


# ---------------------------------------------------------------------------
# tokenization / shingles (shared)
# ---------------------------------------------------------------------------


def with_tokens(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace tokens, JVM-side."""
    return docs.withColumn(
        "tokens",
        F.split(F.trim(F.col(text_col)), r"\s+"),
    )


def with_shingles(docs: DataFrame, n: int = 3,
                  text_col: str = "text") -> DataFrame:
    """Word n-gram shingles as strings, JVM-side (transform over token
    index range — no Python)."""
    d = with_tokens(docs, text_col)
    toks = F.col("tokens")
    count = F.greatest(F.size(toks) - F.lit(n - 1), F.lit(0))
    shingles = F.transform(
        F.sequence(F.lit(0), count - 1),
        lambda i: F.concat_ws(
            " ", *[F.element_at(toks, (i + j + 1).cast("int")) for j in range(n)]
        ),
    )
    return d.withColumn(
        "shingles",
        F.when(count > 0, shingles).otherwise(
            F.array().cast(T.ArrayType(T.StringType()))
        ),
    )


# ---------------------------------------------------------------------------
# MinHash + LSH (near-dup at scale: no all-pairs shuffle)
# ---------------------------------------------------------------------------


def minhash_signatures(docs: DataFrame, n_hashes: int = 16, shingle_n: int = 3,
                       text_col: str = "text",
                       hash_fn: str = "xxhash64") -> DataFrame:
    """doc -> array of n_hashes minhash values.

    Permutation k is keyed by salting the shingle: min(hash(k || s)).
    Entirely JVM-side: transform + aggregate over the shingle array.
    hash_fn: 'xxhash64' (engine default, fastest) or 'md5' (hex-string
    minima — reproducible by external oracles like DuckDB).
    """
    d = with_shingles(ensure_width(docs), shingle_n, text_col)
    hf = F.xxhash64 if hash_fn == "xxhash64" else F.md5

    def _salted(k: int):
        # single-arg lambda: a 2-arg lambda would receive the element INDEX
        # as its second argument from F.transform and shadow k
        return lambda s: hf(F.concat(F.lit(f"{k}:"), s))

    sig = F.array(
        *[
            F.array_min(F.transform(F.col("shingles"), _salted(k)))
            for k in range(n_hashes)
        ]
    )
    return d.withColumn("minhash", sig).drop("tokens", "shingles")


def band_buckets(
    docs: DataFrame,
    n_hashes: int = 16,
    bands: int = 4,
    shingle_n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    hash_fn: str = "xxhash64",
    extra_cols: tuple[str, ...] = (),
) -> DataFrame:
    """(id, band, bucket [, extra_cols]) LSH band keys per document.

    Each signature splits into ``bands`` bands of n_hashes/bands rows; a
    band's key is the hash of its joined values. Everything here is a
    per-row JVM expression (shingle transform -> salted minima -> band
    hash -> posexplode) — NO aggregation, so the projection applies to
    batch AND streaming frames alike; docs with no shingles emit no rows.
    """
    rows = n_hashes // bands
    hf = F.xxhash64 if hash_fn == "xxhash64" else F.md5
    sig = minhash_signatures(docs, n_hashes, shingle_n, text_col, hash_fn)
    sig = sig.filter(F.element_at("minhash", 1).isNotNull())
    return sig.select(
        F.col(id_col).alias("id"),
        *[F.col(c) for c in extra_cols],
        F.posexplode(
            F.array(
                *[
                    hf(
                        F.concat_ws(
                            ",",
                            *[
                                F.element_at("minhash", b * rows + j + 1)
                                for j in range(rows)
                            ],
                        )
                    )
                    for b in range(bands)
                ]
            )
        ).alias("band", "bucket"),
    )


def lsh_candidate_pairs(
    docs: DataFrame,
    n_hashes: int = 16,
    bands: int = 4,
    shingle_n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Banded-LSH candidate pairs: docs sharing any band bucket.

    Each signature splits into ``bands`` bands of n_hashes/bands rows; a
    band's bucket key is the hash of its values; pairs form by self-join
    WITHIN (band, bucket) — the shuffle key is the bucket, never all-pairs.
    hash_fn as in minhash_signatures; docs with no shingles never pair.
    """
    banded = band_buckets(
        docs, n_hashes, bands, shingle_n, text_col, id_col, hash_fn
    )
    a, b = banded.alias("a"), banded.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("doc_a"), F.col("b.id").alias("doc_b")
        )
        .distinct()
    )
    return pairs


def jaccard_pairs(
    docs: DataFrame,
    threshold: float = 0.5,
    shingle_n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    candidates: DataFrame | None = None,
    block_col: str | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard over candidate pairs (or all pairs sharing ≥1
    shingle if no candidates given — the token-inverted-index join).

    ``block_col`` optionally restricts pairs to the same block (e.g. same
    source/shard) — the standard way to bound the inverted-index join when
    the vocabulary is small relative to the corpus.
    Returns (doc_a, doc_b, jaccard) with jaccard rounded to 6dp.

    Scale strategy (PPJoin-style prefix filtering): two docs with
    Jaccard >= t must share a shingle among the first
    ``n - ceil(t*n) + 1`` of their shingles under ANY fixed global total
    order. We order by xxhash64(shingle) INSIDE the array (array_sort +
    slice — no frequency pass, no window, no shuffle to build prefixes)
    and join on the hash itself; hash collisions only add candidates,
    which the exact array_intersect verification then discards, so the
    output is identical to the naive inverted-index join. (A
    frequency-ascending order would prune hot shingles harder at the cost
    of a global frequency join; on measured corpora the hash order's
    plan — one fewer shuffle over the full index — is faster.)
    """
    cols = [F.col(id_col).alias("id"),
            F.array_distinct("shingles").alias("sh"),
            F.size(F.array_distinct("shingles")).alias("n_sh")]
    if block_col:
        cols.append(F.col(block_col).alias("blk"))
    # widen the shingle compute itself (narrow local scans serialize it)
    sh = with_shingles(
        ensure_width(docs, id_col), shingle_n, text_col
    ).select(*cols)
    blk = ["blk"] if block_col else []

    prefix_len = (
        F.col("n_sh")
        - F.ceil(F.lit(threshold) * F.col("n_sh"))
        + 1
    ).cast("int")
    prefix = sh.select(
        "id", "n_sh", *blk,
        F.posexplode(
            F.slice(
                F.array_sort(F.transform("sh", lambda s: F.xxhash64(s))),
                F.lit(1), F.greatest(prefix_len, F.lit(0)),
            )
        ).alias("pos", "shingle"),
    )

    # user repartition on the join key: AQE-exempt (the 1 MB coalesce floor
    # would squeeze this byte-small, CPU-dense self-join into one task) and
    # shared by both aliases -> the b branch is a ReusedExchange
    w = int(prefix.sparkSession.conf.get("spark.sql.shuffle.partitions",
                                         "32"))
    prefix = prefix.repartition(w, F.col("shingle"))
    a, b = prefix.alias("a"), prefix.alias("b")
    cond = (F.col("a.shingle") == F.col("b.shingle")) & (
        F.col("a.id") < F.col("b.id")
    )
    if block_col:
        cond = cond & (F.col("a.blk") == F.col("b.blk"))
    # length filter: jaccard <= min(na,nb)/max(na,nb), so mismatched sizes
    # can't reach the threshold — prune before the verify join
    cond = cond & (
        F.least(F.col("a.n_sh"), F.col("b.n_sh"))
        >= F.lit(threshold) * F.greatest(F.col("a.n_sh"), F.col("b.n_sh"))
    )
    # positional filter (PPJoin): tokens at 0-based prefix positions
    # (pa, pb) leave at most min(na-pa, nb-pb) shared tokens from here on.
    # jaccard >= t  <=>  overlap >= t/(1+t)*(na+nb), and a qualifying
    # pair's FIRST shared prefix token sees ALL its overlap ahead of it,
    # so at least one join row always survives — conservative, exact.
    cond = cond & (
        F.least(
            F.col("a.n_sh") - F.col("a.pos"),
            F.col("b.n_sh") - F.col("b.pos"),
        )
        >= F.lit(threshold / (1.0 + threshold))
        * (F.col("a.n_sh") + F.col("b.n_sh"))
    )
    cand = (
        a.join(b, cond)
        .select(F.col("a.id").alias("doc_a"), F.col("b.id").alias("doc_b"))
        .distinct()
    )
    if candidates is not None:
        cand = cand.join(candidates, ["doc_a", "doc_b"], "left_semi")
    # pin the verify join's width too: array_intersect over fat shingle
    # arrays is the CPU-dense step the coalesce floor otherwise serializes
    cand = cand.repartition(w, F.col("doc_a"))

    sa = sh.select(
        F.col("id").alias("doc_a"), F.col("sh").alias("sh_a"),
        F.col("n_sh").alias("na"),
    )
    sb = sh.select(
        F.col("id").alias("doc_b"), F.col("sh").alias("sh_b"),
        F.col("n_sh").alias("nb"),
    )
    pairs = cand.join(sa, "doc_a").join(sb, "doc_b").withColumn(
        "inter", F.size(F.array_intersect("sh_a", "sh_b"))
    )
    jac = pairs.withColumn(
        "jaccard",
        F.round(
            F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter")), 6
        ),
    )
    return jac.filter(F.col("jaccard") >= threshold).select(
        "doc_a", "doc_b", "jaccard"
    )


# ---------------------------------------------------------------------------
# SimHash (Charikar) — 64-bit near-dup signatures
# ---------------------------------------------------------------------------


# token -> ±1 bit-vector memo. Tokens are Zipfian in any real (or
# synthetic) corpus, so the md5+unpack work amortizes to ~once per
# vocabulary word per executor. Pure function of the token; capped.
_SIMHASH_TOK_CACHE: dict[str, np.ndarray] = {}
_SIMHASH_CACHE_CAP = 1 << 20
_POW2 = (np.uint64(1) << np.arange(64, dtype=np.uint64))


def _tok_vec(tok: str) -> np.ndarray:
    v = _SIMHASH_TOK_CACHE.get(tok)
    if v is None:
        h = struct.unpack(
            "<Q", hashlib.md5(tok.encode("utf-8")).digest()[:8]
        )[0]
        bits = (np.uint64(h) >> np.arange(64, dtype=np.uint64)) & np.uint64(1)
        v = np.where(bits.astype(bool), 1, -1).astype(np.int32)
        if len(_SIMHASH_TOK_CACHE) < _SIMHASH_CACHE_CAP:
            _SIMHASH_TOK_CACHE[tok] = v
    return v


def _simhash_batch(texts: pd.Series) -> pd.Series:
    from collections import Counter

    out = np.zeros(len(texts), dtype=np.int64)
    for i, t in enumerate(texts):
        if not t:
            continue
        acc = np.zeros(64, dtype=np.int64)
        # multiplicity-weighted sum == summing per token occurrence
        for tok, c in Counter(t.split()).items():
            acc += c * _tok_vec(tok)
        out[i] = ((acc > 0).astype(np.uint64) * _POW2).sum().astype(np.int64)
    return pd.Series(out)


@pandas_udf(T.LongType())
def simhash_udf(text: pd.Series) -> pd.Series:
    return _simhash_batch(text)


def simhash_near_dups(docs: DataFrame, max_hamming: int = 3,
                      text_col: str = "text",
                      id_col: str = "doc_id",
                      block_col: str | None = None) -> DataFrame:
    """Near-dup pairs by simhash hamming distance, blocked on 16-bit chunks:
    two sigs within hamming d<=3 share at least one of 4 exact 16-bit chunks
    (pigeonhole), so the join key is (chunk_idx, chunk_value) — no all-pairs.
    ``block_col`` adds a same-block restriction for low-entropy corpora."""
    cols = [F.col(id_col).alias("id"), simhash_udf(F.col(text_col)).alias("sig")]
    if block_col:
        cols.append(F.col(block_col).alias("blk"))
    # widen the Arrow simhash pass (narrow local scans serialize it)
    sig = ensure_width(docs, id_col).select(*cols)
    chunk_cols = ["id", "sig"] + (["blk"] if block_col else [])
    chunks = sig.select(
        *chunk_cols,
        F.posexplode(
            F.array(
                *[
                    F.shiftright(F.col("sig"), k * 16).bitwiseAND(F.lit(0xFFFF))
                    for k in range(4)
                ]
            )
        ).alias("chunk_idx", "chunk_val"),
    )
    # user repartition on the join key (AQE-exempt; see jaccard_pairs) —
    # AND the one exchange both aliases share, so the simhash UDF runs
    # ONCE instead of once per self-join branch (ReusedExchange)
    w = int(chunks.sparkSession.conf.get("spark.sql.shuffle.partitions",
                                         "32"))
    chunks = chunks.repartition(w, F.col("chunk_idx"), F.col("chunk_val"))
    a, b = chunks.alias("a"), chunks.alias("b")
    cond = (
        (F.col("a.chunk_idx") == F.col("b.chunk_idx"))
        & (F.col("a.chunk_val") == F.col("b.chunk_val"))
        & (F.col("a.id") < F.col("b.id"))
    )
    if block_col:
        cond = cond & (F.col("a.blk") == F.col("b.blk"))
    cand = (
        a.join(b, cond)
        .select(
            F.col("a.id").alias("doc_a"),
            F.col("b.id").alias("doc_b"),
            F.col("a.sig").alias("sig_a"),
            F.col("b.sig").alias("sig_b"),
        )
        .distinct()
    )
    ham = cand.withColumn(
        "hamming", F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b")))
    )
    return ham.filter(F.col("hamming") <= max_hamming).select(
        "doc_a", "doc_b", "hamming"
    )


# ---------------------------------------------------------------------------
# language ID / quality / tokens / fingerprint
# ---------------------------------------------------------------------------

EN_STOPWORDS = (
    "the a an and or of to in is are was were be been it this that "
    "with for on as at by from not but"
).split()


def with_lang_id(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic language ID: stopword-hit ratio (the batch analogue of the
    reference's Tika LanguageIdentifier gate, DocumentParserBolt.java:182-194).
    JVM-side: filter over the token array against a literal stopword set."""
    d = with_tokens(docs, text_col)
    hits = F.size(
        F.filter(
            F.col("tokens"),
            lambda t: F.lower(t).isin([*EN_STOPWORDS]),
        )
    )
    ratio = F.round(
        hits / F.greatest(F.size("tokens"), F.lit(1)).cast("double"), 6
    )
    return d.withColumn("stopword_ratio", ratio).withColumn(
        "lang_guess",
        F.when(ratio >= 0.05, F.lit("en")).otherwise(F.lit("other")),
    )


def with_quality(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Length / punctuation / mean-token-length quality features + score."""
    d = with_tokens(docs, text_col)
    t = F.col(text_col)
    n_chars = F.length(t)
    n_tokens = F.size("tokens")
    n_punct = n_chars - F.length(F.regexp_replace(t, r"[^\w\s]", ""))
    mean_tok = F.round(
        (n_chars - n_tokens + 1) / F.greatest(n_tokens, F.lit(1)).cast("double"),
        6,
    )
    punct_ratio = F.round(
        n_punct / F.greatest(n_chars, F.lit(1)).cast("double"), 6
    )
    score = F.round(
        F.least(n_tokens / F.lit(100.0), F.lit(1.0)) * (1 - punct_ratio), 6
    )
    return (
        d.withColumn("n_chars_calc", n_chars)
        .withColumn("n_tokens", n_tokens)
        .withColumn("punct_ratio", punct_ratio)
        .withColumn("mean_token_len", mean_tok)
        .withColumn("quality_score", score)
    )


def with_fingerprint(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Normalized document fingerprint: md5 of lowercased
    whitespace-collapsed text (oracle-reproducible)."""
    norm = F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " ")
    return docs.withColumn("fingerprint", F.md5(norm))


def rep_metrics(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Gopher-style intra-document repetition signals:

    - dup_token_ratio: 1 - distinct_tokens / tokens (0 = no repeats)
    - top_bigram_share: occurrences of the most frequent bigram / bigrams
      (0 for docs with < 2 tokens)

    The ratios are pure array functions (no shuffle). The bigram mode needs
    a per-doc frequency table; rather than an O(n^2) per-row array scan, it
    explodes to (doc, bigram) and double-aggregates — both groupBys partial-
    combine map-side and shuffle only (id, bigram)-sized rows, so the shape
    holds when docs are MB-long and the corpus is 100 TB.
    """
    t = docs.select(
        F.col(id_col), F.split(F.trim(F.col(text_col)), r"\s+").alias("toks")
    )
    base = t.select(
        id_col,
        F.size("toks").alias("n_tokens"),
        F.size(F.array_distinct("toks")).alias("n_distinct"),
        "toks",
    )
    bigrams = base.filter(F.col("n_tokens") >= 2).select(
        id_col,
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.size("toks") - 2),
                lambda i: F.concat(
                    F.element_at("toks", i + 1),
                    F.lit(" "),
                    F.element_at("toks", i + 2),
                ),
            )
        ).alias("bg"),
    )
    agg = (
        bigrams.groupBy(id_col, "bg")
        .agg(F.count("*").alias("c"))
        .groupBy(id_col)
        .agg(F.max("c").alias("_top"), F.sum("c").alias("_nbg"))
    )
    return base.join(agg, id_col, "left").select(
        id_col,
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.round(
            1
            - F.col("n_distinct").cast("double")
            / F.greatest(F.col("n_tokens"), F.lit(1)),
            6,
        ).alias("dup_token_ratio"),
        F.round(
            F.coalesce(
                F.col("_top").cast("double") / F.col("_nbg"), F.lit(0.0)
            ),
            6,
        ).alias("top_bigram_share"),
    )


def boilerplate_ngrams(
    docs: DataFrame,
    n: int = 2,
    min_docs: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    block_col: str = "source",
) -> DataFrame:
    """Cross-document boilerplate detection — C4/RefinedWeb line-dedup
    generalized to token n-grams (the right unit for single-line corpora;
    on multi-line webtext pass the line array through the same shape): an
    n-gram is boilerplate within a block (source / host) when it occurs in
    >= ``min_docs`` DISTINCT documents of that block. Returns per doc
    (doc_id, n_grams, n_boiler, boiler_frac) over the doc's DISTINCT
    n-grams.

    Scale shape: per-doc distinct n-grams -> explode -> count per
    (block, gram). The per-doc array_distinct makes a plain COUNT(*) equal
    COUNT(DISTINCT doc) — no distinct aggregation — and the count
    partial-combines map-side. Flagged grams rejoin docs with a semi-join
    keyed (block, gram), then a per-doc count: every shuffle keys on
    (block, gram) or doc_id, nothing is all-pairs, so the op holds at
    corpus scale where boilerplate removal normally runs (trillions of
    grams, billions of docs).
    """
    sh = with_shingles(docs, n, text_col).select(
        F.col(id_col).alias("doc_id"),
        F.col(block_col).alias("blk"),
        F.array_distinct("shingles").alias("grams"),
    )
    g = sh.select("doc_id", "blk", F.explode("grams").alias("gram"))
    boiler = (
        g.groupBy("blk", "gram")
        .agg(F.count("*").alias("nd"))
        .filter(F.col("nd") >= min_docs)
        .select("blk", "gram")
    )
    nb = (
        g.join(boiler, ["blk", "gram"], "left_semi")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_boiler"))
    )
    base = sh.select("doc_id", F.size("grams").alias("n_grams"))
    return base.join(nb, "doc_id", "left").select(
        "doc_id",
        F.col("n_grams").cast("long").alias("n_grams"),
        F.coalesce(F.col("n_boiler"), F.lit(0)).cast("long")
        .alias("n_boiler"),
        F.round(
            F.coalesce(F.col("n_boiler"), F.lit(0)).cast("double")
            / F.greatest(F.col("n_grams"), F.lit(1)),
            6,
        ).alias("boiler_frac"),
    )


def dup_spans(
    docs: DataFrame,
    n: int = 50,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """ExactSubstr-style duplicated-span detection (Lee et al. 2022,
    "Deduplicating Training Data Makes Language Models Better"): a token
    position starts a duplicated window when its n-token gram occurs >= 2
    times in the WHOLE corpus (any document, including the same one —
    within-doc repetition counts, exactly as the suffix-array formulation
    does). Overlapping or adjacent duplicated windows merge into maximal
    spans. Returns per doc:

      (doc_id, n_tokens, n_dup_spans, n_dup_tokens, dup_frac)

    where n_dup_tokens is the size of the union of all duplicated windows
    [p, p+n) and n_dup_spans counts the merged maximal spans (two windows
    at start positions a < b merge when b - a <= n).

    Spark-first shape instead of a distributed suffix array: one row per
    token position keyed by md5(gram) — the global occurrence count
    partial-combines map-side on a uniformly-hashed key (boilerplate
    mega-grams collapse per-partition before the shuffle), the rejoin is
    a semi-join on the same key, and the per-doc interval merge is pure
    JVM array math over the sorted duplicated positions: with consecutive
    gaps d_k, union size = sum(min(d_k, n)) + n and span count =
    1 + |{d_k > n}| — no Python, no window over an unpartitioned frame,
    nothing all-pairs. Per-doc state is bounded by the doc's own token
    count. At 100 TB the only wide shuffle keys on the 128-bit gram hash.
    """
    sh = with_shingles(docs, n, text_col).select(
        F.col(id_col).alias("doc_id"),
        F.size("tokens").alias("n_tokens"),
        "shingles",
    )
    pos = sh.select(
        "doc_id", F.posexplode("shingles").alias("pos", "gram")
    ).select("doc_id", "pos", F.md5("gram").alias("gkey"))
    dup = (
        pos.groupBy("gkey")
        .agg(F.count("*").alias("cnt"))
        .filter(F.col("cnt") >= 2)
        .select("gkey")
    )
    dpos = (
        pos.join(dup, "gkey", "left_semi")
        .groupBy("doc_id")
        .agg(F.array_sort(F.collect_list("pos")).alias("ps"))
    )
    k = F.size("ps")
    # gaps between consecutive duplicated start positions (empty when k<2)
    diffs = F.when(
        k >= 2,
        F.zip_with(
            F.slice("ps", 1, k - 1),
            F.slice("ps", 2, k - 1),
            lambda a, b: b - a,
        ),
    ).otherwise(F.array().cast("array<int>"))
    n_dup_tokens = F.when(k == 0, F.lit(0)).otherwise(
        F.aggregate(
            diffs, F.lit(n), lambda acc, d: acc + F.least(d, F.lit(n))
        )
    )
    n_dup_spans = F.when(k == 0, F.lit(0)).otherwise(
        F.lit(1) + F.size(F.filter(diffs, lambda d: d > n))
    )
    merged = dpos.select(
        "doc_id",
        n_dup_spans.alias("n_dup_spans"),
        n_dup_tokens.alias("n_dup_tokens"),
    )
    base = sh.select("doc_id", "n_tokens")
    return base.join(merged, "doc_id", "left").select(
        "doc_id",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.coalesce("n_dup_spans", F.lit(0)).cast("long")
        .alias("n_dup_spans"),
        F.coalesce("n_dup_tokens", F.lit(0)).cast("long")
        .alias("n_dup_tokens"),
        F.round(
            F.coalesce("n_dup_tokens", F.lit(0)).cast("double")
            / F.greatest(F.col("n_tokens"), F.lit(1)),
            6,
        ).alias("dup_frac"),
    )


def unigram_surprisal(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    quant: int = 1_000_000,
) -> DataFrame:
    """Corpus-trained unigram LM scoring — the CCNet-style "perplexity
    bucket" signal (Wenzek et al. 2020) with the LM trained on the corpus
    itself instead of an external KenLM: token surprisal = ln(N / count),
    per doc the mean surprisal in nats. Low mean = stereotyped/boilerplate
    docs, high mean = rare-token (often noise) docs — the standard
    filter-both-tails quality axis.

    Determinism contract: per-token surprisal is quantized to integer
    micro-nats ONCE per distinct token (round(ln(N/cnt) * quant)), so the
    per-doc aggregation is an exact integer sum and the per-doc mean is an
    exact integer floor-division — no float summation-order or rounding-tie
    dependence across partitions, engines, or cluster sizes. Scale shape:
    one map-side-combinable token count (shuffle keys on the token), one
    token-keyed rejoin, one per-doc agg; the only driver value is the
    corpus token total N (one scalar from an aggregate job).
    """
    toks = with_tokens(docs, text_col).select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.transform("tokens", F.lower)).alias("tok"),
    )
    counts = toks.groupBy("tok").agg(F.count("*").alias("cnt"))
    total = counts.agg(F.sum("cnt")).first()[0] or 0
    surp = counts.select(
        "tok",
        F.round(F.log(F.lit(float(total)) / F.col("cnt")) * quant)
        .cast("long")
        .alias("surp_q"),
    )
    per_doc = (
        toks.join(surp, "tok")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            F.sum("surp_q").alias("sum_surp_q"),
        )
    )
    return per_doc.select(
        "doc_id",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.col("sum_surp_q").cast("long").alias("sum_surp_q"),
        F.expr("sum_surp_q div n_tokens").cast("long").alias("mean_surp_q"),
    )


def bm25_search(
    docs: DataFrame,
    query_terms: list[str],
    k: int = 20,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
    quant: int = 1_000_000,
) -> DataFrame:
    """BM25 ranked retrieval over the corpus (Robertson-Sparck Jones
    probabilistic idf, the Okapi tf saturation) — the search-engine query
    the reference crawler feeds (its corpus export is a search-index
    input; this closes the loop engine-side). Returns the top-k docs by
    (score desc, doc_id): deterministic total order, TakeOrdered physical
    plan — no global sort materializes.

        idf(t)      = ln(1 + (N - df + 0.5) / (df + 0.5))       (always > 0)
        s(d, t)     = idf * tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl))
        score(d)    = sum over query terms of s(d, t)

    Determinism contract: s(d, t) is computed as ONE double expression and
    quantized to integer micro-units per (doc, term); the per-doc score is
    an exact integer sum, so ranking never depends on float summation
    order across terms, partitions, or engines. Scale shape: the tf table
    only holds (doc, query-term) hits — the explode filters to the query
    vocabulary before any shuffle; df (<= |terms| rows) and the corpus
    totals (1 row) ride broadcasts. Nothing corpus-sized is sorted: top-k
    is a per-partition heap + driver merge of k rows.
    """
    terms = F.array(*[F.lit(t) for t in query_terms])
    d = with_tokens(docs, text_col).select(
        F.col(id_col).alias("doc_id"),
        F.transform("tokens", F.lower).alias("_toks"),
    )
    d = d.select(
        "doc_id",
        F.size("_toks").cast("long").alias("dl"),
        F.filter("_toks", lambda x: F.array_contains(terms, x)).alias(
            "_hits"
        ),
    )
    tf = (
        d.select("doc_id", "dl", F.explode("_hits").alias("term"))
        .groupBy("doc_id", "dl", "term")
        .agg(F.count("*").cast("long").alias("tf"))
    )
    df_t = tf.groupBy("term").agg(F.count("*").cast("long").alias("df"))
    tot = d.agg(
        F.count("*").alias("n_docs"), F.sum("dl").alias("sum_dl")
    ).withColumn("_one", F.lit(1))
    scored = (
        tf.join(F.broadcast(df_t), "term")
        .withColumn("_one", F.lit(1))
        .join(F.broadcast(tot), "_one")
    )
    avgdl = F.col("sum_dl").cast("double") / F.col("n_docs")
    idf = F.log(
        1.0
        + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    s = (
        idf
        * (F.col("tf") * (k1 + 1.0))
        / (F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / avgdl))
    )
    per_doc = (
        scored.select(
            "doc_id",
            F.round(s * quant).cast("long").alias("s_q"),
        )
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_terms_hit"),
            F.sum("s_q").cast("long").alias("score_q"),
        )
    )
    return per_doc.orderBy(F.desc("score_q"), "doc_id").limit(k)


def chunk_docs(
    docs: DataFrame,
    chunk_tokens: int = 128,
    overlap: int = 32,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Split documents into fixed-size token windows with overlap — the
    chunking step every pretraining/retrieval pipeline runs between
    curation and tokenization (context packing, RAG passage indexing).

    chunk i covers token offsets [i*stride, i*stride + chunk_tokens) with
    stride = chunk_tokens - overlap; the final window may be short; a doc
    never yields zero chunks. Pure JVM (sequence + posexplode + slice +
    array_join): embarrassingly parallel, output rows = ceil growth over
    input — no shuffle at all, the chunker composes with the scan. Chunk
    boundaries are integer arithmetic on the token count, so the chunk
    set is engine-exact. Returns (doc_id, chunk_id, start_tok, n_tokens,
    chunk_text).
    """
    if not 0 <= overlap < chunk_tokens:
        raise ValueError(
            f"need 0 <= overlap < chunk_tokens: {overlap}, {chunk_tokens}"
        )
    stride = chunk_tokens - overlap
    d = with_tokens(docs, text_col)
    n = F.size("tokens")
    # n > chunk_tokens: n_chunks = ceil((n - chunk_tokens)/stride) + 1,
    # the ceil as exact integer math
    n_chunks = F.when(n <= chunk_tokens, F.lit(1)).otherwise(
        F.floor(
            (n - F.lit(chunk_tokens) + F.lit(stride) - 1)
            / F.lit(stride)
        ).cast("int")
        + 1
    )
    ch = d.select(
        F.col(id_col).alias("doc_id"),
        F.col("tokens"),
        F.posexplode(F.sequence(F.lit(0), n_chunks - 1)).alias(
            "chunk_id", "_i"
        ),
    )
    start = F.col("chunk_id") * stride
    piece = F.slice(F.col("tokens"), start + 1, chunk_tokens)
    return ch.select(
        "doc_id",
        F.col("chunk_id").cast("long").alias("chunk_id"),
        start.cast("long").alias("start_tok"),
        F.size(piece).cast("long").alias("n_tokens"),
        F.array_join(piece, " ").alias("chunk_text"),
    )


# single-char unifications applied after NFC: curly quotes -> straight,
# en/em dash -> '-', NBSP -> space. Kept as (from, to) pairs so the SQL
# oracle can replay them as chained replace() calls.
NORMALIZE_CHAR_MAP: tuple[tuple[str, str], ...] = (
    ("‘", "'"), ("’", "'"),
    ("“", '"'), ("”", '"'),
    ("–", "-"), ("—", "-"),
    (" ", " "),
)
# C0 controls except \t \n (plus DEL); \r handled by the CRLF fold first
NORMALIZE_CTRL_RE = "[\\x{0}-\\x{8}\\x{B}-\\x{1F}\\x{7F}]"
NORMALIZE_ZW_RE = "[\\x{200B}-\\x{200D}\\x{FEFF}]"


def normalize_text(
    docs: DataFrame, text_col: str = "text", out_col: str = "norm_text"
) -> DataFrame:
    """Pre-tokenization unicode normalization — the cleanup pass every
    webtext pipeline runs before any token-based op: NFC composition
    (é as one codepoint, not e+combining-acute), CRLF -> LF, C0
    control/DEL strip (keeping tab+newline), zero-width/BOM removal, and
    curly-quote / dash / NBSP unification.

    NFC is the single Python step (Arrow-batched pandas UDF over
    unicodedata — both it and DuckDB's nfc_normalize implement the same
    Unicode algorithm, so the oracle matches); everything after is fused
    JVM regexp/translate. Pure per-row projection: no shuffle, composes
    with the scan at any size. Adds ``out_col`` + ``was_changed``.
    """
    import unicodedata

    @pandas_udf("string")
    def nfc(s: pd.Series) -> pd.Series:
        return s.map(
            lambda x: unicodedata.normalize("NFC", x)
            if x is not None else None
        )

    cur = nfc(F.col(text_col))
    cur = F.regexp_replace(cur, "\\r\\n", "\n")
    cur = F.regexp_replace(cur, NORMALIZE_CTRL_RE, "")
    cur = F.regexp_replace(cur, NORMALIZE_ZW_RE, "")
    src = "".join(a for a, _ in NORMALIZE_CHAR_MAP)
    dst = "".join(b for _, b in NORMALIZE_CHAR_MAP)
    cur = F.translate(cur, src, dst)
    return docs.select(
        "*",
        cur.alias(out_col),
        (F.col(text_col) != cur).alias("was_changed"),
    )


def backoff_surprisal(
    docs: DataFrame,
    target_col: str = "is_target",
    text_col: str = "text",
    id_col: str = "doc_id",
    alpha: float = 0.4,
    quant: int = 1_000_000,
) -> DataFrame:
    """Bigram LM scoring with Stupid Backoff (Brants et al. 2007) — the
    CCNet setup proper: the LM trains on the TARGET slice (CCNet:
    Wikipedia) and scores the whole corpus (CCNet: Common Crawl), so
    out-of-domain bigrams genuinely hit the backoff path, unlike
    self-scored unigram surprisal where every n-gram is in-corpus.

        seen bigram:   s(w | p) = -ln( cnt(p,w) / cnt(p·) )
        backoff:       s(w | p) = -ln( alpha * (cnt(w)+1) / (N + V) )
        first token:   s(w)     = -ln( (cnt(w)+1) / (N + V) )

    with N = train token instances, V = train vocab + 1 (the Laplace
    +1/(N+V) handles OOV tokens exactly). Determinism contract: scores
    are quantized to integer micro-nats ONCE per distinct (prev, w) pair
    (and once per distinct first token), so per-doc sums and means are
    exact integer math on any engine/partitioning. Scale shape: train
    counts are map-combinable groupBys; the pair score table is built on
    the corpus's DISTINCT bigram set and rejoined by (prev, w) — every
    shuffle keys on a token or bigram; only the two scalars N, V cross
    the driver. Returns (doc_id, n_tokens, n_backoff, sum_surp_q,
    mean_surp_q).
    """
    # (prev, w) instances are built INSIDE the array (transform over the
    # index range -> small 2-string structs) before the explode, so no
    # exploded row ever carries the whole token array — with a retained
    # array column, a 1M-token doc would otherwise materialize O(n^2)
    # bytes at the first row-format boundary
    toksl = F.col("_toks")
    inst = with_tokens(docs, text_col).select(
        F.col(id_col).alias("doc_id"),
        F.col(target_col).alias("_t"),
        F.transform("tokens", F.lower).alias("_toks"),
    ).select(
        "doc_id",
        "_t",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.size(toksl) - 1),
                lambda i: F.struct(
                    F.when(
                        i > 0, F.element_at(toksl, i.cast("int"))
                    ).alias("prev"),
                    F.element_at(toksl, (i + 1).cast("int")).alias("w"),
                ),
            )
        ).alias("_pw"),
    ).select(
        "doc_id",
        "_t",
        F.col("_pw.prev").alias("prev"),
        F.col("_pw.w").alias("w"),
    )
    train = inst.filter(F.col("_t"))
    nv = train.agg(
        F.count("*").alias("n"),
        F.countDistinct("w").alias("vocab"),
    ).first()
    n_total, v = int(nv["n"]), int(nv["vocab"]) + 1
    if n_total == 0:
        raise ValueError("backoff_surprisal: empty target slice")
    uni = train.groupBy("w").agg(F.count("*").alias("cnt_w"))
    big = train.filter(F.col("prev").isNotNull()).groupBy(
        "prev", "w"
    ).agg(F.count("*").alias("cnt_pw"))
    prevc = train.filter(F.col("prev").isNotNull()).groupBy("prev").agg(
        F.count("*").alias("cnt_prev")
    )

    denom = F.lit(n_total + v)
    uni_s = F.round(
        -F.log(
            (F.coalesce(F.col("cnt_w"), F.lit(0)) + 1).cast("double")
            / denom
        )
        * quant
    ).cast("long")
    back_s = F.round(
        -F.log(
            F.lit(alpha)
            * (F.coalesce(F.col("cnt_w"), F.lit(0)) + 1).cast("double")
            / denom
        )
        * quant
    ).cast("long")

    first_tab = (
        inst.filter(F.col("prev").isNull())
        .select("w")
        .distinct()
        .join(uni, "w", "left")
        .select("w", uni_s.alias("surp_q"))
    )
    pair_tab = (
        inst.filter(F.col("prev").isNotNull())
        .select("prev", "w")
        .distinct()
        .join(big, ["prev", "w"], "left")
        .join(prevc, "prev", "left")
        .join(uni, "w", "left")
        .select(
            "prev",
            "w",
            F.when(
                F.col("cnt_pw").isNotNull(),
                F.round(
                    -F.log(
                        F.col("cnt_pw").cast("double") / F.col("cnt_prev")
                    )
                    * quant
                ).cast("long"),
            ).otherwise(back_s).alias("surp_q"),
            (F.col("cnt_pw").isNull()).alias("is_backoff"),
        )
    )
    scored_first = inst.filter(F.col("prev").isNull()).join(
        first_tab, "w"
    ).select("doc_id", "surp_q", F.lit(False).alias("is_backoff"))
    scored_rest = inst.filter(F.col("prev").isNotNull()).join(
        pair_tab, ["prev", "w"]
    ).select("doc_id", "surp_q", "is_backoff")
    per_doc = (
        scored_first.unionByName(scored_rest)
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            F.sum(F.col("is_backoff").cast("long")).alias("n_backoff"),
            F.sum("surp_q").alias("sum_surp_q"),
        )
    )
    return per_doc.select(
        "doc_id",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.col("n_backoff").cast("long").alias("n_backoff"),
        F.col("sum_surp_q").cast("long").alias("sum_surp_q"),
        F.expr("sum_surp_q div n_tokens").cast("long").alias("mean_surp_q"),
    )
