"""Deterministic byte-pair-encoding training + vectorized apply.

The single most-used operator in a real training-data pipeline: learn a
merge table from the corpus, then tokenize the corpus (or new text) with
it. This is real BPE (Sennrich et al. 2016; the GPT-2 variant's
pre-tokenizer), not the pre-tokenizer-regex approximation the catalog
carried as ``token_count_bpe`` through round 3 (now renamed
``pretokenize_count``).

Execution shape, designed for the 100 TB regime:

* ``word_counts`` — ONE distributed pass over the corpus builds the
  (pre-token, count) table. By Heaps'/Zipf's law this table is orders of
  magnitude smaller than the corpus (vocabulary-sized), and it is the
  only thing training ever scans again.
* ``train_bpe`` — the classic merge loop, run as Spark jobs over the
  word table: each merge is one explode-adjacent-pairs + groupBy + top-1
  pass, and ONLY the single best (left, right, count) row reaches the
  driver per step — the same bounded-driver-state discipline as
  ``annsearch.kmeans_cells`` (centroids only). The merge application is
  a pure-JVM ``F.aggregate`` left fold over the symbol array — exactly
  the left-to-right non-overlapping single-pass replace the reference
  algorithm specifies — so there is no Python in the loop at all.
  Determinism: ties in pair frequency break lexicographically on
  (left, right); integer counts are order-free; fixed ``n_merges`` with
  an early stop when the best pair's count drops below
  ``min_pair_count`` (once no pair qualifies, the word table is a
  fixpoint, so later steps would also find nothing — the DuckDB oracle
  unrolls the same rule per step). Two runs, two partitionings, or two
  cluster sizes produce the identical merge table bit-for-bit.
* ``encode`` / ``count_tokens_udf`` — the inference path for text the
  trainer never saw: replay merges by rank per word (the standard
  min-rank loop, equivalent to replaying the merge sequence in order),
  Arrow-batched via pandas UDF with an unbounded per-executor word
  cache (Zipf makes the hit rate ~1). For corpus-that-was-trained-on
  tokenization, skip Python entirely: join the corpus' exploded
  pre-tokens against the final training segmentation (vocabulary-sized,
  broadcast- or shuffle-joined by Catalyst/AQE) — ``queries.py``'s
  ``bpe_tokenize`` takes that all-JVM path and the two paths are
  asserted equal in tests/test_bpe.py.

Reference provenance: the reference crawler has no tokenizer; this op
comes from the training-data-pipeline mandate (SURVEY.md §2.12) and
round-3 VERDICT task #4. Algorithm is public (Sennrich 2016, GPT-2).
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import DataFrame, functions as F

# GPT-2 pre-tokenizer shape restricted to ASCII classes so the Java-regex
# (Spark), RE2 (DuckDB), and Python-re dialects agree byte-for-byte:
# an optional-leading-space letter run, digit run, or punctuation run.
PRETOKEN_PATTERN = r" ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+"
_PRETOKEN_RE = re.compile(PRETOKEN_PATTERN)

# The DuckDB oracle encodes a word's symbol sequence as
# \x02sym\x03\x02sym\x03... so that non-overlapping left-to-right
# replace() IS the BPE merge pass; strip the two control chars from the
# text on both sides so they can never collide with a symbol.
_CTRL = "[\\x02\\x03]"


def clean_text_col(col):
    """Text column with the oracle's delimiter control chars stripped."""
    return F.regexp_replace(col, _CTRL, "")


def pretokens_col(col):
    """Array of GPT-2-style pre-tokens (merges never cross them)."""
    return F.regexp_extract_all(clean_text_col(col), F.lit(PRETOKEN_PATTERN), 0)


def word_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, cnt, syms) table: one corpus pass, then vocabulary-sized.

    ``syms`` starts as the character split; train_bpe folds merges into
    it in place. Partial aggregation makes the corpus pass map-side
    combinable; everything after this never touches the corpus again.
    """
    return (
        df.select(F.explode(pretokens_col(F.col(text_col))).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn("syms", F.split("word", ""))
    )


def _adjacent_pairs():
    """(s1, s2) structs for each adjacent symbol pair in ``syms``."""
    return F.arrays_zip(
        F.slice("syms", 1, F.size("syms") - 1).alias("s1"),
        F.slice("syms", 2, F.size("syms") - 1).alias("s2"),
    )


def merge_pass_col(syms_col, left: str, right: str):
    """One BPE merge applied to a symbol array, entirely JVM-side.

    Left fold: append each symbol unless the accumulator ends with
    ``left`` and the symbol is ``right``, in which case the tail is
    replaced by the merged symbol. Because the merged symbol is a NEW
    symbol (compared by whole-symbol equality, not suffix), a freshly
    merged tail never re-merges within the pass — matching the
    non-overlapping left-to-right replace of the reference algorithm
    and of the oracle's string replace().
    """
    merged = left + right
    return F.aggregate(
        syms_col,
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(left))
            & (x == F.lit(right)),
            F.concat(
                F.slice(acc, F.lit(1), F.size(acc) - 1),
                F.array(F.lit(merged)),
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def train_bpe(
    df: DataFrame,
    n_merges: int,
    text_col: str = "text",
    min_pair_count: int = 2,
) -> tuple[list[tuple[str, str, int]], DataFrame]:
    """Learn ``n_merges`` merges; return (merges, final segmentation).

    merges: [(left, right, pair_count)] in rank order. The returned
    DataFrame is the word table with ``syms`` = each word's final
    segmentation (localCheckpointed, so downstream joins don't replay
    the loop). Per merge: one pair-count job over the vocabulary table
    + one eager checkpoint of the updated table; driver state is the
    one best-pair row. Merge literals change per step, so each step
    compiles a fresh plan — acceptable for a train-once job (unlike the
    crawl round loop, which is codegen-cache-invariant by design).
    """
    words = word_counts(df, text_col).localCheckpoint()
    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        best = (
            words.select(F.explode(_adjacent_pairs()).alias("p"), "cnt")
            .groupBy(F.col("p.s1").alias("s1"), F.col("p.s2").alias("s2"))
            .agg(F.sum("cnt").alias("c"))
            .orderBy(F.desc("c"), F.asc("s1"), F.asc("s2"))
            .limit(1)
            .collect()
        )
        if not best or best[0]["c"] < min_pair_count:
            break
        left, right, c = best[0]["s1"], best[0]["s2"], int(best[0]["c"])
        merges.append((left, right, c))
        words = words.withColumn(
            "syms", merge_pass_col(F.col("syms"), left, right)
        ).localCheckpoint()
    return merges, words


def encode(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Tokenize one word by replaying merges in rank order (min-rank
    loop, the standard GPT-2 inference form). For any word the trainer
    saw, this reproduces the training segmentation exactly."""
    syms = re.findall(r".", word, flags=re.DOTALL)
    if not syms:
        return []
    while len(syms) >= 2:
        best_rank, best_i = None, -1
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        left, right = syms[best_i], syms[best_i + 1]
        out, i = [], 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == left and syms[i + 1] == right:
                out.append(left + right)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


def count_tokens_udf(merges: list[tuple[str, str, int]]):
    """pandas UDF text -> BPE token count for NEW text (inference path).

    The merge table rides the closure (broadcast by Spark); per-word
    encodes are memoized per executor — Zipfian word reuse makes the
    cache hit rate approach 1, so the Python cost is ~one encode per
    DISTINCT word per executor, not per occurrence.
    """
    ranks = {(l, r): i for i, (l, r, _c) in enumerate(merges)}
    ctrl = re.compile(_CTRL)
    cache: dict[str, int] = {}

    def _n(word: str) -> int:
        v = cache.get(word)
        if v is None:
            v = len(encode(word, ranks))
            cache[word] = v
        return v

    @F.pandas_udf("long")
    def _count(texts: pd.Series) -> pd.Series:
        return texts.map(
            lambda t: sum(
                _n(w) for w in _PRETOKEN_RE.findall(ctrl.sub("", t or ""))
            )
        ).astype("int64")

    return _count
