"""Corpus-curation ops: stratified sampling, domain mix, repetition
metrics, token-budget shard packing (sparkcrawl/curation.py, textops.
rep_metrics). The DuckDB oracle covers value parity at sf0.001/0.01
(queries stratified_sample / domain_mix / rep_metrics / shard_packing);
these tests pin the properties the oracle can't see: independence from
partitioning, plan shape, and hand-computed edge cases."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from sparkcrawl import curation, textops


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (i, f"w{i % 7} " * (i % 5 + 1) + f"tail{i}",
         ["en", "de", "fr", "zh"][i % 4], f"src{i % 3}", 10 + i)
        for i in range(200)
    ]
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, "
        "n_chars long"
    )


# ---------------------------------------------------------------------------
# stratified sampling
# ---------------------------------------------------------------------------


def test_stratified_sample_matches_hashlib_reference(spark, docs):
    """The kept set equals an independent Python md5 re-derivation —
    sampling is a pure function of (salt, doc_id, lang), so any external
    auditor can reproduce it exactly."""
    rates = {"en": 0.5, "de": 0.25, "fr": 0.25}
    got = {
        r["doc_id"]
        for r in curation.stratified_sample(docs, rates).collect()
    }
    expect = set()
    for i in range(200):
        lang = ["en", "de", "fr", "zh"][i % 4]
        bucket = hashlib.md5(f"samp:{i}".encode()).hexdigest()[:4]
        thr = curation.rate_threshold(rates.get(lang, 0.125))
        if bucket < thr:
            expect.add(i)
    assert got == expect
    # rate sanity on the uniform md5 buckets: en keeps about half
    en_total = 50
    en_kept = sum(1 for i in expect if i % 4 == 0)
    assert 0.3 * en_total <= en_kept <= 0.7 * en_total


def test_stratified_sample_no_shuffle(spark, docs):
    """A sampling decision must never move data: the plan is scan + filter
    + project, with no Exchange."""
    plan = curation.stratified_sample(docs)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan, plan


def test_rate_threshold_bounds():
    assert curation.rate_threshold(0.5) == "8000"
    assert curation.rate_threshold(0.0) == "0000"
    assert curation.rate_threshold(1.0) == "ffff"
    with pytest.raises(ValueError):
        curation.rate_threshold(1.5)


# ---------------------------------------------------------------------------
# domain mix
# ---------------------------------------------------------------------------


def test_domain_mix_shares_sum_to_one(spark, docs):
    rows = curation.domain_mix(docs).collect()
    assert abs(sum(r["share"] for r in rows) - 1.0) < 1e-4
    assert sum(r["n_docs"] for r in rows) == 200
    # chars aggregate per cell matches a direct recount
    direct = {
        (r["source"], r["lang"]): r["s"]
        for r in docs.groupBy("source", "lang")
        .agg(F.sum("n_chars").alias("s")).collect()
    }
    for r in rows:
        assert r["total_chars"] == direct[(r["source"], r["lang"])]


# ---------------------------------------------------------------------------
# repetition metrics
# ---------------------------------------------------------------------------


def test_rep_metrics_hand_computed(spark):
    d = spark.createDataFrame(
        [
            (1, "a a a b"),      # 4 toks, 2 distinct; bigrams a-a a-a a-b
            (2, "x"),            # single token: no bigrams
            (3, "p q r s"),      # all distinct, all bigrams unique
            (4, "z z"),          # one bigram
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in textops.rep_metrics(d).collect()}
    assert got[1]["dup_token_ratio"] == 0.5
    assert got[1]["top_bigram_share"] == round(2 / 3, 6)
    assert got[2]["dup_token_ratio"] == 0.0
    assert got[2]["top_bigram_share"] == 0.0
    assert got[3]["dup_token_ratio"] == 0.0
    assert got[3]["top_bigram_share"] == round(1 / 3, 6)
    assert got[4]["dup_token_ratio"] == 0.5
    assert got[4]["top_bigram_share"] == 1.0


# ---------------------------------------------------------------------------
# shard packing
# ---------------------------------------------------------------------------


def _tok_counts(docs):
    return textops.with_tokens(docs).select(
        "doc_id", F.size("tokens").alias("n_tokens")
    )


def test_pack_shards_matches_pandas_cumsum(spark, docs):
    out = curation.pack_shards(_tok_counts(docs), budget=16).toPandas() \
        .sort_values("doc_id").reset_index(drop=True)
    ref = _tok_counts(docs).toPandas().sort_values("doc_id") \
        .reset_index(drop=True)
    cum = ref["n_tokens"].cumsum()
    assert (out["cum_tokens"] == cum).all()
    assert (out["shard_id"] == (cum - ref["n_tokens"]) // 16).all()
    # shards are contiguous runs in doc order
    assert (out["shard_id"].diff().dropna() >= 0).all()


def test_pack_shards_identical_across_shuffle_widths(spark, docs):
    """The running total is a pure function of the ordered corpus — the
    range-partition width (1 / 3 / 8) must not leak into values."""
    toks = _tok_counts(docs)
    results = []
    orig = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        for w in ("1", "3", "8"):
            spark.conf.set("spark.sql.shuffle.partitions", w)
            results.append(
                sorted(
                    map(tuple, curation.pack_shards(toks, 16).collect())
                )
            )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", orig)
    assert results[0] == results[1] == results[2]


def test_pack_shards_window_partitions_by_pid(spark, docs):
    """Same guard as dense_seq: the cumulative window runs per range
    partition, never over a single global partition."""
    plan = curation.pack_shards(_tok_counts(docs), 16)._jdf \
        .queryExecution().executedPlan().toString()
    assert "Window" in plan
    assert "hashpartitioning(_pid" in plan
    assert "SinglePartition" not in plan


def test_pack_shards_rejects_bad_budget(spark, docs):
    with pytest.raises(ValueError):
        curation.pack_shards(_tok_counts(docs), 0)