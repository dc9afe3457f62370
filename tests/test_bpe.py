"""Trained BPE: parity vs an independent pure-Python reference, inference
== training segmentation, JVM-join path == pandas-UDF path, determinism
across partitionings, early stop."""

from __future__ import annotations

import re
from collections import Counter

from pyspark.sql import functions as F

from sparkcrawl import bpe


# ---------------------------------------------------------------------------
# Independent reference implementation (Counter/dict based, no Spark, no
# shared helpers beyond the pre-tokenizer pattern constant) — the classic
# Sennrich trainer operating on tuple-of-symbols keys.
# ---------------------------------------------------------------------------

def _ref_train(texts, n_merges, min_pair_count=2):
    pat = re.compile(bpe.PRETOKEN_PATTERN)
    words = Counter()
    for t in texts:
        t = re.sub("[\x02\x03]", "", t or "")
        words.update(pat.findall(t))
    seg = {w: tuple(w) for w in words}
    merges = []
    for _ in range(n_merges):
        pairs = Counter()
        for w, syms in seg.items():
            c = words[w]
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += c
        if not pairs:
            break
        # max count, ties broken lexicographically ascending on the pair
        best, bc = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if bc < min_pair_count:
            break
        merges.append((best[0], best[1], bc))
        l, r = best
        new_seg = {}
        for w, syms in seg.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_seg[w] = tuple(out)
        seg = new_seg
    return merges, seg


CORPUS = [
    "the cat sat on the mat, the cat sat!!",
    "aaaa aaaa aa baaab",  # repeated-char runs: overlap handling
    "low lower lowest newest newest widest",  # the Sennrich example shape
    "a b c d 1234 12 12 :-) :-) :-)",
    "  double  spaced\tand\nnewlined text text",
    "unicode café café naïve",
    "x",  # single pre-token, single char
    "",  # empty doc
]


def _spark_corpus(spark, parts=1):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(CORPUS)], "doc_id long, text string"
    ).repartition(parts)


def test_train_matches_independent_reference(spark):
    df = _spark_corpus(spark)
    got_merges, got_words = bpe.train_bpe(df, n_merges=30)
    ref_merges, ref_seg = _ref_train(CORPUS, 30)
    assert got_merges == ref_merges
    got_seg = {
        r["word"]: tuple(r["syms"]) for r in got_words.collect()
    }
    assert got_seg == ref_seg


def test_early_stop_is_a_fixpoint(spark):
    # every pre-token unique -> no pair ever reaches count 2
    df = spark.createDataFrame([(0, "ab cd ef")], "doc_id long, text string")
    merges, words = bpe.train_bpe(df, n_merges=10)
    assert merges == []
    assert {r["word"]: tuple(r["syms"]) for r in words.collect()} == {
        "ab": ("a", "b"), " cd": (" ", "c", "d"), " ef": (" ", "e", "f"),
    }


def test_encode_replays_training_segmentation(spark):
    df = _spark_corpus(spark)
    merges, words = bpe.train_bpe(df, n_merges=30)
    ranks = {(l, r): i for i, (l, r, _c) in enumerate(merges)}
    for row in words.collect():
        assert bpe.encode(row["word"], ranks) == list(row["syms"]), row["word"]
    # and on words the trainer never saw it still terminates + covers
    assert "".join(bpe.encode("unseenword!", ranks)) == "unseenword!"
    assert bpe.encode("", ranks) == []


def test_udf_inference_equals_jvm_join_path(spark):
    df = _spark_corpus(spark, parts=3)
    merges, words = bpe.train_bpe(df, n_merges=30)
    seg = words.select("word", F.size("syms").cast("long").alias("w_tokens"))
    dt = df.select(
        "doc_id", F.explode(bpe.pretokens_col(F.col("text"))).alias("word")
    )
    jvm = (
        df.select("doc_id")
        .join(
            dt.join(seg, "word").groupBy("doc_id").agg(
                F.sum("w_tokens").alias("n")
            ),
            "doc_id",
            "left",
        )
        .select("doc_id", F.coalesce("n", F.lit(0)).alias("n"))
    )
    udf = df.select(
        "doc_id", bpe.count_tokens_udf(merges)(F.col("text")).alias("n")
    )
    assert sorted(map(tuple, jvm.collect())) == sorted(
        map(tuple, udf.collect())
    )


def test_training_is_partitioning_invariant(spark):
    m1, w1 = bpe.train_bpe(_spark_corpus(spark, parts=1), n_merges=20)
    m7, w7 = bpe.train_bpe(_spark_corpus(spark, parts=7), n_merges=20)
    assert m1 == m7
    assert sorted(
        (r["word"], tuple(r["syms"])) for r in w1.collect()
    ) == sorted((r["word"], tuple(r["syms"])) for r in w7.collect())
