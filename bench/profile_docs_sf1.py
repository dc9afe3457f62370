"""Documents-table op throughput at sf1-equivalent volume.

Times selected documents-table operators at sf0.1 (5,000 docs) and at a
deterministic Nx replication (doc_id*N+k remap — sf1-equivalent at N=10,
50,000 docs) and reports the scaling factor vs linear extrapolation. The
interesting ops are the ones whose intermediate volume could grow
superlinearly (pair joins, cross-doc gram counts, iterative graph
sweeps); a ratio near or below 1x means per-row cost held.

Usage: python bench/profile_docs_sf1.py [sf_dir] [multiplier] [op ...]
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

DEFAULT_OPS = ("boilerplate_ngrams", "pii_scrub", "curation_pipeline",
               "pagerank", "rep_metrics", "lang_id",
               # round-3 additions (all documents-table-only)
               "dup_spans", "gopher_rules", "unigram_surprisal",
               "dsir_weights", "bm25_search", "length_quantiles", "hits",
               "c4_filters", "line_dedup", "perplexity_buckets",
               "corpus_shuffle", "chunk_docs", "normalize_text",
               "quality_pipeline", "backoff_surprisal", "doc_attributes",
               # round-4 additions: trained BPE (replication multiplies
               # word COUNTS but not the vocabulary, so training cost
               # should be ~flat after the one corpus pass — the claim),
               # heldout inference, token packing, WARC render+parse
               "bpe_merges", "bpe_tokenize", "bpe_apply_heldout",
               "token_shard_packing", "warc_roundtrip",
               # round-4 batch 2: dedup applied (LSH pairs + closure +
               # accounting) and DSIR's Gumbel top-k selection
               "dedup_survivors", "dsir_resample", "windowed_lsh_pairs")


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    mult = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    ops = sys.argv[3:] or list(DEFAULT_OPS)

    from pyspark.sql import functions as F

    from sparkcrawl import schema as S  # noqa: F401  (session import side)
    from sparkcrawl.session import get_spark
    from sparkcrawl.queries import QUERIES

    spark = get_spark("profile-docs", cores=32, shuffle_partitions=32)

    # materialize the replicated documents table as parquet so each op
    # sees a normal scan (same path shape the queries expect)
    base = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    big_dir = f"/tmp/sparkcrawl_docs_x{mult}"
    if not os.path.exists(os.path.join(big_dir, "documents.parquet")):
        big = base.crossJoin(
            spark.range(mult).withColumnRenamed("id", "k")
        ).select(
            (F.col("doc_id") * mult + F.col("k")).alias("doc_id"),
            "text", "lang",
            # keep source cardinality: gram counts per source must scale
            # with docs, not collapse into one giant pseudo-source
            "source", "n_chars",
        )
        big.repartition(32).write.mode("overwrite").parquet(
            os.path.join(big_dir, "documents.parquet")
        )

    def run(name, d):
        import sparkcrawl.queries as Q

        fn = QUERIES[name][0]
        # honest BPE timing: drop the per-session training memo so both
        # the warm and the timed pass include the merge loop
        Q._BPE_TRAIN_MEMO.clear()
        fn(spark, d).count()  # warm: codegen + workers
        Q._BPE_TRAIN_MEMO.clear()
        t0 = time.time()
        n = fn(spark, d).count()
        return n, time.time() - t0

    print(f"# documents x{mult} probe ({sf_dir})")
    for name in ops:
        n0, t0 = run(name, sf_dir)
        n1, t1 = run(name, big_dir)
        ratio = t1 / (t0 * mult) if t0 > 0 else float("nan")
        print(
            f"{name:22s} sf0.1 {t0:6.2f}s/{n0} rows   "
            f"x{mult} {t1:6.2f}s/{n1} rows   vs-linear {ratio:.2f}x"
        )


if __name__ == "__main__":
    main()
