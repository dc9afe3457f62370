"""XPath matcher throughput at sf1-equivalent volume.

VERDICT r2 item 6: `q_xpath_match` runs in the bench's Python (Arrow UDF)
lane; the sf0.1 documents table is only 2,500 rows. This probe times the
matcher at sf0.1 and at a synthesized 10x (sf1-equivalent, 25,000 rows)
replication of the same table, and reports whether the sf1 wall stays
within 2x of the sf0.1-extrapolated cost (i.e. per-row cost at most ~2x,
no superlinear blowup from DOM parsing / AST handling across Arrow
batches). Expression ASTs are parsed once on the driver and shipped in
the UDF closure (xpath.py:evaluate_udf), so the per-doc DOM parse is the
only Python hot path being measured.

Usage: python bench/profile_xpath.py [sf_dir] [multiplier]
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    mult = int(sys.argv[2]) if len(sys.argv) > 2 else 10

    from pyspark.sql import functions as F

    from sparkcrawl.session import get_spark
    from sparkcrawl.queries import q_xpath_match, _rss_docs, _XPATH_MATCH_EXPRS
    from sparkcrawl.xpath import evaluate_matches

    spark = get_spark("profile-xpath", cores=32, shuffle_partitions=32)

    def _run(df):
        t0 = time.time()
        n = df.count()
        return n, time.time() - t0

    # warm up Python workers / codegen so both legs are steady-state
    q_xpath_match(spark, sf_dir).count()

    base = _rss_docs(spark, sf_dir)
    n01, t01 = _run(evaluate_matches(base, _XPATH_MATCH_EXPRS, doc_col="doc"))

    # sf1-equivalent: deterministic 10x replication with remapped doc_id
    # (doc_id*mult+k keeps ids unique; text payload identical per replica).
    big = base.crossJoin(
        spark.range(mult).withColumnRenamed("id", "k")
    ).select(
        (F.col("doc_id") * mult + F.col("k")).alias("doc_id"), "doc"
    ).repartition(32)
    big.cache().count()
    n1, t1 = _run(evaluate_matches(big, _XPATH_MATCH_EXPRS, doc_col="doc"))
    big.unpersist()

    extrapolated = t01 * mult
    ratio = t1 / extrapolated if extrapolated else float("inf")
    print(
        f"sf0.1: {n01} match rows in {t01:.2f}s | "
        f"sf1-equiv ({mult}x): {n1} rows in {t1:.2f}s | "
        f"extrapolated {extrapolated:.2f}s | ratio {ratio:.2f} "
        f"({'OK <=2x' if ratio <= 2.0 else 'EXCEEDS 2x'})"
    )
    spark.stop()


if __name__ == "__main__":
    main()
