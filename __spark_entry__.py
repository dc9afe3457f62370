"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  — flagship: one crawl-shaped pipeline over sf0.001
queries()     — operator catalog (SURVEY.md §2 + training-data ops)
oracle_sql()  — DuckDB-equivalent SQL per query (where SQL-expressible)
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from sparkcrawl.queries import QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: frontier-round pipeline over the sf0.001 documents table —
    synthesize a URL frontier, apply admission filters (D1-D3), per-host run
    caps (R4), seen anti-join (D4), content dedup (P1), and aggregate
    per-host crawl metrics (A1)."""
    from pyspark.sql import Window as W, functions as F

    from sparkcrawl.filters import FilterConfig, admission_predicate
    from sparkcrawl.queries import _urls
    from sparkcrawl.textops import exact_dup_groups

    sf_dir = "/root/testdata/sf0.001"
    u = _urls(spark, sf_dir)
    u = u.withColumn("path_depth", F.size(F.split(F.col("path"), "/")))
    admitted = u.filter(admission_predicate(FilterConfig()))
    seen = u.filter(F.col("doc_id") % 3 == 0).select("url_norm")
    new = admitted.join(seen, "url_norm", "left_anti")
    w = W.partitionBy("host").orderBy("seq")
    selected = new.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") <= 5
    )
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    dups = exact_dup_groups(docs)
    fetched = selected.join(
        docs.select("doc_id", "text", "lang"), "doc_id"
    ).withColumn("content_md5", F.md5("text"))
    return (
        fetched.join(dups, "content_md5")
        .groupBy("host")
        .agg(
            F.count("*").alias("n_fetched"),
            F.sum(
                F.when(F.col("keep_doc_id") == F.col("doc_id"), 1).otherwise(0)
            ).alias("n_unique_content"),
            F.min("seq").alias("first_seq"),
        )
        .orderBy("host")
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (+ training-data
    ops). Each callable takes (spark, sf_dir) and returns a DataFrame."""
    return {name: fn for name, (fn, _) in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent ANSI SQL per query — EVERY queries() entry has a
    full value-hash oracle (simhash/LSH pair generation via md5-keyed
    variants, multimodal decode via the deterministic payload, centroid
    cosines via integer quantization of the mean, and ann_ivf_kmeans's
    fixed-4-sweep training loop unrolled as chained CTEs — deterministic
    by construction, so the hashes must match exactly)."""
    return {name: sql for name, (_, sql) in QUERIES.items() if sql is not None}
