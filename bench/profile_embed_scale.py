"""Embedding-op throughput at 10x vector volume.

The documents probe (profile_docs_sf1.py) replicates rows; replicating
EMBEDDINGS would plant 10 exact copies of every vector and quadratically
inflate near-dup pair volume — a data property, not an op property. So
this probe generates FRESH deterministic vectors (md5-derived components,
same dim/scale as the sf fixtures) at N and 10N and times the operators
directly, scaling the knobs their contracts say must scale (k_cells grows
with the corpus for semantic_dedup — the SemDeDup paper's setup — and
stays fixed for the IVF search ops, whose per-query probe cost is
k_cells-bound, not corpus-bound).

Usage: python bench/profile_embed_scale.py [n_base] [mult]
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    n_base = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    mult = int(sys.argv[2]) if len(sys.argv) > 2 else 10

    from pyspark.sql import functions as F

    from sparkcrawl import annsearch
    from sparkcrawl.session import get_spark

    spark = get_spark("profile-embed", cores=32, shuffle_partitions=32)

    def gen(n, tag):
        # deterministic md5-derived components in [-1, 1), 64-dim
        d = spark.range(n).select(F.col("id").alias("vec_id"))
        comps = F.transform(
            F.sequence(F.lit(0), F.lit(63)),
            lambda j: (
                F.conv(
                    F.substring(
                        F.md5(
                            F.concat_ws(
                                ":", F.lit(tag), F.col("vec_id"), j
                            )
                        ),
                        1, 6,
                    ),
                    16, 10,
                ).cast("double")
                / F.lit(float(1 << 24))
                * 2.0
                - 1.0
            ),
        )
        path = f"/tmp/sparkcrawl_embed_{tag}_{n}"
        if not os.path.exists(path):
            d.select("vec_id", comps.alias("embedding")).repartition(
                32
            ).write.mode("overwrite").parquet(path)
        return spark.read.parquet(path)

    jvm = spark.sparkContext._jvm

    def bytes_read():
        # JVM-global Hadoop FS counters: in local mode they cover executor
        # reads too, and a cache-served scan reads 0 source bytes — so the
        # delta across an op counts its SOURCE scans.
        return sum(
            s.getBytesRead()
            for s in jvm.org.apache.hadoop.fs.FileSystem.getAllStatistics()
        )

    def run(label, fn):
        fn().count()  # warm
        b0 = bytes_read()
        t0 = time.time()
        n_rows = fn().count()
        dt = time.time() - t0
        print(
            f"{label:34s} {dt:6.2f}s  ({n_rows} rows, "
            f"{bytes_read() - b0} source bytes)"
        )
        return dt

    def kmeans_scan_ab(df, n, k_cells):
        """VERDICT r3 task #5 evidence: kmeans_cells persists its projected
        (id, _e) frame, so training reads the source ONCE instead of
        iters+1 times. A/B by disabling DataFrame.persist (no-op) on the
        same code path and counting source bytes."""
        # patch the CONCRETE class (pyspark.sql.classic.*) — the
        # pyspark.sql.dataframe.DataFrame base is abstract in Spark 4
        # and patching it never reaches instances
        cls = type(df)
        assert "persist" in vars(cls), "persist not defined on " + str(cls)

        def leg():
            b0 = bytes_read()
            annsearch.kmeans_cells(df, k_cells=k_cells, iters=4)
            return bytes_read() - b0

        cached = leg()
        orig = cls.persist
        cls.persist = lambda self, *a, **k: self
        try:
            uncached = leg()
        finally:
            cls.persist = orig
        per_scan = uncached / 5  # init pick + 4 assignment sweeps
        print(
            f"kmeans_cells train scans n={n}: cached={cached} bytes "
            f"(~{cached / max(per_scan, 1):.1f} scans) vs "
            f"no-persist={uncached} bytes (~5.0 scans)"
        )

    for n in (n_base, n_base * mult):
        e = gen(n, "e")
        qs = e.filter(F.col("vec_id") % 50 == 0)
        k_cells_search = 32
        k_cells_dedup = max(32, n // 64)  # SemDeDup: cells scale with N
        print(f"# n={n} (queries={n // 50}, dedup k_cells={k_cells_dedup})")
        kmeans_scan_ab(e, n, k_cells_search)
        run(f"ann_join_topk n={n}", lambda: annsearch.ann_join_topk(
            e, qs, k=5, nprobe=2, k_cells=k_cells_search, iters=4))
        run(f"ann_join_topk sampled n={n}", lambda: annsearch.ann_join_topk(
            e, qs, k=5, nprobe=2, k_cells=k_cells_search, iters=4,
            sample_frac=0.25))
        run(f"embedding_near_dup n={n}", lambda: annsearch.embedding_near_dup(
            e, threshold=0.8, n_bands=4, band_bits=8))
        run(f"semantic_dedup n={n}", lambda: annsearch.semantic_dedup(
            e, threshold=0.8, k_cells=k_cells_dedup, iters=2))


if __name__ == "__main__":
    main()
