"""Round-5 drift probe: is the bulk data-plane ~8% drop (r3 20,580 ->
r4 ~19,000 p/s) a regression in the pipeline, or the measurement context?

The bulk pipeline's code (extract/urlnorm/filters/session) is
byte-identical r3..r4 (git diff), so this measures the two remaining
suspects directly in one process:

  leg A: bulk rate in a FRESH JVM (3 steady passes)
  leg B: bulk rate in the SAME JVM after the full headline suite + t2
         crawl leg have churned it (exactly bench.py's measurement
         position)

with host-bandwidth stamps bracketing each leg. If A ~= r3's number and
B ~= r4's, the drift is JVM context (heap churn/GC from the preceding
legs), not the data plane.

Usage: python bench/bulk_context_ab.py [cores]
"""
from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "bench"))


def main():
    cores = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    import hostprobe

    import bench as B
    from sparkcrawl.session import get_spark

    spark = get_spark("bulk-ab", cores=cores, shuffle_partitions=cores)
    out = {"cores": cores}

    out["host_pre_2t"] = round(hostprobe.leg("mem", 2, 2.0) / 1e9, 1)
    out["host_pre_8t"] = round(hostprobe.leg("mem", 8, 2.0) / 1e9, 1)
    fresh = []
    for _ in range(3):
        fresh.append(B.bench_bulk(spark, B.CRAWL_SIZE))
    out["bulk_fresh_jvm"] = fresh
    out["host_mid_2t"] = round(hostprobe.leg("mem", 2, 2.0) / 1e9, 1)
    out["host_mid_8t"] = round(hostprobe.leg("mem", 8, 2.0) / 1e9, 1)

    t0 = time.time()
    B.bench_queries(spark, os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    B.bench_crawl(spark, B.CRAWL_SIZE, B.CRAWL_ROUNDS)
    out["suite_wall_s"] = round(time.time() - t0, 1)

    churned = []
    for _ in range(3):
        churned.append(B.bench_bulk(spark, B.CRAWL_SIZE))
    out["bulk_after_suite"] = churned
    out["host_post_2t"] = round(hostprobe.leg("mem", 2, 2.0) / 1e9, 1)
    out["host_post_8t"] = round(hostprobe.leg("mem", 8, 2.0) / 1e9, 1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
