"""Stage-level drill-down for a driver-catalog query: run it twice (cold,
steady) and dump the steady run's stages sorted by task time.

Usage: python bench/profile_query.py <query-name> [sf_dir] [cores]
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _api(port: int, path: str):
    with urllib.request.urlopen(
        f"http://localhost:{port}/api/v1/{path}", timeout=10
    ) as r:
        return json.loads(r.read())


def main():
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    cores = int(sys.argv[3]) if len(sys.argv) > 3 else 32

    from sparkcrawl.session import get_spark
    from sparkcrawl.queries import QUERIES

    spark = get_spark(f"q-{name}", cores=cores, shuffle_partitions=cores,
                      extra_conf={"spark.ui.enabled": "true"})
    port = int(spark.sparkContext.uiWebUrl.rsplit(":", 1)[1])
    app_id = spark.sparkContext.applicationId
    fn, _ = QUERIES[name]

    def run():
        t0 = time.time()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        return time.time() - t0

    cold = run()
    pre = max((s["stageId"] for s in
               _api(port, f"applications/{app_id}/stages")), default=-1)
    steady = run()
    print(f"{name}: cold {cold:.2f}s steady {steady:.2f}s")
    stages = [s for s in _api(port, f"applications/{app_id}/stages")
              if s["stageId"] > pre and s["status"] == "COMPLETE"]
    stages.sort(key=lambda s: -s.get("executorRunTime", 0))
    tot = sum(s.get("executorRunTime", 0) for s in stages)
    print(f"steady stages={len(stages)} total task-ms={tot}")
    for s in stages[:8]:
        print(f"  stage {s['stageId']:>4} run={s['executorRunTime']:>7}ms "
              f"cpu={s.get('executorCpuTime', 0) // 1_000_000:>6}ms "
              f"tasks={s['numCompleteTasks']:<4} "
              f"in={s.get('inputBytes', 0):>10} "
              f"sr={s.get('shuffleReadBytes', 0):>9} "
              f"sw={s.get('shuffleWriteBytes', 0):>9}")


if __name__ == "__main__":
    main()
