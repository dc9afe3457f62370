"""Dump full detail of the hottest stages of the LAST crawl round at t2 —
identifies the surprise task-time burner inside the materialize chain.

Usage: python bench/profile_hotstage.py [size] [cores] [rounds]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import urllib.request

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))


def _api(port: int, path: str):
    url = f"http://localhost:{port}/api/v1/{path}"
    with urllib.request.urlopen(url, timeout=10) as r:
        return json.loads(r.read())


def main():
    size = sys.argv[1] if len(sys.argv) > 1 else "t2"
    cores = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    rounds = int(sys.argv[3]) if len(sys.argv) > 3 else 5

    if (os.environ.get("SPARKCRAWL_SCALE_PIN", "1") == "1"
            and not os.environ.get("_SPARKCRAWL_PINNED")):
        os.environ["_SPARKCRAWL_PINNED"] = "1"
        os.execvp("taskset", ["taskset", "-c", f"0-{cores - 1}",
                              sys.executable] + sys.argv)

    from gen_web_sharded import ensure_web
    from sparkcrawl.session import get_spark
    from sparkcrawl.engine import CrawlConfig, CrawlEngine
    from sparkcrawl.tables import SnapshotStore
    from sparkcrawl import schema as S

    web = ensure_web(size, f"/tmp/sparkcrawl_benchweb_{size}")
    os.environ.setdefault("SPARKCRAWL_DRIVER_MEM", "8g")
    spark = get_spark(f"hot-{cores}", cores=cores,
                      shuffle_partitions=4 * cores,
                      extra_conf={"spark.ui.enabled": "true"})
    port = int(spark.sparkContext.uiWebUrl.rsplit(":", 1)[1])
    app_id = spark.sparkContext.applicationId
    store_dir = f"/tmp/sparkcrawl_hot_{cores}_{os.getpid()}"
    shutil.rmtree(store_dir, ignore_errors=True)
    store = SnapshotStore(store_dir)
    pages = spark.read.schema(S.PAGES).parquet(f"{web}/pages.parquet")
    meta = spark.read.schema(S.PAGE_META).parquet(f"{web}/page_meta.parquet")
    robots = spark.read.schema(S.ROBOTS).parquet(f"{web}/robots.parquet")
    seeds = spark.read.schema(S.SEEDS).parquet(f"{web}/seeds.parquet")
    eng = CrawlEngine(spark, store, pages, meta, robots, CrawlConfig())
    eng.init_frontier(seeds)

    last_stage = -1
    for r in range(1, rounds + 1):
        sids = [s["stageId"] for s in _api(port, f"applications/{app_id}/stages")]
        if sids:
            last_stage = max(sids)
        eng.run_round(r)

    stages = [s for s in _api(port, f"applications/{app_id}/stages")
              if s["stageId"] > last_stage and s["status"] == "COMPLETE"]
    stages.sort(key=lambda s: -s.get("executorRunTime", 0))
    for s in stages[:4]:
        print(f"=== stage {s['stageId']} runTime={s['executorRunTime']}ms "
              f"tasks={s['numCompleteTasks']} "
              f"input={s.get('inputBytes', 0)} "
              f"shuffleRead={s.get('shuffleReadBytes', 0)} "
              f"shuffleWrite={s.get('shuffleWriteBytes', 0)} "
              f"gc={s.get('jvmGcTime', 0)}ms "
              f"deser={s.get('executorDeserializeTime', 0)}ms "
              f"cpu={s.get('executorCpuTime', 0) // 1_000_000}ms")
        det = s.get("details", "")
        print("    callsite:")
        for line in det.splitlines()[:14]:
            print("      " + line)
        try:
            tl = _api(port, f"applications/{app_id}/stages/{s['stageId']}/0/"
                            f"taskList?length=50")
            tl.sort(key=lambda t: -(t.get("duration") or 0))
            for t in tl[:6]:
                tm = t.get("taskMetrics", {})
                print(f"      task {t['taskId']} dur={t.get('duration')}ms "
                      f"run={tm.get('executorRunTime')}ms "
                      f"cpu={(tm.get('executorCpuTime') or 0) // 1_000_000}ms "
                      f"deser={tm.get('executorDeserializeTime')}ms "
                      f"sched={t.get('schedulerDelay')}ms")
        except Exception as e:
            print("      taskList failed:", e)
        print()
    shutil.rmtree(store_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
