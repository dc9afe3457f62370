"""Dump EVERY stage of the last crawl round (task count, run/cpu/deser,
python boundary) plus a job count — the round-5 fixed-latency census.

Usage: python bench/profile_stages_all.py [size] [cores] [rounds]
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


def _api(port, path):
    with urllib.request.urlopen(
            f"http://localhost:{port}/api/v1/{path}", timeout=10) as r:
        return json.loads(r.read())


def main():
    size = sys.argv[1] if len(sys.argv) > 1 else "t2"
    cores = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    rounds = int(sys.argv[3]) if len(sys.argv) > 3 else 5

    if (os.environ.get("SPARKCRAWL_SCALE_PIN", "1") == "1"
            and not os.environ.get("_SPARKCRAWL_PINNED")):
        os.environ["_SPARKCRAWL_PINNED"] = "1"
        os.execvp("taskset", ["taskset", "-c", f"0-{cores - 1}",
                              sys.executable] + sys.argv)

    from gen_web_sharded import ensure_web
    from sparkcrawl import schema as S
    from sparkcrawl.engine import CrawlConfig, CrawlEngine
    from sparkcrawl.session import get_spark
    from sparkcrawl.tables import SnapshotStore

    web = ensure_web(size, f"/tmp/sparkcrawl_benchweb_{size}")
    spark = get_spark(f"stall-{cores}", cores=cores,
                      shuffle_partitions=cores,
                      extra_conf={"spark.ui.enabled": "true"})
    port = int(spark.sparkContext.uiWebUrl.rsplit(":", 1)[1])
    app_id = spark.sparkContext.applicationId
    store_dir = f"/tmp/sparkcrawl_census_{os.getpid()}"
    shutil.rmtree(store_dir, ignore_errors=True)
    store = SnapshotStore(store_dir)
    pages = spark.read.schema(S.PAGES).parquet(f"{web}/pages.parquet")
    meta = spark.read.schema(S.PAGE_META).parquet(f"{web}/page_meta.parquet")
    robots = spark.read.schema(S.ROBOTS).parquet(f"{web}/robots.parquet")
    seeds = spark.read.schema(S.SEEDS).parquet(f"{web}/seeds.parquet")
    eng = CrawlEngine(spark, store, pages, meta, robots, CrawlConfig())
    eng.init_frontier(seeds)

    last_stage = last_job = -1
    for r in range(1, rounds + 1):
        sids = [s["stageId"] for s in _api(port, f"applications/{app_id}/stages")]
        jids = [j["jobId"] for j in _api(port, f"applications/{app_id}/jobs")]
        if sids:
            last_stage = max(sids)
        if jids:
            last_job = max(jids)
        out = eng.run_round(r)
    print("last round:", out)

    jobs = [j for j in _api(port, f"applications/{app_id}/jobs")
            if j["jobId"] > last_job]
    stages = [s for s in _api(port, f"applications/{app_id}/stages")
              if s["stageId"] > last_stage and s["status"] == "COMPLETE"]
    stages.sort(key=lambda s: s["stageId"])
    tot_run = sum(s.get("executorRunTime", 0) for s in stages)
    print(f"jobs={len(jobs)} stages={len(stages)} "
          f"sum_stage_runtime_ms={tot_run}")
    for s in stages:
        name = s.get("name", "")[:60]
        print(f"  st {s['stageId']:>4} tasks={s['numCompleteTasks']:>4} "
              f"run={s.get('executorRunTime', 0):>5}ms "
              f"cpu={s.get('executorCpuTime', 0) // 1_000_000:>5}ms "
              f"deser={s.get('executorDeserializeTime', 0):>4}ms "
              f"in={s.get('inputBytes', 0):>9} "
              f"sr={s.get('shuffleReadBytes', 0):>8} {name}")
        if s.get("executorRunTime", 0) > 500:
            det = s.get("details", "")
            for line in det.splitlines()[:18]:
                print("        | " + line)
            try:
                tl = _api(port, f"applications/{app_id}/stages/"
                                f"{s['stageId']}/0/taskList?length=40")
                tl.sort(key=lambda t: -(t.get("duration") or 0))
                for t in tl[:4]:
                    tm = t.get("taskMetrics", {})
                    print(f"        task {t['taskId']} "
                          f"dur={t.get('duration')}ms "
                          f"run={tm.get('executorRunTime')}ms "
                          f"cpu={(tm.get('executorCpuTime') or 0)//1_000_000}"
                          f"ms gettingResult={t.get('gettingResultTime')}ms "
                          f"sched={t.get('schedulerDelay')}ms")
            except Exception as e:
                print("        taskList failed:", e)
    shutil.rmtree(store_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
