"""Job-level drill-down for one crawl round: run `rounds` rounds and, for
the LAST one, dump every Spark job the round submitted (description,
duration, stage/task counts) from the UI REST API. This is the tool for
attacking the small-round fixed cost: phase walls (profile_round.py) say
WHICH phase is slow; this says which JOBS inside it.

Usage: python bench/profile_jobs.py [size] [cores] [rounds]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time
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
    spark = get_spark(f"jobs-{cores}", cores=cores,
                      shuffle_partitions=4 * cores,
                      extra_conf={"spark.ui.enabled": "true"})
    port = int(spark.sparkContext.uiWebUrl.rsplit(":", 1)[1])
    app_id = spark.sparkContext.applicationId
    store_dir = f"/tmp/sparkcrawl_jobs_{cores}_{os.getpid()}"
    shutil.rmtree(store_dir, ignore_errors=True)
    store = SnapshotStore(store_dir)
    pages = spark.read.schema(S.PAGES).parquet(f"{web}/pages.parquet")
    meta = spark.read.schema(S.PAGE_META).parquet(f"{web}/page_meta.parquet")
    robots = spark.read.schema(S.ROBOTS).parquet(f"{web}/robots.parquet")
    seeds = spark.read.schema(S.SEEDS).parquet(f"{web}/seeds.parquet")
    conf_kw = json.loads(os.environ.get("SPARKCRAWL_SCALE_CONF", "{}"))
    eng = CrawlEngine(spark, store, pages, meta, robots,
                      CrawlConfig(**conf_kw))
    eng.init_frontier(seeds)

    last_job = -1
    for r in range(1, rounds + 1):
        jobs = _api(port, f"applications/{app_id}/jobs")
        if jobs:
            last_job = max(j["jobId"] for j in jobs)
        t0 = time.time()
        out = eng.run_round(r)
        wall = time.time() - t0
        print(f"ROUND {r}: {wall:.2f}s selected={out['n_selected']}",
              flush=True)

    from datetime import datetime

    def _ts(s):
        return datetime.strptime(s.replace("GMT", ""),
                                 "%Y-%m-%dT%H:%M:%S.%f")

    jobs = _api(port, f"applications/{app_id}/jobs")
    new = sorted((j for j in jobs if j["jobId"] > last_job),
                 key=lambda j: j["jobId"])
    total_ms = 0.0
    for j in new:
        dur = -1.0
        if j.get("completionTime") and j.get("submissionTime"):
            try:
                dur = (_ts(j["completionTime"])
                       - _ts(j["submissionTime"])).total_seconds() * 1000
            except ValueError:
                pass
        if dur > 0:
            total_ms += dur
        desc = (j.get("description") or j.get("name", ""))[:110]
        print(f"  job {j['jobId']:>4}  {dur:8.0f} ms  "
              f"stages={len(j.get('stageIds', []))} "
              f"tasks={j.get('numTasks', '?')}  {desc}", flush=True)
        if dur > 400:
            # attribute: per-stage names + task-time for the slow jobs
            for sid in sorted(j.get("stageIds", [])):
                try:
                    for att in _api(port,
                                    f"applications/{app_id}/stages/{sid}"):
                        if att.get("status") == "SKIPPED":
                            continue
                        print(
                            f"        stage {sid:>4} "
                            f"{att.get('executorRunTime', 0):>7} ms-task "
                            f"n={att.get('numCompleteTasks', 0):<4} "
                            f"{att.get('name', '')[:90]}", flush=True)
                except Exception:
                    pass
    if new:
        span = (_ts(new[-1]["completionTime"])
                - _ts(new[0]["submissionTime"])).total_seconds()
        print(f"LAST-ROUND jobs={len(new)} sum_job_ms={total_ms:.0f} "
              f"first-to-last span={span:.2f}s")
    shutil.rmtree(store_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
