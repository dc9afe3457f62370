"""Map the last round's Spark jobs/stages to SQL executions + plan nodes
(REST /sql endpoint) — finds WHICH operator owns an anonymous stage.

Usage: python bench/profile_sqlexec.py [size] [cores] [rounds]
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
            f"http://localhost:{port}/api/v1/{path}", timeout=20) as r:
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
    spark = get_spark(f"sqlx-{cores}", cores=cores, shuffle_partitions=cores,
                      extra_conf={"spark.ui.enabled": "true"})
    port = int(spark.sparkContext.uiWebUrl.rsplit(":", 1)[1])
    app_id = spark.sparkContext.applicationId
    store_dir = f"/tmp/sparkcrawl_sqlx_{os.getpid()}"
    shutil.rmtree(store_dir, ignore_errors=True)
    store = SnapshotStore(store_dir)
    pages = spark.read.schema(S.PAGES).parquet(f"{web}/pages.parquet")
    meta = spark.read.schema(S.PAGE_META).parquet(f"{web}/page_meta.parquet")
    robots = spark.read.schema(S.ROBOTS).parquet(f"{web}/robots.parquet")
    seeds = spark.read.schema(S.SEEDS).parquet(f"{web}/seeds.parquet")
    eng = CrawlEngine(spark, store, pages, meta, robots, CrawlConfig())
    eng.init_frontier(seeds)

    last_exec = -1
    for r in range(1, rounds + 1):
        eids = [e["id"] for e in _api(port, f"applications/{app_id}/sql?length=2000")]
        if eids:
            last_exec = max(eids)
        eng.run_round(r)

    stages = {s["stageId"]: s
              for s in _api(port, f"applications/{app_id}/stages")
              if s["status"] == "COMPLETE"}
    execs = [e for e in
             _api(port, f"applications/{app_id}/sql?length=2000&details=true")
             if e["id"] > last_exec]
    rows = []
    for e in execs:
        sids = sorted(set(e.get("stages", [])))
        run = sum(stages[s].get("executorRunTime", 0)
                  for s in sids if s in stages)
        ntasks = sum(stages[s].get("numCompleteTasks", 0)
                     for s in sids if s in stages)
        rows.append((run, e["id"], e.get("description", "")[:90],
                     sids, ntasks, e.get("duration", 0)))
    rows.sort(reverse=True)
    for run, eid, desc, sids, ntasks, dur in rows:
        print(f"exec {eid} run={run}ms wall={dur}ms tasks={ntasks} "
              f"stages={sids} :: {desc}")
    # detail the heaviest execution's plan nodes
    if rows:
        top = rows[0][1]
        e = [x for x in execs if x["id"] == top][0]
        print("\n== top exec plan nodes ==")
        for n in e.get("nodes", [])[:80]:
            mets = {m["name"]: m["value"] for m in n.get("metrics", [])}
            interesting = {k: v for k, v in mets.items()
                           if any(t in k for t in
                                  ("time", "rows", "partitions"))}
            print(f"  node {n['nodeId']:>3} {n['nodeName'][:50]:<50} "
                  f"{json.dumps(interesting)[:160]}")
    shutil.rmtree(store_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
