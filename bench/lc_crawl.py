"""Wide-web crawl under REAL multi-process executors vs single-JVM local.

Submits the same fixed-round crawl twice through ``spark-submit
--py-files sparkcrawl.zip`` — once at ``local[8]`` (one JVM, the mode
every other bench uses) and once at ``local-cluster[2,4,6144]`` (two
separate executor JVMs x 4 cores: serialized closures, network
shuffle/broadcast fetch, per-executor Python workers, executor-side
--py-files imports) — then verifies the two stores are bit-identical
(trace/crawled counts + order-insensitive content digests) and appends
the wall/throughput table to BENCH/BASELINE.md.

This is the sandbox's closest falsifier of the north rule's
"multi-executor cluster" claim: everything a second executor PROCESS can
break (BloomFileState shard merges under process concurrency, broadcast
transport, closure pickling) runs for real here, on the same crawl the
scaling benches measure.

Usage: python bench/lc_crawl.py [size=wide] [rounds=6]
"""

from __future__ import annotations

import datetime as dt
import json
import os
import shutil
import subprocess
import sys
import time
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SPARK_SUBMIT = os.path.join(
    os.environ.get("SPARK_HOME", "/opt/spark"), "bin", "spark-submit"
)

MASTERS = {
    "local": "local[8]",
    "local-cluster": "local-cluster[2,4,6144]",
}


def submit_leg(master: str, web: str, store: str, rounds: int,
               zip_path: str, cli_py: str, workdir: str) -> dict:
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)  # zip-only import, like a real cluster
    env["PYSPARK_PYTHON"] = sys.executable
    env["PYSPARK_DRIVER_PYTHON"] = sys.executable
    shutil.rmtree(store, ignore_errors=True)
    cmd = [
        SPARK_SUBMIT,
        "--master", master,
        "--conf", "spark.sql.shuffle.partitions=32",
        "--conf", "spark.driver.memory=12g",
        "--conf", "spark.ui.enabled=false",
        "--conf", "spark.sql.session.timeZone=UTC",
        "--py-files", zip_path,
        cli_py,
        "--web", web, "--store", store, "--max-rounds", str(rounds),
    ]
    # Equal 8-CPU envelope for both legs (local-cluster spreads them over
    # driver + 2 executor JVMs; local[8] puts them all in one).
    if os.environ.get("SPARKCRAWL_SCALE_PIN", "1") == "1":
        cmd = ["taskset", "-c", "0-7"] + cmd
    t0 = time.time()
    proc = subprocess.run(
        cmd, cwd=workdir, env=env, capture_output=True, text=True,
        timeout=int(os.environ.get("SPARKCRAWL_SCALE_TIMEOUT", "3600")),
    )
    wall = time.time() - t0
    if proc.returncode != 0:
        sys.stderr.write(proc.stderr[-4000:])
        raise SystemExit(f"leg failed: {master}")
    res = json.loads(
        [ln for ln in proc.stdout.splitlines() if ln.startswith("{")][-1]
    )
    res["submit_wall_s"] = round(wall, 2)
    return res


def store_digest(spark, store_dir: str) -> dict:
    """Order-insensitive content digest of a crawl store: row counts plus
    a commutative crc32 sum over the value-bearing columns (sum of 32-bit
    values over <=10^7 rows fits a long with ~30 bits to spare)."""
    from pyspark.sql import functions as F

    from sparkcrawl import schema as S
    from sparkcrawl.tables import SnapshotStore

    store = SnapshotStore(store_dir)
    crawled = store.read(spark, "crawled", S.CRAWLED)
    trace = store.read(spark, "trace", S.TRACE)
    c = crawled.agg(
        F.count("*").alias("n"),
        F.sum(
            F.crc32(F.concat_ws("\x01", "url_norm", F.md5("text")))
        ).alias("digest"),
    ).collect()[0]
    t = trace.agg(
        F.count("*").alias("n"),
        F.sum(
            F.crc32(
                F.concat_ws(
                    "\x01", F.col("round").cast("string"),
                    F.col("ord").cast("string"), "url_norm",
                )
            )
        ).alias("digest"),
    ).collect()[0]
    rounds = sorted(
        (r["round"], r["n_selected"], r["wall_ms"])
        for r in store.read(spark, "metrics", S.METRICS).collect()
    )
    ss_urls = sum(n for rd, n, w in rounds if rd > 1)
    ss_wall = sum(w for rd, n, w in rounds if rd > 1) / 1000.0
    return {
        "n_crawled": c["n"], "crawled_digest": int(c["digest"]),
        "n_traced": t["n"], "trace_digest": int(t["digest"]),
        "steady_urls": ss_urls, "steady_wall_s": round(ss_wall, 2),
        "steady_urls_per_sec": round(ss_urls / max(ss_wall, 1e-9), 2),
    }


def main():
    size = sys.argv[1] if len(sys.argv) > 1 else "wide"
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 6
    web = f"/tmp/sparkcrawl_benchweb_{size}"
    if not os.path.isdir(web):
        raise SystemExit(
            f"missing {web}: python tests/gen_fixtures.py {size} {web}"
        )

    from sparkcrawl.package import build_pyfiles_zip

    workdir = "/tmp/sparkcrawl_lc"
    os.makedirs(workdir, exist_ok=True)
    zip_path = build_pyfiles_zip(os.path.join(workdir, "sparkcrawl.zip"))
    cli_py = os.path.join(workdir, "cli_main.py")
    with zipfile.ZipFile(zip_path) as zf:
        with open(cli_py, "wb") as f:
            f.write(zf.read("sparkcrawl/cli.py"))

    legs = {}
    for key, master in MASTERS.items():
        store = os.path.join(workdir, f"store_{key}")
        legs[key] = {
            "master": master,
            "store": store,
            "run": submit_leg(
                master, web, store, rounds, zip_path, cli_py, workdir
            ),
        }

    # digest both stores with one small in-process session
    from sparkcrawl.session import get_spark

    spark = get_spark("lc-digest", cores=8, shuffle_partitions=16)
    for leg in legs.values():
        leg["digest"] = store_digest(spark, leg["store"])
        shutil.rmtree(leg["store"], ignore_errors=True)

    a, b = legs["local"], legs["local-cluster"]
    identical = (
        a["digest"]["n_crawled"] == b["digest"]["n_crawled"]
        and a["digest"]["crawled_digest"] == b["digest"]["crawled_digest"]
        and a["digest"]["n_traced"] == b["digest"]["n_traced"]
        and a["digest"]["trace_digest"] == b["digest"]["trace_digest"]
    )
    out = {
        "size": size, "rounds": rounds, "identical": identical,
        "legs": {
            k: {"master": v["master"], **v["run"], **v["digest"]}
            for k, v in legs.items()
        },
    }
    print(json.dumps(out, indent=2))

    stamp = dt.datetime.now(dt.timezone.utc).strftime("%Y-%m-%d %H:%M UTC")
    lines = [
        "",
        f"## local-cluster A/B {stamp} (size={size}, rounds={rounds}, "
        f"8 CPUs per leg, zip-only imports)",
        "",
        "| master | engine wall s | submit wall s | traced | extracted |"
        " steady URLs/s | trace digest | crawled digest |",
        "|---|---|---|---|---|---|---|---|",
    ]
    for k in ("local", "local-cluster"):
        leg, d = legs[k], legs[k]["digest"]
        lines.append(
            f"| {leg['master']} | {leg['run']['wall_ms'] / 1000.0:.2f} |"
            f" {leg['run']['submit_wall_s']} | {d['n_traced']} |"
            f" {d['n_crawled']} | {d['steady_urls_per_sec']} |"
            f" {d['trace_digest']} | {d['crawled_digest']} |"
        )
    lines.append("")
    lines.append(
        ("**Bit-identical stores across execution modes** (counts + "
         "order-insensitive crc32 digests of trace AND crawled text)."
         if identical else
         "**DIVERGENCE DETECTED — investigate before trusting "
         "multi-executor claims.**")
        + " local-cluster runs 2 separate executor JVMs (4 cores, 6 GiB "
        "each): real serialized closures, network shuffle/broadcast, "
        "executor-side --py-files imports, per-executor Python workers, "
        "and BloomFileState shard merges under process concurrency."
    )
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "a") as f:
        f.write("\n".join(lines) + "\n")
    if not identical:
        raise SystemExit(1)


if __name__ == "__main__":
    main()
