"""North-rule deployment shape: the crawl runs via real ``spark-submit
--py-files sparkcrawl.zip`` (BASELINE.json north_rule / north_star), with
checkpoint resume across process death, and produces the identical
crawled corpus as an in-process engine run.

The subprocess legs run with cwd=tmp and the repo stripped from
PYTHONPATH, so driver AND executor Python workers can only import
``sparkcrawl`` from the shipped zip — Arrow UDFs are pickled by module
reference, so a worker-side import failure would fail the crawl. This is
the closest a single-box sandbox gets to proving the --py-files path a
multi-executor cluster uses.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import zipfile

import pytest

from conftest import load_inputs

from sparkcrawl import schema as S
from sparkcrawl.engine import CrawlConfig, CrawlEngine
from sparkcrawl.package import build_pyfiles_zip
from sparkcrawl.tables import SnapshotStore

SPARK_SUBMIT = os.path.join(
    os.environ.get("SPARK_HOME", "/opt/spark"), "bin", "spark-submit"
)


def _submit(cli_py, zip_path, cwd, *args):
    env = dict(os.environ)
    # Prove zip-only import: drop the repo (and tests dir) from the
    # subprocess interpreter's path.
    env.pop("PYTHONPATH", None)
    env["PYSPARK_PYTHON"] = sys.executable
    env["PYSPARK_DRIVER_PYTHON"] = sys.executable
    cmd = [
        SPARK_SUBMIT,
        "--master", "local[4]",
        "--conf", "spark.sql.shuffle.partitions=8",
        "--conf", "spark.ui.enabled=false",
        "--conf", "spark.driver.memory=2g",
        "--py-files", zip_path,
        cli_py, *args,
    ]
    proc = subprocess.run(
        cmd, cwd=cwd, env=env, capture_output=True, text=True, timeout=600
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    # last stdout line is the engine's JSON result
    lines = [ln for ln in proc.stdout.splitlines() if ln.startswith("{")]
    assert lines, proc.stdout[-2000:] + proc.stderr[-2000:]
    return json.loads(lines[-1])


def _crawled_map(spark, store_dir):
    store = SnapshotStore(store_dir)
    return {
        r["url_norm"]: r["text"]
        for r in store.read(spark, "crawled", S.CRAWLED).collect()
    }


@pytest.mark.skipif(
    not os.path.exists(SPARK_SUBMIT), reason="spark-submit not installed"
)
def test_spark_submit_pyfiles_resume(spark, fixture_paths, tmp_path):
    # -- expected: in-process run with the CLI's default config ----------
    pages, meta, robots, seeds = load_inputs(spark, fixture_paths)
    ref_store = SnapshotStore(str(tmp_path / "ref_store"))
    CrawlEngine(spark, ref_store, pages, meta, robots, CrawlConfig()).run(
        seeds
    )
    expected = _crawled_map(spark, str(tmp_path / "ref_store"))
    assert expected  # tiny web crawls a non-trivial corpus

    # -- package + extract the primary resource from the zip itself ------
    zip_path = build_pyfiles_zip(str(tmp_path / "sparkcrawl.zip"))
    # deterministic packaging: rebuild is bit-identical
    zip2 = build_pyfiles_zip(str(tmp_path / "sparkcrawl2.zip"))
    with open(zip_path, "rb") as a, open(zip2, "rb") as b:
        assert a.read() == b.read()
    cli_py = str(tmp_path / "cli_main.py")
    with zipfile.ZipFile(zip_path) as zf:
        with open(cli_py, "wb") as f:
            f.write(zf.read("sparkcrawl/cli.py"))

    web = os.path.dirname(fixture_paths["pages"])
    store = str(tmp_path / "store")
    corpus = str(tmp_path / "corpus")

    # -- leg 1: partial crawl, then kill (process exit) ------------------
    res1 = _submit(
        cli_py, zip_path, str(tmp_path),
        "--web", web, "--store", store, "--max-rounds", "2",
    )
    assert res1["rounds"] == 2

    # -- leg 2: resume from checkpoint in a NEW process, run to fixpoint -
    res2 = _submit(
        cli_py, zip_path, str(tmp_path),
        "--web", web, "--store", store, "--resume", "--export", corpus,
    )
    assert res2["n_crawled_total"] == len(expected)
    assert res2["n_frontier"] == 0  # quiescence reached

    # byte-identical corpus vs the in-process run, across process death
    assert _crawled_map(spark, store) == expected

    # export landed in url$$$body format with one line per crawled doc
    n_lines = 0
    for fn in os.listdir(corpus):
        if fn.startswith("part-"):
            with open(os.path.join(corpus, fn), encoding="utf-8") as f:
                for ln in f:
                    if ln.strip():
                        assert "$$$" in ln
                        n_lines += 1
    assert n_lines == len(expected)
