"""Shared pytest fixtures: one SparkSession per run + tiny synthetic web."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from sparkcrawl.session import get_spark  # noqa: E402
from gen_fixtures import generate, write_parquet  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = get_spark("sparkcrawl-tests", cores=4, shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def fixtures():
    return generate("tiny", seed=42)


@pytest.fixture(scope="session")
def fixture_paths(fixtures, tmp_path_factory):
    out = tmp_path_factory.mktemp("web")
    return write_parquet(fixtures, str(out))


def load_inputs(spark, fixture_paths):
    from sparkcrawl import schema as S

    pages = spark.read.schema(S.PAGES).parquet(fixture_paths["pages"])
    meta = spark.read.schema(S.PAGE_META).parquet(fixture_paths["page_meta"])
    robots = spark.read.schema(S.ROBOTS).parquet(fixture_paths["robots"])
    seeds = spark.read.schema(S.SEEDS).parquet(fixture_paths["seeds"])
    return pages, meta, robots, seeds
