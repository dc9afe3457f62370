"""as-of join (sparkcrawl/relational.py): pandas merge_asof is the third
engine (the duckdb oracle `asof_join` pins the native ASOF JOIN side)."""

from __future__ import annotations

import random

import pandas as pd
import pytest

from sparkcrawl.relational import asof_join


def _frames(seed=7, n_left=120, n_right=80, keys=5):
    rng = random.Random(seed)
    left = pd.DataFrame({
        "k": [rng.randrange(keys) for _ in range(n_left)],
        "t": [rng.randrange(1000) for _ in range(n_left)],
        "lid": range(n_left),
    })
    # unique (k, t) on the right — the op's determinism precondition
    seen, rows = set(), []
    while len(rows) < n_right:
        k, t = rng.randrange(keys), rng.randrange(1000)
        if (k, t) not in seen:
            seen.add((k, t))
            rows.append((k, t, len(rows)))
    right = pd.DataFrame(rows, columns=["k", "t", "rid"])
    return left, right


@pytest.mark.parametrize("direction", ["backward", "forward"])
def test_asof_join_matches_pandas_merge_asof(spark, direction):
    left, right = _frames()
    want = pd.merge_asof(
        left.sort_values(["t", "lid"]), right.sort_values("t"),
        on="t", by="k", direction=direction, suffixes=("", "_r"),
    )
    got = asof_join(
        spark.createDataFrame(left), spark.createDataFrame(right),
        on="t", by=["k"], direction=direction,
    ).toPandas()
    # pandas returns matched right t under 't_r'? no — merge_asof keeps a
    # single 'on' column; compare the matched rid per left row instead
    want_map = dict(zip(want["lid"], want["rid"]))
    got_map = dict(zip(got["lid"], got["rid"]))
    assert len(got) == len(left)
    for lid in left["lid"]:
        w, g = want_map[lid], got_map[lid]
        assert (pd.isna(w) and pd.isna(g)) or w == g, (direction, lid, w, g)


def test_asof_join_exact_match_and_suffix(spark):
    l = spark.createDataFrame([(1, 10, "a")], "k long, t long, v string")
    r = spark.createDataFrame([(1, 10, "x")], "k long, t long, v string")
    row = asof_join(l, r, on="t", by=["k"]).collect()[0]
    # exact-time right row matches in both directions; clashing right
    # columns come back suffixed
    assert row["v"] == "a" and row["v_r"] == "x" and row["t_r"] == 10


def test_asof_join_no_match_is_null(spark):
    l = spark.createDataFrame([(1, 5)], "k long, t long")
    r = spark.createDataFrame([(1, 9)], "k long, t long")
    row = asof_join(l, r, on="t", by=["k"]).collect()[0]
    assert row["t_r"] is None
    fwd = asof_join(l, r, on="t", by=["k"], direction="forward").collect()[0]
    assert fwd["t_r"] == 9


def test_asof_join_rejects_bad_direction(spark):
    l = spark.createDataFrame([(1, 5)], "k long, t long")
    with pytest.raises(ValueError):
        asof_join(l, l, on="t", by=["k"], direction="nearest")


def test_length_quantiles_exact_rank_semantics(spark, tmp_path):
    """q_length_quantiles picks the value at ceil(p*n) in the (n_chars,
    doc_id) total order — pinned against a plain-Python computation on a
    fixture with even counts and ties (where interpolating built-ins
    disagree across engines)."""
    import math

    from sparkcrawl.queries import q_length_quantiles

    rows = [
        # en: 10 docs incl. ties at 30
        *[(i, "en", v) for i, v in enumerate(
            [10, 20, 30, 30, 30, 40, 50, 60, 70, 80])],
        # de: a single doc (every quantile = that doc)
        (100, "de", 7),
    ]
    df = spark.createDataFrame(rows, "doc_id long, lang string, n_chars long")
    df.write.parquet(str(tmp_path / "documents.parquet"))

    got = {r["lang"]: r.asDict()
           for r in q_length_quantiles(spark, str(tmp_path)).collect()}

    by_lang = {}
    for _, lang, v in rows:
        by_lang.setdefault(lang, []).append(v)
    for lang, vals in by_lang.items():
        vals.sort()
        n = len(vals)
        for p in (50, 90, 99):
            want = vals[math.ceil(p * n / 100) - 1]
            assert got[lang][f"p{p}"] == want, (lang, p, got[lang])
        assert got[lang]["n_docs"] == n
    assert got["en"]["p50"] == 30 and got["de"]["p50"] == 7
