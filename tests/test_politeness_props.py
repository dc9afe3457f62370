"""Property test: politeness selection (both the salted two-phase top-k and
the direct window path) matches the pure-Python oracle on random frontiers."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings, strategies as st

from sparkcrawl import schema as S
from sparkcrawl.politeness import select_per_host, select_py

hosts = st.sampled_from([f"h{i}.com" for i in range(6)])


@st.composite
def frontiers(draw):
    n = draw(st.integers(1, 60))
    seqs = draw(
        st.lists(
            st.integers(1, 10_000), min_size=n, max_size=n, unique=True
        )
    )
    rows = []
    for i, s in enumerate(seqs):
        h = draw(hosts)
        rows.append((f"http://{h}:80/p{i}", h, f"/p{i}", 1, s, 0))
    prio = {
        h: draw(st.sampled_from([1, 2, 3]))
        for h in {r[1] for r in rows}
        if draw(st.booleans())
    }
    return rows, prio


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(frontiers())
def test_selection_matches_oracle_both_paths(spark, case):
    rows, prio = case
    frontier = spark.createDataFrame(rows, S.FRONTIER)
    prio_df = spark.createDataFrame(
        list(prio.items()) or [("__none__", 3)], "host string, priority int"
    )
    want = {
        (r["host"], r["seq"])
        for r in select_py(
            [
                dict(url_norm=u, host=h, path=p, depth=d, seq=s)
                for (u, h, p, d, s, _) in rows
            ],
            prio, rules={}, clock={}, round_no=1,
        )
    }
    # direct single-window path (small-frontier fast path)
    direct = {
        (r["host"], r["seq"])
        for r in select_per_host(
            frontier, prio_df, frontier_size=len(rows)
        ).collect()
    }
    # salted two-phase path (the mega-host scale path)
    two_phase = {
        (r["host"], r["seq"])
        for r in select_per_host(frontier, prio_df, frontier_size=None).collect()
    }
    assert direct == want
    assert two_phase == want
