"""Property-based tests for the batch-19 kernels whose bugs would be
silent on the fixture (hypothesis, randomized inputs vs pure-python
references), plus plan evidence for the batch-19/20 scale claims."""

from __future__ import annotations

import tempfile

import pyspark.sql.functions as F
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from energi_data_etl_spark.queries.datapipe import (
    APPORTION_BUDGET,
    cascade_delete_audit,
    token_budget_apportionment,
)
from energi_data_etl_spark.queries.llm import semdedup_cell_prune
from energi_data_etl_spark.queries.timeseries import PRESENCE_US, interval_coalesce_users

SETTINGS = dict(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)


@given(
    st.dictionaries(
        st.integers(0, 4),
        # offsets in minutes over two days: dense enough to merge,
        # sparse enough to leave gaps; duplicates allowed (same-start
        # intervals must merge, the fixture rarely exercises that)
        st.lists(st.integers(0, 2880), min_size=1, max_size=40),
        min_size=1,
        max_size=5,
    )
)
@settings(**SETTINGS)
def test_interval_coalesce_property(spark, starts_per_user):
    rows, i = [], 0
    for u, mins in starts_per_user.items():
        for m in mins:
            rows.append((i, 1704067200_000000 + m * 60_000_000, int(u)))
            i += 1
    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(
            rows, "event_id long, us long, user_id long"
        ).select(
            "event_id",
            F.timestamp_micros("us").alias("ts"),
            "user_id",
            F.lit("view").alias("event_type"),
            F.lit(1.0).alias("value"),
            F.lit("{}").alias("props"),
        ).repartition(4).write.mode("overwrite").parquet(f"{d}/events.parquet")
        got = {r.user_id: r for r in interval_coalesce_users(spark, d).collect()}
    for u, mins in starts_per_user.items():
        islands = []
        for s in sorted(m * 60_000_000 + 1704067200_000000 for m in mins):
            e = s + PRESENCE_US
            if islands and s <= islands[-1][1]:
                islands[-1][1] = max(islands[-1][1], e)
            else:
                islands.append([s, e])
        r = got[u]
        assert r.n_islands == len(islands)
        assert r.coverage_us == sum(e - s for s, e in islands)
        assert r.max_island_us == max(e - s for s, e in islands)


@given(
    st.dictionaries(
        st.sampled_from(["a", "b", "c", "d", "e", "f"]),
        st.integers(1, 400),  # docs per source; token count = 3 per doc
        min_size=2,
        max_size=6,
    )
)
@settings(**SETTINGS)
def test_apportionment_property(spark, docs_per_source):
    rows, i = [], 0
    for s, n in docs_per_source.items():
        for _ in range(n):
            # 3 whitespace tokens per doc -> n_tokens = 3n per source
            rows.append((i, "tok tok tok", "en", s, 11))
            i += 1
    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(
            rows, "doc_id long, text string, lang string, source string, n_chars long"
        ).repartition(4).write.mode("overwrite").parquet(f"{d}/documents.parquet")
        got = token_budget_apportionment(spark, d).collect()
    toks = {s: 3 * n for s, n in docs_per_source.items()}
    total = sum(toks.values())
    quotas = {s: (APPORTION_BUDGET * t) // total for s, t in toks.items()}
    rems = {s: (APPORTION_BUDGET * t) % total for s, t in toks.items()}
    leftover = APPORTION_BUDGET - sum(quotas.values())
    order = sorted(toks, key=lambda s: (-rems[s], s))
    # exact conservation + per-source python replay
    assert sum(r.final_alloc for r in got) == APPORTION_BUDGET
    for r in got:
        assert r.quota_floor == quotas[r.source]
        expected_extra = order.index(r.source) < leftover
        assert r.got_extra == expected_extra
        assert r.final_alloc == quotas[r.source] + int(expected_extra)


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "simple")


def test_semdedup_pair_join_is_equi_not_cartesian(spark, sf_dir):
    plan = _plan(semdedup_cell_prune(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan  # pair join hashes on cid


def test_cascade_delete_probes_are_broadcast(spark, sf_dir):
    plan = _plan(cascade_delete_audit(spark, sf_dir))
    assert "CartesianProduct" not in plan
    # every membership probe carries the broadcast hint; no sort-merge
    assert "SortMergeJoin" not in plan


def test_interval_coalesce_windows_share_one_shuffle(spark, sf_dir):
    from energi_data_etl_spark.queries.timeseries import interval_coalesce_users

    plan = _plan(interval_coalesce_users(spark, sf_dir))
    # the running-max window and the island-sum window share ONE
    # hashpartitioning(user_id) exchange; the only other exchange is
    # the (user_id, island) rollup
    assert plan.count("hashpartitioning(user_id") == 1
    assert plan.count("Exchange") <= 2


def test_rolling_correlation_single_calendar_sort(spark, sf_dir):
    from energi_data_etl_spark.queries.timeseries import rolling_correlation_daily

    plan = _plan(rolling_correlation_daily(spark, sf_dir))
    # all six window sums ride ONE single-partition sort of the
    # calendar-sized daily frame (plus the day-grain groupBy exchange)
    assert plan.count("SinglePartition") == 1
    assert plan.count("Exchange") <= 2


@given(
    st.lists(
        st.tuples(st.integers(0, 1023), st.integers(0, 1023)),
        min_size=3,
        max_size=8,
    ),
    st.lists(
        st.tuples(st.integers(0, 1023), st.integers(0, 1023)),
        min_size=5,
        max_size=30,
    ),
)
@settings(max_examples=20, deadline=None)
def test_ray_cast_terms_match_float_reference_on_random_polygons(poly, points):
    """The integer-orientation crossing terms (generated as ANSI SQL,
    evaluated here in DuckDB) implement the even-odd rule for ANY
    integer polygon — including degenerate/self-intersecting vertex
    lists, where even-odd is still well-defined — matching the
    textbook float intersection-x reference exactly (coordinates
    < 2^10 keep every product exact in both arithmetics)."""
    import duckdb

    import energi_data_etl_spark.queries.spatial as sp

    # generate terms for this polygon via the same code path the query
    # uses (swap the module FENCE, restore after)
    orig = sp.FENCE
    try:
        sp.FENCE = poly
        _, sql_terms = sp._crossing_terms("x", "y")
    finally:
        sp.FENCE = orig

    def ref(px, py):
        inside = False
        n = len(poly)
        for i in range(n):
            x1, y1 = poly[i]
            x2, y2 = poly[(i + 1) % n]
            if (y1 <= py) != (y2 <= py):
                if px < x1 + (py - y1) * (x2 - x1) / (y2 - y1):
                    inside = not inside
        return inside

    con = duckdb.connect()
    vals = ", ".join(f"({x}, {y})" for x, y in points)
    rows = con.execute(
        f"SELECT x, y, ({' + '.join(sql_terms)}) % 2 = 1 FROM (VALUES {vals}) t(x, y)"
    ).fetchall()
    for x, y, got in rows:
        assert got == ref(x, y), (poly, x, y)
