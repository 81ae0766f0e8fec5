"""Method/invariant tests for the ops-analytics tier
(queries/opsanalytics.py): each operator is checked against an
independent reference — a brute-force python re-derivation, a conserved
quantity, or the definitional formulation — not just against its own
oracle SQL (which driver_sim already covers)."""

from __future__ import annotations

from collections import defaultdict

import pyspark.sql.functions as F

from energi_data_etl_spark.queries.opsanalytics import (
    ab_test_two_proportion,
    active_users_rolling_7d,
    floored_running_balance,
    max_concurrent_sessions,
    order_date_streaks,
    pareto_frontier_lineitem,
    proration_largest_remainder,
    run_length_collapse,
    sql_udf_surface,
)
from energi_data_etl_spark.sources.tables import load_table


def test_active_users_rolling_vs_bruteforce(spark, sf_dir):
    rows = (
        load_table(spark, "events", sf_dir)
        .select(F.col("ts").cast("date").alias("d"), "user_id")
        .collect()
    )
    by_day = defaultdict(set)
    for r in rows:
        by_day[r.d].add(r.user_id)
    days = sorted(by_day)
    got = {r.d: r for r in active_users_rolling_7d(spark, sf_dir).collect()}
    assert sorted(got) == days
    for d in days:
        window = set()
        for d2 in days:
            if 0 <= (d - d2).days <= 6:
                window |= by_day[d2]
        assert got[d].dau == len(by_day[d])
        assert got[d].wau_7d == len(window)
        assert 0 < got[d].stickiness <= 1.0


def test_max_concurrent_vs_global_bruteforce(spark, sf_dir):
    """Re-derive peak concurrency per day from raw sessions WITHOUT the
    day-splitting: for each day, sweep only that day's instants over
    ALL sessions. Certifies that the day-boundary split loses nothing."""
    ev = sorted(
        load_table(spark, "events", sf_dir)
        .select("user_id", "event_id", F.col("ts").cast("timestamp").cast("long").alias("s"))
        .collect(),
        key=lambda r: (r.user_id, r.s, r.event_id),
    )
    sessions = []
    prev_user, prev_s = None, None
    for r in ev:
        if r.user_id != prev_user or r.s - prev_s > 1800:
            sessions.append([r.s, r.s])
        else:
            sessions[-1][1] = r.s
        prev_user, prev_s = r.user_id, r.s
    got = {r.day: r.max_concurrent for r in max_concurrent_sessions(spark, sf_dir).collect()}
    # sweep each day's boundary instants against the full session list
    import datetime

    for day, want_max in got.items():
        day_start = int(datetime.datetime.combine(day, datetime.time()).timestamp())
        day_end = day_start + 86399
        instants = sorted(
            {max(st, day_start) for st, en in sessions if st <= day_end and en >= day_start}
        )
        brute = max(
            sum(1 for st, en in sessions if st <= t <= en) for t in instants
        )
        assert brute == want_max, (day, brute, want_max)


def test_order_date_streaks_longest_is_consistent(spark, sf_dir):
    df = order_date_streaks(spark, sf_dir)
    bad = df.filter(
        (F.col("longest_streak") < 1)
        | (F.col("longest_streak") > F.col("n_active_days"))
        | (F.col("n_streaks") > F.col("n_active_days"))
    )
    assert bad.count() == 0
    # brute-force a few customers
    rows = load_table(spark, "orders", sf_dir).select("o_custkey", F.col("o_orderdate").cast("date").alias("d")).collect()
    per = defaultdict(set)
    for r in rows:
        per[r.o_custkey].add(r.d)
    got = {r.o_custkey: r for r in df.collect()}
    for ck in list(per)[:50]:
        days = sorted(per[ck])
        streaks, cur = [], 1
        for a, b in zip(days, days[1:]):
            if (b - a).days == 1:
                cur += 1
            else:
                streaks.append(cur)
                cur = 1
        streaks.append(cur)
        assert got[ck].n_active_days == len(days)
        assert got[ck].n_streaks == len(streaks)
        assert got[ck].longest_streak == max(streaks)


def test_run_length_collapse_conserves_events(spark, sf_dir):
    df = run_length_collapse(spark, sf_dir)
    total = df.agg(F.sum("n_events")).first()[0]
    n_ev = load_table(spark, "events", sf_dir).count()
    assert total == n_ev  # RLE loses no events
    assert df.filter(F.col("longest_run") < 1).count() == 0


def test_pareto_frontier_vs_bruteforce(spark, sf_dir):
    pts = (
        load_table(spark, "lineitem", sf_dir)
        .groupBy("l_returnflag", "l_quantity")
        .agg(F.min("l_extendedprice").alias("p"))
        .collect()
    )
    by_flag = defaultdict(list)
    for r in pts:
        by_flag[r.l_returnflag].append((r.l_quantity, r.p))
    want = set()
    for flag, ps in by_flag.items():
        for q, p in ps:
            if not any(q2 > q and p2 <= p for q2, p2 in ps):
                want.add((flag, q, p))
    got = {
        (r.l_returnflag, r.qty, r.best_price)
        for r in pareto_frontier_lineitem(spark, sf_dir).collect()
    }
    assert got == want


def test_proration_conserves_to_the_cent(spark, sf_dir):
    alloc = proration_largest_remainder(spark, sf_dir)
    per_order = alloc.groupBy("o_orderkey").agg(F.sum("alloc_cents").alias("s"))
    oc = load_table(spark, "orders", sf_dir).select(
        "o_orderkey", F.floor(F.col("o_totalprice") * 100 + 0.5).alias("total_cents")
    )
    joined = per_order.join(oc, "o_orderkey")
    assert joined.filter(F.col("s") != F.col("total_cents")).count() == 0
    assert alloc.filter(F.col("alloc_cents") < 0).count() == 0


def test_floored_balance_vs_stateful_loop(spark, sf_dir):
    rows = sorted(
        load_table(spark, "events", sf_dir)
        .select(
            "user_id",
            "event_id",
            F.col("ts").cast("timestamp").cast("long").alias("s"),
            (
                F.floor(F.col("value") * 100 + 0.5)
                * F.when(F.col("event_type") == "purchase", -10).otherwise(1)
            ).alias("delta"),
        )
        .collect(),
        key=lambda r: (r.user_id, r.s, r.event_id),
    )
    state = {}
    for r in rows:
        bal, mx, clamps = state.get(r.user_id, (0, 0, 0))
        bal = bal + r.delta
        if bal < 0:
            bal = 0
        if bal == 0 and r.delta < 0:
            clamps += 1
        state[r.user_id] = (bal, max(mx, bal), clamps)
    got = {r.user_id: r for r in floored_running_balance(spark, sf_dir).collect()}
    assert set(got) == set(state)
    for uid, (bal, mx, clamps) in state.items():
        assert got[uid].final_balance == bal, uid
        assert got[uid].max_balance == mx, uid
        assert got[uid].n_clamps == clamps, uid


def test_ab_split_is_deterministic_and_z_matches_scipy_form(spark, sf_dir):
    import math

    r = ab_test_two_proportion(spark, sf_dir).first()
    assert r.n_a > 0 and r.n_b > 0
    p_a, p_b = r.conv_a / r.n_a, r.conv_b / r.n_b
    pool = (r.conv_a + r.conv_b) / (r.n_a + r.n_b)
    se = math.sqrt(pool * (1 - pool) * (1 / r.n_a + 1 / r.n_b))
    want = math.floor((p_a - p_b) / se * 10000) / 10000
    assert r.z_floor4 == want


def test_sql_udf_inlines_into_codegen(spark, sf_dir):
    from energi_data_etl_spark.plans.inspect import explain_str

    df = sql_udf_surface(spark, sf_dir)
    plan = explain_str(df, mode="simple")
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "WholeStageCodegen" in explain_str(df, mode="formatted") or "HashAggregate" in plan
    # SQL table UDF variant: parameterized over a temp view
    load_table(spark, "orders", sf_dir).createOrReplaceTempView("eds_orders_v")
    spark.sql(
        """
        CREATE OR REPLACE TEMPORARY FUNCTION eds_big_orders(thr DOUBLE)
        RETURNS TABLE(o_orderkey BIGINT, o_totalprice DOUBLE)
        RETURN SELECT o_orderkey, o_totalprice FROM eds_orders_v WHERE o_totalprice >= thr
        """
    )
    n_udtf = spark.sql("SELECT COUNT(*) AS n FROM eds_big_orders(300000.0)").first()["n"]
    n_direct = spark.sql("SELECT COUNT(*) AS n FROM eds_orders_v WHERE o_totalprice >= 300000.0").first()["n"]
    assert n_udtf == n_direct


# ---------------------------------------------------------------------------
# Plan evidence: docstring scale claims vs actual physical plans
# ---------------------------------------------------------------------------


def test_active_users_spine_is_broadcast_band_join(spark, sf_dir):
    """The day spine joins by broadcast nested loop (the band predicate
    is non-equi); the dedup'd (user, day) frame is checkpoint-truncated
    so it computes once for spine and probe."""
    from energi_data_etl_spark.plans.inspect import explain_str
    from energi_data_etl_spark.queries import QUERIES

    plan = explain_str(QUERIES["active_users_rolling_7d"].fn(spark, sf_dir), mode="simple")
    assert "BroadcastNestedLoopJoin" in plan, plan
    assert "Scan ExistingRDD" in plan, plan  # localCheckpoint: dedup computed once


def test_proration_windows_reuse_join_partitioning(spark, sf_dir):
    """Join + wsum window + leftover window + remainder rank all key on
    the order key: exactly the join's two input exchanges, none after."""
    from energi_data_etl_spark.plans.inspect import explain_str
    from energi_data_etl_spark.queries import QUERIES

    plan = explain_str(QUERIES["proration_largest_remainder"].fn(spark, sf_dir), mode="simple")
    assert plan.count("Exchange hashpartitioning") <= 2, plan


def test_balance_and_rle_single_user_exchange(spark, sf_dir):
    """floored_running_balance: ONE user_id exchange shared by both
    windows and the per-user rollup. run_length_collapse: the user_id
    exchange plus the final |event_type|-keyed report exchange, which
    is map-side combined (≤5 rows per task cross the wire)."""
    from energi_data_etl_spark.plans.inspect import explain_str
    from energi_data_etl_spark.queries import QUERIES

    plan = explain_str(QUERIES["floored_running_balance"].fn(spark, sf_dir), mode="simple")
    assert plan.count("Exchange hashpartitioning") == 1, plan
    plan = explain_str(QUERIES["run_length_collapse"].fn(spark, sf_dir), mode="simple")
    assert plan.count("Exchange hashpartitioning") == 2, plan
    assert "partial_count" in plan, plan  # report rollup combines map-side


def test_pareto_window_runs_on_reduced_frame(spark, sf_dir):
    """The running-min window consumes the per-(flag, qty) aggregate,
    not the fact table: the plan aggregates BEFORE the window sort."""
    from energi_data_etl_spark.plans.inspect import explain_str
    from energi_data_etl_spark.queries import QUERIES

    plan = explain_str(QUERIES["pareto_frontier_lineitem"].fn(spark, sf_dir), mode="simple")
    # the tree prints consumer-first: Window ABOVE (= downstream of) the
    # reducing HashAggregate means the window's input is the reduced frame
    assert "Window" in plan and "HashAggregate" in plan, plan
    assert plan.index("Window") < plan.index("HashAggregate"), plan
