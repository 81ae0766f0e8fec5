"""Semantic invariants of the behavioral-analytics tier (beyond the
oracle parity checks): conservation laws and monotonicity that must
hold on ANY input, pinned on the sf0.001 fixture so a future refactor
that keeps the oracle in lockstep but breaks the semantics (e.g. both
sides silently dropping rows) still fails loudly.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from energi_data_etl_spark.queries import QUERIES
from energi_data_etl_spark.sources.tables import load_table


def test_sessionize_conserves_events(spark, sf_dir):
    """Every event lands in exactly one session: per-user n_events sums
    to the raw event count, and session counts are sane."""
    out = QUERIES["sessionize_events_batch"].fn(spark, sf_dir).toPandas()
    raw = load_table(spark, "events", sf_dir)
    assert int(out["n_events"].sum()) == raw.count()
    assert (out["n_sessions"] <= out["n_events"]).all()
    assert (out["n_sessions"] >= 1).all()
    assert (out["longest_session_events"] <= out["n_events"]).all()
    assert (out["total_active_secs"] >= 0).all()
    assert len(out) == raw.select("user_id").distinct().count()


def test_funnel_is_monotone(spark, sf_dir):
    """Each funnel stage is a strict subset of the previous: the ordered
    conditional-MIN chain can only lose users downstream."""
    row = QUERIES["funnel_view_click_purchase"].fn(spark, sf_dir).collect()[0]
    assert row.n_users >= row.n_viewed >= row.n_clicked_after >= row.n_purchased_after >= 0
    assert 0.0 <= row.conversion_rate <= 1.0
    if row.n_purchased_after:
        assert row.avg_secs_to_convert > 0


def test_cohort_retention_triangle(spark, sf_dir):
    """Offset-0 cells must cover every user exactly once (everyone is
    active in their own first week), offsets are non-negative, and no
    cell exceeds its cohort's size."""
    out = QUERIES["cohort_weekly_retention"].fn(spark, sf_dir).toPandas()
    raw = load_table(spark, "events", sf_dir)
    n_users = raw.select("user_id").distinct().count()
    assert (out["week_offset"] >= 0).all()
    week0 = out[out["week_offset"] == 0]
    assert int(week0["n_active_users"].sum()) == n_users
    sizes = week0.set_index("cohort_week")["n_active_users"]
    for _, r in out.iterrows():
        assert r["n_active_users"] <= sizes[r["cohort_week"]]


def test_transition_shares_row_stochastic(spark, sf_dir):
    """Per source state the FLOOR-truncated shares must sum to ~1 from
    below (each of ≤|types| cells truncates away < 1e-6)."""
    out = QUERIES["event_transition_matrix"].fn(spark, sf_dir).toPandas()
    sums = out.groupby("prev_type")["share"].sum()
    assert ((sums <= 1.0) & (sums > 1.0 - 1e-5 * len(out))).all(), sums
    assert (out["n_transitions"] >= 1).all()


def test_open_orders_sweep_closes_to_zero(spark, sf_dir):
    """The sweep-line must conserve: the final running value is 0 (every
    +1 matched by a -1), the peak is positive, and counts never go
    negative anywhere on the spine."""
    out = (
        QUERIES["open_orders_daily"].fn(spark, sf_dir)
        .orderBy("d")
        .toPandas()
    )
    assert int(out["open_orders"].iloc[-1]) == 0
    assert (out["open_orders"] >= 0).all()
    assert int(out["open_orders"].max()) > 0


def test_histogram_conserves_counts(spark, sf_dir):
    """Histogram bins partition the rows: per-type bin counts sum to the
    raw per-type count and bins stay in [0, 9]."""
    out = QUERIES["value_histogram_by_type"].fn(spark, sf_dir).toPandas()
    raw = (
        load_table(spark, "events", sf_dir)
        .groupBy("event_type").count().toPandas().set_index("event_type")["count"]
    )
    assert (out["bin"] >= 0).all() and (out["bin"] <= 9).all()
    sums = out.groupby("event_type")["n"].sum()
    for et, n in sums.items():
        assert int(n) == int(raw[et])


def test_rfm_tiles_cover_all_customers(spark, sf_dir):
    """Every customer with orders lands in exactly one RFM cell; tiles
    are 1..4."""
    out = QUERIES["rfm_customer_segments"].fn(spark, sf_dir).toPandas()
    n_cust = (
        load_table(spark, "orders", sf_dir).select("o_custkey").distinct().count()
    )
    assert int(out["n_customers"].sum()) == n_cust
    for c in ["r_tile", "f_tile", "m_tile"]:
        assert out[c].between(1, 4).all()


def test_market_basket_pairs_canonical(spark, sf_dir):
    """Pairs are canonical (a < b) and counts positive, descending."""
    out = QUERIES["market_basket_pairs"].fn(spark, sf_dir).toPandas()
    assert (out["part_a"] < out["part_b"]).all()
    assert (out["n_orders"] >= 1).all()
    assert list(out["n_orders"]) == sorted(out["n_orders"], reverse=True)


def test_scd2_versions_conserve_orders(spark, sf_dir):
    """SCD2 collapse must conserve the fact count: per-customer n_orders
    sums to the raw orders count, and version counts are sane."""
    out = QUERIES["scd2_customer_status"].fn(spark, sf_dir).toPandas()
    raw_n = load_table(spark, "orders", sf_dir).count()
    assert int(out["n_orders"].sum()) == raw_n
    assert (out["n_versions"] == out["current_version"]).all()
    assert (out["first_date"] <= out["last_date"]).all()
