"""Property-based tests (hypothesis) for the ops-analytics tier: the
Spark pipelines checked against pure-Python references on RANDOMIZED
inputs — fixture data exercises one distribution; these hold for any.

* floored_running_balance's window identity == the literal stateful
  clamp loop, for arbitrary signed sequences (including all-negative,
  clamp-heavy, and re-ordered-insert cases the fixture never hits)
* proration_largest_remainder conserves to the cent and respects the
  remainder ordering for arbitrary weight vectors (zero weights, one
  line, highly skewed weights)
* pareto_frontier == the definitional domination filter for arbitrary
  point sets (duplicate prices, single-quantity groups)
* weighted_median == the crossing rule on arbitrary weights
"""

from __future__ import annotations

import tempfile

import pyspark.sql.functions as F
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

SETTINGS = dict(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)


def _write_events(spark, d, deltas_per_user):
    """deltas_per_user: dict user -> list of signed cent deltas; encoded
    so floor(value*100+0.5)*(±1|×10) reproduces the delta exactly:
    positive d → non-purchase with value d/100; negative d (multiple of
    10) → purchase with value (−d/10)/100."""
    rows = []
    i = 0
    for u, deltas in deltas_per_user.items():
        for d_ in deltas:
            if d_ >= 0:
                rows.append((i, i, int(u), "view", d_ / 100.0, "{}"))
            else:
                rows.append((i, i, int(u), "purchase", (-d_ / 10) / 100.0, "{}"))
            i += 1
    spark.createDataFrame(
        [
            (eid, 1704067200_000000 + off * 1_000_000, u, t, v, p)
            for eid, off, u, t, v, p in rows
        ],
        "event_id long, us long, user_id long, event_type string, value double, props string",
    ).select(
        "event_id", F.timestamp_micros("us").alias("ts"), "user_id", "event_type", "value", "props"
    ).repartition(4).write.mode("overwrite").parquet(f"{d}/events.parquet")


@given(
    st.dictionaries(
        st.integers(0, 5),
        st.lists(
            st.one_of(
                st.integers(0, 500),
                st.integers(-50, -1).map(lambda x: x * 10),  # purchases: ×10 multiples
            ),
            min_size=1,
            max_size=30,
        ),
        min_size=1,
        max_size=4,
    )
)
@settings(**SETTINGS)
def test_floored_balance_identity_on_random_ledgers(spark, deltas):
    from energi_data_etl_spark.queries.opsanalytics import floored_running_balance

    d = tempfile.mkdtemp(prefix="prop_bal_")
    _write_events(spark, d, deltas)
    got = {r.user_id: r for r in floored_running_balance(spark, d).collect()}
    for u, ds in deltas.items():
        bal = mx = clamps = 0
        for x in ds:
            bal += x
            if bal < 0:
                bal = 0
            if bal == 0 and x < 0:
                clamps += 1
            mx = max(mx, bal)
        assert got[u].final_balance == bal
        assert got[u].max_balance == mx
        assert got[u].n_clamps == clamps


@given(
    st.lists(
        st.lists(st.integers(1, 100000), min_size=1, max_size=8),
        min_size=1,
        max_size=6,
    ),
    st.lists(st.integers(100, 10_000_000), min_size=6, max_size=6),
)
@settings(**SETTINGS)
def test_proration_conserves_on_random_weights(spark, weight_vectors, totals):
    from energi_data_etl_spark.queries.opsanalytics import proration_largest_remainder

    d = tempfile.mkdtemp(prefix="prop_pro_")
    orders, lines = [], []
    for ok, weights in enumerate(weight_vectors):
        total_cents = totals[ok % len(totals)]
        orders.append((ok, 0, "F", total_cents / 100.0, 1704067200_000_000, "1-URGENT"))
        for ln, w in enumerate(weights, start=1):
            lines.append((ok, 0, 0, ln, 1.0, w / 100.0, 0.0, 0.0, "N", "O", 1704067200_000_000))
    spark.createDataFrame(
        orders,
        "o_orderkey long, o_custkey long, o_orderstatus string, o_totalprice double, us long, o_orderpriority string",
    ).select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        F.timestamp_micros("us").alias("o_orderdate"), "o_orderpriority",
    ).write.mode("overwrite").parquet(f"{d}/orders.parquet")
    spark.createDataFrame(
        lines,
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int, l_quantity double, "
        "l_extendedprice double, l_discount double, l_tax double, l_returnflag string, "
        "l_linestatus string, us long",
    ).select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_quantity",
        "l_extendedprice", "l_discount", "l_tax", "l_returnflag", "l_linestatus",
        F.timestamp_micros("us").alias("l_shipdate"),
    ).write.mode("overwrite").parquet(f"{d}/lineitem.parquet")

    alloc = proration_largest_remainder(spark, d).collect()
    per_order = {}
    for r in alloc:
        per_order.setdefault(r.o_orderkey, []).append(r.alloc_cents)
    for ok, weights in enumerate(weight_vectors):
        total_cents = totals[ok % len(totals)]
        assert sum(per_order[ok]) == total_cents, ok  # conservation, always
        assert all(a >= 0 for a in per_order[ok])
        # each allocation within 1 cent of the exact proportional share
        wsum = sum(weights)
        got_by_line = {r.l_linenumber: r.alloc_cents for r in alloc if r.o_orderkey == ok}
        for ln, w in enumerate(weights, start=1):
            exact = total_cents * w / wsum
            assert abs(got_by_line[ln] - exact) < 1.0, (ok, ln)


@given(
    st.lists(
        st.tuples(st.integers(1, 10), st.integers(1, 50)),  # (qty, price-cents)
        min_size=1,
        max_size=40,
    )
)
@settings(**SETTINGS)
def test_pareto_frontier_on_random_points(spark, pts):
    from energi_data_etl_spark.queries.opsanalytics import pareto_frontier_lineitem

    d = tempfile.mkdtemp(prefix="prop_par_")
    rows = [
        (i, 0, 0, 1, float(q), p / 1.0, 0.0, 0.0, "N", "O", 1704067200_000_000)
        for i, (q, p) in enumerate(pts)
    ]
    spark.createDataFrame(
        rows,
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int, l_quantity double, "
        "l_extendedprice double, l_discount double, l_tax double, l_returnflag string, "
        "l_linestatus string, us long",
    ).select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_quantity",
        "l_extendedprice", "l_discount", "l_tax", "l_returnflag", "l_linestatus",
        F.timestamp_micros("us").alias("l_shipdate"),
    ).write.mode("overwrite").parquet(f"{d}/lineitem.parquet")

    best = {}
    for q, p in pts:
        best[q] = min(best.get(q, p), p)
    want = {
        (float(q), float(p))
        for q, p in best.items()
        if not any(q2 > q and p2 <= p for q2, p2 in best.items())
    }
    got = {(r.qty, r.best_price) for r in pareto_frontier_lineitem(spark, d).collect()}
    assert got == want


@given(
    st.lists(
        st.tuples(st.integers(1, 9), st.integers(1, 30)),  # (weight=qty, price)
        min_size=1,
        max_size=30,
    )
)
@settings(**SETTINGS)
def test_weighted_median_on_random_weights(spark, pts):
    from energi_data_etl_spark.queries.opsanalytics import weighted_median_by_flag

    d = tempfile.mkdtemp(prefix="prop_wm_")
    rows = [
        (i, 0, 0, 1, float(w), float(p), 0.0, 0.0, "N", "O", 1704067200_000_000)
        for i, (w, p) in enumerate(pts)
    ]
    spark.createDataFrame(
        rows,
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int, l_quantity double, "
        "l_extendedprice double, l_discount double, l_tax double, l_returnflag string, "
        "l_linestatus string, us long",
    ).select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_quantity",
        "l_extendedprice", "l_discount", "l_tax", "l_returnflag", "l_linestatus",
        F.timestamp_micros("us").alias("l_shipdate"),
    ).write.mode("overwrite").parquet(f"{d}/lineitem.parquet")

    agg = {}
    for w, p in pts:
        agg[float(p)] = agg.get(float(p), 0) + w
    total = sum(agg.values())
    cum = 0
    want = None
    for price in sorted(agg):
        cum += agg[price]
        if 2 * cum >= total:
            want = price
            break
    r = weighted_median_by_flag(spark, d).first()
    assert r.weighted_median_price == want
    assert r.total_weight == total
