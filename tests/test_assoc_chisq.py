"""Method tests for chisq_independence_audit and association_rules_lift:
both replayed against brute-force python/numpy references on the same
fixture data, plus the invariants the oracle can't see (chi-square of a
truly coupled synthetic table is large; lift algebra identities)."""

from __future__ import annotations

from collections import Counter

import numpy as np

from energi_data_etl_spark.queries.analytics import association_rules_lift
from energi_data_etl_spark.queries.quality import chisq_independence_audit
from energi_data_etl_spark.sources.tables import load_table


def test_chisq_matches_numpy_reference(spark, sf_dir):
    rows = (
        load_table(spark, "events", sf_dir)
        .selectExpr(
            "event_type AS t",
            "(unix_micros(cast(ts as timestamp)) div 86400000000) % 7 AS d",
        )
        .collect()
    )
    types = sorted({r.t for r in rows})
    dows = sorted({r.d for r in rows})
    o = np.zeros((len(types), len(dows)))
    for r in rows:
        o[types.index(r.t), dows.index(r.d)] += 1
    e = o.sum(axis=1, keepdims=True) * o.sum(axis=0, keepdims=True) / o.sum()
    chi2 = float((((o - e) ** 2) / e).sum())
    v = float(np.sqrt(chi2 / (o.sum() * (min(len(types), len(dows)) - 1))))
    got = chisq_independence_audit(spark, sf_dir).collect()[0]
    assert got.n_events == int(o.sum())
    assert got.n_types == len(types) and got.n_dows == len(dows)
    assert got.dof == (len(types) - 1) * (len(dows) - 1)
    assert abs(got.chisq_stat - chi2) < 1e-4
    assert abs(got.cramers_v - v) < 1e-6


def test_association_rules_match_counter_reference(spark, sf_dir):
    li = {
        (r.l_orderkey, r.l_partkey)
        for r in load_table(spark, "lineitem", sf_dir).select("l_orderkey", "l_partkey").collect()
    }
    n_orders = len({o for o, _ in li})
    part_n = Counter(p for _, p in li)
    by_order: dict[int, list[int]] = {}
    for o, p in li:
        by_order.setdefault(o, []).append(p)
    pair_n: Counter = Counter()
    for parts in by_order.values():
        ps = sorted(parts)
        for i in range(len(ps)):
            for j in range(i + 1, len(ps)):
                pair_n[(ps[i], ps[j])] += 1
    rows = association_rules_lift(spark, sf_dir).collect()
    assert 0 < len(rows) <= 20
    want_top = sorted(pair_n.items(), key=lambda kv: (-kv[1], kv[0]))[: len(rows)]
    assert [((r.part_a, r.part_b), r.n_ab) for r in rows] == want_top
    for r in rows:
        assert r.n_a == part_n[r.part_a] and r.n_b == part_n[r.part_b]
        assert r.n_orders == n_orders
        # exact floor-6dp integer algebra
        assert r.support == (r.n_ab * 1000000 // n_orders) / 1e6
        assert r.conf_a_to_b == (r.n_ab * 1000000 // r.n_a) / 1e6
        assert r.conf_b_to_a == (r.n_ab * 1000000 // r.n_b) / 1e6
        assert r.lift == (r.n_ab * 1000000 * n_orders // (r.n_a * r.n_b)) / 1e6
        # rule sanity: confidence never exceeds 1, n_ab bounded by margins
        assert r.n_ab <= min(r.n_a, r.n_b)
        assert r.conf_a_to_b <= 1.0 and r.conf_b_to_a <= 1.0


def test_chisq_detects_planted_dependence(spark):
    """A synthetic table where type fully determines the day index must
    produce chi-square >> dof and Cramer's V near 1 (the query's whole
    point); built via a temp view of the events schema."""
    import pyspark.sql.functions as F

    base = 1704067200_000000  # 2024-01-01 UTC, µs
    day = 86400_000000
    df = spark.range(7000).select(
        F.col("id").alias("event_id"),
        F.timestamp_micros(
            (F.lit(base) + (F.col("id") % 7) * F.lit(day) + F.col("id")).cast("long")
        ).alias("ts"),
        F.col("id").alias("user_id"),
        F.concat(F.lit("type"), (F.col("id") % 7).cast("string")).alias("event_type"),
        F.lit(1.0).alias("value"),
        F.lit("{}").alias("props"),
    )
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        df.write.mode("overwrite").parquet(f"{d}/events.parquet")
        row = chisq_independence_audit(spark, d).collect()[0]
    # fully dependent: chi2 == n * (k-1), V == 1
    assert row.n_types == 7 and row.n_dows == 7
    assert abs(row.chisq_stat - row.n_events * 6) < 1e-3
    assert abs(row.cramers_v - 1.0) < 1e-9
