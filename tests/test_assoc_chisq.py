"""Method tests for chisq_independence_audit and association_rules_lift:
both replayed against brute-force python/numpy references on the same
fixture data, plus the invariants the oracle can't see (chi-square of a
truly coupled synthetic table is large; lift algebra identities)."""

from __future__ import annotations

from collections import Counter

import numpy as np
import pyspark.sql.functions as F

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
        # staged to keep BIGINT intermediates <= ~1e6*n (r11 overflow
        # fix): conf ppm first, then * n // n_b — mirrored in the oracle
        assert r.lift == (r.n_ab * 1000000 // r.n_a) * n_orders // r.n_b / 1e6
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


def test_entity_resolution_matches_union_find(spark, sf_dir):
    """Iterative CC output == python union-find on the same fuzzy
    candidate edges; cluster stats conserve members and rows."""
    from energi_data_etl_spark.queries.datapipe import entity_resolution_clusters

    names = {
        r.p_name: r.n
        for r in load_table(spark, "part", sf_dir).groupBy("p_name").agg(
            F.count(F.lit(1)).alias("n")
        ).collect()
    }
    import itertools

    by_blk: dict[str, list[str]] = {}
    for n in names:
        by_blk.setdefault(n[0], []).append(n)

    def lev(a: str, b: str) -> int:
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    parent: dict[str, str] = {}

    def find(x: str) -> str:
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    edges = 0
    for blk in by_blk.values():
        for a, b in itertools.combinations(sorted(blk), 2):
            if lev(a, b) <= 3:
                edges += 1
                ra, rb = find(a), find(b)
                if ra != rb:
                    parent[ra] = rb
    comp: dict[str, str] = {}
    for n in parent:
        comp.setdefault(find(n), n)
    want = {n: min(m for m in parent if find(m) == find(n)) for n in parent}
    rows = entity_resolution_clusters(spark, sf_dir).collect()
    assert {r.name: r.component for r in rows} == want
    assert edges > 0
    for r in rows:
        members = [n for n in want if want[n] == r.component]
        assert r.cluster_size == len(members)
        assert r.cluster_rows == sum(names[m] for m in members)


def test_trending_decay_is_exact_integer(spark, sf_dir):
    """Decay scores == a python bit-shift replay; ordering fully
    deterministic; a single yesterday event outweighs any count of
    30-day-old events (the semantics the shift encodes)."""
    from energi_data_etl_spark.queries.behavior import trending_users_decayed

    ev = load_table(spark, "events", sf_dir).selectExpr(
        "user_id", "unix_micros(cast(ts as timestamp)) div 86400000000 AS d"
    ).collect()
    md = max(r.d for r in ev)
    scores: dict[int, int] = {}
    counts: dict[int, int] = {}
    for r in ev:
        scores[r.user_id] = scores.get(r.user_id, 0) + (1 << max(0, 30 - (md - r.d)))
        counts[r.user_id] = counts.get(r.user_id, 0) + 1
    rows = trending_users_decayed(spark, sf_dir).collect()
    want = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[: len(rows)]
    assert [(r.user_id, r.decay_score) for r in rows] == want
    assert all(r.n_events == counts[r.user_id] for r in rows)
    # dominance: weight(age 1) == 2^29 > 29 days * any plausible volume at weight 1
    assert (1 << 29) > 10_000_000 * 1
