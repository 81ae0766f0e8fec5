"""Join surface (SURVEY.md §2.4 J1-J7). The reference is single-table;
all joins are tier EXT over the star-schema corpus.

Scale notes: dimension tables (region/nation/supplier) are broadcast
(explicit hint → BroadcastHashJoin, no shuffle of the fact side);
fact-fact joins shuffle on the join key (sort-merge, AQE may demote);
the as-of join uses the union+window rewrite (operators/joins.py) —
one shuffle, no pairwise blowup.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..operators import skew as K
from ..operators.joins import asof_join
from ..sources.tables import load_table
from .catalog import query


@query(
    "join_star_revenue",
    tier="J1 (inner equi, broadcast dims)",
    oracle="""
        SELECT r_name, n_name,
               COUNT(*) AS n_orders,
               ROUND(SUM(o_totalprice), 2) AS revenue
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation   ON c_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
        GROUP BY r_name, n_name
    """,
)
def join_star_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact⋈dim⋈dim⋈dim with explicit broadcast of the small sides —
    the fact table never shuffles for the joins, only for the final agg."""
    o = load_table(spark, "orders", sf_dir)
    c = load_table(spark, "customer", sf_dir)
    n = load_table(spark, "nation", sf_dir)
    r = load_table(spark, "region", sf_dir)
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(F.count(F.lit(1)).alias("n_orders"), F.round(F.sum("o_totalprice"), 2).alias("revenue"))
    )


@query(
    "join_left_outer_histogram",
    tier="J2 (left outer, null semantics)",
    oracle="""
        SELECT n_orders, COUNT(*) AS n_customers
        FROM (
            SELECT c_custkey, COUNT(o_orderkey) AS n_orders
            FROM customer LEFT JOIN orders ON c_custkey = o_custkey
            GROUP BY c_custkey
        ) t
        GROUP BY n_orders
    """,
)
def join_left_outer_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT JOIN preserving order-less customers (COUNT of the null key
    → 0), then order-count histogram."""
    c = load_table(spark, "customer", sf_dir)
    o = load_table(spark, "orders", sf_dir)
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )
    return per_cust.groupBy("n_orders").agg(F.count(F.lit(1)).alias("n_customers"))


@query(
    "join_full_outer",
    tier="J2 (full outer)",
    oracle="""
        SELECT COALESCE(cn.k, sn.k) AS nationkey,
               COALESCE(cn.n_cust, 0) AS n_cust,
               COALESCE(sn.n_supp, 0) AS n_supp
        FROM (SELECT c_nationkey AS k, COUNT(*) AS n_cust FROM customer GROUP BY 1) cn
        FULL JOIN (SELECT s_nationkey AS k, COUNT(*) AS n_supp FROM supplier GROUP BY 1) sn
          ON cn.k = sn.k
    """,
)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, "customer", sf_dir).groupBy(F.col("c_nationkey").alias("k")).agg(
        F.count(F.lit(1)).alias("n_cust")
    )
    s = load_table(spark, "supplier", sf_dir).groupBy(F.col("s_nationkey").alias("k")).agg(
        F.count(F.lit(1)).alias("n_supp")
    )
    return c.join(s, "k", "full").select(
        F.col("k").alias("nationkey"),
        F.coalesce("n_cust", F.lit(0)).alias("n_cust"),
        F.coalesce("n_supp", F.lit(0)).alias("n_supp"),
    )


@query(
    "join_semi",
    tier="J3 (left semi ≡ EXISTS)",
    oracle="""
        SELECT c_mktsegment, COUNT(*) AS n_big_spenders
        FROM customer
        WHERE EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey AND o_totalprice > 400000)
        GROUP BY c_mktsegment
    """,
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """left_semi: probe side streams, no row multiplication, only the
    matching keys shuffle."""
    c = load_table(spark, "customer", sf_dir)
    o = load_table(spark, "orders", sf_dir).filter(F.col("o_totalprice") > 400000)
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_big_spenders"))
    )


@query(
    "join_anti",
    tier="J3 (left anti ≡ NOT EXISTS)",
    oracle="""
        SELECT c_mktsegment, COUNT(*) AS n_without_big_order
        FROM customer
        WHERE NOT EXISTS (SELECT 1 FROM orders
                          WHERE o_custkey = c_custkey AND o_totalprice > 300000)
        GROUP BY c_mktsegment
    """,
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, "customer", sf_dir)
    o = load_table(spark, "orders", sf_dir).filter(F.col("o_totalprice") > 300000)
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_without_big_order"))
    )


@query(
    "join_theta_pairs",
    tier="J4 (non-equi theta join → BroadcastNestedLoop on small sides)",
    oracle="""
        SELECT a.n_name AS nation_a, b.n_name AS nation_b
        FROM nation a JOIN nation b
          ON a.n_regionkey = b.n_regionkey AND a.n_nationkey < b.n_nationkey
    """,
)
def join_theta_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Self-join with inequality residual — unordered same-region pairs."""
    n = load_table(spark, "nation", sf_dir)
    a, b = n.alias("a"), n.alias("b")
    return a.join(
        b,
        (F.col("a.n_regionkey") == F.col("b.n_regionkey")) & (F.col("a.n_nationkey") < F.col("b.n_nationkey")),
    ).select(F.col("a.n_name").alias("nation_a"), F.col("b.n_name").alias("nation_b"))


@query(
    "join_cross",
    tier="J7 (cross join)",
    oracle="""
        SELECT a.r_name AS region_a, b.r_name AS region_b
        FROM region a CROSS JOIN region b
    """,
)
def join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = load_table(spark, "region", sf_dir)
    a, b = r.alias("a"), r.alias("b")
    return a.crossJoin(b).select(F.col("a.r_name").alias("region_a"), F.col("b.r_name").alias("region_b"))


@query(
    "join_range",
    tier="J5 (equi + range residual: ship within 90 days of order)",
    oracle="""
        SELECT o_orderpriority,
               COUNT(*) AS n_lines,
               ROUND(SUM(l_extendedprice), 2) AS revenue
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         AND CAST(l_shipdate AS DATE) BETWEEN CAST(o_orderdate AS DATE)
                                          AND CAST(o_orderdate AS DATE) + 90
        GROUP BY o_orderpriority
    """,
)
def join_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join anchored on an equi key: the equi part drives the
    shuffle/hash strategy; the range condition evaluates as a residual
    filter inside the join — no quadratic pair expansion."""
    li = load_table(spark, "lineitem", sf_dir)
    o = load_table(spark, "orders", sf_dir)
    od, sd = F.to_date(o.o_orderdate), F.to_date(li.l_shipdate)
    return (
        li.join(o, (li.l_orderkey == o.o_orderkey) & sd.between(od, F.date_add(od, 90)))
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_lines"), F.round(F.sum("l_extendedprice"), 2).alias("revenue"))
    )


@query(
    "join_asof",
    tier="J6 (as-of join via union+window rewrite)",
    oracle="""
        SELECT p.event_id, p.user_id, c.value AS asof_value
        FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
          ON p.user_id = c.user_id AND p.ts >= c.ts
    """,
)
def join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest click value at-or-before each purchase, per user — the
    natural energy-data join ('price in effect at time t', SURVEY J6).
    Implemented as one shuffle on user_id (operators/joins.py), checked
    against DuckDB's native ASOF JOIN."""
    ev = load_table(spark, "events", sf_dir)
    purchases = ev.filter(F.col("event_type") == "purchase").select("event_id", "user_id", "ts")
    clicks = ev.filter(F.col("event_type") == "click").select("user_id", "ts", "value")
    joined = asof_join(purchases, clicks, on=["user_id"], left_ts="ts", right_ts="ts", value_cols=["value"])
    return joined.select("event_id", "user_id", F.col("asof_value"))


@query(
    "join_skew_salted",
    tier="J1+scale (salted shuffle join: manual hot-key skew mitigation)",
    oracle="""
        SELECT p_brand,
               COUNT(*) AS n_lines,
               ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
        FROM lineitem JOIN part ON l_partkey = p_partkey
        GROUP BY p_brand
    """,
)
def join_skew_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The salted-join recipe for hot keys when BOTH sides are too big
    to broadcast: the probe side gets ``salt = pmod(xxhash64(row-unique
    key), S)`` so one hot join key spreads over S reducer partitions;
    the build side replicates each row S times (explode 0..S-1); the
    join keys on (key, salt). Results are provably identical to the
    plain join — every (l, p) pair still meets exactly once, in the
    salt partition chosen by l. Cost model: S× replication of the
    smaller side buys hot-key parallelism S — the right trade whenever
    max-key share ≫ 1/parallelism.

    AQE's runtime skew-split covers the batch case automatically; the
    manual form certified here is what still works where AQE cannot
    re-plan (deterministic co-partitioned pipelines, stream-stream
    state, bucketed writes). hint("merge") pins SortMergeJoin so the
    demo cannot silently degenerate into a broadcast join at test
    scale (the plan audit asserts it)."""
    S = 8
    l = load_table(spark, "lineitem", sf_dir).select(
        "l_partkey",
        "l_extendedprice",
        "l_discount",
        F.pmod(F.xxhash64("l_orderkey", "l_linenumber"), F.lit(S)).cast("int").alias("salt"),
    )
    p = (
        load_table(spark, "part", sf_dir)
        .select("p_partkey", "p_brand")
        .withColumn("salt", F.explode(F.sequence(F.lit(0), F.lit(S - 1))))
    )
    j = l.join(
        p.hint("merge"),
        (l.l_partkey == p.p_partkey) & (l.salt == p.salt),
    )
    return j.groupBy("p_brand").agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"),
    )


@query(
    "lateral_join_topk",
    tier="J-ext (correlated LATERAL subquery: per-outer-row dependent top-k)",
    oracle="""
        SELECT r.r_name AS region_name, l.nation_name, l.total_bal
        FROM region r, LATERAL (
            SELECT n.n_name AS nation_name,
                   ROUND(CAST(SUM(c.c_acctbal) AS DOUBLE), 2) AS total_bal
            FROM nation n JOIN customer c ON c.c_nationkey = n.n_nationkey
            WHERE n.n_regionkey = r.r_regionkey
            GROUP BY n.n_name
            ORDER BY SUM(c.c_acctbal) DESC, n.n_name
            LIMIT 2
        ) l
    """,
)
def lateral_join_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LATERAL is the SQL-standard spelling of per-row dependent
    subqueries — 'for each region, its top-2 nations by customer
    balance' — which Catalyst DECORRELATES into joins + windows rather
    than executing per-outer-row (DecorrelateInnerQuery; the naive
    interpretation would rescan customer once per region, quadratic at
    100 TB). Same result as the window top-k family, certified through
    the LATERAL operator surface itself; ties broken by name so the
    LIMIT frontier is deterministic in both engines."""
    from ..sources.tables import load_table

    for t in ("region", "nation", "customer"):
        load_table(spark, t, sf_dir).createOrReplaceTempView(f"__lat_{t}")
    return spark.sql(
        """
        SELECT r.r_name AS region_name, l.nation_name, l.total_bal
        FROM __lat_region r, LATERAL (
            SELECT n.n_name AS nation_name,
                   ROUND(SUM(c.c_acctbal), 2) AS total_bal
            FROM __lat_nation n JOIN __lat_customer c ON c.c_nationkey = n.n_nationkey
            WHERE n.n_regionkey = r.r_regionkey
            GROUP BY n.n_name
            ORDER BY SUM(c.c_acctbal) DESC, n.n_name
            LIMIT 2
        ) l
        """
    )


@query(
    "join_skew_adaptive_salted",
    tier="J1+§4.3 (adaptive salting: replicate the build side only for DETECTED hot keys)",
    oracle="""
        WITH probe AS (
            SELECT CASE WHEN l_orderkey % 4 <> 0 THEN -1 ELSE l_orderkey END AS pk,
                   l_extendedprice * (1 - l_discount) AS rev
            FROM lineitem
        ), build AS (
            SELECT CASE WHEN o_orderkey % 4 <> 0 THEN -1 ELSE o_orderkey END AS bk,
                   MIN(o_orderpriority) AS prio
            FROM orders GROUP BY 1
        )
        SELECT b.prio,
               CAST(COUNT(*) AS BIGINT) AS n_lines,
               ROUND(CAST(SUM(p.rev) AS DOUBLE), 2) AS revenue
        FROM probe p JOIN build b ON p.pk = b.bk
        GROUP BY b.prio
    """,
)
def join_skew_adaptive_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """join_skew_salted's production upgrade: full salting multiplies
    the ENTIRE build side by S even though almost every key is cold —
    adaptive salting (operators/skew.py::adaptive_salted_join) first
    DETECTS hot keys (here the manufactured key -1 holding ~75% of
    probe rows; threshold 5% of rows), then splits: cold keys take the
    plain equi-join untouched, only the hot keys' build rows replicate
    S ways and join on (key, salt). The split is detection-driven, so
    the replication cost scales with |hot keys|, not |build|; a
    detection miss degrades performance only — the union of the two
    paths is provably the plain join, which is exactly what the
    unsalted oracle certifies."""
    li = load_table(spark, "lineitem", sf_dir)
    o = load_table(spark, "orders", sf_dir)
    probe = li.select(
        F.when(F.col("l_orderkey") % 4 != 0, F.lit(-1))
        .otherwise(F.col("l_orderkey"))
        .alias("pk"),
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("rev"),
    )
    build = (
        o.select(
            F.when(F.col("o_orderkey") % 4 != 0, F.lit(-1))
            .otherwise(F.col("o_orderkey"))
            .alias("bk"),
            "o_orderpriority",
        )
        .groupBy("bk")
        .agg(F.min("o_orderpriority").alias("prio"))
    )
    j = K.adaptive_salted_join(probe, build, "pk", "bk", salt_buckets=8, hot_frac=0.05)
    return j.groupBy("prio").agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.round(F.sum("rev"), 2).alias("revenue"),
    )


@query(
    "join_asof_forward",
    tier="J6-ext (forward as-of: earliest right row at-or-after each left row)",
    oracle="""
        WITH p AS (
            SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
        ), c AS (
            SELECT user_id, ts, value FROM events WHERE event_type = 'click'
        ), nxt AS (
            SELECT p.event_id, p.user_id, MIN(c.ts) AS mts
            FROM p LEFT JOIN c ON c.user_id = p.user_id AND c.ts >= p.ts
            GROUP BY p.event_id, p.user_id
        )
        SELECT n.event_id, n.user_id, c2.value AS next_value
        FROM nxt n LEFT JOIN c c2 ON c2.user_id = n.user_id AND c2.ts = n.mts
    """,
)
def join_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The FORWARD as-of — next click at-or-after each purchase, per
    user (post-purchase behavior attribution; the mirror of J6's
    'price in effect at time t'). DuckDB's native ASOF is
    backward-only, so the oracle derives the forward match from first
    principles (per-row MIN of qualifying timestamps, joined back) —
    while the Spark side stays the one-shuffle union+window rewrite
    with the frame flipped to [current, unbounded following]. Same
    scale property as backward: no per-key pair generation, one
    exchange + one sort."""
    ev = load_table(spark, "events", sf_dir)
    purchases = ev.filter(F.col("event_type") == "purchase").select("event_id", "user_id", "ts")
    clicks = ev.filter(F.col("event_type") == "click").select("user_id", "ts", "value")
    joined = asof_join(
        purchases,
        clicks,
        on=["user_id"],
        left_ts="ts",
        right_ts="ts",
        value_cols=["value"],
        direction="forward",
    )
    return joined.select("event_id", "user_id", F.col("asof_value").alias("next_value"))


@query(
    "join_null_safe_keys",
    tier="J1-ext (null-safe equality join: <=> / IS NOT DISTINCT FROM semantics)",
    oracle="""
        WITH o AS (
            SELECT NULLIF(o_orderkey % 5, 0) AS k, o_totalprice
            FROM orders WHERE o_orderkey < 2000
        ), d AS (
            SELECT NULLIF(n_nationkey % 5, 0) AS k, n_name
            FROM nation
        )
        SELECT COALESCE(o.k, -1) AS key_bucket,
               CAST(COUNT(*) AS BIGINT) AS n_pairs,
               CAST(COUNT(DISTINCT d.n_name) AS BIGINT) AS n_dims,
               ROUND(CAST(SUM(o.o_totalprice) AS DOUBLE), 2) AS total_price
        FROM o JOIN d ON o.k IS NOT DISTINCT FROM d.k
        GROUP BY COALESCE(o.k, -1)
    """,
)
def join_null_safe_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Plain SQL equality never matches NULL keys (NULL = NULL is
    NULL), which silently DROPS every null-keyed row from an inner
    join — the classic missing-rows bug when join keys are derived
    and nullable. The null-safe operator (Spark `<=>`, SQL standard
    IS NOT DISTINCT FROM) treats NULL as a joinable value; certified
    here on manufactured nullable buckets where the NULL group must
    appear in the output with full multiplicity. Plans like any
    equi-join (hash on the coalesced key internally) — no nested-loop
    penalty for null safety."""
    o = load_table(spark, "orders", sf_dir).filter(F.col("o_orderkey") < 2000).select(
        F.nullif(F.col("o_orderkey") % 5, F.lit(0)).alias("k"), "o_totalprice"
    )
    d = load_table(spark, "nation", sf_dir).select(
        F.nullif(F.col("n_nationkey") % 5, F.lit(0)).alias("k2"), "n_name"
    )
    j = o.join(F.broadcast(d), F.col("k").eqNullSafe(F.col("k2")))
    return j.groupBy(F.coalesce("k", F.lit(-1)).alias("key_bucket")).agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.countDistinct("n_name").alias("n_dims"),
        F.round(F.sum("o_totalprice"), 2).alias("total_price"),
    )
