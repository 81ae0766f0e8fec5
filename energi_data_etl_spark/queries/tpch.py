"""TPC-H-shaped composite queries over the driver corpus — the
recognizable multi-join analytics a warehouse user runs daily
(SURVEY §2.3/§2.4 composition; shapes follow the public TPC-H spec,
constants adapted to the fixture's value domains).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..sources.tables import load_table
from .catalog import query


@query(
    "tpch_q3_shipping_priority",
    tier="J1+A1+§2.6 (TPC-H Q3 shape: 3-way join, agg, top-k)",
    oracle="""
        SELECT l_orderkey,
               ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
               CAST(o_orderdate AS DATE) AS orderdate,
               o_orderpriority
        FROM customer JOIN orders ON c_custkey = o_custkey
                      JOIN lineitem ON l_orderkey = o_orderkey
        WHERE c_mktsegment = 'BUILDING'
          AND CAST(o_orderdate AS DATE) < DATE '1998-01-01'
          AND CAST(l_shipdate AS DATE) > DATE '1998-01-01'
        GROUP BY l_orderkey, CAST(o_orderdate AS DATE), o_orderpriority
        ORDER BY revenue DESC, orderdate ASC, l_orderkey ASC
        LIMIT 10
    """,
)
def tpch_q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unshipped high-value orders for one segment: broadcast the
    filtered customer dim, shuffle-join the facts, top-10 without a
    total sort (TakeOrderedAndProject)."""
    c = load_table(spark, "customer", sf_dir).filter(F.col("c_mktsegment") == "BUILDING")
    o = load_table(spark, "orders", sf_dir).filter(F.to_date("o_orderdate") < F.lit("1998-01-01").cast("date"))
    li = load_table(spark, "lineitem", sf_dir).filter(F.to_date("l_shipdate") > F.lit("1998-01-01").cast("date"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", F.to_date("o_orderdate").alias("orderdate"), "o_orderpriority")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("orderdate").asc(), F.col("l_orderkey").asc())
        .limit(10)
        .select("l_orderkey", "revenue", "orderdate", "o_orderpriority")
    )


@query(
    "tpch_q5_local_volume",
    tier="J1 (TPC-H Q5 shape: 5-way star join with co-nation residual)",
    oracle="""
        SELECT n_name,
               ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
        FROM customer
        JOIN orders   ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        JOIN nation   ON s_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
        WHERE r_name = 'ASIA'
        GROUP BY n_name
    """,
)
def tpch_q5_local_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue from customers served by same-nation suppliers in one
    region — the classic snowflake join with an equi-residual
    (c_nationkey = s_nationkey) folded into the supplier join."""
    c = load_table(spark, "customer", sf_dir)
    o = load_table(spark, "orders", sf_dir)
    li = load_table(spark, "lineitem", sf_dir)
    s = load_table(spark, "supplier", sf_dir)
    n = load_table(spark, "nation", sf_dir)
    r = load_table(spark, "region", sf_dir).filter(F.col("r_name") == "ASIA")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey))
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
    )


@query(
    "tpch_q10_returned_items",
    tier="J1+A1 (TPC-H Q10 shape: returned-item revenue per customer, top 20)",
    oracle="""
        SELECT c_custkey, c_name, n_name,
               ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
               ROUND(c_acctbal, 2) AS c_acctbal
        FROM customer JOIN orders ON c_custkey = o_custkey
                      JOIN lineitem ON l_orderkey = o_orderkey
                      JOIN nation ON c_nationkey = n_nationkey
        WHERE l_returnflag = 'R'
          AND CAST(o_orderdate AS DATE) >= DATE '1997-01-01'
        GROUP BY c_custkey, c_name, n_name, ROUND(c_acctbal, 2)
        ORDER BY revenue DESC, c_custkey ASC
        LIMIT 20
    """,
)
def tpch_q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, "customer", sf_dir)
    o = load_table(spark, "orders", sf_dir).filter(F.to_date("o_orderdate") >= F.lit("1997-01-01").cast("date"))
    li = load_table(spark, "lineitem", sf_dir).filter(F.col("l_returnflag") == "R")
    n = load_table(spark, "nation", sf_dir)
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name", F.round("c_acctbal", 2).alias("c_acctbal"))
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
        .limit(20)
        .select("c_custkey", "c_name", "n_name", "revenue", "c_acctbal")
    )


@query(
    "having_large_orders",
    tier="A1+HAVING (TPC-H Q18 shape: filter on aggregate)",
    oracle="""
        SELECT l_orderkey,
               ROUND(SUM(l_quantity), 2) AS total_qty,
               COUNT(*) AS n_lines
        FROM lineitem
        GROUP BY l_orderkey
        HAVING SUM(l_quantity) > 150
    """,
)
def having_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HAVING ≡ post-aggregation filter: Catalyst keeps it after the
    final HashAggregate — no second shuffle."""
    li = load_table(spark, "lineitem", sf_dir)
    return (
        li.groupBy("l_orderkey")
        .agg(F.round(F.sum("l_quantity"), 2).alias("total_qty"), F.count(F.lit(1)).alias("n_lines"))
        .filter(F.col("total_qty") > 150)
    )


@query(
    "correlated_scalar_subquery",
    tier="§3 planner (correlated scalar subquery → decorrelated join)",
    oracle="""
        SELECT c_custkey, c_mktsegment,
               (SELECT ROUND(MAX(o_totalprice), 2) FROM orders WHERE o_custkey = c_custkey) AS max_order
        FROM customer
        WHERE c_custkey < 200
    """,
)
def correlated_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery — Catalyst decorrelates it into an
    aggregate + left outer join (no per-row re-execution; the subquery
    'loop' of a naive engine becomes one shuffle)."""
    load_table(spark, "customer", sf_dir).createOrReplaceTempView("customer_csq")
    load_table(spark, "orders", sf_dir).createOrReplaceTempView("orders_csq")
    return spark.sql(
        """
        SELECT c_custkey, c_mktsegment,
               (SELECT ROUND(MAX(o_totalprice), 2) FROM orders_csq WHERE o_custkey = c_custkey) AS max_order
        FROM customer_csq
        WHERE c_custkey < 200
        """
    )
