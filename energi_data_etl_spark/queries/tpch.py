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
    "tpch_q4_order_priority",
    tier="§3 planner (TPC-H Q4 shape: correlated EXISTS → left semi join)",
    oracle="""
        SELECT o_orderpriority, COUNT(*) AS order_count
        FROM orders o
        WHERE CAST(o_orderdate AS DATE) >= DATE '1997-01-01'
          AND CAST(o_orderdate AS DATE) < DATE '1997-07-01'
          AND EXISTS (SELECT 1 FROM lineitem
                      WHERE l_orderkey = o.o_orderkey AND l_returnflag = 'R')
        GROUP BY o_orderpriority
    """,
)
def tpch_q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS — Catalyst rewrites it to a LEFT SEMI join (one
    shuffle; a naive engine's per-row subquery loop disappears). TPC-H Q4
    with the fixture's l_returnflag standing in for the spec's missing
    commit/receipt dates."""
    load_table(spark, "orders", sf_dir).createOrReplaceTempView("orders_q4")
    load_table(spark, "lineitem", sf_dir).createOrReplaceTempView("lineitem_q4")
    return spark.sql(
        """
        SELECT o_orderpriority, COUNT(*) AS order_count
        FROM orders_q4 o
        WHERE CAST(o_orderdate AS DATE) >= DATE '1997-01-01'
          AND CAST(o_orderdate AS DATE) < DATE '1997-07-01'
          AND EXISTS (SELECT 1 FROM lineitem_q4
                      WHERE l_orderkey = o.o_orderkey AND l_returnflag = 'R')
        GROUP BY o_orderpriority
        """
    )


@query(
    "tpch_q12_priority_lines",
    tier="A2 conditional agg (TPC-H Q12 shape: CASE-sum counts per group)",
    oracle="""
        SELECT l_linestatus,
               CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
               CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
        FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        WHERE CAST(l_shipdate AS DATE) >= DATE '1997-01-01'
          AND CAST(l_shipdate AS DATE) < DATE '1998-01-01'
        GROUP BY l_linestatus
    """,
)
def tpch_q12_priority_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional-sum pivot (TPC-H Q12 with o_orderpriority standing in
    for the fixture's missing l_shipmode): CASE folds into the partial
    aggregate, so the join output is consumed map-side."""
    o = load_table(spark, "orders", sf_dir)
    li = load_table(spark, "lineitem", sf_dir).filter(
        (F.to_date("l_shipdate") >= F.lit("1997-01-01").cast("date"))
        & (F.to_date("l_shipdate") < F.lit("1998-01-01").cast("date"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@query(
    "tpch_q14_promo_ratio",
    tier="A2 (TPC-H Q14 shape: ratio of conditional to total aggregate)",
    oracle="""
        SELECT ROUND(100.0 * SUM(CASE WHEN p_type = 'PROMO' THEN l_extendedprice * (1 - l_discount) ELSE 0 END)
                     / SUM(l_extendedprice * (1 - l_discount)), 6) AS promo_revenue_pct
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE CAST(l_shipdate AS DATE) >= DATE '1997-07-01'
          AND CAST(l_shipdate AS DATE) < DATE '1997-10-01'
    """,
)
def tpch_q14_promo_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Promo-revenue share for one quarter: global (no-key) aggregate of
    two sums; part is the broadcast side, lineitem's date filter is pushed
    to the parquet scan."""
    li = load_table(spark, "lineitem", sf_dir).filter(
        (F.to_date("l_shipdate") >= F.lit("1997-07-01").cast("date"))
        & (F.to_date("l_shipdate") < F.lit("1997-10-01").cast("date"))
    )
    p = load_table(spark, "part", sf_dir)
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .agg(
            F.round(
                100.0 * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(0.0)) / F.sum(rev), 6
            ).alias("promo_revenue_pct")
        )
    )


@query(
    "tpch_q16_supplier_cnt",
    tier="§3 planner (TPC-H Q16 shape: NOT IN subquery → null-aware anti join + distinct agg)",
    oracle="""
        SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE p_brand <> 'Brand#4'
          AND p_size IN (1, 7, 14, 21, 28, 35, 42, 49)
          AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        GROUP BY p_brand, p_type, p_size
    """,
)
def tpch_q16_supplier_cnt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT IN (subquery) — planned as a null-aware anti join against the
    tiny negative-balance supplier set (broadcast), then COUNT(DISTINCT)
    per part group. Lineitem stands in for the fixture's missing
    partsupp."""
    load_table(spark, "lineitem", sf_dir).createOrReplaceTempView("lineitem_q16")
    load_table(spark, "part", sf_dir).createOrReplaceTempView("part_q16")
    load_table(spark, "supplier", sf_dir).createOrReplaceTempView("supplier_q16")
    return spark.sql(
        """
        SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
        FROM lineitem_q16 JOIN part_q16 ON l_partkey = p_partkey
        WHERE p_brand <> 'Brand#4'
          AND p_size IN (1, 7, 14, 21, 28, 35, 42, 49)
          AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier_q16 WHERE s_acctbal < 0)
        GROUP BY p_brand, p_type, p_size
        """
    )


@query(
    "tpch_q18_large_volume",
    tier="§3 planner (TPC-H Q18 shape: IN subquery with HAVING, deterministic top-k)",
    oracle="""
        SELECT c_custkey, c_name, o_orderkey,
               CAST(o_orderdate AS DATE) AS orderdate,
               ROUND(o_totalprice, 2) AS totalprice,
               ROUND(SUM(l_quantity), 2) AS total_qty
        FROM customer JOIN orders ON c_custkey = o_custkey
                      JOIN lineitem ON o_orderkey = l_orderkey
        WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem
                             GROUP BY l_orderkey HAVING SUM(l_quantity) > 250)
        GROUP BY c_custkey, c_name, o_orderkey, CAST(o_orderdate AS DATE), ROUND(o_totalprice, 2)
        ORDER BY totalprice DESC, o_orderkey ASC
        LIMIT 20
    """,
)
def tpch_q18_large_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN (aggregating subquery) — a left semi join against the HAVING
    output; top-20 via TakeOrderedAndProject (no total sort), o_orderkey
    tie-break for determinism."""
    load_table(spark, "customer", sf_dir).createOrReplaceTempView("customer_q18")
    load_table(spark, "orders", sf_dir).createOrReplaceTempView("orders_q18")
    load_table(spark, "lineitem", sf_dir).createOrReplaceTempView("lineitem_q18")
    return spark.sql(
        """
        SELECT c_custkey, c_name, o_orderkey,
               CAST(o_orderdate AS DATE) AS orderdate,
               ROUND(o_totalprice, 2) AS totalprice,
               ROUND(SUM(l_quantity), 2) AS total_qty
        FROM customer_q18 JOIN orders_q18 ON c_custkey = o_custkey
                          JOIN lineitem_q18 ON o_orderkey = l_orderkey
        WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem_q18
                             GROUP BY l_orderkey HAVING SUM(l_quantity) > 250)
        GROUP BY c_custkey, c_name, o_orderkey, CAST(o_orderdate AS DATE), ROUND(o_totalprice, 2)
        ORDER BY totalprice DESC, o_orderkey ASC
        LIMIT 20
        """
    )


@query(
    "tpch_q19_disjunctive",
    tier="P2 (TPC-H Q19 shape: OR-of-ANDs residual over a join)",
    oracle="""
        SELECT ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
        FROM lineitem JOIN part ON p_partkey = l_partkey
        WHERE (p_brand = 'Brand#2'  AND p_size BETWEEN 1 AND 5  AND l_quantity BETWEEN 1 AND 11)
           OR (p_brand = 'Brand#4'  AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 10 AND 20)
           OR (p_brand = 'Brand#19' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 20 AND 30)
    """,
)
def tpch_q19_disjunctive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Disjunctive residual predicate (TPC-H Q19 minus the fixture's
    missing container/shipmode columns). Catalyst extracts the common
    join key so the OR stays a post-join filter on the broadcast join;
    per-branch min/max bounds still prune the part side."""
    li = load_table(spark, "lineitem", sf_dir)
    p = load_table(spark, "part", sf_dir)
    qty, size, brand = F.col("l_quantity"), F.col("p_size"), F.col("p_brand")
    cond = (
        ((brand == "Brand#2") & size.between(1, 5) & qty.between(1, 11))
        | ((brand == "Brand#4") & size.between(1, 10) & qty.between(10, 20))
        | ((brand == "Brand#19") & size.between(1, 15) & qty.between(20, 30))
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .filter(cond)
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
    )


@query(
    "tpch_q7_volume_shipping",
    tier="J1 (TPC-H Q7 shape: nation-pair trade volume by year)",
    oracle="""
        SELECT supp_nation, cust_nation, l_year,
               ROUND(SUM(volume), 2) AS revenue
        FROM (SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
                     CAST(YEAR(CAST(l_shipdate AS DATE)) AS INT) AS l_year,
                     l_extendedprice * (1 - l_discount) AS volume
              FROM supplier JOIN lineitem ON s_suppkey = l_suppkey
                            JOIN orders ON o_orderkey = l_orderkey
                            JOIN customer ON c_custkey = o_custkey
                            JOIN nation n1 ON s_nationkey = n1.n_nationkey
                            JOIN nation n2 ON c_nationkey = n2.n_nationkey
              WHERE ((n1.n_name = 'NATION_12' AND n2.n_name = 'NATION_10')
                  OR (n1.n_name = 'NATION_9'  AND n2.n_name = 'NATION_11'))
                AND CAST(l_shipdate AS DATE) BETWEEN DATE '1996-01-01' AND DATE '1997-12-31'
             ) shipping
        GROUP BY supp_nation, cust_nation, l_year
    """,
)
def tpch_q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bilateral trade volume (TPC-H Q7): the nation dim joins twice
    under different roles — both broadcast — and the pair disjunction is
    a residual the optimizer pushes below the aggregate."""
    s = load_table(spark, "supplier", sf_dir)
    li = load_table(spark, "lineitem", sf_dir).filter(
        F.to_date("l_shipdate").between(F.lit("1996-01-01").cast("date"), F.lit("1997-12-31").cast("date"))
    )
    o = load_table(spark, "orders", sf_dir)
    c = load_table(spark, "customer", sf_dir)
    n1 = load_table(spark, "nation", sf_dir).select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = load_table(spark, "nation", sf_dir).select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        ((F.col("supp_nation") == "NATION_12") & (F.col("cust_nation") == "NATION_10"))
        | ((F.col("supp_nation") == "NATION_9") & (F.col("cust_nation") == "NATION_11"))
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(pair)
        .groupBy("supp_nation", "cust_nation", F.year(F.to_date("l_shipdate")).alias("l_year"))
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
    )


@query(
    "tpch_q8_market_share",
    tier="J1+A2 (TPC-H Q8 shape: 7-way join, share-of-total per year)",
    oracle="""
        SELECT o_year,
               ROUND(SUM(CASE WHEN nation = 'NATION_19' THEN volume ELSE 0 END)
                     / SUM(volume), 6) AS mkt_share
        FROM (SELECT CAST(YEAR(CAST(o_orderdate AS DATE)) AS INT) AS o_year,
                     l_extendedprice * (1 - l_discount) AS volume,
                     n2.n_name AS nation
              FROM part JOIN lineitem ON p_partkey = l_partkey
                        JOIN supplier ON s_suppkey = l_suppkey
                        JOIN orders ON l_orderkey = o_orderkey
                        JOIN customer ON o_custkey = c_custkey
                        JOIN nation n1 ON c_nationkey = n1.n_nationkey
                        JOIN region ON n1.n_regionkey = r_regionkey
                        JOIN nation n2 ON s_nationkey = n2.n_nationkey
              WHERE r_name = 'AMERICA' AND p_type = 'ECONOMY'
             ) all_nations
        GROUP BY o_year
    """,
)
def tpch_q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One nation's share of a region's part-type market per year
    (TPC-H Q8): a 7-way join where every dimension broadcasts; only the
    two fact tables shuffle. The share is a conditional-sum ratio inside
    one aggregate."""
    p = load_table(spark, "part", sf_dir).filter(F.col("p_type") == "ECONOMY")
    li = load_table(spark, "lineitem", sf_dir)
    s = load_table(spark, "supplier", sf_dir)
    o = load_table(spark, "orders", sf_dir)
    c = load_table(spark, "customer", sf_dir)
    n1 = load_table(spark, "nation", sf_dir).select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_region")
    )
    n2 = load_table(spark, "nation", sf_dir).select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("nation")
    )
    r = load_table(spark, "region", sf_dir).filter(F.col("r_name") == "AMERICA")
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("n1_key"))
        .join(F.broadcast(r), F.col("n1_region") == F.col("r_regionkey"))
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("n2_key"))
        .groupBy(F.year(F.to_date("o_orderdate")).alias("o_year"))
        .agg(
            F.round(
                F.sum(F.when(F.col("nation") == "NATION_19", vol).otherwise(0.0)) / F.sum(vol), 6
            ).alias("mkt_share")
        )
    )


@query(
    "tpch_q15_top_supplier",
    tier="§3 planner (TPC-H Q15 shape: CTE + scalar MAX subquery over it)",
    oracle="""
        WITH revenue AS (
            SELECT l_suppkey AS supplier_no,
                   SUM(l_extendedprice * (1 - l_discount)) AS total_revenue
            FROM lineitem
            WHERE CAST(l_shipdate AS DATE) >= DATE '1997-01-01'
              AND CAST(l_shipdate AS DATE) < DATE '1997-04-01'
            GROUP BY l_suppkey)
        SELECT s_suppkey, s_name, ROUND(total_revenue, 2) AS total_revenue
        FROM supplier JOIN revenue ON s_suppkey = supplier_no
        WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    """,
)
def tpch_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top supplier by quarterly revenue (TPC-H Q15). The SQL form
    references the CTE twice (join input + scalar MAX), which the static
    plan computes twice; the engine formulation instead ranks the
    aggregated revenue table — post-agg it's one row per supplier, so
    the single-partition window is tiny — one lineitem scan total, and
    rank()=1 keeps MAX-equality tie semantics."""
    from pyspark.sql.window import Window

    li = load_table(spark, "lineitem", sf_dir).filter(
        (F.to_date("l_shipdate") >= F.lit("1997-01-01").cast("date"))
        & (F.to_date("l_shipdate") < F.lit("1997-04-01").cast("date"))
    )
    s = load_table(spark, "supplier", sf_dir)
    rev = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("total_revenue")
    )
    top = (
        rev.withColumn("rnk", F.rank().over(Window.orderBy(F.col("total_revenue").desc())))
        .filter(F.col("rnk") == 1)
        .drop("rnk")
    )
    return (
        F.broadcast(top)
        .join(s, F.col("supplier_no") == s.s_suppkey)
        .select("s_suppkey", "s_name", F.round("total_revenue", 2).alias("total_revenue"))
    )


@query(
    "tpch_q22_idle_customers",
    tier="§3 planner (TPC-H Q22 shape: scalar AVG subquery + qualified NOT EXISTS)",
    oracle="""
        SELECT c_nationkey, COUNT(*) AS numcust,
               ROUND(SUM(c_acctbal), 2) AS totacctbal
        FROM customer c
        WHERE c_acctbal > (SELECT AVG(c_acctbal) FROM customer WHERE c_acctbal > 0)
          AND NOT EXISTS (SELECT 1 FROM orders
                          WHERE o_custkey = c.c_custkey AND o_totalprice > 450000)
        GROUP BY c_nationkey
    """,
)
def tpch_q22_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Well-funded customers with no large orders (TPC-H Q22 with
    o_totalprice standing in for the fixture's missing phone country
    codes): an uncorrelated scalar AVG subquery feeds the filter, and
    the qualified NOT EXISTS plans as a broadcast anti join against the
    pre-filtered orders side."""
    load_table(spark, "customer", sf_dir).createOrReplaceTempView("customer_q22")
    load_table(spark, "orders", sf_dir).createOrReplaceTempView("orders_q22")
    return spark.sql(
        """
        SELECT c_nationkey, COUNT(*) AS numcust,
               ROUND(SUM(c_acctbal), 2) AS totacctbal
        FROM customer_q22 c
        WHERE c_acctbal > (SELECT AVG(c_acctbal) FROM customer_q22 WHERE c_acctbal > 0)
          AND NOT EXISTS (SELECT 1 FROM orders_q22
                          WHERE o_custkey = c.c_custkey AND o_totalprice > 450000)
        GROUP BY c_nationkey
        """
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


@query(
    "tpch_q6_forecast_revenue",
    tier="P3+P6+A1 (TPC-H Q6 shape: multi-predicate scan → single global sum)",
    oracle="""
        SELECT ROUND(SUM(l_extendedprice * l_discount), 2) AS revenue
        FROM lineitem
        WHERE CAST(l_shipdate AS DATE) >= DATE '1996-01-01'
          AND CAST(l_shipdate AS DATE) <  DATE '1997-01-01'
          AND l_discount BETWEEN 0.05 AND 0.07
          AND l_quantity < 24
    """,
)
def tpch_q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue increase from discount removal (TPC-H Q6): the pure
    scan-filter-aggregate shape — all four predicates push into the
    parquet scan, the sum is one map-side-combined partial agg, zero
    joins. The baseline any columnar engine must ace."""
    li = load_table(spark, "lineitem", sf_dir)
    return (
        li.filter(
            (F.to_date("l_shipdate") >= F.lit("1996-01-01").cast("date"))
            & (F.to_date("l_shipdate") < F.lit("1997-01-01").cast("date"))
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias("revenue"))
    )


@query(
    "tpch_q9_product_profit",
    tier="J1+F2 (TPC-H Q9 shape: 5-way join, profit by supplier-nation × year)",
    oracle="""
        SELECT nation, o_year, ROUND(SUM(amount), 2) AS profit
        FROM (SELECT n_name AS nation,
                     CAST(YEAR(CAST(o_orderdate AS DATE)) AS INT) AS o_year,
                     l_extendedprice * (1 - l_discount) AS amount
              FROM lineitem JOIN supplier ON s_suppkey = l_suppkey
                            JOIN part ON p_partkey = l_partkey
                            JOIN orders ON o_orderkey = l_orderkey
                            JOIN nation ON s_nationkey = n_nationkey
              WHERE p_name LIKE '%red%'
             ) profit_lines
        GROUP BY nation, o_year
    """,
)
def tpch_q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Profit per supplier-nation per year over a part-name substring
    (TPC-H Q9 shape; the fixture has no partsupp table, so profit is
    revenue — the join/agg topology is unchanged). part/supplier/nation
    broadcast; only lineitem⋈orders shuffles."""
    li = load_table(spark, "lineitem", sf_dir)
    s = load_table(spark, "supplier", sf_dir)
    p = load_table(spark, "part", sf_dir).filter(F.col("p_name").contains("red"))
    o = load_table(spark, "orders", sf_dir)
    n = load_table(spark, "nation", sf_dir)
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year(F.to_date("o_orderdate")).alias("o_year"),
        )
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("profit"))
    )


@query(
    "tpch_q11_important_stock",
    tier="A1+§3 (TPC-H Q11 shape: group-agg filtered by a global scalar-subquery threshold)",
    oracle="""
        WITH contrib AS (
            SELECT l_partkey, SUM(l_extendedprice) AS part_value
            FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
                          JOIN nation ON s_nationkey = n_nationkey
            WHERE n_name IN ('NATION_3', 'NATION_7')
            GROUP BY l_partkey
        )
        SELECT l_partkey, ROUND(part_value, 2) AS part_value
        FROM contrib
        WHERE part_value > (SELECT 0.001 * SUM(part_value) FROM contrib)
    """,
)
def tpch_q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parts whose value exceeds a fraction of the national total
    (TPC-H Q11 shape; lineitem value stands in for partsupp stock). The
    global threshold is a 1-row aggregate cross-joined back (broadcast
    nested loop over 1 row — the distributed form of a scalar subquery,
    no driver collect); the grouped frame is computed once and reused
    for both sides via persist."""
    li = load_table(spark, "lineitem", sf_dir)
    s = load_table(spark, "supplier", sf_dir)
    n = load_table(spark, "nation", sf_dir).filter(F.col("n_name").isin("NATION_3", "NATION_7"))
    contrib = (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy("l_partkey")
        .agg(F.sum("l_extendedprice").alias("part_value"))
        .localCheckpoint(eager=False)
    )
    threshold = contrib.agg((F.sum("part_value") * 0.001).alias("__thr"))
    return (
        contrib.crossJoin(F.broadcast(threshold))
        .filter(F.col("part_value") > F.col("__thr"))
        .select("l_partkey", F.round("part_value", 2).alias("part_value"))
    )


@query(
    "tpch_q17_small_qty_revenue",
    tier="J1+§3 (TPC-H Q17 shape: correlated per-group AVG subquery)",
    oracle="""
        -- FLOOR-truncate the quotient (not ROUND): SUM/7.0 is a raw
        -- quotient whose closest double can sit on a .5 boundary at 2dp,
        -- where Spark and DuckDB ROUND diverge (CLAUDE.md quotient rule).
        SELECT FLOOR(SUM(l1.l_extendedprice) / 7.0 * 100) / 100 AS avg_yearly
        FROM lineitem l1 JOIN part ON p_partkey = l1.l_partkey
        WHERE p_brand = 'Brand#23'
          AND l1.l_quantity < (SELECT 0.5 * AVG(l2.l_quantity)
                               FROM lineitem l2 WHERE l2.l_partkey = l1.l_partkey)
    """,
)
def tpch_q17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue lost to small-quantity orders (TPC-H Q17): the correlated
    AVG decorrelates into a per-part aggregate joined back to the fact —
    one extra shuffle instead of a per-row subquery loop. The per-part
    avg is computed over ALL lineitems (not just the brand's), matching
    the SQL's correlation scope."""
    li = load_table(spark, "lineitem", sf_dir)
    p = load_table(spark, "part", sf_dir).filter(F.col("p_brand") == "Brand#23")
    per_part = li.groupBy(F.col("l_partkey").alias("__pk")).agg(
        (F.avg("l_quantity") * 0.5).alias("__half_avg")
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(per_part, li.l_partkey == per_part.__pk)
        .filter(F.col("l_quantity") < F.col("__half_avg"))
        .agg((F.floor(F.sum("l_extendedprice") / 7.0 * 100) / 100).alias("avg_yearly"))
    )


@query(
    "tpch_q2_min_cost_supplier",
    tier="J1+W1+§3 (TPC-H Q2 shape: per-part argmin supplier via window rank)",
    oracle="""
        WITH costs AS (
            SELECT l_partkey AS pk, l_suppkey AS sk,
                   MIN(l_extendedprice / l_quantity) AS unit_cost
            FROM lineitem
            GROUP BY 1, 2
        ),
        ranked AS (
            SELECT pk, sk, unit_cost,
                   ROW_NUMBER() OVER (PARTITION BY pk ORDER BY unit_cost ASC, sk ASC) AS rn
            FROM costs
        )
        SELECT p_partkey, p_brand, s_name, n_name,
               ROUND(s_acctbal, 2) AS s_acctbal,
               FLOOR(unit_cost * 10000) / 10000 AS unit_cost
        FROM ranked JOIN part ON p_partkey = pk
                    JOIN supplier ON s_suppkey = sk
                    JOIN nation ON s_nationkey = n_nationkey
                    JOIN region ON n_regionkey = r_regionkey
        WHERE rn = 1 AND p_size >= 40 AND r_name = 'EUROPE'
        ORDER BY s_acctbal DESC, n_name ASC, s_name ASC, p_partkey ASC
        LIMIT 20
    """,
)
def tpch_q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cheapest supplier per part in a region (TPC-H Q2 shape; observed
    lineitem unit price stands in for partsupp supply cost). The
    correlated MIN becomes a window argmin with a deterministic
    (unit_cost, suppkey) tie-break — identical to the oracle's
    ROW_NUMBER, so the LIMIT is stable across engines. unit_cost is
    FLOOR-truncated, not ROUNDed: ROUND diverges between engines when
    the quotient's closest double sits on a .5 boundary (price/2 with
    odd cents), while FLOOR of the identical IEEE quotient is exact."""
    from pyspark.sql import Window

    li = load_table(spark, "lineitem", sf_dir)
    p = load_table(spark, "part", sf_dir).filter(F.col("p_size") >= 40)
    s = load_table(spark, "supplier", sf_dir)
    n = load_table(spark, "nation", sf_dir)
    r = load_table(spark, "region", sf_dir).filter(F.col("r_name") == "EUROPE")
    costs = li.groupBy(F.col("l_partkey").alias("pk"), F.col("l_suppkey").alias("sk")).agg(
        F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_cost")
    )
    w = Window.partitionBy("pk").orderBy(F.col("unit_cost").asc(), F.col("sk").asc())
    best = costs.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)
    return (
        best.join(F.broadcast(p), best.pk == p.p_partkey)
        .join(F.broadcast(s), best.sk == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select(
            "p_partkey",
            "p_brand",
            "s_name",
            "n_name",
            F.round("s_acctbal", 2).alias("s_acctbal"),
            (F.floor(F.col("unit_cost") * 10000) / 10000).alias("unit_cost"),
        )
        .orderBy(F.col("s_acctbal").desc(), F.col("n_name").asc(), F.col("s_name").asc(), F.col("p_partkey").asc())
        .limit(20)
    )


@query(
    "tpch_q20_part_promotion",
    tier="J3+A1 (TPC-H Q20 shape: semi-join on a HAVING-filtered grouped subquery)",
    oracle="""
        SELECT s_name, ROUND(s_acctbal, 2) AS s_acctbal
        FROM supplier
        WHERE s_suppkey IN (
            SELECT l_suppkey
            FROM lineitem JOIN part ON p_partkey = l_partkey
            WHERE p_type = 'ECONOMY'
            GROUP BY l_suppkey, l_partkey
            HAVING SUM(l_quantity) > 80
        )
    """,
)
def tpch_q20_part_promotion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suppliers with excess stock of a part type (TPC-H Q20 shape;
    shipped quantity stands in for availqty). The nested IN becomes a
    LEFT SEMI join against the HAVING-filtered aggregate — no
    de-duplication pass needed, semi-join semantics absorb it.
    Quantities are integral doubles, so the HAVING threshold compares
    exactly on both engines."""
    li = load_table(spark, "lineitem", sf_dir)
    p = load_table(spark, "part", sf_dir).filter(F.col("p_type") == "ECONOMY")
    s = load_table(spark, "supplier", sf_dir)
    qualified = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum("l_quantity").alias("__qty"))
        .filter(F.col("__qty") > 80)
        .select("l_suppkey")
    )
    return (
        s.join(qualified, s.s_suppkey == qualified.l_suppkey, "left_semi")
        .select("s_name", F.round("s_acctbal", 2).alias("s_acctbal"))
    )


@query(
    "tpch_q21_waiting_supplier",
    tier="J3 (TPC-H Q21 shape: EXISTS + NOT EXISTS double correlation)",
    oracle="""
        WITH pairs_all AS (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem),
             pairs_r   AS (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem
                           WHERE l_returnflag = 'R')
        SELECT s_name, COUNT(*) AS numwait
        FROM pairs_r l1
        JOIN orders ON o_orderkey = l1.l_orderkey AND o_orderstatus = 'F'
        JOIN supplier ON s_suppkey = l1.l_suppkey
        WHERE EXISTS (SELECT 1 FROM pairs_all l2
                      WHERE l2.l_orderkey = l1.l_orderkey
                        AND l2.l_suppkey <> l1.l_suppkey)
          AND NOT EXISTS (SELECT 1 FROM pairs_r l3
                          WHERE l3.l_orderkey = l1.l_orderkey
                            AND l3.l_suppkey <> l1.l_suppkey)
        GROUP BY s_name
    """,
)
def tpch_q21_waiting_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suppliers solely responsible for returned lines on finalized
    multi-supplier orders (TPC-H Q21 shape; l_returnflag='R' stands in
    for the late-receipt predicate — the fixture has no receiptdate).
    The EXISTS/NOT-EXISTS correlation is per-order set logic, computed
    by two chained aggregations over ONE lineitem scan (r17 rewrite,
    pinned by test_q21_single_lineitem_scan_no_self_join): per
    (order, supplier) whether any line is returned, then per order the
    supplier count / returned-supplier count / the sole returner's key;
    "waiting" ⇔ n_supp ≥ 2 ∧ n_r = 1. No self-joins."""
    li = load_table(spark, "lineitem", sf_dir)
    o = load_table(spark, "orders", sf_dir).filter(F.col("o_orderstatus") == "F").select("o_orderkey")
    s = load_table(spark, "supplier", sf_dir)
    # r17 opt (guide §2.4): the EXISTS/NOT-EXISTS pair used two distincts
    # over lineitem plus two shuffled semi/anti joins with inequality
    # residuals. The correlation is per-order set logic, so two chained
    # aggregations compute it exactly: per (order, supplier) whether any
    # line is returned, then per order the supplier count, the returned-
    # supplier count, and — when exactly one supplier has returns — its
    # key. "Sole returner on a multi-supplier order" ⇔ n_supp ≥ 2 ∧
    # n_r = 1, and the waiting pair is (order, r_supp); identical row
    # set, one lineitem scan, no self-joins.
    ps = li.groupBy("l_orderkey", "l_suppkey").agg(
        F.max((F.col("l_returnflag") == "R").cast("int")).alias("has_r")
    )
    per = ps.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n_supp"),
        F.sum("has_r").alias("n_r"),
        F.max(F.when(F.col("has_r") == 1, F.col("l_suppkey"))).alias("r_supp"),
    )
    base = (
        per.filter((F.col("n_supp") >= 2) & (F.col("n_r") == 1))
        .select("l_orderkey", F.col("r_supp").alias("l_suppkey"))
        .join(o, F.col("l_orderkey") == o.o_orderkey, "left_semi")
    )
    return (
        base.join(F.broadcast(s), base.l_suppkey == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )


@query(
    "tpch_q13_custdist",
    tier="J2+A3 (TPC-H Q13 shape: outer-join count distribution)",
    oracle="""
        SELECT c_count, COUNT(*) AS custdist
        FROM (
            SELECT c_custkey, COUNT(o_orderkey) AS c_count
            FROM customer LEFT OUTER JOIN orders
              ON c_custkey = o_custkey
             AND o_orderpriority NOT LIKE '%URGENT%'
            GROUP BY c_custkey
        ) c_orders
        GROUP BY c_count
        ORDER BY custdist DESC, c_count DESC
    """,
)
def tpch_q13_custdist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer order-count distribution (TPC-H Q13, the last of the 22
    canonical shapes; o_orderpriority NOT LIKE stands in for the spec's
    o_comment filter the fixture lacks). The join-side predicate lives in
    the OUTER join condition -- not a post-filter -- so zero-order
    customers survive with c_count = 0. Two shuffles total: the outer
    join's and the tiny second COUNT's; COUNT(o_orderkey) skips the NULLs
    the outer join manufactures, which is the whole trick of the query."""
    c = load_table(spark, "customer", sf_dir)
    o = load_table(spark, "orders", sf_dir).filter(~F.col("o_orderpriority").like("%URGENT%"))
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )
