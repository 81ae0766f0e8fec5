"""Bucketed-table co-location (SURVEY.md §4.3): the fact⋈fact join
pattern at scale — pay the shuffle once at write, join shuffle-free
forever after."""

from __future__ import annotations

import pyspark.sql.functions as F

from energi_data_etl_spark.plans.inspect import explain_str
from energi_data_etl_spark.sources.sinks import write_bucketed_table
from energi_data_etl_spark.sources.tables import load_table


def test_bucketed_join_has_no_exchange(spark, sf_dir):
    orders = load_table(spark, "orders", sf_dir).select("o_orderkey", "o_custkey", "o_totalprice")
    lineitem = load_table(spark, "lineitem", sf_dir).select("l_orderkey", "l_quantity", "l_extendedprice")
    write_bucketed_table(orders, "b_orders", "o_orderkey", n_buckets=8)
    write_bucketed_table(lineitem.withColumnRenamed("l_orderkey", "o_orderkey"), "b_lineitem", "o_orderkey", 8)

    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force SMJ so bucketing is what's tested
    try:
        a = spark.table("b_orders")
        b = spark.table("b_lineitem")
        joined = a.join(b, "o_orderkey").groupBy().agg(F.sum("l_quantity").alias("q"))
        plan = explain_str(a.join(b, "o_orderkey"), mode="simple")
        assert "Exchange" not in plan, plan  # both sides pre-bucketed → no shuffle
        # and the result is right
        got = joined.first()["q"]
        want = (
            load_table(spark, "lineitem", sf_dir)
            .join(load_table(spark, "orders", sf_dir), F.col("l_orderkey") == F.col("o_orderkey"))
            .agg(F.sum("l_quantity"))
            .first()[0]
        )
        assert got == want
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_bucketed_aggregation_avoids_shuffle(spark, sf_dir):
    cust = load_table(spark, "customer", sf_dir).select("c_custkey", "c_acctbal")
    write_bucketed_table(cust, "b_customer", "c_custkey", n_buckets=8)
    try:
        t = spark.table("b_customer")
        plan = explain_str(t.groupBy("c_custkey").agg(F.sum("c_acctbal").alias("s")), mode="simple")
        assert "Exchange" not in plan, plan  # grouping key == bucket key
    finally:
        spark.sql("DROP TABLE IF EXISTS b_customer")
