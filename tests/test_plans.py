"""Physical-plan audits (SURVEY.md §4, the 100 TB mandate): these fail
if a plan regression would hurt at scale — filter not pushed to parquet,
dimension join not broadcast, projection not pruned."""

from __future__ import annotations

import pyspark.sql.functions as F

from energi_data_etl_spark.plans.inspect import (
    assert_broadcast_join,
    assert_pushed_filter,
    explain_str,
    scan_read_schema,
)
from energi_data_etl_spark.queries import QUERIES


def test_filter_pushdown_reaches_scan(spark, sf_dir):
    df = QUERIES["filter_projection"].fn(spark, sf_dir)
    assert_pushed_filter(df, "o_orderstatus")
    assert_pushed_filter(df, "o_totalprice")


def test_projection_prunes_read_schema(spark, sf_dir):
    df = QUERIES["filter_projection"].fn(spark, sf_dir)
    schema_line = scan_read_schema(df, "orders")
    # 3 projected + 2 filter-only columns; the untouched o_custkey must not be read
    assert "o_custkey" not in schema_line, schema_line


def test_star_join_broadcasts_dims(spark, sf_dir):
    df = QUERIES["join_star_revenue"].fn(spark, sf_dir)
    assert_broadcast_join(df, n_expected=3)


def test_topk_plans_take_ordered(spark, sf_dir):
    plan = explain_str(QUERIES["topk_orders"].fn(spark, sf_dir))
    assert "TakeOrderedAndProject" in plan, plan


def test_agg_has_partial_combine(spark, sf_dir):
    plan = explain_str(QUERIES["pricing_summary"].fn(spark, sf_dir))
    assert plan.count("HashAggregate") >= 2, plan  # partial + final


def test_whole_stage_codegen_covers_flagship(spark, sf_dir):
    # simple mode marks codegen stages with '*(n)'; AQE only materializes
    # the final (codegen-annotated) plan after execution
    df = QUERIES["flagship_daily_avg"].fn(spark, sf_dir)
    df.collect()
    plan = explain_str(df, mode="simple")
    assert "*(" in plan, plan


def test_asof_join_is_single_shuffle(spark, sf_dir):
    """The union+window rewrite must not plan a join (no pairwise blowup):
    exactly one Exchange on user_id for the window."""
    plan = explain_str(QUERIES["join_asof"].fn(spark, sf_dir), mode="simple")
    assert "Join" not in plan, plan
    assert plan.count("Exchange") == 1, plan
