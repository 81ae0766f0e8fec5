"""Accuracy gates for the sketch-tier aggregates (SURVEY A6): declared
rows-only for the driver, so these tests are their correctness bound."""

from __future__ import annotations

from energi_data_etl_spark.queries import QUERIES


def test_approx_count_distinct_within_5pct(spark, oracle_sf_dir):
    # the query itself now emits the tolerance verdict (oracle-checked);
    # this pins that the verdict is all-true locally too
    for row in QUERIES["approx_count_distinct"].fn(spark, oracle_sf_dir).collect():
        assert row.within_tol, row


def test_approx_percentile_within_1pct(spark, oracle_sf_dir):
    # the query itself now emits the tolerance verdict (oracle-checked);
    # this pins that the verdict is all-true locally too
    for row in QUERIES["approx_percentile_sketch"].fn(spark, oracle_sf_dir).collect():
        assert row.within_tol, row
