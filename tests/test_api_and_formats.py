"""Engine API surface + multi-format IO round-trips."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from energi_data_etl_spark.api import Engine
from energi_data_etl_spark.sources.tables import load_table, read_any


def test_engine_sql_matches_dataframe_path(spark, sf_dir):
    eng = Engine(spark, sf_dir)
    via_sql = eng.sql(
        "SELECT l_returnflag, COUNT(*) AS n FROM lineitem GROUP BY l_returnflag"
    ).collect()
    via_df = (
        eng.table("lineitem").groupBy("l_returnflag").agg(F.count(F.lit(1)).alias("n")).collect()
    )
    assert {(r.l_returnflag, r.n) for r in via_sql} == {(r.l_returnflag, r.n) for r in via_df}


def test_engine_zone_summary_is_dashboard_shape(spark, sf_dir):
    eng = Engine(spark, sf_dir)
    cards = {r.event_type: r.avg_value for r in eng.zone_summary(months=[1]).collect()}
    assert set(cards) == {"click", "view", "purchase", "signup", "error"}


def test_engine_daily_averages_compose_with_summary(spark, sf_dir):
    eng = Engine(spark, sf_dir)
    daily = eng.daily_averages(months=[1])
    assert daily.columns == ["date", "event_type", "avg_value"]
    assert daily.count() > 0


def test_engine_run_query_and_catalog(spark, sf_dir):
    eng = Engine(spark, sf_dir)
    assert "flagship_daily_avg" in eng.query_names()
    assert eng.run_query("flagship_daily_avg").count() > 0
    with pytest.raises(KeyError):
        eng.table("nope")


@pytest.mark.parametrize("fmt", ["orc", "csv", "json"])
def test_format_round_trip_matches_parquet(spark, sf_dir, tmp_path, fmt):
    """S-tier: the same table written/read via other formats yields the
    same rows (schema explicit for text formats)."""
    src = load_table(spark, "nation", sf_dir)
    path = str(tmp_path / f"nation_{fmt}")
    writer = src.write.format(fmt)
    if fmt == "csv":
        writer = writer.option("header", True)
    writer.save(path)
    back = read_any(
        spark,
        path,
        fmt,
        schema="n_nationkey int, n_name string, n_regionkey int",
        **({"header": True} if fmt == "csv" else {}),
    )
    assert {tuple(r) for r in back.collect()} == {tuple(r) for r in src.collect()}


def test_text_format_requires_schema(spark, tmp_path):
    with pytest.raises(ValueError):
        read_any(spark, str(tmp_path), "csv")
