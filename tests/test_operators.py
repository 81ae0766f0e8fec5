"""Unit tests for the operator library (SURVEY.md §5.2 item 4): edge
cases the corpus queries don't reach — empty inputs, no-match as-of,
tie timestamps."""

from __future__ import annotations

import datetime

import pyspark.sql.functions as F

from energi_data_etl_spark.operators.joins import asof_join


def _ts(s: str):
    return datetime.datetime.fromisoformat(s)


def test_asof_join_basic_and_ties(spark):
    left = spark.createDataFrame(
        [(1, _ts("2024-01-01T10:00:00")), (1, _ts("2024-01-01T12:00:00")), (2, _ts("2024-01-01T09:00:00"))],
        "user_id int, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (1, _ts("2024-01-01T09:30:00"), 10.0),
            (1, _ts("2024-01-01T12:00:00"), 20.0),  # exactly equal ts → included (at-or-before)
            (2, _ts("2024-01-01T09:30:00"), 99.0),  # after left's only row → no match
        ],
        "user_id int, ts timestamp, value double",
    )
    out = {
        (r["user_id"], r["ts"]): r["asof_value"]
        for r in asof_join(left, right, on=["user_id"], left_ts="ts", right_ts="ts", value_cols=["value"]).collect()
    }
    assert out[(1, _ts("2024-01-01T10:00:00"))] == 10.0
    assert out[(1, _ts("2024-01-01T12:00:00"))] == 20.0  # tie includes equality
    assert out[(2, _ts("2024-01-01T09:00:00"))] is None  # left join keeps row, null value


def test_asof_join_inner_drops_unmatched(spark):
    left = spark.createDataFrame([(1, _ts("2024-01-01T00:00:00"))], "user_id int, ts timestamp")
    right = spark.createDataFrame([(1, _ts("2024-06-01T00:00:00"), 1.0)], "user_id int, ts timestamp, value double")
    assert asof_join(left, right, ["user_id"], "ts", "ts", ["value"], how="inner").count() == 0


def test_asof_join_empty_right(spark):
    left = spark.createDataFrame([(1, _ts("2024-01-01T00:00:00"))], "user_id int, ts timestamp")
    right = spark.createDataFrame([], "user_id int, ts timestamp, value double")
    rows = asof_join(left, right, ["user_id"], "ts", "ts", ["value"]).collect()
    assert len(rows) == 1 and rows[0]["asof_value"] is None


def test_daily_average_empty_input(spark):
    """The reference guards empty loads (energy_etl.py:82 `if all_data:`) —
    the engine's groupBy naturally yields an empty frame, same schema."""
    from energi_data_etl_spark.pipeline.energy import daily_average

    empty = spark.createDataFrame([], "ts timestamp, zone string, price double")
    out = daily_average(empty, ts_col="ts", key_col="zone", value_col="price")
    assert out.count() == 0
    assert out.columns == ["date", "zone", "avg_value"]


def test_daily_average_matches_reference_shape(spark):
    """Reference semantics (energy_etl.py:69): daily mean of hourly prices
    per zone — 24 hourly rows collapse to one row per (date, zone)."""
    from energi_data_etl_spark.pipeline.energy import daily_average

    rows = [(_ts(f"2024-01-01T{h:02d}:00:00"), "SE3", float(h)) for h in range(24)]
    rows += [(_ts("2024-01-02T00:00:00"), "SE3", 10.0)]
    df = spark.createDataFrame(rows, "ts timestamp, zone string, price double")
    out = {(str(r["date"]), r["zone"]): r["avg_value"] for r in daily_average(df, value_col="price").collect()}
    assert out[("2024-01-01", "SE3")] == sum(range(24)) / 24  # == the reference's sum/len
    assert out[("2024-01-02", "SE3")] == 10.0


def test_adaptive_salted_join_equals_plain_join(spark):
    """The adaptive salted join must be row-identical to the plain
    equi-join in both regimes: with a detected hot key (the split+salt
    path runs) and with no key over the threshold (hot set empty, pure
    cold path) — the salt is a physical rewrite only."""
    import pyspark.sql.functions as F

    from energi_data_etl_spark.operators.skew import adaptive_salted_join

    # 80% of probe rows on key 1 (hot); build has one row per key
    probe = spark.range(1000).select(
        F.when(F.col("id") % 5 != 0, F.lit(1)).otherwise(F.col("id")).alias("pk"),
        (F.col("id") * 1.5).alias("v"),
    )
    build = probe.select(F.col("pk").alias("bk")).distinct().withColumn(
        "attr", F.col("bk") * 10
    )
    plain = probe.join(build, probe.pk == build.bk).groupBy("attr").agg(
        F.count(F.lit(1)).alias("n"), F.round(F.sum("v"), 4).alias("s")
    )
    salted = adaptive_salted_join(probe, build, "pk", "bk", salt_buckets=4).groupBy(
        "attr"
    ).agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("v"), 4).alias("s"))
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))

    # uniform keys: nothing crosses the 5% threshold, hot set is empty
    uniform = spark.range(1000).select(F.col("id").alias("pk"), F.lit(1.0).alias("v"))
    ub = uniform.select(F.col("pk").alias("bk")).distinct().withColumn("attr", F.col("bk"))
    got = adaptive_salted_join(uniform, ub, "pk", "bk").count()
    assert got == 1000
