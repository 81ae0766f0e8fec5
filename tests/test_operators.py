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


def test_observe_metrics_ride_the_job(spark, sf_dir):
    """df.observe attaches accumulator-backed metrics to the MAIN job —
    row counts / sums / extrema collected during the action, no second
    scan. The 100 TB data-quality pattern: every pipeline stage reports
    its own volume metrics for free. Certified: observed metrics equal
    a separately-computed aggregate."""
    import pyspark.sql.functions as F
    from pyspark.sql import Observation

    from energi_data_etl_spark.sources.tables import load_table

    ev = load_table(spark, "events", sf_dir)
    obs = Observation("ingest_metrics")
    observed = ev.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("value").alias("sum_value"),
        F.min("ts").alias("min_ts"),
        F.max("ts").alias("max_ts"),
    )
    observed.groupBy("event_type").count().collect()  # one real action
    got = obs.get
    want = ev.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("value").alias("sum_value"),
        F.min("ts").alias("min_ts"),
        F.max("ts").alias("max_ts"),
    ).collect()[0]
    assert got["n_rows"] == want["n_rows"]
    assert abs(got["sum_value"] - want["sum_value"]) < 1e-6
    assert got["min_ts"] == want["min_ts"] and got["max_ts"] == want["max_ts"]


def test_map_in_arrow_matches_jvm_expression(spark, sf_dir):
    """mapInArrow is the lowest-overhead Python boundary — raw Arrow
    RecordBatches, no pandas conversion tax. The kernel must agree
    exactly with the JVM expression it replaces (here per-doc byte
    length), certifying the batch schema contract both directions."""
    import pyarrow as pa
    import pyspark.sql.functions as F

    from energi_data_etl_spark.sources.tables import load_table

    d = load_table(spark, "documents", sf_dir).select("doc_id", "text")

    def kernel(batches):
        for b in batches:
            yield pa.RecordBatch.from_arrays(
                [b.column("doc_id"), pa.compute.binary_length(b.column("text"))],
                names=["doc_id", "n"],
            )

    got = {
        r.doc_id: r.n
        for r in d.mapInArrow(kernel, "doc_id long, n int").collect()
    }
    want = {r.doc_id: r.n for r in d.select("doc_id", F.length("text").alias("n")).collect()}
    assert got == want


def test_parquet_bloom_filter_option_writes_filters(spark, sf_dir, tmp_path):
    """Parquet bloom filters are the point-lookup data-skipping layer
    under zone maps (high-cardinality keys where min/max ranges prune
    nothing). The write option must actually add filter bytes to the
    file, and the data must round-trip identically — the at-scale
    contract for needle-in-haystack scans over id columns."""
    from energi_data_etl_spark.sources.tables import load_table

    ev = load_table(spark, "events", sf_dir).select("event_id", "user_id").coalesce(1)
    plain, bloomed = str(tmp_path / "plain"), str(tmp_path / "bloomed")
    ev.write.parquet(plain)
    (
        ev.write.option("parquet.bloom.filter.enabled#event_id", "true")
        .option("parquet.bloom.filter.expected.ndv#event_id", "20000")
        .parquet(bloomed)
    )
    import glob
    import os

    size = lambda p: sum(os.path.getsize(f) for f in glob.glob(f"{p}/part-*.parquet"))  # noqa: E731
    assert size(bloomed) > size(plain), (size(bloomed), size(plain))
    back = spark.read.parquet(bloomed)
    assert back.count() == ev.count()
    assert back.filter("event_id = 42").count() == ev.filter("event_id = 42").count()


def test_sorted_pair_structs_singleton_and_empty_sets_yield_no_pairs(spark):
    """ADVICE r17 #4: the i<j pair expansion must be safe WITHOUT the
    caller's size>1 filter — on a singleton set F.sequence(0, -1)
    yields the descending [0, -1] and F.get returns nulls, so the raw
    idiom emits a spurious (null, null) pair. The shared helper embeds
    the guard; exploding it on unfiltered sets must produce exactly the
    true i<j pairs and nothing for size<=1 rows."""
    from energi_data_etl_spark.operators.arrays import sorted_pair_structs

    df = spark.createDataFrame(
        [(1, ["a", "b", "c"]), (2, ["x"]), (3, []), (4, ["m", "n"])],
        "k int, s array<string>",
    )
    out = (
        df.select("k", F.explode(sorted_pair_structs("s", "u", "v")).alias("p"))
        .select("k", "p.u", "p.v")
        .collect()
    )
    got = sorted((r.k, r.u, r.v) for r in out)
    assert got == [(1, "a", "b"), (1, "a", "c"), (1, "b", "c"), (4, "m", "n")], got
    assert all(u is not None and v is not None for _, u, v in got)
