"""Exact-method tests for the round-8 quality/forecast/sketch tier
(queries/quality.py) — the invariants the DuckDB oracle can't see:
the Misra-Gries superset guarantee under real skew, prefix-filter
recall vs the unfiltered q-gram join, and the equi-depth balance
property."""

from __future__ import annotations

import pyspark.sql.functions as F

from energi_data_etl_spark.queries.quality import (
    char_lm_quality_bits,
    dq_expectation_suite,
    feature_equidepth_bins,
    fuzzy_join_prefix_filtered,
    heavyhitters_misra_gries,
    seasonal_naive_backtest,
)


def test_dq_suite_all_pass_on_fixture(spark, sf_dir):
    rows = dq_expectation_suite(spark, sf_dir).collect()
    assert len(rows) == 8
    assert all(r.passed for r in rows), [r.check_id for r in rows if not r.passed]
    assert all(r.observed == 0 for r in rows)


def test_misra_gries_superset_guarantee_under_skew(spark):
    """Synthetic 90%-hot-key stream across many partitions: the union of
    per-partition MG candidates must contain every key with global
    frequency > n/k — the pigeonhole guarantee the query's verdict
    column pins. Reuses the query's kernel via a temp parquet table."""
    import tempfile

    n = 20_000
    hot = F.when(F.pmod(F.col("id"), F.lit(10)) < 9, F.lit("hot")).otherwise(
        F.concat(F.lit("cold"), (F.col("id") % 500).cast("string"))
    )
    with tempfile.TemporaryDirectory() as d:
        (
            spark.range(n)
            .select(
                F.col("id").alias("event_id"),
                F.timestamp_micros((F.lit(1704067200_000000) + F.col("id")).cast("long")).alias("ts"),
                F.col("id").alias("user_id"),
                hot.alias("event_type"),
                F.lit(1.0).alias("value"),
                F.lit("{}").alias("props"),
            )
            .repartition(16)
            .write.mode("overwrite")
            .parquet(f"{d}/events.parquet")
        )
        out = heavyhitters_misra_gries(spark, d).collect()
    heavy = [r.event_type for r in out if r.is_heavy]
    assert heavy == ["hot"]  # 90% >> 1/8; every cold key is ~0.018%
    assert all(r.sketch_found_all_heavy for r in out)


def test_prefix_filter_recall_vs_full_qgram_join(spark, sf_dir):
    """Every levenshtein<=2 pair the UNFILTERED q-gram join finds must
    survive prefix filtering: a 1-char edit disturbs at most 2 of the
    2-grams, and TPC-H-ish names have >=4 rare grams left intact, so
    true near-dups always collide on a rare gram."""
    filtered = {
        (r.name_a, r.name_b)
        for r in fuzzy_join_prefix_filtered(spark, sf_dir).collect()
        if r.lev_dist <= 2
    }
    from energi_data_etl_spark.sources.tables import load_table

    names = load_table(spark, "part", sf_dir).select("p_name").distinct()
    idx = F.sequence(F.lit(1), F.length("p_name") - 1)
    grams = names.select(
        "p_name",
        F.explode(
            F.array_distinct(F.transform(idx, lambda i: F.col("p_name").substr(i, F.lit(2))))
        ).alias("g"),
    )
    a = grams.select(F.col("p_name").alias("name_a"), "g")
    b = grams.select(F.col("p_name").alias("name_b"), "g")
    full = {
        (r.name_a, r.name_b)
        for r in (
            a.join(b, "g")
            .filter(F.col("name_a") < F.col("name_b"))
            .select("name_a", "name_b")
            .distinct()
            .withColumn("lev", F.levenshtein("name_a", "name_b"))
            .filter(F.col("lev") <= 2)
            .collect()
        )
    }
    assert full, "fixture has no lev<=2 name pairs — recall test is vacuous"
    assert full <= filtered | full and filtered <= full | filtered  # type sanity
    missed = full - filtered
    assert not missed, f"prefix filter lost true near-dup pairs: {sorted(missed)[:5]}"


def test_equidepth_bins_are_balanced(spark, sf_dir):
    rows = feature_equidepth_bins(spark, sf_dir).collect()
    assert [r.bin for r in rows] == list(range(1, 11))
    sizes = [r.n_rows for r in rows]
    assert max(sizes) - min(sizes) <= 1  # NTILE equi-depth property
    # bins tile the value range in order (boundaries may touch on ties)
    for lo_r, hi_r in zip(rows, rows[1:]):
        assert lo_r.hi <= hi_r.lo


def test_seasonal_backtest_window(spark, sf_dir):
    rows = seasonal_naive_backtest(spark, sf_dir).collect()
    # events span exactly 2024-01-01..30 at every SF -> 23 scored days
    assert all(r.n_days == 23 for r in rows)
    assert all(r.mae_seasonal >= 0 and r.mae_naive >= 0 for r in rows)


def test_char_lm_bits_sane(spark, sf_dir):
    rows = char_lm_quality_bits(spark, sf_dir).collect()
    assert len(rows) == 5
    for r in rows:
        assert r.n_chars > 0
        # unigram char entropy of natural-ish text: 0 < H < log2(alphabet)
        assert 0.0 < r.bits_per_char < 8.0


def test_benford_covers_all_digits_and_sums_to_one(spark, sf_dir):
    from energi_data_etl_spark.queries.quality import benford_first_digit_audit

    rows = benford_first_digit_audit(spark, sf_dir).collect()
    assert [r.digit for r in rows] == list(range(1, 10))
    assert abs(sum(r.p_benford for r in rows) - 1.0) < 1e-4
    assert sum(r.n_obs for r in rows) > 0
    # freq_obs is a probability vector up to FLOOR truncation
    assert 0.999 <= sum(r.freq_obs for r in rows) <= 1.0 + 1e-9


def test_psi_detects_injected_drift(spark):
    """Synthetic drift: the current fortnight's values shifted +200 for
    one type — its PSI must cross the 0.2 alert bar while the stable
    type stays under it."""
    import tempfile

    import pyspark.sql.functions as F

    n = 10_000
    half = F.col("id") % 30 < 15  # first 15 "days"
    drifted_type = F.when(F.col("id") % 2 == 0, "stable").otherwise("drifty")
    value = F.when(
        (F.col("id") % 2 == 1) & ~half, 250.0 + F.pmod(F.xxhash64("id"), F.lit(100))
    ).otherwise(10.0 + F.pmod(F.xxhash64("id", F.lit(2)), F.lit(100)))
    with tempfile.TemporaryDirectory() as d:
        (
            spark.range(n)
            .select(
                F.col("id").alias("event_id"),
                F.timestamp_micros(
                    (F.lit(1704067200_000000) + (F.col("id") % 30) * F.lit(86_400_000_000)).cast(
                        "long"
                    )
                ).alias("ts"),
                F.col("id").alias("user_id"),
                drifted_type.alias("event_type"),
                value.cast("double").alias("value"),
                F.lit("{}").alias("props"),
            )
            .repartition(8)
            .write.mode("overwrite")
            .parquet(f"{d}/events.parquet")
        )
        from energi_data_etl_spark.queries.quality import psi_value_drift

        out = {r.event_type: r for r in psi_value_drift(spark, d).collect()}
    assert out["drifty"].drifted and out["drifty"].psi > 0.2
    assert not out["stable"].drifted and out["stable"].psi < 0.05


def test_changepoint_finds_injected_shift(spark):
    """A level shift of +500/day injected on day 20 must be the argmax
    split for that type."""
    import datetime
    import tempfile

    import pyspark.sql.functions as F

    n = 30_000  # 1000 events/day x 30 days
    # day decoupled from the id parity that assigns the type — id % 30
    # would give the odd-id "stepped" type only odd days
    day = F.floor(F.col("id") / 2) % 30
    value = F.when((F.col("id") % 2 == 1) & (day >= 19), 60.0).otherwise(10.0)
    with tempfile.TemporaryDirectory() as d:
        (
            spark.range(n)
            .select(
                F.col("id").alias("event_id"),
                F.timestamp_micros(
                    (F.lit(1704067200_000000) + day * F.lit(86_400_000_000)).cast("long")
                ).alias("ts"),
                F.col("id").alias("user_id"),
                F.when(F.col("id") % 2 == 0, "flat").otherwise("stepped").alias("event_type"),
                value.cast("double").alias("value"),
                F.lit("{}").alias("props"),
            )
            .repartition(8)
            .write.mode("overwrite")
            .parquet(f"{d}/events.parquet")
        )
        from energi_data_etl_spark.queries.quality import changepoint_binary_segmentation

        out = {r.event_type: r for r in changepoint_binary_segmentation(spark, d).collect()}
    # the last pre-shift day (Jan 19; shift starts day index 19 = Jan 20)
    # is the argmax split, left = days 0..18 -> 19 days
    assert out["stepped"].split_day == datetime.date(2024, 1, 19)
    assert out["stepped"].left_days == 19
    assert out["stepped"].gap_stat > out["flat"].gap_stat * 10


def test_twap_bounded_by_value_range(spark, sf_dir):
    from energi_data_etl_spark.queries.timeseries import time_weighted_average_daily

    rows = time_weighted_average_daily(spark, sf_dir).collect()
    assert len(rows) == 150  # 5 types x 30 days at every SF
    assert all(0.0 < r.twap < 500.0 for r in rows)  # convex combination of values
    assert all(r.n_segments >= 1 for r in rows)


def test_ohlc_invariants(spark, sf_dir):
    import pyspark.sql.functions as F

    from energi_data_etl_spark.queries.timeseries import ohlc_hourly_resample
    from energi_data_etl_spark.sources.tables import load_table

    df = ohlc_hourly_resample(spark, sf_dir)
    bad = df.filter(
        (F.col("high") < F.col("low"))
        | (F.col("open") > F.col("high"))
        | (F.col("open") < F.col("low"))
        | (F.col("close") > F.col("high"))
        | (F.col("close") < F.col("low"))
    ).count()
    assert bad == 0
    total = df.agg(F.sum("volume")).collect()[0][0]
    assert total == load_table(spark, "events", sf_dir).count()  # every event in exactly one candle


def test_key_skew_audit_gini_bounds(spark, sf_dir):
    from energi_data_etl_spark.queries.quality import key_skew_audit

    rows = {r.key_name: r for r in key_skew_audit(spark, sf_dir).collect()}
    assert set(rows) == {"lineitem.l_partkey", "lineitem.l_suppkey", "events.user_id"}
    for r in rows.values():
        assert 0.0 <= r.gini < 1.0
        assert 0.0 < r.top_share <= 1.0
        assert r.max_count * r.n_keys >= r.n_rows  # max >= mean
    # fixture keys are near-uniform: no mega-key, low inequality
    assert all(r.gini < 0.5 for r in rows.values())


def test_event_sequence_rates_sane(spark, sf_dir):
    from energi_data_etl_spark.queries.behavior import event_sequence_detection

    rows = event_sequence_detection(spark, sf_dir).collect()
    assert len(rows) == 30
    for r in rows:
        assert 0 <= r.n_recovered <= r.n_errors
        assert 0.0 <= r.recovery_rate <= 1.0


def test_user_path_topk_shape(spark, sf_dir):
    from energi_data_etl_spark.queries.behavior import user_path_topk

    rows = user_path_topk(spark, sf_dir).collect()
    assert len(rows) == 10
    counts = [r.n_user_days for r in rows]
    assert counts == sorted(counts, reverse=True)
    for r in rows:
        parts = r.path.split(">")
        assert 1 <= len(parts) <= 5
        assert set(parts) <= {"view", "click", "purchase", "signup", "error"}


def test_conversion_latency_quantiles_ordered(spark, sf_dir):
    from energi_data_etl_spark.queries.behavior import conversion_latency_quantiles

    r = conversion_latency_quantiles(spark, sf_dir).collect()[0]
    assert r.n_converted > 0
    assert 0 <= r.p25_s <= r.p50_s <= r.p75_s <= r.p90_s


def test_attribution_shares_sum_to_one(spark, sf_dir):
    from energi_data_etl_spark.queries.behavior import attribution_last_touch

    rows = attribution_last_touch(spark, sf_dir).collect()
    touches = {r.touch for r in rows}
    assert touches <= {"view", "click", "signup", "error", "none"}  # never 'purchase'
    assert 0.999 <= sum(r.share for r in rows) <= 1.0 + 1e-9  # FLOOR-truncated partition of 1
    assert all(r.n_purchases > 0 for r in rows)


def test_seasonal_adjusted_anomaly_shape(spark, sf_dir):
    from energi_data_etl_spark.queries.timeseries import seasonal_adjusted_anomaly

    rows = seasonal_adjusted_anomaly(spark, sf_dir).collect()
    assert len(rows) == 15  # top-3 per type x 5 types
    by_type = {}
    for r in rows:
        by_type.setdefault(r.event_type, []).append(r)
    assert all(len(v) == 3 for v in by_type.values())


def test_mutual_information_bounds(spark, sf_dir):
    from energi_data_etl_spark.queries.quality import mutual_information_type_value

    r = mutual_information_type_value(spark, sf_dir).collect()[0]
    assert r.n_events > 0
    # 0 <= MI <= min(H(T), H(B)); fixture type/value are ~independent
    assert -1e-9 <= r.mi_nats <= min(r.h_type_nats, r.h_bin_nats) + 1e-9
    # value does not encode type in the fixture, but finite-sample MI is
    # biased up by ~(|T|-1)(|B|-1)/(2N) nats (= 0.018 at sf0.001's N=1000)
    assert r.mi_nats < 36.0 / (2 * r.n_events) + 0.01
    import math

    assert 0 < r.h_type_nats <= math.log(5) + 1e-9
    assert 0 < r.h_bin_nats <= math.log(10) + 1e-9


def test_streaming_ohlc_equals_batch_ohlc(spark, sf_dir):
    """Stream/batch equivalence (SURVEY §5.2.6) for the ORDER-dependent
    candle aggregate: the incremental min_by/max_by stream and the
    two-sided-rank batch plan must produce identical candles."""
    from energi_data_etl_spark.queries.streaming import streaming_ohlc_candles
    from energi_data_etl_spark.queries.timeseries import ohlc_hourly_resample

    s = {
        (r.event_type, r.h): (r.open, r.high, r.low, r.close, r.volume)
        for r in streaming_ohlc_candles(spark, sf_dir).collect()
    }
    b = {
        (r.event_type, r.h): (r.open, r.high, r.low, r.close, r.volume)
        for r in ohlc_hourly_resample(spark, sf_dir).collect()
    }
    assert s == b


def test_streaming_ohlc_append_evicts(spark, sf_dir):
    """The append-mode drain must emit exactly the watermark-FINALIZED
    subset of the complete-mode candles: identical values for every
    candle whose end the 25 h watermark passed, and a NON-EMPTY evicted
    tail (the last ~26 h of fixture hours never finalize in a bounded
    drain) — the state-eviction contract the complete twin defers to."""
    import datetime as dt

    import pyspark.sql.functions as F

    from energi_data_etl_spark.queries.streaming import (
        streaming_ohlc_candles,
        streaming_ohlc_candles_append,
    )
    from energi_data_etl_spark.sources.tables import load_table

    complete = {
        (r.event_type, r.h): (r.open, r.high, r.low, r.close, r.volume)
        for r in streaming_ohlc_candles(spark, sf_dir).collect()
    }
    append = {
        (r.event_type, r.h): (r.open, r.high, r.low, r.close, r.volume)
        for r in streaming_ohlc_candles_append(spark, sf_dir).collect()
    }
    max_ts = load_table(spark, "events", sf_dir).agg(F.max("ts")).collect()[0][0]
    cut = max_ts - dt.timedelta(hours=26)
    finalized = {k: v for k, v in complete.items() if k[1] <= cut}
    assert append == finalized
    assert len(append) < len(complete)  # something was actually evicted
