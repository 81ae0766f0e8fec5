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


def test_gapfill_spine_is_dense_and_fill_monotone(spark, oracle_sf_dir):
    """Gap-fill invariants beyond the hash compare: every (date, type)
    cell exists (dense spine), no non-gap row lost its value, and once
    a category observes a value every later cell is non-null."""
    import pyspark.sql.functions as F

    out = QUERIES["gapfill_forward"].fn(spark, oracle_sf_dir)
    rows = out.collect()
    types = {r.event_type for r in rows}
    dates = {str(r.date) for r in rows}
    assert len(rows) == len(types) * len(dates), "spine must be the full cross product"
    by_type = {}
    for r in sorted(rows, key=lambda r: (r.event_type, str(r.date))):
        seen = by_type.get(r.event_type, False)
        if r.filled_value is not None:
            by_type[r.event_type] = True
        elif seen:
            raise AssertionError(f"null after first observation: {r}")
        if not r.was_gap:
            assert r.filled_value is not None, r


def test_merge_upsert_conserves_keys(spark, oracle_sf_dir):
    """MERGE op-count identities: kept + updated = |base|,
    updated + inserted = |updates| (no key lost or double-counted)."""
    from energi_data_etl_spark.sources.tables import load_table
    import pyspark.sql.functions as F

    o = load_table(spark, "orders", oracle_sf_dir)
    n_base = o.filter(F.col("o_orderkey") % 3 != 0).count()
    n_upd = o.filter(F.col("o_orderkey") % 2 == 0).count()
    ops = {}
    for r in QUERIES["merge_upsert_orders"].fn(spark, oracle_sf_dir).collect():
        ops[r.op] = ops.get(r.op, 0) + r.n
    assert ops["kept"] + ops["updated"] == n_base, ops
    assert ops["updated"] + ops["inserted"] == n_upd, ops


def test_percentile_disc_histogram_matches_native(spark, oracle_sf_dir):
    """The r12 histogram + cumulative-window + exact-BIGINT-pick plan
    must equal Spark's own percentile_disc WITHIN GROUP on the fixture
    — the cross-engine hash gate pins it against DuckDB QUANTILE_DISC;
    this pins it against the engine-native buffering aggregate too, so
    a boundary-convention drift (ceil(p*n) vs floor((n-1)p)+1) in any
    future rewrite is caught locally."""
    from energi_data_etl_spark.sources.tables import load_table

    ours = {
        r.l_returnflag: (r.p25, r.p50, r.p99)
        for r in QUERIES["percentile_disc_surface"].fn(spark, oracle_sf_dir).collect()
    }
    load_table(spark, "lineitem", oracle_sf_dir).createOrReplaceTempView("__pd_native")
    native = {
        r.l_returnflag: (r.p25, r.p50, r.p99)
        for r in spark.sql(
            """
            SELECT l_returnflag,
                   percentile_disc(0.25) WITHIN GROUP (ORDER BY l_extendedprice) AS p25,
                   percentile_disc(0.50) WITHIN GROUP (ORDER BY l_extendedprice) AS p50,
                   percentile_disc(0.99) WITHIN GROUP (ORDER BY l_extendedprice) AS p99
            FROM __pd_native GROUP BY l_returnflag
            """
        ).collect()
    }
    assert ours == native
