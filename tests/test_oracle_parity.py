"""Replicates the driver's t2 gate locally: every catalog query with an
oracle must match DuckDB at sf0.01 (row count + columns + values)."""

from __future__ import annotations

import pytest

from energi_data_etl_spark.plans.parity import check_query
from energi_data_etl_spark.queries import QUERIES

ORACLE_QUERIES = sorted(name for name, q in QUERIES.items() if q.oracle is not None)
ROWS_ONLY_QUERIES = sorted(name for name, q in QUERIES.items() if q.oracle is None)


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_query_matches_duckdb_oracle(spark, duck, oracle_sf_dir, name):
    q = QUERIES[name]
    res = check_query(spark, duck, name, q.fn, q.oracle, oracle_sf_dir)
    assert res.ok, f"{name}: {res.detail}"
    # an empty result matches any oracle vacuously — every declared
    # query must exercise real rows at the driver's SF (audited: all do)
    assert not res.detail.startswith("0 rows"), f"{name}: vacuous oracle match (0 rows)"


@pytest.mark.parametrize("name", ROWS_ONLY_QUERIES)
def test_rows_only_query_runs(spark, oracle_sf_dir, name):
    """Rows-only queries still pass through the driver canonicalizer, so
    the complex-output-column check (see plans/parity.py::
    complex_output_columns — a bug class that cost three rounds) rides
    this execution; oracle queries get the same guard inside
    check_query. No query is executed twice just to read its schema."""
    from energi_data_etl_spark.plans.parity import complex_output_columns

    q = QUERIES[name]
    df = q.fn(spark, oracle_sf_dir)
    bad = complex_output_columns(df)
    assert not bad, f"{name} outputs complex-typed columns {bad} (serialize to strings)"
    assert df.count() > 0, f"{name}: empty result — a rows-only check proves nothing"
    assert len(df.columns) > 0


# The driver certifies the FIRST 50 queries in registration order each
# round; queries/__init__.py pins the round's window explicitly in
# FIRST_50 and reorders the registry to match. Assert the registry
# agrees so an accidental import reshuffle or catalog insertion doesn't
# silently change which queries get certified (ADVICE r03). Changing
# the rotation ON PURPOSE = edit FIRST_50 in queries/__init__.py.


def test_first_50_registration_order_pinned():
    from energi_data_etl_spark.queries import FIRST_50

    assert list(QUERIES)[:50] == FIRST_50


def test_entry_smoke(spark, sf_dir):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert set(df.columns) == {"date", "event_type", "avg_value"}


def test_contract_shapes():
    import __spark_entry__ as e

    qs, os_ = e.queries(), e.oracle_sql()
    assert set(os_) <= set(qs)
    assert "flagship_daily_avg" in qs
