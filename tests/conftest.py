from __future__ import annotations

import os

import pytest

# Fixture-gate pin (see streaming/ops.py:drain_partitions): tests drain
# sf0.001-sized streams where 4 state tasks beat defaultParallelism.
os.environ.setdefault("SPARK_GRAFT_DRAIN_PARTITIONS", "4")

SF_TEST_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
SF_ORACLE_DIR = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")


@pytest.fixture(scope="session")
def spark():
    from energi_data_etl_spark.session import get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_TEST_CPUS", "8"))
    spark = get_spark("energi-tests", cpus=cpus)
    yield spark
    spark.stop()


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_TEST_DIR


@pytest.fixture(scope="session")
def oracle_sf_dir() -> str:
    return SF_ORACLE_DIR


@pytest.fixture(scope="session")
def duck(oracle_sf_dir):
    from energi_data_etl_spark.plans.parity import duckdb_connect

    con = duckdb_connect(oracle_sf_dir)
    yield con
    con.close()


@pytest.fixture(scope="session")
def duck_small(sf_dir):
    from energi_data_etl_spark.plans.parity import duckdb_connect

    con = duckdb_connect(sf_dir)
    yield con
    con.close()
