"""Canonical Parquet table loaders (SURVEY.md §2.1 S4).

The engine's durable store is partitioned Parquet read as DataFrames
(the reference's store is a BigQuery table, energy_etl.py:89-108; we map
that to Parquet per BASELINE.json "DataFrame ops over Parquet").

Post-read normalization is *schema-level only* (cheap projections):

* ``events.ts`` is TIMESTAMP(NANOS) in the fixture parquet. With
  ``spark.sql.legacy.parquet.nanosAsLong=true`` Spark surfaces it as
  int64 nanos; we convert to ``timestamp_ntz`` at microsecond precision,
  which is bit-identical to what DuckDB reads from the same file. The
  conversion is a per-row projection (whole-stage codegen), no shuffle.

At 100 TB the loader is also where partition-pruning-friendly layout
assumptions live: fact tables are expected partitioned by a coarse date
column, so any ``filter(date ...)`` downstream prunes files before the
scan (PartitioningAwareFileIndex) — see sinks.write_fact_table.
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

__all__ = ["TABLES", "load_table", "load_all", "default_sf_dir"]

#: The test-corpus tables (TESTDATA.md): TPC-H-ish star schema + events
#: stream + LLM-pipeline tables.
TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def default_sf_dir() -> str:
    return os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _normalize_events(df: DataFrame) -> DataFrame:
    """events.ts: int64 nanos (legacy read) → timestamp_ntz at µs.

    Integer-division truncation (`div`) matches DuckDB's ns→µs
    truncation of the same parquet. NOT `floor(ts / 1000)`: epoch-ns
    (~1.7e18) exceeds double's 53-bit mantissa, so the float division
    rounds sub-µs digits and lands a different µs ~12% of the time.
    If a future Spark reads NANOS natively as timestamp, the branch
    below is a no-op cast.
    """
    ts_type = dict(df.dtypes).get("ts")
    if ts_type == "bigint":
        df = df.withColumn(
            "ts", F.to_timestamp_ntz(F.timestamp_micros(F.expr("ts div 1000")))
        )
    elif ts_type == "timestamp":
        df = df.withColumn("ts", F.to_timestamp_ntz(F.col("ts")))
    return df


def load_table(spark: SparkSession, name: str, sf_dir: str | None = None) -> DataFrame:
    """Scan one corpus table. Filters/projections applied by callers are
    pushed into the parquet scan by Catalyst (verified in tests/test_plans.py)."""
    sf_dir = sf_dir or default_sf_dir()
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        df = _normalize_events(df)
    return df


def load_all(spark: SparkSession, sf_dir: str | None = None) -> dict[str, DataFrame]:
    return {name: load_table(spark, name, sf_dir) for name in TABLES}


def read_any(spark: SparkSession, path: str, fmt: str, schema=None, **options) -> DataFrame:
    """Format-agnostic scan (S-tier completeness): parquet / orc / csv /
    json behind one call, schema always explicit for text formats (never
    infer in the pipeline — SURVEY §1.3). Pushdown applies to
    parquet/orc; csv/json degrade to full scans, which is why the
    engine's durable tables are parquet."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    elif fmt in ("csv", "json"):
        raise ValueError(f"{fmt} reads require an explicit schema (no inference in the pipeline)")
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.format(fmt).load(path)
