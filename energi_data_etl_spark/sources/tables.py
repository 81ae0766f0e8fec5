"""Canonical Parquet table loaders (SURVEY.md §2.1 S4).

The engine's durable store is partitioned Parquet read as DataFrames
(the reference's store is a BigQuery table, energy_etl.py:89-108; we map
that to Parquet per BASELINE.json "DataFrame ops over Parquet").

Post-read normalization is *schema-level only* (cheap projections):

* ``events.ts`` is TIMESTAMP(NANOS) in the fixture parquet. Depending
  on the Spark build it surfaces as ``timestamp_ntz`` (native read,
  already µs) or ``bigint`` (legacy long read — epoch-ns or epoch-µs,
  detected from magnitude, see epoch_long_to_micros); either way we
  normalize to ``timestamp_ntz`` at microsecond precision, bit-identical
  to what DuckDB reads from the same file. The conversion is a per-row
  projection (whole-stage codegen), no shuffle.

At 100 TB the loader is also where partition-pruning-friendly layout
assumptions live: fact tables are expected partitioned by a coarse date
column, so any ``filter(date ...)`` downstream prunes files before the
scan (PartitioningAwareFileIndex) — see sinks.write_fact_table.
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

__all__ = ["TABLES", "load_table", "load_all", "default_sf_dir", "epoch_long_to_micros", "NS_EPOCH_THRESHOLD"]

#: Magnitude cut between epoch-ns and epoch-µs int64 values. 2^57 ≈
#: 1.44e17: epoch-µs stays below it until year ~6500, epoch-ns exceeds
#: it from ~1974-07 on. Everything in the corpus (2024 data) is
#: unambiguous on either side.
NS_EPOCH_THRESHOLD = 1 << 57

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


def epoch_long_to_micros(colname: str = "ts"):
    """int64 epoch column in UNKNOWN units (ns or µs) → epoch-µs long.

    Different Spark builds surface parquet TIMESTAMP(NANOS) read through
    an explicit LongType schema as either epoch-ns or already-truncated
    epoch-µs (this environment's 4.1.2 delivers µs and silently ignores
    ``spark.sql.legacy.parquet.nanosAsLong``). Units are therefore
    detected from magnitude per value — divide by 1000 only when the
    value is epoch-ns-sized (> 2^57) — instead of assumed from config.

    Integer-division truncation (``div``) matches DuckDB's ns→µs
    truncation of the same parquet. NOT ``floor(ts / 1000)``: epoch-ns
    (~1.7e18) exceeds double's 53-bit mantissa, so float division
    rounds sub-µs digits and lands a different µs ~12% of the time.
    """
    c = F.col(colname)
    return F.when(c > F.lit(NS_EPOCH_THRESHOLD), F.expr(f"{colname} div 1000")).otherwise(c)


def _normalize_events(df: DataFrame) -> DataFrame:
    """events.ts → timestamp_ntz at µs precision, whatever the read
    surfaced: ``bigint`` (legacy long read, ns or µs — see
    epoch_long_to_micros), ``timestamp``/``timestamp_ntz`` (native
    NANOS read, already µs-truncated by Spark — cast only). The result
    is bit-identical to DuckDB's reading of the same parquet.
    """
    ts_type = dict(df.dtypes).get("ts")
    if ts_type == "bigint":
        df = df.withColumn(
            "ts", F.to_timestamp_ntz(F.timestamp_micros(epoch_long_to_micros("ts")))
        )
    elif ts_type in ("timestamp", "timestamp_ntz"):
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
    json / xml (Spark 4 native XML source; pass rowTag) behind one
    call, schema always explicit for text formats (never infer in the
    pipeline — SURVEY §1.3). Pushdown applies to parquet/orc; csv/json/
    xml degrade to full scans, which is why the engine's durable tables
    are parquet."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    elif fmt in ("csv", "json", "xml"):
        raise ValueError(f"{fmt} reads require an explicit schema (no inference in the pipeline)")
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.format(fmt).load(path)
