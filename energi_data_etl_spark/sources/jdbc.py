"""External-warehouse JDBC shim (SURVEY §2.1 gap closure, VERDICT r15
item 6).

The reference's durable store is an external SQL warehouse: it reads
the incremental watermark with a SQL MAX over the live table
(`/root/reference/scripts/energy_etl.py:24-37`) and appends batches
through the warehouse's load API (`:86-108`). This repo's primary
mapping of that store is partitioned Parquet (`sources/sinks.py` —
right for a Spark-native lakehouse), but a migrating user's first
question is "where does my warehouse table go". These helpers are the
answer when the table STAYS in an external RDBMS/warehouse behind a
JDBC driver: thin, dependency-free wrappers over the public
`spark.read.jdbc` / `DataFrameWriter.jdbc` API that encode the two
scale rules a naive port always misses —

* **push the watermark query down** (`latest_watermark_jdbc`): the
  reference's `SELECT MAX(date)` must run IN the warehouse (a pushdown
  subquery table), never as a full-table fetch + Spark agg;
* **partition the backfill read** (`read_jdbc` with `partition_column`
  + bounds): one unpartitioned JDBC read is a single executor task and
  a single warehouse cursor — the 100 TB form slices the key range
  into `num_partitions` parallel range queries, exactly like the
  (zone, day) fetch plan in `sources/http_json.py`.

Tested exact-method against the Derby embedded driver that ships in
Spark's own jars (tests/test_jdbc.py) — no network, no proprietary
dependency; any JDBC URL (Postgres, MySQL, BigQuery's JDBC bridge,
Trino, ...) takes the same calls with its driver on the classpath.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

__all__ = ["read_jdbc", "write_jdbc", "latest_watermark_jdbc"]


def read_jdbc(
    spark: SparkSession,
    url: str,
    table: str,
    *,
    partition_column: str | None = None,
    lower_bound=None,
    upper_bound=None,
    num_partitions: int | None = None,
    driver: str | None = None,
    properties: dict[str, str] | None = None,
) -> DataFrame:
    """Read a warehouse table (or a ``(subquery) alias``) over JDBC.

    Unpartitioned reads are a SINGLE task; pass ``partition_column``
    (numeric/date/timestamp) with bounds to fan the scan out into
    ``num_partitions`` parallel range queries. Bounds only shape the
    per-partition WHERE clauses — rows outside them are still read (by
    the first/last slice), so a stale bound degrades balance, never
    correctness. Filters and projections on the returned frame are
    pushed into the warehouse by the JDBC source (predicate pushdown +
    column pruning are visible in `.explain` as PushedFilters)."""
    reader = spark.read.format("jdbc").option("url", url).option("dbtable", table)
    if driver:
        reader = reader.option("driver", driver)
    for k, v in (properties or {}).items():
        reader = reader.option(k, v)
    if partition_column is not None:
        if lower_bound is None or upper_bound is None or num_partitions is None:
            raise ValueError(
                "partitioned JDBC read needs all of partition_column, "
                "lower_bound, upper_bound, num_partitions"
            )
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
            .option("numPartitions", str(num_partitions))
        )
    return reader.load()


def write_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    *,
    mode: str = "append",
    driver: str | None = None,
    batchsize: int = 10_000,
    properties: dict[str, str] | None = None,
) -> None:
    """Append/overwrite a DataFrame into a warehouse table over JDBC —
    the reference's load-job append (`energy_etl.py:86-108`) expressed
    as a distributed write: each Spark task opens one connection and
    streams its partition in ``batchsize`` batches, so write
    parallelism is the frame's partitioning (repartition first to match
    what the warehouse can absorb). ``mode='append'`` is the
    incremental-lifecycle setting; the skip-empty guard and audit
    column stay the caller's job (`sources/sinks.py::write_fact_table`
    semantics)."""
    writer = (
        df.write.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("batchsize", str(batchsize))
        .mode(mode)
    )
    if driver:
        writer = writer.option("driver", driver)
    for k, v in (properties or {}).items():
        writer = writer.option(k, v)
    writer.save()


def latest_watermark_jdbc(
    spark: SparkSession,
    url: str,
    table: str,
    col: str,
    *,
    driver: str | None = None,
    properties: dict[str, str] | None = None,
):
    """The reference's watermark read (`energy_etl.py:24-37`) against a
    JDBC warehouse: ``SELECT MAX(col)`` PUSHED DOWN as a subquery table,
    so the warehouse answers from its own index/metadata and exactly one
    row crosses the wire — never a full-table fetch. Returns None when
    the table is empty or missing (the cold-start fallback, `:42-46`).

    ``col`` is spliced verbatim — quote it per the warehouse dialect.
    In particular, tables CREATED by Spark's JDBC writer (write_jdbc)
    have case-exact QUOTED identifiers, so a lowercase column needs
    ``'"day_no"'`` against ANSI-folding engines (Derby, Postgres,
    Oracle) and a backtick form against MySQL."""
    sub = f"(SELECT MAX({col}) AS wm FROM {table}) energi_wm"
    try:
        row = read_jdbc(
            spark, url, sub, driver=driver, properties=properties
        ).first()
    except Exception as exc:  # noqa: BLE001 — table does not exist yet: cold start
        # Log before falling back (ADVICE r16): a silent None makes a
        # transient auth/driver failure indistinguishable from cold
        # start, and the incremental caller would re-ingest history.
        # The reference's fallback prints too (energy_etl.py:42-46).
        import logging

        logging.getLogger(__name__).warning(
            "latest_watermark_jdbc(%s): treating as cold start after %s: %s",
            table, type(exc).__name__, exc,
        )
        return None
    # positional: case-folding engines rename the unquoted alias
    # (Derby reports Row(WM=...)), and the frame has exactly one column
    return row[0] if row else None
