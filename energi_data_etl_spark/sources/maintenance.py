"""Table-maintenance operators: small-file compaction (SURVEY §2.1
sink-side hygiene; the reference appends one parquet per daily run,
scripts/energy_etl.py:86-111, so a year of operation leaves 365 tiny
files — the classic small-files problem every long-running pipeline
hits at scale).

Spark-idiomatic recipe: size the output from the ACTUAL on-disk bytes
(post-compression, via the Hadoop FileSystem API so it works on any
scheme, not just local disk), `repartition(n)` for even output files,
optionally `sortWithinPartitions` to preserve/establish clustering for
min-max file skipping, and write to a NEW directory — compaction is a
rewrite, never an in-place overwrite (Spark cannot read and overwrite
the same path in one job, and a mid-job failure must never lose the
source data; the caller swaps directories after success).
"""

from __future__ import annotations

import math
from dataclasses import dataclass

from pyspark.sql import SparkSession

__all__ = ["CompactionStats", "compact_parquet", "parquet_layout_stats"]


@dataclass(frozen=True)
class CompactionStats:
    n_files_before: int
    n_files_after: int
    total_bytes_before: int
    n_rows: int


def _list_parquet_files(spark: SparkSession, path: str) -> list[tuple[str, int]]:
    """(path, size) of every data file under `path`, via the Hadoop FS
    API (scheme-agnostic: file://, hdfs://, s3a://, ...)."""
    jvm = spark.sparkContext._jvm
    jsc = spark.sparkContext._jsc
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(jsc.hadoopConfiguration())
    files = []
    it = fs.listFiles(hpath, True)
    while it.hasNext():
        status = it.next()
        name = status.getPath().getName()
        if not name.startswith(("_", ".")):
            files.append((status.getPath().toString(), status.getLen()))
    return files


def parquet_layout_stats(spark: SparkSession, path: str) -> tuple[int, int]:
    """(n_files, total_bytes) for the data files of a parquet table."""
    files = _list_parquet_files(spark, path)
    return len(files), sum(sz for _, sz in files)


def compact_parquet(
    spark: SparkSession,
    src_path: str,
    dest_path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    sort_cols: list[str] | None = None,
    partition_by: list[str] | None = None,
) -> CompactionStats:
    """Rewrite a many-small-files parquet table into ~target-sized files.

    Output file count = ceil(on-disk bytes / target): sizing from the
    compressed footprint (not row counts) is what keeps post-compaction
    files near the target regardless of schema width or codec. The
    rewrite is one read + one `repartition` exchange + one write —
    linear, no driver materialization; `sort_cols` adds a
    within-partition sort so min/max footer stats stay selective on
    those columns (pair with the Z-order audit for multi-dim layouts).

    `partition_by` PRESERVES a hive-partitioned layout (date=.../):
    the repartition keys on the partition columns so each output task
    holds whole partitions (≈1 file per partition directory instead of
    n_tasks × n_partitions fragments — compacting a date-partitioned
    fact table without it would flatten the layout and break the
    partition-pruned watermark/date queries)."""
    n_before, total_bytes = parquet_layout_stats(spark, src_path)
    n_target = max(1, math.ceil(total_bytes / target_file_bytes))
    df = spark.read.parquet(src_path)
    if partition_by:
        out = df.repartition(n_target, *[df[c] for c in partition_by])
    else:
        out = df.repartition(n_target)
    if sort_cols:
        out = out.sortWithinPartitions(*sort_cols)
    writer = out.write.mode("error")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(dest_path)
    n_after, _ = parquet_layout_stats(spark, dest_path)
    n_rows = spark.read.parquet(dest_path).count()
    return CompactionStats(
        n_files_before=n_before,
        n_files_after=n_after,
        total_bytes_before=total_bytes,
        n_rows=n_rows,
    )
