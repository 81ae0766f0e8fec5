"""SparkSession construction with the engine's defaults.

Scale notes (100 TB mandate): every setting here is chosen so the same
code runs unchanged on a 1000-executor cluster — local[] is only the
test harness. AQE handles runtime re-planning (partition coalescing,
skew-join splitting, SMJ→broadcast demotion); shuffle partition count is
only the *initial* value under AQE, so an over-estimate is cheap.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

__all__ = ["get_spark", "cpu_count", "apply_engine_conf", "scratch_dir"]


def scratch_dir(prefix: str, dir: str | None = None) -> str:  # noqa: A002
    """mkdtemp whose lifetime is the PROCESS, not the function: removal
    is registered with atexit because queries return LAZY DataFrames
    that may read files under the dir after the function returns (the
    driver collects later), so eager cleanup would break the plan.
    Closes the r08/r10 advice item "uplink mkdtemp dirs never cleaned" —
    a long-lived session (bench: 267 queries; driver: 50) no longer
    accumulates orphan scratch dirs past process exit."""
    import atexit
    import shutil
    import tempfile

    path = tempfile.mkdtemp(prefix=prefix, dir=dir)
    atexit.register(shutil.rmtree, path, ignore_errors=True)
    return path


def cpu_count() -> int:
    """Worker-thread count for local mode (driver contract: SPARK_GRAFT_CPUS)."""
    return int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


#: Configs that must hold on ANY session running engine queries — applied
#: both when we build the session ourselves and (where possible) when the
#: driver hands us one.
ENGINE_CONF: dict[str, str] = {
    # Deterministic wall-clock semantics: the reference stores UTC audit
    # timestamps (energy_etl.py:100 uses utcnow()); all engine timestamp
    # arithmetic is UTC so results don't depend on host timezone.
    "spark.sql.session.timeZone": "UTC",
    # The events fixture stores TIMESTAMP(NANOS) which vanilla Spark
    # rejects (PARQUET_TYPE_ILLEGAL). Read nanos as int64 and convert to
    # timestamp_ntz in the loader (sources/tables.py) — a pure projection,
    # scales linearly, no driver round-trip.
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # Parquet timestamps without timezone → TimestampNTZ (matches DuckDB's
    # naive-µs reading of the same files, so oracle schemas line up).
    "spark.sql.parquet.inferTimestampNTZ.enabled": "true",
    # Runtime re-planning: partition coalescing, skew-join handling,
    # SMJ→BHJ demotion when runtime stats show a small side.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Arrow for any pandas-UDF exchange (the slow path, but when used it
    # must be batched, never per-row).
    "spark.sql.execution.arrow.pyspark.enabled": "true",
}


def apply_engine_conf(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable engine configs to an existing session.

    Static configs (nanosAsLong is runtime-settable in 4.x; timezone and
    AQE are runtime) — anything that fails to set is skipped, the loader
    compensates where it can.

    Also rightsizes shuffle partitions: a foreign session arrives with
    the 200 default, which AQE coalesces for batch but CANNOT for
    stateful streaming (AQE is disabled there) — 200 near-empty state
    tasks per micro-batch otherwise.
    """
    for k, v in {**ENGINE_CONF, "spark.sql.shuffle.partitions": str(cpu_count())}.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            pass
    return spark


def get_spark(app_name: str = "energi-data-etl-spark", cpus: int | None = None) -> SparkSession:
    n = cpus or cpu_count()
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{n}]")
        # Initial shuffle parallelism = core count; AQE coalesces down.
        # On a real cluster this would be ~2-3× total cores instead.
        .config("spark.sql.shuffle.partitions", str(n))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
        .config("spark.ui.enabled", "false")
        # bucketed-table storage (sources/sinks.py write_bucketed_table)
        # lives outside the repo checkout
        .config("spark.sql.warehouse.dir", os.environ.get("SPARK_GRAFT_WAREHOUSE", "/tmp/energi_warehouse"))
    )
    for k, v in ENGINE_CONF.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
