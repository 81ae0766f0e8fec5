"""Operational observability surface: Spark's row-level metric hooks.

* batch `Observation` — free-rider metrics computed DURING the action
  (no second scan), the mechanism a production job uses to publish
  row counts / sums to its metrics sink without re-reading 100 TB
* streaming `DataFrame.observe` + StreamingQueryListener — the same
  metrics surfaced per micro-batch through progress events (what a
  lag/DQ monitor consumes)

Both are pinned against directly-computed aggregates on the fixture.
"""

from __future__ import annotations

import time

import pyspark.sql.functions as F
from pyspark.sql import Observation

from energi_data_etl_spark.sources.tables import load_table


def test_batch_observation_matches_direct_aggregates(spark, sf_dir):
    orders = load_table(spark, "orders", sf_dir)
    obs = Observation("orders_metrics")
    observed = orders.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("o_totalprice").alias("revenue"),
        F.count(F.when(F.col("o_totalprice") <= 0, 1)).alias("nonpositive"),
    )
    # one action drives BOTH the query result and the metrics
    top = observed.groupBy("o_orderpriority").count().collect()
    direct = orders.agg(
        F.count(F.lit(1)).alias("n"), F.sum("o_totalprice").alias("s")
    ).collect()[0]
    got = obs.get
    assert got["n_rows"] == direct.n
    assert abs(got["revenue"] - direct.s) < 1e-6
    assert got["nonpositive"] == 0
    assert sum(r["count"] for r in top) == direct.n


def test_streaming_observe_metrics_reach_listener(spark, sf_dir, tmp_path):
    """df.observe on a stream surfaces per-micro-batch observed metrics
    through StreamingQueryProgress — the hook a freshness/DQ monitor
    consumes. Drained with AvailableNow; the summed per-batch n_rows
    must equal the batch count of the same source."""
    from pyspark.sql.streaming import StreamingQueryListener

    from energi_data_etl_spark.streaming.ops import events_stream

    collected: list[dict] = []

    class Grab(StreamingQueryListener):
        def onQueryStarted(self, event):
            pass

        def onQueryProgress(self, event):
            row = event.progress.observedMetrics.get("ev_metrics")
            if row is not None:
                collected.append({"n_rows": row.n_rows, "v_sum": row.v_sum})

        def onQueryIdle(self, event):
            pass

        def onQueryTerminated(self, event):
            pass

    listener = Grab()
    spark.streams.addListener(listener)
    try:
        stream = events_stream(spark, f"{sf_dir}/events.parquet").observe(
            "ev_metrics",
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("value").alias("v_sum"),
        )
        q = (
            stream.writeStream.format("noop")
            .trigger(availableNow=True)
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .start()
        )
        q.awaitTermination()
        # listener delivery is async relative to query termination
        deadline = time.time() + 30
        expected_n = load_table(spark, "events", sf_dir).count()
        while time.time() < deadline and sum(m["n_rows"] for m in collected) < expected_n:
            time.sleep(0.5)
        assert sum(m["n_rows"] for m in collected) == expected_n
        direct = load_table(spark, "events", sf_dir).agg(F.sum("value").alias("s")).collect()[0].s
        assert abs(sum(m["v_sum"] for m in collected) - direct) < 1e-6
    finally:
        spark.streams.removeListener(listener)
