"""User-facing engine session (SURVEY.md §3: the surfaces a reference
user actually touches — the pipeline entry point, the delegated SQL
surface, and the dashboard metrics).

The reference delegates SQL to BigQuery (energy_etl.py:30) and
analytics to Power BI (images/Powerbi.png). A user switching to this
engine gets the same three surfaces locally:

    eng = Engine(spark, sf_dir)
    eng.table("lineitem")                   # catalog of named tables
    eng.sql("SELECT ... FROM lineitem ...") # full Spark SQL, same names
    eng.zone_summary(months=[1])            # the Power BI cards
    eng.daily_averages(months=[1])          # the fact table the cards read
    eng.run_query("pricing_summary")        # any declared catalog query
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from .pipeline.energy import daily_average
from .session import apply_engine_conf
from .sources.tables import TABLES, default_sf_dir, load_table

__all__ = ["Engine"]


class Engine:
    """A session-scoped handle over the corpus: named tables registered
    as temp views (so `sql()` sees the same names DuckDB/BigQuery
    would), plus the flagship metric surfaces."""

    def __init__(self, spark: SparkSession, sf_dir: str | None = None):
        self.spark = apply_engine_conf(spark)
        self.sf_dir = sf_dir or default_sf_dir()
        self._registered = False

    # -- catalog ----------------------------------------------------------
    def table(self, name: str) -> DataFrame:
        if name not in TABLES:
            raise KeyError(f"unknown table {name!r}; available: {TABLES}")
        return load_table(self.spark, name, self.sf_dir)

    def register_all(self) -> None:
        """Expose every corpus table as a temp view for the SQL surface."""
        if not self._registered:
            for t in TABLES:
                self.table(t).createOrReplaceTempView(t)
            self._registered = True

    # -- the delegated-SQL surface (reference: BigQuery client.query) -----
    def sql(self, statement: str) -> DataFrame:
        self.register_all()
        return self.spark.sql(statement)

    # -- the dashboard surface (reference: Power BI cards + month slicer) -
    def daily_averages(self, months: Sequence[int] | None = None) -> DataFrame:
        """The fact table of the reference (daily avg per key), built
        from the events stream table."""
        return daily_average(
            self.table("events"), ts_col="ts", key_col="event_type", value_col="value", months=months
        )

    def zone_summary(self, months: Sequence[int] | None = None) -> DataFrame:
        """The four dashboard cards: per-key average over the selected
        months (SURVEY §3.3 — the flagship query family)."""
        ev = self.table("events").withColumn("date", F.to_date("ts"))
        if months:
            ev = ev.filter(F.month("date").isin(list(months)))
        return ev.groupBy("event_type").agg(F.round(F.avg("value"), 4).alias("avg_value"))

    # -- the declared-query catalog --------------------------------------
    def run_query(self, name: str) -> DataFrame:
        from .queries import QUERIES

        return QUERIES[name].fn(self.spark, self.sf_dir)

    def query_names(self) -> list[str]:
        from .queries import QUERIES

        return sorted(QUERIES)
