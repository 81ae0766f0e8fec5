"""Round-8 third-batch surface tests: pipe-syntax SQL compiles to the
same results (and plan shape) as the DataFrame form, and the XML
round-trip is value-lossless including doubles."""

from __future__ import annotations

import pyspark.sql.functions as F

from energi_data_etl_spark.queries.functions import pipe_syntax_surface, xml_roundtrip_extract
from energi_data_etl_spark.sources.tables import load_table


def test_pipe_syntax_equals_dataframe_form(spark, sf_dir):
    got = {r.o_orderpriority: (r.n_orders, r.revenue, r.avg_price)
           for r in pipe_syntax_surface(spark, sf_dir).collect()}
    o = load_table(spark, "orders", sf_dir)
    want = {
        r.o_orderpriority: (r.n_orders, r.revenue, r.avg_price)
        for r in (
            o.where((F.col("o_orderstatus") == "O") & (F.col("o_orderdate") >= "1996-01-01"))
            .groupBy("o_orderpriority")
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_orders"),
                F.round(F.sum("o_totalprice"), 2).alias("revenue"),
                F.round(F.avg("o_totalprice"), 4).alias("avg_price"),
            )
            .collect()
        )
    }
    assert got == want and got


def test_pipe_syntax_filter_reaches_scan(spark, sf_dir):
    """The pipe dialect is sugar, not a pushdown bypass: the WHERE
    lands in the scan's pushed filters like the nested form's."""
    plan = pipe_syntax_surface(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan and "IsNotNull(o_orderstatus)" in plan


def test_xml_roundtrip_lossless_and_malformed_is_null(spark, sf_dir):
    rows = xml_roundtrip_extract(spark, sf_dir).collect()
    assert rows and all(r.roundtrip_ok for r in rows)
    # malformed XML parses to a null struct (PERMISSIVE), not an error
    bad = (
        spark.createDataFrame([("<r><k>not-closed",)], ["x"])
        .select(F.from_xml("x", "k INT").alias("p"))
        .collect()[0]
    )
    assert bad.p is None or bad.p.k is None
