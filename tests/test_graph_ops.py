"""Connected-components and salted-agg operator tests — topologies the
SQL-oracle query can't exercise (chains, multi-cluster merges)."""

from __future__ import annotations

import pyspark.sql.functions as F

from energi_data_etl_spark.operators.graph import connected_components
from energi_data_etl_spark.operators.skew import salted_agg


def test_cc_chain_merges_transitively(spark):
    """a-b, b-c, c-d is one component even though no single pair says so
    — the case a plain groupBy-on-fingerprint cannot solve."""
    pairs = spark.createDataFrame([(1, 2), (2, 3), (3, 4), (10, 11)], "a long, b long")
    got = {r.id: r.component for r in connected_components(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}


def test_cc_handles_cluster_merge_through_late_edge(spark):
    # two cliques joined by one bridge edge
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (5, 6), (6, 7), (3, 5)], "a long, b long"
    )
    got = {r.id: r.component for r in connected_components(pairs).collect()}
    assert set(got.values()) == {1}


def test_cc_empty_edges(spark):
    pairs = spark.createDataFrame([], "a long, b long")
    assert connected_components(pairs).count() == 0


def test_salted_agg_equals_direct_agg_under_skew(spark):
    """90% of rows on one key (the skew shape): salted result must equal
    the direct groupBy exactly (sums of doubles merged identically)."""
    rows = [("hot", float(i % 7)) for i in range(9000)] + [("cold%d" % (i % 10), float(i)) for i in range(1000)]
    df = spark.createDataFrame(rows, "k string, v double").repartition(8)
    got = {r.k: (r.n, r.min_value, r.max_value) for r in salted_agg(df, ["k"], "v").collect()}
    want = {
        r.k: (r.n, r.min_value, r.max_value)
        for r in df.groupBy("k")
        .agg(F.count("v").alias("n"), F.min("v").alias("min_value"), F.max("v").alias("max_value"))
        .collect()
    }
    assert got == want
    assert got["hot"][0] == 9000
