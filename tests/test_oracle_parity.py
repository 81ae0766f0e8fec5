"""Replicates the driver's t2 gate locally: every catalog query with an
oracle must match DuckDB at sf0.01 (row count + columns + values)."""

from __future__ import annotations

import pytest

from energi_data_etl_spark.plans.parity import check_query
from energi_data_etl_spark.queries import QUERIES

ORACLE_QUERIES = sorted(name for name, q in QUERIES.items() if q.oracle is not None)
ROWS_ONLY_QUERIES = sorted(name for name, q in QUERIES.items() if q.oracle is None)


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_query_matches_duckdb_oracle(spark, duck, oracle_sf_dir, name):
    q = QUERIES[name]
    res = check_query(spark, duck, name, q.fn, q.oracle, oracle_sf_dir)
    assert res.ok, f"{name}: {res.detail}"
    # an empty result matches any oracle vacuously — every declared
    # query must exercise real rows at the driver's SF (audited: all do)
    assert not res.detail.startswith("0 rows"), f"{name}: vacuous oracle match (0 rows)"


@pytest.mark.parametrize("name", ROWS_ONLY_QUERIES)
def test_rows_only_query_runs(spark, oracle_sf_dir, name):
    q = QUERIES[name]
    df = q.fn(spark, oracle_sf_dir)
    assert df.count() > 0, f"{name}: empty result — a rows-only check proves nothing"
    assert len(df.columns) > 0


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_no_complex_output_columns(spark, sf_dir, name):
    """The driver canonicalizer sorts result cells — Array/Map/Struct
    cells are unhashable ndarrays in pandas and ERR the whole query.
    This class of bug cost three rounds (array_surface/map_functions in
    r01, winnowing/multimodal in r03): every query must emit only
    atomic columns (serialize arrays per the array_surface recipe,
    queries/functions.py)."""
    from pyspark.sql import types as T

    schema = QUERIES[name].fn(spark, sf_dir).schema
    bad = [
        f.name
        for f in schema.fields
        if isinstance(f.dataType, (T.ArrayType, T.MapType, T.StructType))
    ]
    assert not bad, (
        f"{name} outputs complex-typed columns {bad} — the driver "
        "canonicalizer cannot sort them; serialize to strings "
        "(array_surface recipe)"
    )


# The driver certifies the FIRST 50 queries in registration order each
# round; queries/__init__.py front-loads the tiers that still need a
# driver-green row. Pin that order so an accidental import reshuffle or
# catalog insertion doesn't silently change which queries get certified
# (ADVICE r03). Changing the rotation ON PURPOSE = update this list.
EXPECTED_FIRST_50 = [
    "tpch_q3_shipping_priority", "tpch_q5_local_volume", "tpch_q10_returned_items",
    "having_large_orders", "tpch_q4_order_priority", "tpch_q12_priority_lines",
    "tpch_q14_promo_ratio", "tpch_q16_supplier_cnt", "tpch_q18_large_volume",
    "tpch_q19_disjunctive", "tpch_q7_volume_shipping", "tpch_q8_market_share",
    "tpch_q15_top_supplier", "tpch_q22_idle_customers", "correlated_scalar_subquery",
    "streaming_tumbling_daily", "streaming_sliding_2d_1d", "streaming_session_windows",
    "streaming_stateful_totals", "streaming_dedup_count", "grouped_median_udaf",
    "tokenize_udtf", "salted_aggregation", "dedup_clusters", "tfidf_top_terms",
    "pivot_status_counts", "unpivot_status_counts", "null_safety_surface",
    "percentile_surface", "approx_percentile_sketch", "collect_aggregates",
    "data_quality_report", "regex_surface", "dedup_exact", "dedup_bag_exact",
    "neardup_minhash", "neardup_simhash", "ngram_jaccard_pairs", "knn_exact_cosine",
    "embedding_neardup_exact", "ann_ivf_topk", "ann_lsh_topk", "text_stats_by_lang",
    "lang_id_scores", "quality_scores", "token_counts_per_doc",
    "winnowing_fingerprints", "udf_text_normalize", "multimodal_payload_meta",
    "multimodal_decode_features",
]


def test_first_50_registration_order_pinned():
    assert list(QUERIES)[:50] == EXPECTED_FIRST_50


def test_entry_smoke(spark, sf_dir):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert set(df.columns) == {"date", "event_type", "avg_value"}


def test_contract_shapes():
    import __spark_entry__ as e

    qs, os_ = e.queries(), e.oracle_sql()
    assert set(os_) <= set(qs)
    assert "flagship_daily_avg" in qs
