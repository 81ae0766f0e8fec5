from .catalog import QUERIES, Query, query, spark_queries, oracle_sqls  # noqa: F401

# Importing the query modules registers them in QUERIES.
from . import flagship  # noqa: F401,E402
from . import relational  # noqa: F401,E402
from . import functions  # noqa: F401,E402
from . import joins  # noqa: F401,E402
from . import windows  # noqa: F401,E402
from . import streaming  # noqa: F401,E402
from . import analytics  # noqa: F401,E402
from . import tpch  # noqa: F401,E402
from . import extensions  # noqa: F401,E402
from . import robustness  # noqa: F401,E402
from . import llm  # noqa: F401,E402
from . import datapipe  # noqa: F401,E402
from . import timeseries  # noqa: F401,E402
from . import lifecycle  # noqa: F401,E402
from . import behavior  # noqa: F401,E402

# ORDER MATTERS: the driver's per-round correctness file records only the
# FIRST 50 queries in registration order, so the window is rotated
# round-to-round until every query has a driver-certified row. Round 6
# front-loads the 40 that have never met the real driver — 22 sim-only
# r05 additions (7 TPC-H shapes, 5 robustness extras, multimodal frame
# sample, the 7-query datapipe tier, the 2-query timeseries tier) plus
# the 18 new r06 queries (lifecycle, lsh_bucket_stats,
# streaming_rollup_parquet, the 4-query cleaning tier, scd2, z-score
# anomaly, the 4-query behavior tier, basket/RFM/centroids,
# histogram, open-orders sweep) — then 5 regression canaries
# (flagship, one join, one window, streaming_interval_join for the
# drain-conf change, one relational) and the 5 oldest r≤4-certified
# rows (extensions, llm dedup/knn).
# 40+5+5 = 50. Queries not listed keep registration order after 50.
FIRST_50 = [
    # -- 22 never driver-certified (VERDICT r05 top item) --
    "tpch_q6_forecast_revenue", "tpch_q9_product_profit", "tpch_q11_important_stock",
    "tpch_q17_small_qty_revenue", "tpch_q2_min_cost_supplier", "tpch_q20_part_promotion",
    "tpch_q21_waiting_supplier",
    "window_distribution_surface", "sort_nulls_policy", "regression_aggregates",
    "timezone_conversion", "recursive_cte_hierarchy",
    "multimodal_frame_sample",
    "split_train_val_test", "split_cluster_aware", "contamination_ngram_overlap",
    "token_budget_packing", "stratified_sample_by_lang", "pipeline_end_to_end",
    "dedup_incremental_delta",
    "gapfill_forward", "merge_upsert_orders",
    # -- 18 new in r06 --
    "pipeline_incremental_lifecycle", "lsh_bucket_stats", "streaming_rollup_parquet",
    "pii_redaction_stats", "repetition_topgram_stats", "domain_mixture_plan",
    "cleaning_funnel_report", "scd2_customer_status", "anomaly_zscore_events",
    "sessionize_events_batch", "funnel_view_click_purchase",
    "cohort_weekly_retention", "event_transition_matrix",
    "market_basket_pairs", "rfm_customer_segments", "embedding_label_centroids",
    "value_histogram_by_type", "open_orders_daily",
    # -- 5 regression canaries --
    "flagship_daily_avg", "join_star_revenue", "window_rank_topk",
    "streaming_interval_join", "pricing_summary",
    # -- 5 oldest driver rows (last certified r≤4); near-twins of rows
    # still in the window were dropped to make room for r06 additions:
    # regex_surface (pii_redaction_stats), quality_scores
    # (cleaning_funnel_report), collect_aggregates, salted_aggregation,
    # dedup_bag_exact, token_counts_per_doc, null_safety_surface,
    # percentile_surface (approx sketch retained), lang_id_scores
    # (text_stats retained), embedding_neardup_exact (knn retained) --
    "data_quality_report",
    "grouped_median_udaf", "dedup_clusters",
    "dedup_exact",
    "knn_exact_cosine",
]


def _rotate(first: list[str]) -> None:
    missing = [n for n in first if n not in QUERIES]
    assert not missing, f"rotation names not registered: {missing}"
    assert len(first) == len(set(first)) == 50, "rotation must pin exactly 50 distinct names"
    ordered = {n: QUERIES[n] for n in first}
    ordered.update((n, q) for n, q in list(QUERIES.items()) if n not in ordered)
    QUERIES.clear()
    QUERIES.update(ordered)


_rotate(FIRST_50)
