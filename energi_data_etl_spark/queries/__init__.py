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
# round-to-round until every query has a driver-certified row.
#
# Round 7 window = every oracled query that has never produced a
# hash_match=true row in CORRECTNESS_r01..r06 (33 of them — the 11 r06
# HUGEINT-oracle failures now fixed with CAST AS BIGINT, plus the 22
# r06-late additions that never met the real driver), then the entry
# canary, then the 16 stalest certified rows (all last certified r04)
# to refresh their certification. 33+1+16 = 50.
#
# ROWS-ONLY QUERIES STAY OUT OF THE WINDOW: the driver records a
# no-oracle query as an `err: no_oracle` row (CORRECTNESS_r06
# lsh_bucket_stats), i.e. it consumes a slot without producing a
# certification. The 6 rows-only queries (lsh_bucket_stats, pagerank,
# neardup_minhash/simhash, ann_ivf/lsh_topk) are carried by exact-method
# tests in tests/ instead (SURVEY.md §5.2).
FIRST_50 = [
    # -- 11 r06 hash-gate failures, re-certifying with BIGINT-cast oracles --
    "split_train_val_test", "token_budget_packing", "stratified_sample_by_lang",
    "pipeline_end_to_end", "pii_redaction_stats", "repetition_topgram_stats",
    "domain_mixture_plan", "cleaning_funnel_report", "scd2_customer_status",
    "anomaly_zscore_events", "sessionize_events_batch",
    # -- 22 oracled but never yet in a driver window (r06-late additions) --
    "api_source_daily_rollup", "api_source_stream_rollup",
    "streaming_interval_join_louter",
    "tpch_q13_custdist", "gapfill_linear_interpolate", "hll_merge_weekly_users",
    "join_skew_salted", "doc_chunk_sliding", "global_row_index",
    "zorder_layout_audit", "skew_diagnosis_report",
    "moment_statistics", "argminmax_aggregates", "percentile_disc_surface",
    "listagg_ordered",
    "token_entropy_scores", "source_overlap_matrix", "length_winsorize_stats",
    "snapshot_diff_orders", "dedup_survivorship_quality",
    "crosssplit_leakage_audit", "event_type_drift",
    # -- entry canary --
    "flagship_daily_avg",
    # -- 16 stalest certified rows (all last certified r04) --
    "dedup_bag_exact", "ngram_jaccard_pairs", "embedding_neardup_exact",
    "tpch_q3_shipping_priority", "tpch_q5_local_volume", "tpch_q10_returned_items",
    "having_large_orders", "tpch_q4_order_priority", "tpch_q12_priority_lines",
    "tpch_q14_promo_ratio", "tpch_q16_supplier_cnt", "tpch_q18_large_volume",
    "tpch_q19_disjunctive", "tpch_q7_volume_shipping", "tpch_q8_market_share",
    "tpch_q15_top_supplier",
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
