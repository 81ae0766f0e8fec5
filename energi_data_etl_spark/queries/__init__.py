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
from . import quality  # noqa: F401
from . import opsanalytics  # noqa: F401,E402
from . import spatial  # noqa: F401,E402
from . import sketches  # noqa: F401,E402

# ORDER MATTERS: the driver's per-round correctness file records only the
# FIRST 50 queries in registration order, so the window is rotated
# round-to-round until every query has a driver-certified row.
#
# Round 11 window (the rotation the r09 AND r10 verdicts ordered; rounds
# 9-10 had no builder session so the r08 window ran three times): entry
# canary + 49 of the 68 never-driver-certified oracled queries (catalog
# minus hash-green rows in CORRECTNESS_r01..r10 minus the 2 rows-only;
# ledger recomputed 2026-08-15, staleness 50@r10 / 49@r07 / 37@r06 /
# 45@r05 / 16@r04). Front-loaded per VERDICT r10 items 1-2: the two
# never-certified streaming queries, the api_sink pair, and ann_ivf_topk
# (the ONLY oracled query whose latest driver row is an error — an
# r01-r04 `no_oracle` row predating the verdict oracle it gained in
# r08), then the two algorithm twins that justify the rows-only
# exemptions (pagerank_integer_twin, neardup_simhash_md5), then the
# heavy/stateful/iterative tier. The 19 deferred (lighter SQL-surface /
# window-analytics queries, each sim-green) are pinned for r12 in
# SURVEY.md §7's rotation table alongside the 16 r04-stale and 14
# oldest-r05 rows.
#
# ROWS-ONLY QUERIES STAY OUT OF THE WINDOW: the driver records a
# no-oracle query as an `err: no_oracle` row (CORRECTNESS_r06
# lsh_bucket_stats), i.e. it consumes a slot without producing a
# certification. Rows-only queries are carried by exact-method
# tests in tests/ instead (SURVEY.md §5.2).
FIRST_50 = [
    # -- streaming / stream-sink family (first: highest value if the
    #    window truncates; the only streaming queries without a row) --
    "streaming_ohlc_candles", "streaming_daily_active_users",
    "api_sink_stream_roundtrip", "api_sink_roundtrip",
    # -- entry canary (early in case of truncation) --
    "flagship_daily_avg",
    # -- the one latest-row-is-an-error query (VERDICT r10 item 2) --
    "ann_ivf_topk",
    # -- algorithm twins justifying the 2 rows-only exemptions --
    "neardup_simhash_md5", "pagerank_integer_twin",
    # -- heavy / stateful / iterative tier --
    "semdedup_cell_prune", "entity_resolution_clusters",
    "sessionize_incremental_merge", "shortest_path_layered_dag",
    "bfs_reachability_levels", "fifo_inventory_matching",
    # -- spatial --
    "spatial_point_in_polygon", "spatial_grid_radius_join",
    "spatial_grid_nearest_neighbor",
    # -- sketches --
    "bloom_filter_prejoin", "countmin_frequency_audit",
    "cms_join_cardinality",
    # -- governance / data-eng --
    "masking_surface", "cascade_delete_audit", "target_encoding_loo",
    "split_temporal_embargo", "token_budget_apportionment",
    # -- recursive / format surfaces --
    "hierarchy_rollup_recursive", "xml_roundtrip_extract",
    # -- finance / stats tier --
    "revenue_bridge_monthly", "km_conversion_hazard",
    "weighted_median_by_flag", "chisq_independence_audit",
    "mutual_information_type_value",
    # -- timeseries tier --
    "time_weighted_average_daily", "ohlc_hourly_resample",
    "seasonal_adjusted_anomaly", "interval_coalesce_users",
    "rolling_correlation_daily", "seasonal_naive_backtest",
    # -- behavioral analytics tier --
    "event_sequence_detection", "user_path_topk",
    "conversion_latency_quantiles", "attribution_last_touch",
    "trending_users_decayed",
    # -- quality / drift tier --
    "dq_expectation_suite", "fuzzy_join_prefix_filtered",
    "char_lm_quality_bits", "heavyhitters_misra_gries",
    "feature_equidepth_bins", "benford_first_digit_audit",
    "psi_value_drift",
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
