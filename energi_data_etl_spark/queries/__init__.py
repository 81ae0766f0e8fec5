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
# Round 8 window = the ENTIRE remaining never-certified pool: every
# oracled query with no hash_match=true row in CORRECTNESS_r01..r07
# (43 — 7 early-r07 additions + 36 r07-second-session additions — plus
# the 3 LSH queries that gained verdict-style oracles this round:
# neardup_minhash, lsh_bucket_stats, ann_lsh_topk — VERDICT r07 item 3),
# then the entry canary, then the 3 stalest certified §2-anchor rows
# (last green r04; the other three r04-stale rows — percentile_surface,
# salted_aggregation, null_safety_surface — defer to r09: each has an
# r06/r07-green close relative). 46+1+3 = 50 — this zeroes the
# never-certified backlog in one window.
#
# Ordered streaming/state/sketch first (VERDICT r07 item 1: highest
# value if the window truncates), then retrieval, then data-eng.
#
# ROWS-ONLY QUERIES STAY OUT OF THE WINDOW: the driver records a
# no-oracle query as an `err: no_oracle` row (CORRECTNESS_r06
# lsh_bucket_stats), i.e. it consumes a slot without producing a
# certification. Rows-only queries are carried by exact-method
# tests in tests/ instead (SURVEY.md §5.2).
FIRST_50 = [
    # -- streaming / state family (incl. T2 streaming_late_data_drop,
    #    the one §2 row never driver-certified) --
    "streaming_late_data_drop", "streaming_foreachbatch_upsert",
    "streaming_update_mode_totals", "streaming_rocksdb_stateful_rollup",
    "statestore_reader_audit", "streaming_interval_join_fouter",
    "api_source_dedup_stream",
    # -- sketch family --
    "kll_quantile_sketch_audit", "theta_sketch_user_overlap",
    "theta_sketch_weekly_churn", "bitmap_distinct_users",
    # -- entry canary (early in case of truncation) --
    "flagship_daily_avg",
    # -- retrieval stack --
    "inverted_index_postings", "bm25_topk_search", "hybrid_retrieval_rrf",
    # -- LSH tier, newly verdict-oracled this round (VERDICT r07 item 3) --
    "neardup_minhash", "lsh_bucket_stats", "ann_lsh_topk",
    # -- Spark-4 surface (variant/lateral/collation/UDTF/cogroup) --
    "variant_shredding_agg", "lateral_join_topk", "collation_ci_grouping",
    "melt_udtf_polymorphic", "cogroup_order_reconciliation",
    # -- joins --
    "join_skew_adaptive_salted", "join_asof_forward", "join_null_safe_keys",
    "scd2_pointintime_enrich",
    # -- embeddings / ML tier --
    "embedding_covariance_block", "embedding_quantization_error",
    "kmeans_lloyd_assign", "multimodal_resize_stub",
    # -- data-eng tier --
    "ivm_join_delta", "cdc_apply_log", "rollup_cascade_weekly",
    "ewma_value_smoothing", "robust_mad_outliers",
    "brand_cooccurrence_triangles", "vocabulary_growth_curve",
    "boilerplate_ngram_prune", "sample_exact_k_per_stratum",
    "sample_weighted_reservoir", "shuffle_shard_plan",
    "fuzzy_match_blocked_pairs", "fuzzy_join_qgram_candidates",
    "k_anonymity_audit", "schema_evolution_union_by_name",
    "file_metadata_lineage",
    # -- 3 stalest certified §2-anchor rows (last green r04; U1/U3/L4) --
    "udf_text_normalize", "tokenize_udtf", "text_stats_by_lang",
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
