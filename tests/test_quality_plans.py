"""Plan-evidence tests for the round-8 tier: the scale claims in the
docstrings asserted against the actual physical plans (the
test_plans.py discipline extended to the new queries)."""

from __future__ import annotations

from energi_data_etl_spark.plans.inspect import explain_str
from energi_data_etl_spark.queries import QUERIES


def test_ohlc_single_hash_exchange(spark, sf_dir):
    """The (type, hour) exchange is REUSED by both window ranks and the
    final aggregation — exactly one hash exchange in the whole plan
    (the rangepartitioning one is the output orderBy)."""
    plan = explain_str(QUERIES["ohlc_hourly_resample"].fn(spark, sf_dir), mode="simple")
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_twap_single_hash_exchange(spark, sf_dir):
    """Window and daily rollup share the (type, day) partitioning."""
    plan = explain_str(QUERIES["time_weighted_average_daily"].fn(spark, sf_dir), mode="simple")
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_benford_partial_aggregation(spark, sf_dir):
    """The digit histogram map-side combines (partial_count before the
    exchange — asserted on the UNCHECKPOINTED histogram sub-plan, since
    the query-level checkpoint truncates what the outer plan shows) and
    the 9-row digit dimension broadcasts in the full query."""
    import pyspark.sql.functions as F

    from energi_data_etl_spark.sources.tables import load_table

    digits = (
        load_table(spark, sf_dir=sf_dir, name="orders")
        .filter(F.col("o_totalprice") >= 1)
        .select(
            F.substring(F.floor("o_totalprice").cast("long").cast("string"), 1, 1)
            .cast("int")
            .alias("digit")
        )
        .groupBy("digit")
        .agg(F.count(F.lit(1)).cast("long").alias("n_obs"))
    )
    assert "partial_count" in explain_str(digits, mode="simple")
    plan = explain_str(QUERIES["benford_first_digit_audit"].fn(spark, sf_dir), mode="simple")
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan, plan
    assert "Scan ExistingRDD" in plan, plan  # histogram computed once, read twice


def test_char_lm_model_join_broadcasts(spark, sf_dir):
    """The char-probability model (≤ alphabet rows) joins by broadcast,
    never a shuffle of the exploded corpus against it."""
    plan = explain_str(QUERIES["char_lm_quality_bits"].fn(spark, sf_dir), mode="simple")
    assert "BroadcastHashJoin" in plan, plan


def test_dq_ri_check_plans_anti_join(spark, sf_dir):
    """The referential-integrity expectation really is a LEFT ANTI join
    on the key, and the range checks partial-aggregate."""
    plan = explain_str(QUERIES["dq_expectation_suite"].fn(spark, sf_dir), mode="simple")
    assert "LeftAnti" in plan, plan
    assert "partial_count" in plan, plan


def test_sequence_detection_no_self_join(spark, sf_dir):
    """The A-then-B pattern is ONE window pass: no join of the fact
    table against itself anywhere in the plan (the suffix-frame trick's
    whole point)."""
    plan = explain_str(QUERIES["event_sequence_detection"].fn(spark, sf_dir), mode="simple")
    assert "Join" not in plan, plan
    assert plan.count("Scan parquet") == 1, plan


def test_attribution_no_self_join(spark, sf_dir):
    """Same single-pass guarantee for the backward-looking variant."""
    plan = explain_str(QUERIES["attribution_last_touch"].fn(spark, sf_dir), mode="simple")
    assert plan.count("Scan parquet") == 1, plan


def test_mi_joint_frame_is_checkpointed_once(spark, sf_dir):
    """Marginals derive from the checkpointed joint frame: the plan
    shows the truncated lineage (ExistingRDD), not four parquet scans
    of the fact table."""
    plan = explain_str(QUERIES["mutual_information_type_value"].fn(spark, sf_dir), mode="simple")
    assert plan.count("Scan parquet") == 0, plan  # all branches read the checkpoint
    assert "Scan ExistingRDD" in plan, plan


def test_psi_collapses_before_the_grid_join(spark, sf_dir):
    """The fact table partial-aggregates; the types×10 zero-fill grid
    and the PSI fold never see corpus-sized rows."""
    plan = explain_str(QUERIES["psi_value_drift"].fn(spark, sf_dir), mode="simple")
    assert "partial_count" in plan or "partial_sum" in plan, plan


def test_changepoint_single_fact_scan(spark, sf_dir):
    """Daily rollup + three windows + rank — the fact table is read
    exactly once."""
    plan = explain_str(QUERIES["changepoint_binary_segmentation"].fn(spark, sf_dir), mode="simple")
    assert plan.count("Scan parquet") == 1, plan


def test_key_skew_rank_window_over_reduced_rows(spark, sf_dir):
    """The Gini rank window consumes the per-key COUNT frame (post-agg),
    so a HashAggregate sits below the Window in every branch."""
    plan = explain_str(QUERIES["key_skew_audit"].fn(spark, sf_dir), mode="formatted")
    # formatted mode lists operators top-down: Window must reference the
    # aggregated count column, and partial aggregation must exist
    assert "Window" in plan and "partial_count" in plan, plan


def test_fuzzy_prefix_no_broadcast_nested_loop(spark, sf_dir):
    """The prefix-posting self-join is an equi-join on the gram — never
    a nested-loop cartesian."""
    plan = explain_str(QUERIES["fuzzy_join_prefix_filtered"].fn(spark, sf_dir), mode="simple")
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan, plan


def test_user_path_reuses_userday_exchange(spark, sf_dir):
    """Rank window and listagg share the (user, day) partitioning: the
    plan carries exactly two hash exchanges (user-day, then path)."""
    plan = explain_str(QUERIES["user_path_topk"].fn(spark, sf_dir), mode="simple")
    assert plan.count("Exchange hashpartitioning") == 2, plan


def test_conversion_latency_quantile_over_reduced_rows(spark, sf_dir):
    """The exact percentile aggregate consumes per-user latencies; the
    twice-consumed view-side frame is checkpointed (compute-once), so
    the plan has ONE parquet scan (purchase leg) + two checkpoint reads
    — it was three fact scans before the localCheckpoint."""
    plan = explain_str(QUERIES["conversion_latency_quantiles"].fn(spark, sf_dir), mode="simple")
    assert "percentile_disc" in plan, plan
    assert plan.count("Scan parquet") == 1, plan
    assert plan.count("Scan ExistingRDD") == 2, plan


def test_recursive_hierarchy_plans_union_loop(spark, sf_dir):
    """WITH RECURSIVE lowers to the recursion operator (UnionLoop /
    recursive relation), not a static unrolled union."""
    plan = explain_str(QUERIES["hierarchy_rollup_recursive"].fn(spark, sf_dir), mode="simple")
    assert "UnionLoop" in plan or "Recursive" in plan.replace("recursive", "Recursive"), plan


def test_scd2_single_hash_exchange(spark, sf_dir):
    """r14: both window specs and both aggregations share the cust
    partitioning — aliasing AFTER the first window had Catalyst
    planning a second Exchange+Sort pair (the r12 full-catalog probe's
    5.06x row decomposed: the plan is 1.2s warm at 5M through a noop
    sink, the probe ratio was driver-collect of the per-customer
    result). One exchange, ever."""
    plan = explain_str(QUERIES["scd2_customer_status"].fn(spark, sf_dir), mode="simple")
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_kmeans_assign_has_no_sort_window(spark, sf_dir):
    """r15 stale-tier fix: the argmin is min(struct(d, cid)) — a hash
    aggregate with map-side partials — never a row_number sort window
    over N·K rows (the shape the 1M→5M probe measured at 36×). No
    Window node anywhere; min(struct) plans as a SortAggregate (struct
    mins don't hash-aggregate) whose partial_min runs BEFORE the
    exchange — the map-side combine is the scaling property, so pin
    it too."""
    plan = explain_str(QUERIES["kmeans_lloyd_assign"].fn(spark, sf_dir), mode="simple")
    assert "Window" not in plan, plan
    assert "partial_min" in plan, plan


def test_kll_audit_has_no_buffering_percentile(spark, sf_dir):
    """r15 stale-tier fix: the exact p50 comes from the histogram +
    cumulative pick, never a WITHIN-GROUP percentile_disc that buffers
    whole groups in single reducers (23.8× at 5× in the probe). The
    only remaining raw-row aggregate is the mergeable KLL sketch."""
    plan = explain_str(QUERIES["kll_quantile_sketch_audit"].fn(spark, sf_dir), mode="simple")
    assert "percentile_disc" not in plan, plan
    assert "kll_sketch_agg_double" in plan, plan


def test_ann_lsh_scores_prenormalized_dot(spark, sf_dir):
    """r15 stale-tier fix: candidate pairs are scored with a single
    dot fold over pre-normalized vectors — the per-pair norm
    recomputation (dot + 2 norms, 8.32× at 5×) must not come back.
    The plan's pair-scoring projection contains exactly one aggregate
    lambda fold per pair (the dot), not three."""
    import pyspark.sql.functions as F

    from energi_data_etl_spark.operators import similarity as S
    from energi_data_etl_spark.sources.tables import load_table

    e = load_table(spark, "embeddings", sf_dir)
    q = e.filter(F.col("vec_id") < 5)
    plan = explain_str(S.ann_lsh_knn(q, e, k=3), mode="simple")
    # the dot fold is the only zip_with in the plan; cosine() would put
    # SQRT norm denominators in the SAME projection expression as the
    # zip_with (per-pair recompute), while unit_vector's SQRT lives in
    # the per-vector input projections — so no plan line may mix them
    mixed = [ln for ln in plan.splitlines() if "zip_with" in ln and "SQRT" in ln.upper()]
    assert "zip_with" in plan, plan  # the dot fold is present
    assert not mixed, mixed
