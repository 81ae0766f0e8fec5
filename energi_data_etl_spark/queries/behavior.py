"""Behavioral / product-analytics tier over the events stream table:
batch sessionization, funnel conversion, cohort retention, transition
matrix. The reference's dashboard (Power BI over the daily fact,
``scripts/energy_etl.py:69-70``) answers "what happened per day"; this
tier answers the per-user questions every event warehouse is asked next.

Scale notes (100 TB): every query here shuffles ONLY on ``user_id`` —
one Exchange feeds chained windows and the per-user aggregations
(Spark reuses the partitioning across same-key stages), and the final
reports are partial-aggregated rollups of per-user rows. No self-joins
on the fact table except the cohort join-back, which is co-partitioned
on the same key.

Cross-engine: epoch seconds via Spark ``ts.cast("timestamp")
.cast("long")`` (truncates) == DuckDB ``CAST(FLOOR(EPOCH(ts)) AS
BIGINT)``; window order always tie-broken by ``event_id``; quotients
FLOOR-truncated per the CLAUDE.md rounding rule.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ..sources.tables import load_table
from .catalog import query

#: inactivity gap (seconds) that closes a session
SESSION_GAP_S = 1800
#: max gap for a LAG pair to count as a "transition"
TRANSITION_GAP_S = 300


def _with_epoch_s(ev: DataFrame) -> DataFrame:
    return ev.withColumn("s", F.col("ts").cast("timestamp").cast("long"))


@query(
    "sessionize_events_batch",
    tier="W2+W4+A1 (batch sessionization: gap>30min splits, per-user session stats)",
    oracle=f"""
        WITH e AS (
            SELECT user_id, event_id, CAST(FLOOR(EPOCH(ts)) AS BIGINT) AS s FROM events
        ), l AS (
            SELECT *, LAG(s) OVER (PARTITION BY user_id ORDER BY s, event_id) AS ps FROM e
        ), f AS (
            SELECT *, CASE WHEN ps IS NULL OR s - ps > {SESSION_GAP_S} THEN 1 ELSE 0 END AS is_new
            FROM l
        ), sid AS (
            SELECT *, SUM(is_new) OVER (PARTITION BY user_id ORDER BY s, event_id
                                        ROWS UNBOUNDED PRECEDING) AS session_id
            FROM f
        ), per AS (
            SELECT user_id, session_id, COUNT(*) AS n_ev, MAX(s) - MIN(s) AS dur
            FROM sid GROUP BY user_id, session_id
        )
        SELECT user_id,
               COUNT(*) AS n_sessions,
               CAST(SUM(n_ev) AS BIGINT) AS n_events,
               MAX(n_ev) AS longest_session_events,
               CAST(SUM(dur) AS BIGINT) AS total_active_secs
        FROM per GROUP BY user_id
    """,
)
def sessionize_events_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The batch twin of T5's streaming session windows: LAG gap flag →
    running-sum session id → per-session agg → per-user report. All
    three windows and both groupBys key on ``user_id`` — one Exchange
    total; the running session id is the standard "gaps and islands"
    build (no join, no driver loop)."""
    e = _with_epoch_s(load_table(spark, "events", sf_dir))
    wo = Window.partitionBy("user_id").orderBy("s", "event_id")
    l = e.withColumn("ps", F.lag("s").over(wo))
    f = l.withColumn(
        "is_new",
        (F.col("ps").isNull() | ((F.col("s") - F.col("ps")) > SESSION_GAP_S)).cast("int"),
    )
    sid = f.withColumn(
        "session_id", F.sum("is_new").over(wo.rowsBetween(Window.unboundedPreceding, 0))
    )
    per = sid.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_ev"),
        (F.max("s") - F.min("s")).alias("dur"),
    )
    return per.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.sum("n_ev").alias("n_events"),
        F.max("n_ev").alias("longest_session_events"),
        F.sum("dur").alias("total_active_secs"),
    )


@query(
    "funnel_view_click_purchase",
    tier="W4+A5 (ordered funnel: stage timestamps chained per user, conversion report)",
    oracle="""
        WITH e AS (
            SELECT user_id, event_type, CAST(FLOOR(EPOCH(ts)) AS BIGINT) AS s FROM events
        ), s1 AS (
            SELECT *, MIN(CASE WHEN event_type = 'view' THEN s END)
                          OVER (PARTITION BY user_id) AS t1
            FROM e
        ), s2 AS (
            SELECT *, MIN(CASE WHEN event_type = 'click' AND s > t1 THEN s END)
                          OVER (PARTITION BY user_id) AS t2
            FROM s1
        ), s3 AS (
            SELECT *, MIN(CASE WHEN event_type = 'purchase' AND s > t2 THEN s END)
                          OVER (PARTITION BY user_id) AS t3
            FROM s2
        ), u AS (
            SELECT user_id, MAX(t1) AS t1, MAX(t2) AS t2, MAX(t3) AS t3
            FROM s3 GROUP BY user_id
        )
        SELECT COUNT(*) AS n_users,
               COUNT(t1) AS n_viewed,
               COUNT(t2) AS n_clicked_after,
               COUNT(t3) AS n_purchased_after,
               FLOOR(COUNT(t3) * 1000000.0 / COUNT(t1)) / 1000000.0 AS conversion_rate,
               FLOOR(AVG(t3 - t1) * 100.0) / 100.0 AS avg_secs_to_convert
        FROM u
    """,
)
def funnel_view_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel (view → click → purchase, each stage
    strictly AFTER the previous): three chained conditional-MIN windows
    over the same ``user_id`` partition — one Exchange, no join-back of
    the fact table to itself (the naive formulation joins events to a
    per-stage agg twice; the chained-window form touches each row three
    times in place). AVG(t3-t1) is a quotient → FLOOR-truncated."""
    e = _with_epoch_s(
        load_table(spark, "events", sf_dir).select("user_id", "event_type", "ts")
    )
    w = Window.partitionBy("user_id")
    s1 = e.withColumn("t1", F.min(F.when(F.col("event_type") == "view", F.col("s"))).over(w))
    s2 = s1.withColumn(
        "t2",
        F.min(
            F.when((F.col("event_type") == "click") & (F.col("s") > F.col("t1")), F.col("s"))
        ).over(w),
    )
    s3 = s2.withColumn(
        "t3",
        F.min(
            F.when((F.col("event_type") == "purchase") & (F.col("s") > F.col("t2")), F.col("s"))
        ).over(w),
    )
    u = s3.groupBy("user_id").agg(
        F.max("t1").alias("t1"), F.max("t2").alias("t2"), F.max("t3").alias("t3")
    )
    return u.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.count("t1").alias("n_viewed"),
        F.count("t2").alias("n_clicked_after"),
        F.count("t3").alias("n_purchased_after"),
        (F.floor(F.count("t3") * 1000000.0 / F.count("t1")) / 1000000.0).alias("conversion_rate"),
        (F.floor(F.avg(F.col("t3") - F.col("t1")) * 100.0) / 100.0).alias("avg_secs_to_convert"),
    )


@query(
    "cohort_weekly_retention",
    tier="A1+J1+W4 (cohort retention: first-seen week × activity-week offset)",
    oracle="""
        WITH e AS (
            SELECT user_id, DATE_TRUNC('week', ts) AS w FROM events
        ), fu AS (
            SELECT user_id, MIN(w) AS cohort_w FROM e GROUP BY user_id
        ), j AS (
            SELECT DISTINCT e.user_id, fu.cohort_w,
                   CAST(DATE_DIFF('day', fu.cohort_w, e.w) / 7.0 AS BIGINT) AS week_offset
            FROM e JOIN fu ON e.user_id = fu.user_id
        )
        SELECT CAST(cohort_w AS DATE) AS cohort_week, week_offset,
               COUNT(*) AS n_active_users
        FROM j GROUP BY cohort_w, week_offset
    """,
)
def cohort_weekly_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention triangle: cohort = Monday of each user's
    first event; a cell counts users of that cohort active N weeks
    later. Per-user first-week agg, join-back on the SAME key
    (co-partitioned — no second shuffle of the fact under the same
    partitioning), distinct per (user, week), rollup. Both engines
    truncate weeks to Monday, so the day-diff is an exact multiple of 7
    and the cast is lossless."""
    e = load_table(spark, "events", sf_dir).select(
        "user_id", F.date_trunc("week", F.col("ts").cast("timestamp")).alias("w")
    )
    fu = e.groupBy("user_id").agg(F.min("w").alias("cohort_w"))
    j = (
        e.join(fu, "user_id")
        .select(
            "user_id",
            "cohort_w",
            (F.datediff(F.col("w"), F.col("cohort_w")) / 7.0).cast("long").alias("week_offset"),
        )
        .distinct()
    )
    return j.groupBy(
        F.col("cohort_w").cast("date").alias("cohort_week"), "week_offset"
    ).agg(F.count(F.lit(1)).alias("n_active_users"))


@query(
    "event_transition_matrix",
    tier="W2+A1 (Markov transition matrix: LAG pairs within 5 min, share per source state)",
    oracle=f"""
        WITH e AS (
            SELECT user_id, event_id, event_type,
                   CAST(FLOOR(EPOCH(ts)) AS BIGINT) AS s
            FROM events
        ), l AS (
            SELECT event_type,
                   LAG(event_type) OVER w AS prev_type,
                   s - LAG(s) OVER w AS gap
            FROM e
            WINDOW w AS (PARTITION BY user_id ORDER BY s, event_id)
        ), t AS (
            SELECT prev_type, event_type, COUNT(*) AS n_transitions
            FROM l
            WHERE prev_type IS NOT NULL AND gap <= {TRANSITION_GAP_S}
            GROUP BY prev_type, event_type
        )
        SELECT prev_type, event_type, n_transitions,
               FLOOR(n_transitions * 1000000.0
                     / SUM(n_transitions) OVER (PARTITION BY prev_type)) / 1000000.0 AS share
        FROM t
    """,
)
def event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """What users do next: count (prev → next) event-type pairs that
    happen within 5 minutes, normalized to a row-stochastic share per
    source state. One ``user_id`` window builds the pairs; the matrix
    itself is at most |types|² rows, so the normalizing window is free.
    The per-row share is a quotient → FLOOR-truncated."""
    e = _with_epoch_s(
        load_table(spark, "events", sf_dir).select("user_id", "event_id", "event_type", "ts")
    )
    wo = Window.partitionBy("user_id").orderBy("s", "event_id")
    l = e.select(
        "event_type",
        F.lag("event_type").over(wo).alias("prev_type"),
        (F.col("s") - F.lag("s").over(wo)).alias("gap"),
    )
    t = (
        l.filter(F.col("prev_type").isNotNull() & (F.col("gap") <= TRANSITION_GAP_S))
        .groupBy("prev_type", "event_type")
        .agg(F.count(F.lit(1)).alias("n_transitions"))
    )
    wp = Window.partitionBy("prev_type")
    return t.select(
        "prev_type",
        "event_type",
        "n_transitions",
        (F.floor(F.col("n_transitions") * 1000000.0 / F.sum("n_transitions").over(wp)) / 1000000.0).alias(
            "share"
        ),
    )


@query(
    "theta_sketch_user_overlap",
    tier="A6+L8 (theta sketch set algebra: distinct-user audience intersection)",
    oracle="""
        WITH per_user AS (
            SELECT user_id,
                   MAX(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)     AS saw,
                   MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS bought
            FROM events GROUP BY user_id
        )
        SELECT CAST(SUM(saw) AS BIGINT)          AS n_view_users,
               CAST(SUM(bought) AS BIGINT)       AS n_purchase_users,
               CAST(SUM(saw * bought) AS BIGINT) AS n_both_exact,
               TRUE                              AS within_tol
        FROM per_user
    """,
)
def theta_sketch_user_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audience-overlap via theta sketches — the sketch family whose
    set ALGEBRA is closed: unlike HLL (union only), theta sketches
    intersect and difference, which is what audience/cohort overlap
    questions need at 100 TB (build one bounded sketch per segment in
    one pass, combine sketches afterwards — never re-scan to intersect
    two segments). The exact per-user flag rollup rides along as the
    certification surface; the sketch's intersection estimate must land
    within 5% (+1) of it or within_tol flips false and fails the hash
    gate. DuckDB has no theta equivalent, so the oracle pins the exact
    counts and expects the verdict column literally true — a Spark-side
    sketch drift still breaks the compare."""
    ev = load_table(spark, "events", sf_dir)
    agg = ev.agg(
        F.theta_sketch_agg(
            F.when(F.col("event_type") == "view", F.col("user_id"))
        ).alias("sv"),
        F.theta_sketch_agg(
            F.when(F.col("event_type") == "purchase", F.col("user_id"))
        ).alias("sp"),
        F.count_distinct(
            F.when(F.col("event_type") == "view", F.col("user_id"))
        ).alias("n_view_users"),
        F.count_distinct(
            F.when(F.col("event_type") == "purchase", F.col("user_id"))
        ).alias("n_purchase_users"),
    )
    both = (
        ev.filter(F.col("event_type").isin("view", "purchase"))
        .groupBy("user_id")
        .agg(F.count_distinct("event_type").alias("k"))
        .agg(F.sum(F.when(F.col("k") == 2, 1).otherwise(0)).alias("n_both_exact"))
    )
    est = F.theta_sketch_estimate(F.theta_intersection("sv", "sp"))
    return agg.crossJoin(both).select(
        "n_view_users",
        "n_purchase_users",
        "n_both_exact",
        (
            F.abs(est - F.col("n_both_exact"))
            <= F.lit(0.05) * F.col("n_both_exact") + F.lit(1.0)
        ).alias("within_tol"),
    )


@query(
    "theta_sketch_weekly_churn",
    tier="A6+L8 (theta sketch difference: churned / retained / new audience estimates)",
    oracle="""
        WITH per_user AS (
            SELECT user_id,
                   MAX(CASE WHEN ts < TIMESTAMP '2024-01-08' THEN 1 ELSE 0 END) AS w1,
                   MAX(CASE WHEN ts >= TIMESTAMP '2024-01-08'
                             AND ts < TIMESTAMP '2024-01-15' THEN 1 ELSE 0 END) AS w2
            FROM events WHERE ts < TIMESTAMP '2024-01-15'
            GROUP BY user_id
        )
        SELECT CAST(SUM(w1) AS BIGINT)            AS n_week1,
               CAST(SUM(w2) AS BIGINT)            AS n_week2,
               CAST(SUM(w1 * w2) AS BIGINT)       AS n_retained,
               CAST(SUM(w1 * (1 - w2)) AS BIGINT) AS n_churned,
               CAST(SUM((1 - w1) * w2) AS BIGINT) AS n_new,
               TRUE AS retained_tol, TRUE AS churned_tol, TRUE AS new_tol
        FROM per_user
    """,
)
def theta_sketch_weekly_churn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Churn analysis is a set-DIFFERENCE question — |week1 \\ week2| —
    which HLL cannot answer and theta sketches answer in closed form:
    one bounded sketch per week (built in one pass, mergeable across
    partitions and re-aggregatable across weeks), then
    intersection/difference at combine time, never re-scanning. The
    exact per-user flag rollup rides along as the certified surface;
    each estimate (retained/churned/new) must land within 5%+1 of its
    exact count or the corresponding verdict flips false and fails the
    hash (DuckDB has no theta algebra, so the oracle pins the verdicts
    literally true — Spark-side sketch drift still breaks the
    compare)."""
    ev = load_table(spark, "events", sf_dir).filter(F.col("ts") < "2024-01-15")
    w1u = F.when(F.col("ts") < "2024-01-08", F.col("user_id"))
    w2u = F.when(F.col("ts") >= "2024-01-08", F.col("user_id"))
    agg = ev.agg(
        F.theta_sketch_agg(w1u).alias("s1"),
        F.theta_sketch_agg(w2u).alias("s2"),
        F.count_distinct(w1u).alias("n_week1"),
        F.count_distinct(w2u).alias("n_week2"),
    )
    flags = (
        ev.groupBy("user_id")
        .agg(
            F.max((F.col("ts") < "2024-01-08").cast("int")).alias("w1"),
            F.max((F.col("ts") >= "2024-01-08").cast("int")).alias("w2"),
        )
        .agg(
            F.sum(F.col("w1") * F.col("w2")).alias("n_retained"),
            F.sum(F.col("w1") * (1 - F.col("w2"))).alias("n_churned"),
            F.sum((1 - F.col("w1")) * F.col("w2")).alias("n_new"),
        )
    )

    def tol(est, exact):
        return F.abs(est - F.col(exact)) <= F.lit(0.05) * F.col(exact) + F.lit(1.0)

    ret_est = F.theta_sketch_estimate(F.theta_intersection("s1", "s2"))
    chn_est = F.theta_sketch_estimate(F.theta_difference("s1", "s2"))
    new_est = F.theta_sketch_estimate(F.theta_difference("s2", "s1"))
    return agg.crossJoin(flags).select(
        "n_week1",
        "n_week2",
        "n_retained",
        "n_churned",
        "n_new",
        tol(ret_est, "n_retained").alias("retained_tol"),
        tol(chn_est, "n_churned").alias("churned_tol"),
        tol(new_est, "n_new").alias("new_tol"),
    )


@query(
    "event_sequence_detection",
    tier="EXT behavior (MATCH_RECOGNIZE-style sequence: error followed by purchase within 10 min)",
    oracle="""
        WITH seq AS (
            SELECT CAST(ts AS DATE) AS d, event_type,
                   MIN(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END)
                       OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
                             ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
                   - epoch_us(ts) AS gap_us
            FROM events
        )
        SELECT d,
               CAST(COUNT(*) AS BIGINT) AS n_errors,
               CAST(COALESCE(SUM(CASE WHEN gap_us <= 600000000 THEN 1 END), 0) AS BIGINT)
                   AS n_recovered,
               FLOOR(COALESCE(SUM(CASE WHEN gap_us <= 600000000 THEN 1 END), 0) * 1000000
                     / COUNT(*)) / 1000000.0 AS recovery_rate
        FROM seq
        WHERE event_type = 'error'
        GROUP BY d
        ORDER BY d
    """,
)
def event_sequence_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence-pattern detection without MATCH_RECOGNIZE (Spark has
    none): "error followed by a purchase within 10 minutes by the same
    user" — the recovery-funnel question — expressed as a SUFFIX-frame
    window: for every event, the next purchase timestamp is
    MIN(CASE type='purchase') over ROWS 1 FOLLOWING → UNBOUNDED under
    the per-user (ts, event_id) total order; error rows then just
    compare the gap. One window pass detects the pattern for EVERY
    anchor row simultaneously — no self-join on the fact table, no
    per-user UDF loop, and the frame trick generalizes to any
    A-then-B-within-T pattern.

    Cross-engine: integer µs arithmetic under a fully tie-broken
    order; the rate is a FLOOR-truncated quotient of exact longs.
    Scale: ONE shuffle on user_id feeds the window; the daily rollup
    is map-side combined. At 100 TB this is the sessionize plan shape
    (shuffle-once, window, partial-agg) with a different frame."""
    ev = load_table(spark, "events", sf_dir).select(
        "user_id",
        "event_id",
        "event_type",
        F.to_date("ts").alias("d"),
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("us", "event_id")
        .rowsBetween(1, Window.unboundedFollowing)
    )
    seq = ev.select(
        "d",
        "event_type",
        (
            F.min(F.when(F.col("event_type") == "purchase", F.col("us"))).over(w) - F.col("us")
        ).alias("gap_us"),
    ).filter(F.col("event_type") == "error")
    recovered = F.coalesce(F.sum(F.when(F.col("gap_us") <= 600_000_000, 1)), F.lit(0))
    return (
        seq.groupBy("d")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_errors"),
            recovered.cast("long").alias("n_recovered"),
            (F.floor(recovered * 1000000 / F.count(F.lit(1))) / 1000000.0).alias("recovery_rate"),
        )
        .orderBy("d")
    )


@query(
    "user_path_topk",
    tier="EXT behavior (top-k user journey paths: ordered event-type prefix per user-day)",
    oracle="""
        WITH ranked AS (
            SELECT user_id, CAST(ts AS DATE) AS d, event_type,
                   ROW_NUMBER() OVER (PARTITION BY user_id, CAST(ts AS DATE)
                                      ORDER BY epoch_us(ts), event_id) AS rn
            FROM events
        ),
        paths AS (
            SELECT user_id, d, STRING_AGG(event_type, '>' ORDER BY rn) AS path
            FROM ranked WHERE rn <= 5
            GROUP BY user_id, d
        ),
        counted AS (
            SELECT path, CAST(COUNT(*) AS BIGINT) AS n_user_days FROM paths GROUP BY path
        )
        SELECT path, n_user_days
        FROM (SELECT *, ROW_NUMBER() OVER (ORDER BY n_user_days DESC, path ASC) AS r
              FROM counted)
        WHERE r <= 10
        ORDER BY n_user_days DESC, path ASC
    """,
)
def user_path_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k user journeys — the product-analytics "what do people
    actually do" query: each user-day's first five events in time
    order become a path string (view>click>purchase>...), paths are
    counted across user-days, top 10 win (count desc, path tiebreak).
    The prefix cap is the scale contract: paths are bounded strings, so
    the path groupBy carries ≤5 event names per row no matter how hot
    a user-day gets.

    Ordering is total ((epoch µs, event_id) inside the user-day, rn
    inside the listagg) so the string is deterministic on both engines
    — an unordered path agg would be partition-arbitrary and
    uncertifiable. Plan: one (user, day)-keyed shuffle feeds the rank
    window AND the path agg (same keys, exchange reused), then a
    count/top-k over the tiny path dimension."""
    ev = load_table(spark, "events", sf_dir).select(
        "user_id",
        "event_id",
        "event_type",
        F.to_date("ts").alias("d"),
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
    )
    w = Window.partitionBy("user_id", "d").orderBy("us", "event_id")
    ranked = ev.select("user_id", "d", "event_type", F.row_number().over(w).alias("rn")).filter(
        F.col("rn") <= 5
    )
    ranked.createOrReplaceTempView("__path_ranked")
    paths = spark.sql(
        """
        SELECT user_id, d,
               listagg(event_type, '>') WITHIN GROUP (ORDER BY rn) AS path
        FROM __path_ranked GROUP BY user_id, d
        """
    )
    counted = paths.groupBy("path").agg(F.count(F.lit(1)).cast("long").alias("n_user_days"))
    wr = Window.orderBy(F.col("n_user_days").desc(), F.col("path").asc())
    return (
        counted.select("*", F.row_number().over(wr).alias("r"))
        .filter(F.col("r") <= 10)
        .select("path", "n_user_days")
        .orderBy(F.col("n_user_days").desc(), F.col("path").asc())
    )


@query(
    "conversion_latency_quantiles",
    tier="EXT behavior (first-view -> first-subsequent-purchase latency, discrete quantiles)",
    oracle="""
        WITH fv AS (
            SELECT user_id, MIN(epoch_us(ts)) AS v_us
            FROM events WHERE event_type = 'view' GROUP BY user_id
        ),
        fp AS (
            SELECT e.user_id, MIN(epoch_us(e.ts)) AS p_us
            FROM events e JOIN fv ON e.user_id = fv.user_id
            WHERE e.event_type = 'purchase' AND epoch_us(e.ts) > fv.v_us
            GROUP BY e.user_id
        ),
        lat AS (
            SELECT (fp.p_us - fv.v_us) // 1000000 AS lat_s
            FROM fv JOIN fp ON fv.user_id = fp.user_id
        )
        SELECT CAST(COUNT(*) AS BIGINT) AS n_converted,
               CAST(QUANTILE_DISC(lat_s, 0.25) AS BIGINT) AS p25_s,
               CAST(QUANTILE_DISC(lat_s, 0.50) AS BIGINT) AS p50_s,
               CAST(QUANTILE_DISC(lat_s, 0.75) AS BIGINT) AS p75_s,
               CAST(QUANTILE_DISC(lat_s, 0.90) AS BIGINT) AS p90_s
        FROM lat
    """,
)
def conversion_latency_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-to-convert distribution — the growth-team staple: per user,
    the first view and the first purchase strictly after it; the
    latency distribution summarized as DISCRETE quantiles (elements of
    the data, bit-exact across engines — integer seconds from exact µs
    arithmetic, so the whole output row is hash-certifiable with no
    rounding at all).

    Plan: two map-side-combined per-user MINs (the purchase side
    filtered by a co-keyed join back to the view side — user_id keeps
    the exchange reusable), then one exact quantile aggregate over the
    per-user latencies (|users| rows — already reduced; the
    memory-heavy exact percentile never sees the fact table). At
    100 TB the fact scans are the only corpus-sized stages and both
    prune to two event types."""
    ev = load_table(spark, "events", sf_dir).select(
        "user_id", "event_type", F.unix_micros(F.col("ts").cast("timestamp")).alias("us")
    )
    # consumed twice (purchase-side filter + final latency join) —
    # localCheckpoint so the view-side scan+agg runs once (CLAUDE.md
    # compute-once rule; was 3 fact scans, now 2)
    fv = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("us").alias("v_us"))
        .localCheckpoint(eager=False)
    )
    fp = (
        ev.filter(F.col("event_type") == "purchase")
        .join(fv, "user_id")
        .filter(F.col("us") > F.col("v_us"))
        .groupBy("user_id")
        .agg(F.min("us").alias("p_us"))
    )
    lat = fv.join(fp, "user_id").select(
        F.expr("(p_us - v_us) div 1000000").alias("lat_s")
    )
    lat.createOrReplaceTempView("__conv_lat")
    return spark.sql(
        """
        SELECT CAST(COUNT(*) AS BIGINT) AS n_converted,
               CAST(percentile_disc(0.25) WITHIN GROUP (ORDER BY lat_s) AS BIGINT) AS p25_s,
               CAST(percentile_disc(0.50) WITHIN GROUP (ORDER BY lat_s) AS BIGINT) AS p50_s,
               CAST(percentile_disc(0.75) WITHIN GROUP (ORDER BY lat_s) AS BIGINT) AS p75_s,
               CAST(percentile_disc(0.90) WITHIN GROUP (ORDER BY lat_s) AS BIGINT) AS p90_s
        FROM __conv_lat
        """
    )


@query(
    "attribution_last_touch",
    tier="EXT behavior (last-touch attribution: credit each purchase to the preceding event)",
    oracle="""
        WITH touched AS (
            SELECT event_type,
                   MAX(CASE WHEN event_type <> 'purchase'
                            THEN {'us': epoch_us(ts), 'eid': event_id, 'et': event_type} END)
                       OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS lt
            FROM events
        ),
        attributed AS (
            SELECT COALESCE(lt.et, 'none') AS touch
            FROM touched WHERE event_type = 'purchase'
        ),
        counted AS (
            SELECT touch, CAST(COUNT(*) AS BIGINT) AS n_purchases FROM attributed GROUP BY touch
        )
        SELECT touch, n_purchases,
               FLOOR(n_purchases * 1000000 / SUM(n_purchases) OVER ()) / 1000000.0 AS share
        FROM counted
        ORDER BY touch
    """,
)
def attribution_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch attribution — the marketing-analytics default: every
    purchase is credited to the same user's most recent preceding
    non-purchase event. Implemented with the struct-MAX prefix-frame
    trick: MAX(CASE non-purchase THEN (µs, event_id, type)) over ROWS
    UNBOUNDED PRECEDING → 1 PRECEDING picks the latest prior touch
    lexicographically (µs leads, so latest wins; the full (µs, id) key
    makes ties impossible) — the same one-window-pass,
    no-fact-self-join shape as event_sequence_detection, pointed
    backwards. Purchases with no prior touch attribute to 'none'.

    Cross-engine: struct comparison is field-by-field on both engines
    with exact integer leads; shares are FLOOR-truncated quotients of
    exact longs. Scale: ONE user_id shuffle, then a dimension-bounded
    rollup."""
    ev = load_table(spark, "events", sf_dir).select(
        "user_id",
        "event_id",
        "event_type",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("us", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    lt = F.max(
        F.when(
            F.col("event_type") != "purchase",
            F.struct(F.col("us"), F.col("event_id"), F.col("event_type").alias("t")),
        )
    ).over(w)
    attributed = (
        ev.select("event_type", lt.alias("lt"))
        .filter(F.col("event_type") == "purchase")
        .select(F.coalesce(F.col("lt.t"), F.lit("none")).alias("touch"))
    )
    counted = attributed.groupBy("touch").agg(
        F.count(F.lit(1)).cast("long").alias("n_purchases")
    )
    wt = Window.partitionBy()
    return counted.select(
        "touch",
        "n_purchases",
        (F.floor(F.col("n_purchases") * 1000000 / F.sum("n_purchases").over(wt)) / 1000000.0).alias(
            "share"
        ),
    ).orderBy("touch")


@query(
    "trending_users_decayed",
    tier="EXT behavior (exponential time-decay ranking in EXACT integer arithmetic)",
    oracle="""
        WITH ev AS (
            SELECT user_id, (epoch_us(ts) // 86400000000) AS d FROM events
        ),
        mx AS (SELECT MAX(d) AS md FROM ev)
        SELECT user_id,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               CAST(SUM(CAST(1 AS BIGINT)
                        << CAST(GREATEST(0, 30 - (mx.md - ev.d)) AS INT)) AS BIGINT)
                   AS decay_score
        FROM ev CROSS JOIN mx
        GROUP BY user_id
        ORDER BY decay_score DESC, user_id ASC
        LIMIT 20
    """,
)
def trending_users_decayed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trending-keys ranking under exponential time decay (half-life =
    1 day), the 'what is hot NOW' ordering every feed/abuse/ops
    dashboard wants — done in EXACT integer arithmetic: an event aged
    `a` days scores 2^(30-a), i.e. the decay weights are bit shifts,
    so the per-user score is an exact BIGINT sum (corpus spans 30
    days; the float formulation sum(0.5^a) is ORDER-DEPENDENT at the
    ulp and uncertifiable, while this one is the same number on any
    partitioning, any engine). A yesterday-event is worth 2x a
    two-days-ago event; 2^30 >> 30-day tail means one recent burst
    outranks any volume of old traffic — which is the semantics.

    Scale: one conditional-shift projection + one partial-aggregated
    groupBy (the decay fold is map-side combined like any SUM);
    the global max-day is a broadcast scalar; top-20 is
    TakeOrderedAndProject. Headroom: score <= n_user_events * 2^30 —
    int64-safe to ~8e12 events per key; beyond that, rescale the
    exponent base period (weekly ages) or split the window."""
    ev = (
        load_table(spark, "events", sf_dir)
        .select(
            "user_id",
            F.expr("unix_micros(cast(ts as timestamp)) div 86400000000").alias("d"),
        )
        .localCheckpoint(eager=False)  # feeds the max-day scalar AND the rollup
    )
    mx = ev.agg(F.max("d").alias("md"))
    return (
        ev.crossJoin(F.broadcast(mx))
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum(
                F.expr("shiftleft(cast(1 as bigint), cast(greatest(0, 30 - (md - d)) as int))")
            )
            .cast("long")
            .alias("decay_score"),
        )
        .orderBy(F.col("decay_score").desc(), F.col("user_id").asc())
        .limit(20)
    )


#: Incremental sessionization dials: 12 h inactivity gap; the last 10
#: days arrive as the "new" batch.
INC_GAP_US = 12 * 3600 * 1_000_000
INC_NEW_DAYS = 10


@query(
    "sessionize_incremental_merge",
    tier="EXT behavior (incremental sessionization: state + new batch == full recompute, certified definitionally)",
    oracle=f"""
        WITH e AS (
            SELECT user_id, event_id, epoch_us(ts) AS us FROM events
        ),
        marked AS (
            SELECT user_id, event_id, us,
                   CASE WHEN LAG(us) OVER w IS NULL
                             OR us - LAG(us) OVER w > {INC_GAP_US}
                        THEN 1 ELSE 0 END AS ns
            FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
        ),
        sess AS (
            SELECT user_id, us,
                   SUM(ns) OVER (PARTITION BY user_id ORDER BY us, event_id
                                 ROWS UNBOUNDED PRECEDING) AS sid
            FROM marked
        ),
        spans AS (
            SELECT user_id, sid, MIN(us) AS s, MAX(us) AS e, COUNT(*) AS n
            FROM sess GROUP BY user_id, sid
        )
        SELECT user_id,
               CAST(COUNT(*) AS BIGINT) AS n_sessions,
               CAST(SUM(n) AS BIGINT) AS total_events,
               CAST(MAX(e - s) AS BIGINT) AS max_len_us,
               CAST(MAX(e) AS BIGINT) AS latest_end_us
        FROM spans GROUP BY user_id ORDER BY user_id
    """,
)
def sessionize_incremental_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental sessionization — the stateful-batch maintenance
    problem: yesterday's session SUMMARIES plus today's raw events
    must yield the same sessions as recomputing from all history. The
    Spark side actually runs the incremental protocol: sessionize the
    old partition (the persisted state a real pipeline would carry),
    sessionize the new batch independently, then stitch the ONE
    possible seam per user — the last old session extends into the
    first new session iff the inter-event gap at the boundary is
    within the inactivity window (old sessions are maximal, so no
    other merge is possible; time-partitioned batches make the seam
    provably unique). The DuckDB oracle recomputes sessions from the
    FULL history definitionally, so the hash gate certifies
    incremental == full recompute — the IVM guarantee, not twin
    agreement. The fixture is non-vacuous: 5/44/455 boundary-spanning
    sessions at sf0.001/0.01/0.1 exercise the merge path itself.

    Scale (100 TB): each day's batch sessionizes over its own
    partition (the expensive sort touches ONLY new data); the stitch
    joins |users| summary rows — this is exactly why session state
    stores carry (start, end, n) per open session rather than raw
    events. All arithmetic is exact integer µs."""
    ev = (
        load_table(spark, "events", sf_dir)
        .select(
            "user_id",
            "event_id",
            F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
            F.expr("unix_micros(cast(ts as timestamp)) div 86400000000").alias("d"),
        )
        # r18 opt (VERDICT r17 #4, guide §2.4): the cut aggregate and the
        # old/new branches each re-scanned events.parquet (3 scans).
        # Checkpoint the 4-narrow-column projection once; all three
        # consumers read the materialized rows (one-scan claim pinned by
        # tests/test_plans.py::test_sessionize_single_events_scan, which
        # intercepts the checkpoint — the final plan itself only shows
        # the truncated ExistingRDD scans).
        .localCheckpoint(eager=False)
    )
    cut = ev.agg((F.max("d") - INC_NEW_DAYS + 1).alias("c"))
    tagged = ev.crossJoin(F.broadcast(cut))
    old = tagged.filter(F.col("d") < F.col("c"))
    new = tagged.filter(F.col("d") >= F.col("c"))

    def sessions(df: DataFrame) -> DataFrame:
        w = Window.partitionBy("user_id").orderBy("us", "event_id")
        wc = w.rowsBetween(Window.unboundedPreceding, 0)
        marked = df.select(
            "user_id",
            "event_id",
            "us",
            F.when(
                F.lag("us").over(w).isNull() | ((F.col("us") - F.lag("us").over(w)) > INC_GAP_US),
                1,
            )
            .otherwise(0)
            .alias("ns"),
        )
        return (
            marked.select("user_id", "us", F.sum("ns").over(wc).alias("sid"))
            .groupBy("user_id", "sid")
            .agg(F.min("us").alias("s"), F.max("us").alias("e"), F.count(F.lit(1)).alias("n"))
        )

    old_sess = sessions(old).localCheckpoint(eager=False)  # body + seam
    new_sess = sessions(new).localCheckpoint(eager=False)
    last_old = old_sess.groupBy("user_id").agg(
        F.max(F.struct("sid", "s", "e", "n")).alias("m")
    ).select("user_id", F.col("m.sid").alias("lo_sid"), F.col("m.s").alias("lo_s"), F.col("m.e").alias("lo_e"), F.col("m.n").alias("lo_n"))
    first_new = new_sess.groupBy("user_id").agg(
        F.min(F.struct("sid", "s", "e", "n")).alias("m")
    ).select("user_id", F.col("m.sid").alias("fn_sid"), F.col("m.s").alias("fn_s"), F.col("m.e").alias("fn_e"), F.col("m.n").alias("fn_n"))
    seam = (
        last_old.join(first_new, "user_id")
        .filter((F.col("fn_s") - F.col("lo_e")) <= INC_GAP_US)
        .localCheckpoint(eager=False)  # drives both exclusions + merged rows
    )
    merged = seam.select(
        "user_id",
        F.col("lo_s").alias("s"),
        F.col("fn_e").alias("e"),
        (F.col("lo_n") + F.col("fn_n")).alias("n"),
    )
    old_keep = old_sess.join(
        seam.select(F.col("user_id").alias("xuid"), F.col("lo_sid").alias("xsid")),
        (old_sess.user_id == F.col("xuid")) & (old_sess.sid == F.col("xsid")),
        "left_anti",
    ).select("user_id", "s", "e", "n")
    new_keep = new_sess.join(
        seam.select(F.col("user_id").alias("xuid"), F.col("fn_sid").alias("xsid")),
        (new_sess.user_id == F.col("xuid")) & (new_sess.sid == F.col("xsid")),
        "left_anti",
    ).select("user_id", "s", "e", "n")
    final = old_keep.unionByName(new_keep).unionByName(merged)
    return (
        final.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_sessions"),
            F.sum("n").cast("long").alias("total_events"),
            F.max(F.col("e") - F.col("s")).cast("long").alias("max_len_us"),
            F.max("e").cast("long").alias("latest_end_us"),
        )
        .orderBy("user_id")
    )
