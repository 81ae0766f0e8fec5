"""Analytics extensions: TF-IDF (SURVEY.md L4), pivot/unpivot
reshaping. All pure DataFrame ops with DuckDB oracles.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ..operators import text as X
from ..operators.arrays import sorted_pair_structs
from ..sources.tables import load_table
from .catalog import query


@query(
    "tfidf_top_terms",
    tier="L4 (hand-rolled TF-IDF, no MLlib: explode → tf ⋈ df ⋈ N)",
    oracle="""
        WITH tok AS (
            SELECT doc_id, UNNEST(LIST_FILTER(STRING_SPLIT(LOWER(text), ' '), x -> LENGTH(x) > 0)) AS token
            FROM documents
        ), tf AS (
            SELECT doc_id, token, COUNT(*) AS tf FROM tok GROUP BY 1, 2
        ), df AS (
            SELECT token, COUNT(DISTINCT doc_id) AS df FROM tok GROUP BY 1
        ), n AS (
            SELECT COUNT(*) AS n_docs FROM documents
        ), scored AS (
            SELECT tf.doc_id, tf.token,
                   ROUND(tf.tf * LN((n.n_docs + 1.0) / (df.df + 1.0)), 6) AS tfidf
            FROM tf JOIN df USING (token) CROSS JOIN n
        )
        SELECT doc_id, token, tfidf,
               CAST(ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, token ASC) AS BIGINT) AS rnk
        FROM scored
        QUALIFY rnk <= 3 AND doc_id < 100
    """,
)
def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 TF-IDF terms per document, built from relational primitives
    (explode → two aggregations → joins → window top-k). The corpus
    stats (df, N) are tiny aggregates broadcast into the per-doc join —
    at 100 TB only the token explosion is data-scale, and it's a map
    stage feeding partial aggregation."""
    d = load_table(spark, "documents", sf_dir)
    tok = d.select("doc_id", F.explode(X.tokens("text")).alias("token"))
    tf = tok.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tok.groupBy("token").agg(F.countDistinct("doc_id").alias("df"))
    n = d.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(F.broadcast(dfreq), "token")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "token",
            F.round(F.col("tf") * F.log((F.col("n_docs") + 1.0) / (F.col("df") + 1.0)), 6).alias("tfidf"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), F.col("token").asc())
    return (
        scored.select("*", F.row_number().over(w).cast("long").alias("rnk"))
        .filter((F.col("rnk") <= 3) & (F.col("doc_id") < 100))
    )


@query(
    "pivot_status_counts",
    tier="§2.3 reshaping (groupBy().pivot() — wide aggregation)",
    oracle="""
        SELECT o_orderpriority,
               CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS status_f,
               CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS status_o,
               CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS status_p
        FROM orders
        GROUP BY o_orderpriority
    """,
)
def pivot_status_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit pivot values → single-pass wide aggregation (no
    values-discovery job, the 100 TB-safe form of pivot)."""
    o = load_table(spark, "orders", sf_dir)
    wide = o.groupBy("o_orderpriority").pivot("o_orderstatus", ["F", "O", "P"]).count()
    return wide.select(
        "o_orderpriority",
        F.coalesce(F.col("F"), F.lit(0)).alias("status_f"),
        F.coalesce(F.col("O"), F.lit(0)).alias("status_o"),
        F.coalesce(F.col("P"), F.lit(0)).alias("status_p"),
    )


@query(
    "unpivot_status_counts",
    tier="§2.3 reshaping (unpivot/melt — wide back to long)",
    oracle="""
        SELECT o_orderpriority, o_orderstatus AS status, COUNT(*) AS n
        FROM orders
        GROUP BY 1, 2
    """,
)
def unpivot_status_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """unpivot(pivot(x)) round-trip == the plain long-form groupBy — the
    oracle is that direct form, certifying both reshapes compose
    losslessly."""
    o = load_table(spark, "orders", sf_dir)
    wide = o.groupBy("o_orderpriority").pivot("o_orderstatus", ["F", "O", "P"]).count()
    long = wide.unpivot(
        ids=["o_orderpriority"], values=["F", "O", "P"], variableColumnName="status", valueColumnName="n"
    )
    return long.filter(F.col("n").isNotNull())


# --------------------------------------------------------------------------
# Warehouse-analytics additions (r06): basket affinity, RFM, centroids
# --------------------------------------------------------------------------


@query(
    "market_basket_pairs",
    tier="J1+A1+§2.6 (co-occurrence affinity: within-order part pairs, top-20)",
    oracle="""
        WITH li AS (
            SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
        ), pairs AS (
            SELECT a.l_partkey AS part_a, b.l_partkey AS part_b
            FROM li a JOIN li b
              ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        ), counts AS (
            SELECT part_a, part_b, COUNT(*) AS n_orders
            FROM pairs GROUP BY part_a, part_b
        )
        SELECT part_a, part_b, n_orders
        FROM counts
        ORDER BY n_orders DESC, part_a ASC, part_b ASC
        LIMIT 20
    """,
)
def market_basket_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket affinity (frequent-itemset k=2): which parts ship
    together in one order. Distinct (order, part), equi-self-join on
    the ORDER key only (pair fan-out is bounded by per-order line
    count, ~4-7 on this data — never quadratic in the table), pair
    count, deterministic top-20 (full tie-break so LIMIT is stable
    cross-engine). Spark plans the top-k as TakeOrderedAndProject —
    per-partition heaps, no global sort."""
    # r17 opt (guide §2.4, the co-purchase-skeleton shape): the previous
    # distinct + orderkey self-join shuffled the distinct frame twice and
    # recomputed it per join side; one key-only repartition + groupBy
    # (exchange reused — one shuffle) builds each order's sorted part set
    # and the p1<p2 pairs expand in place in the JVM, multiplicity
    # identical (collect_set == the old distinct). Per-order fan-out is
    # bounded by line count (~4-7), as before.
    order_sets = (
        load_table(spark, "lineitem", sf_dir)
        .select("l_orderkey", "l_partkey")
        .repartition("l_orderkey")
        .groupBy("l_orderkey")
        .agg(F.sort_array(F.collect_set("l_partkey")).alias("ps"))
        .filter(F.size("ps") > 1)
    )
    pair_structs = sorted_pair_structs("ps", "part_a", "part_b")
    pairs = order_sets.select(F.explode(pair_structs).alias("p")).select("p.part_a", "p.part_b")
    counts = pairs.groupBy("part_a", "part_b").agg(F.count(F.lit(1)).alias("n_orders"))
    return counts.orderBy(
        F.col("n_orders").desc(), F.col("part_a").asc(), F.col("part_b").asc()
    ).limit(20)


@query(
    "rfm_customer_segments",
    tier="A1+J1+W1 (RFM segmentation: recency/frequency/monetary quartiles per segment)",
    oracle="""
        WITH per_cust AS (
            SELECT o_custkey,
                   MAX(o_orderdate) AS last_order,
                   COUNT(*) AS frequency,
                   ROUND(SUM(o_totalprice), 2) AS monetary
            FROM orders GROUP BY o_custkey
        ), anchor AS (
            SELECT MAX(o_orderdate) AS max_date FROM orders
        ), rfm AS (
            SELECT c.c_mktsegment, p.o_custkey,
                   DATE_DIFF('day', p.last_order, a.max_date) AS recency_days,
                   p.frequency, p.monetary
            FROM per_cust p
            JOIN customer c ON c.c_custkey = p.o_custkey
            CROSS JOIN anchor a
        ), tiles AS (
            SELECT c_mktsegment,
                   NTILE(4) OVER (PARTITION BY c_mktsegment ORDER BY recency_days ASC, o_custkey ASC) AS r_tile,
                   NTILE(4) OVER (PARTITION BY c_mktsegment ORDER BY frequency DESC, o_custkey ASC) AS f_tile,
                   NTILE(4) OVER (PARTITION BY c_mktsegment ORDER BY monetary DESC, o_custkey ASC) AS m_tile,
                   monetary
            FROM rfm
        )
        SELECT c_mktsegment, r_tile, f_tile, m_tile,
               COUNT(*) AS n_customers,
               ROUND(SUM(monetary), 2) AS segment_monetary
        FROM tiles GROUP BY c_mktsegment, r_tile, f_tile, m_tile
    """,
)
def rfm_customer_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM (recency / frequency / monetary) segmentation: per-customer
    order stats, recency vs the corpus max date (1-row broadcast
    anchor), then quartile tiles per market segment and the segment
    cell report. NTILE is exact-integer (no float-boundary risk) with
    full tie-breaks, so both engines bucket identically. Scale note:
    per-segment NTILE sorts each segment's customers in one partition —
    fine while |customers|/|segments| fits a partition; the unbounded-
    scale variant assigns tiles by broadcast approx-percentile cutoffs
    (map stage), traded here for exact cross-engine certifiability."""
    o = load_table(spark, "orders", sf_dir)
    c = load_table(spark, "customer", sf_dir).select("c_custkey", "c_mktsegment")
    per_cust = o.groupBy("o_custkey").agg(
        F.max("o_orderdate").alias("last_order"),
        F.count(F.lit(1)).alias("frequency"),
        F.round(F.sum("o_totalprice"), 2).alias("monetary"),
    )
    anchor = o.agg(F.max("o_orderdate").alias("max_date"))
    rfm = (
        per_cust.join(c, per_cust.o_custkey == c.c_custkey)
        .crossJoin(F.broadcast(anchor))
        .select(
            "c_mktsegment",
            "o_custkey",
            F.datediff(F.col("max_date"), F.col("last_order")).alias("recency_days"),
            "frequency",
            "monetary",
        )
    )
    seg = Window.partitionBy("c_mktsegment")
    tiles = rfm.select(
        "c_mktsegment",
        F.ntile(4).over(seg.orderBy(F.col("recency_days").asc(), F.col("o_custkey").asc())).alias("r_tile"),
        F.ntile(4).over(seg.orderBy(F.col("frequency").desc(), F.col("o_custkey").asc())).alias("f_tile"),
        F.ntile(4).over(seg.orderBy(F.col("monetary").desc(), F.col("o_custkey").asc())).alias("m_tile"),
        "monetary",
    )
    return tiles.groupBy("c_mktsegment", "r_tile", "f_tile", "m_tile").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.round(F.sum("monetary"), 2).alias("segment_monetary"),
    )


@query(
    "embedding_label_centroids",
    tier="L3+F6 (vector aggregate: per-label centroid via posexplode partial agg)",
    oracle="""
        SELECT label, i AS dim,
               ROUND(AVG(embedding[i]), 6) AS centroid,
               COUNT(*) AS n_vectors
        FROM embeddings
        CROSS JOIN UNNEST(GENERATE_SERIES(1, 64)) AS t(i)
        GROUP BY label, i
    """,
)
def embedding_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-class centroid of the embedding column — the vector
    aggregate under IVF training, k-means steps, and class prototypes,
    expressed relationally: posexplode to (label, dim, value) rows and
    partial-aggregate per (label, dim). At 100 TB this is the right
    shape: the explode is a map stage, the agg combines map-side to
    |labels|×|dims| cells, and no vector ever needs to fit anywhere
    whole. (The numpy-matmul kernel in operators/similarity.py is the
    per-partition fast path; this is the pure-JVM certifiable twin.)"""
    e = load_table(spark, "embeddings", sf_dir)
    exploded = e.select("label", F.posexplode("embedding").alias("pos", "v"))
    return (
        exploded.groupBy("label", (F.col("pos") + 1).alias("dim"))
        .agg(
            F.round(F.avg("v"), 6).alias("centroid"),
            F.count(F.lit(1)).alias("n_vectors"),
        )
    )


@query(
    "value_histogram_by_type",
    tier="A5+F8 (equi-width histogram: per-group min/max anchor, map-stage binning)",
    oracle="""
        WITH stats AS (
            SELECT event_type, MIN(value) AS lo, MAX(value) AS hi
            FROM events GROUP BY event_type
        ), binned AS (
            SELECT e.event_type,
                   CAST(LEAST(FLOOR((e.value - s.lo) / ((s.hi - s.lo) / 10.0)), 9) AS BIGINT) AS bin
            FROM events e JOIN stats s ON e.event_type = s.event_type
        )
        SELECT event_type, bin, COUNT(*) AS n
        FROM binned GROUP BY event_type, bin
    """,
)
def value_histogram_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width 10-bin histogram of `value` per event type — the
    profiling primitive under every data-quality dashboard. Per-type
    min/max is one partial-aggregated pass; the tiny stats frame
    broadcasts back and binning is a map stage (same shape as the
    z-score screen — never a per-type sort). MIN/MAX are order-
    independent exact doubles and both engines run the identical IEEE
    expression, so FLOOR binning is deterministic cross-engine."""
    ev = load_table(spark, "events", sf_dir)
    stats = ev.groupBy("event_type").agg(F.min("value").alias("lo"), F.max("value").alias("hi"))
    binned = ev.join(F.broadcast(stats), "event_type").select(
        "event_type",
        F.least(
            F.floor((F.col("value") - F.col("lo")) / ((F.col("hi") - F.col("lo")) / 10.0)),
            F.lit(9).cast("bigint"),
        ).alias("bin"),
    )
    return binned.groupBy("event_type", "bin").agg(F.count(F.lit(1)).alias("n"))


@query(
    "open_orders_daily",
    tier="A1+W4 (sweep-line interval counting: +1/-1 deltas, running sum over the date spine)",
    oracle="""
        WITH spans AS (
            SELECT o.o_orderkey,
                   CAST(o.o_orderdate AS DATE) AS start_d,
                   CAST(MAX(l.l_shipdate) AS DATE) + INTERVAL 1 DAY AS end_d
            FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
            GROUP BY o.o_orderkey, o.o_orderdate
        ), deltas AS (
            SELECT start_d AS d, COUNT(*) AS delta FROM spans GROUP BY start_d
            UNION ALL
            SELECT CAST(end_d AS DATE) AS d, -COUNT(*) AS delta FROM spans GROUP BY end_d
        ), daily AS (
            SELECT d, SUM(delta) AS net FROM deltas GROUP BY d
        )
        SELECT d, CAST(SUM(net) OVER (ORDER BY d ROWS UNBOUNDED PRECEDING) AS BIGINT) AS open_orders
        FROM daily
    """,
)
def open_orders_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How many orders are in flight on each calendar day (placed, not
    yet fully shipped) — the sweep-line formulation: each order emits
    +1 at its order date and -1 the day after its last ship date; daily
    net deltas then one running sum. Counting every (day × open order)
    pair directly is |days|×|open| — quadratic; the sweep is linear in
    orders plus a cumsum over the DATE DOMAIN (~2.4k rows at any corpus
    size), so the single-partition window at the end is bounded by the
    calendar, not the data."""
    o = load_table(spark, "orders", sf_dir)
    l = load_table(spark, "lineitem", sf_dir)
    spans = (
        o.join(l, o.o_orderkey == l.l_orderkey)
        .groupBy("o_orderkey", "o_orderdate")
        .agg(F.max("l_shipdate").alias("last_ship"))
        .select(
            F.col("o_orderdate").cast("date").alias("start_d"),
            F.date_add(F.col("last_ship").cast("date"), 1).alias("end_d"),
        )
    )
    deltas = spans.groupBy(F.col("start_d").alias("d")).agg(
        F.count(F.lit(1)).alias("delta")
    ).unionAll(
        spans.groupBy(F.col("end_d").alias("d")).agg((-F.count(F.lit(1))).alias("delta"))
    )
    daily = deltas.groupBy("d").agg(F.sum("delta").alias("net"))
    w = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, 0)
    return daily.select(
        "d", F.sum("net").over(w).cast("long").alias("open_orders")
    )


@query(
    "rollup_cascade_weekly",
    tier="A1+T1-ext (reaggregatable summary cascade: raw -> daily partials -> weekly)",
    oracle="""
        SELECT DATE_TRUNC('week', CAST(ts AS DATE)) AS week,
               event_type,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               ROUND(SUM(value), 4) AS total_value,
               ROUND(AVG(value), 6) AS avg_value
        FROM events GROUP BY 1, 2
    """,
)
def rollup_cascade_weekly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The summary-table cascade that powers dashboards at 100 TB:
    weekly stats are derived from the DAILY rollup's partials — (sum,
    count) per day, the reaggregatable form; an avg column would be
    un-mergeable — so the raw fact table is scanned once for the finest
    grain and every coarser grain reduces |days| rows, not |events|.
    Same associativity story as hll_merge_weekly_users but for plain
    moments; the oracle aggregates RAW events directly, certifying that
    the cascade is exact, not an approximation. Both engines truncate
    weeks to Monday (Spark date_trunc == DuckDB DATE_TRUNC)."""
    ev = load_table(spark, "events", sf_dir)
    daily = ev.groupBy(
        F.to_date("ts").alias("date"), "event_type"
    ).agg(
        F.count(F.lit(1)).alias("c"),
        F.sum("value").alias("s"),
    )
    return (
        daily.groupBy(
            F.date_trunc("week", F.col("date")).cast("date").alias("week"), "event_type"
        )
        .agg(F.sum("c").alias("n_events"), F.sum("s").alias("sv"))
        .select(
            "week",
            "event_type",
            "n_events",
            F.round(F.col("sv"), 4).alias("total_value"),
            F.round(F.col("sv") / F.col("n_events"), 6).alias("avg_value"),
        )
    )


@query(
    "association_rules_lift",
    tier="EXT analytics (association rules over basket pairs: support/confidence/lift)",
    oracle="""
        WITH li AS (
            SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
        ),
        tot AS (SELECT COUNT(DISTINCT l_orderkey) AS n FROM li),
        parts AS (SELECT l_partkey, COUNT(*) AS n_p FROM li GROUP BY l_partkey),
        pairs AS (
            SELECT a.l_partkey AS part_a, b.l_partkey AS part_b, COUNT(*) AS n_ab
            FROM li a JOIN li b
              ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
            GROUP BY part_a, part_b
        ),
        top AS (
            SELECT part_a, part_b, n_ab FROM pairs
            ORDER BY n_ab DESC, part_a ASC, part_b ASC LIMIT 20
        )
        SELECT t.part_a, t.part_b,
               CAST(t.n_ab AS BIGINT) AS n_ab,
               CAST(pa.n_p AS BIGINT) AS n_a,
               CAST(pb.n_p AS BIGINT) AS n_b,
               CAST(tot.n AS BIGINT) AS n_orders,
               ((t.n_ab * 1000000) // tot.n) / 1000000.0 AS support,
               ((t.n_ab * 1000000) // pa.n_p) / 1000000.0 AS conf_a_to_b,
               ((t.n_ab * 1000000) // pb.n_p) / 1000000.0 AS conf_b_to_a,
               (((t.n_ab * 1000000) // pa.n_p) * tot.n // pb.n_p) / 1000000.0 AS lift
        FROM top t
        JOIN parts pa ON t.part_a = pa.l_partkey
        JOIN parts pb ON t.part_b = pb.l_partkey
        CROSS JOIN tot
        ORDER BY n_ab DESC, part_a ASC, part_b ASC
    """,
)
def association_rules_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Association-rule mining over the basket pairs: for the top-20
    co-occurring part pairs, both directed rules' confidence plus
    support and lift — the step after market_basket_pairs that turns a
    co-count into a recommendation decision (lift > 1 = genuinely
    associated, not just individually popular).

    Cross-engine: every ratio is an exact-integer floor division
    scaled to 6dp (Spark ``div`` == DuckDB ``//`` — no float quotient
    ever forms, so there is no .5-boundary trap at all).

    Scale (100 TB): the pair counts reuse the bounded per-order
    fan-out plan (never quadratic in the table); singleton part counts
    are one partial-aggregated pass over the SAME distinct frame
    (localCheckpoint'd, read once); the metric joins attach part
    counts to 20 rows — the tiny side broadcasts, the part-counts
    table is never shuffled twice."""
    # r17 opt (guide §2.4, same rewrite as market_basket_pairs): one
    # key-only repartition + groupBy builds each order's sorted distinct
    # part set (collect_set == the old distinct, so tot/parts/pairs all
    # derive from this ONE shuffled frame); the p1<p2 pairs expand in
    # place instead of a self-join that shuffled the distinct frame twice.
    order_sets = (
        load_table(spark, "lineitem", sf_dir)
        .select("l_orderkey", "l_partkey")
        .repartition("l_orderkey")
        .groupBy("l_orderkey")
        .agg(F.sort_array(F.collect_set("l_partkey")).alias("ps"))
        .localCheckpoint(eager=False)  # consumed by tot/parts/pairs
    )
    tot = order_sets.agg(F.count(F.lit(1)).alias("n"))
    parts = (
        order_sets.select(F.explode("ps").alias("l_partkey"))
        .groupBy("l_partkey")
        .agg(F.count(F.lit(1)).alias("n_p"))
    )
    pair_structs = sorted_pair_structs("ps", "part_a", "part_b")
    top = (
        order_sets.filter(F.size("ps") > 1)
        .select(F.explode(pair_structs).alias("p"))
        .select("p.part_a", "p.part_b")
        .groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).alias("n_ab"))
        .orderBy(F.col("n_ab").desc(), F.col("part_a").asc(), F.col("part_b").asc())
        .limit(20)
    )
    f6 = lambda num, den: (F.expr(f"({num}) div ({den})") / 1000000.0)  # noqa: E731
    return (
        F.broadcast(top)
        .join(parts.select(F.col("l_partkey").alias("part_a"), F.col("n_p").alias("n_a")), "part_a")
        .join(parts.select(F.col("l_partkey").alias("part_b"), F.col("n_p").alias("n_b")), "part_b")
        .crossJoin(F.broadcast(tot))
        .select(
            "part_a",
            "part_b",
            F.col("n_ab").cast("long").alias("n_ab"),
            F.col("n_a").cast("long").alias("n_a"),
            F.col("n_b").cast("long").alias("n_b"),
            F.col("n").cast("long").alias("n_orders"),
            f6("n_ab * 1000000", "n").alias("support"),
            f6("n_ab * 1000000", "n_a").alias("conf_a_to_b"),
            f6("n_ab * 1000000", "n_b").alias("conf_b_to_a"),
            # lift = conf(a→b) * n / n_b, staged so every BIGINT
            # intermediate stays ≤ ~1e6·n: the naive n_ab*1e6*n
            # numerator overflows BIGINT once n_ab·n > 9.2e12 (ANSI
            # mode throws), i.e. long before 100 TB. Truncating conf
            # to ppm first costs ≤1 ppm, mirrored exactly in the
            # oracle (VERDICT r08/r10 advice item).
            f6("(n_ab * 1000000 div n_a) * n", "n_b").alias("lift"),
        )
        .orderBy(F.col("n_ab").desc(), F.col("part_a").asc(), F.col("part_b").asc())
    )
