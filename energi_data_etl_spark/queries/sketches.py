"""Round-8 probabilistic-filter tier: Bloom-filter join pruning and a
count-min frequency sketch, both built on the cross-engine md5 kernel
so every bit of the sketch is reproducible in DuckDB and the WHOLE
structure is hash-certified — the sketch-family recipe (exact values +
a mathematically-guaranteed verdict column) applied to the two filters
the catalog did not yet carry.

Why these matter at 100 TB: a Bloom filter is how you prune a fact-
table probe side BEFORE an expensive shuffle join when the build side's
key set is too big to broadcast as a plain set but compresses to a few
KB of bits (Spark's own runtime row-group filters are this trick,
opaque; here it is explicit and auditable — you see the fill factor
and the measured false-positive cost). Count-min is the bounded-memory
frequency table for unbounded key domains — the streaming-safe cousin
of Misra-Gries (quality.py) that also supports point queries.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..sources.tables import load_table
from .catalog import query

# Bloom geometry: m bits in 32-bit words, k md5-derived hash functions.
BLOOM_BITS = 65536
BLOOM_WORD = 32
BLOOM_K = 3

# Count-min geometry: d independent md5 rows x w buckets.
CMS_DEPTH = 3
CMS_WIDTH = 256


def _md5_pos_spark(key_expr: str, tag: str, mod: int):
    return F.expr(
        f"cast(conv(substring(md5(concat(cast({key_expr} as string),'{tag}')),1,8),16,10) "
        f"as bigint) % {mod}"
    )


def _md5_pos_sql(key_expr: str, tag: str, mod: int) -> str:
    return (
        f"CAST('0x'||SUBSTRING(MD5(CAST({key_expr} AS VARCHAR)||'{tag}'),1,8) AS BIGINT) % {mod}"
    )


@query(
    "bloom_filter_prejoin",
    tier="EXT scale (explicit Bloom-filter probe-side pruning; exact FP accounting)",
    oracle=f"""
        WITH build AS (
            SELECT DISTINCT o_custkey AS k FROM orders WHERE o_orderpriority = '1-URGENT'
        ),
        pos AS (
            SELECT k, {_md5_pos_sql('k', 'b0', BLOOM_BITS)} AS p FROM build
            UNION ALL
            SELECT k, {_md5_pos_sql('k', 'b1', BLOOM_BITS)} FROM build
            UNION ALL
            SELECT k, {_md5_pos_sql('k', 'b2', BLOOM_BITS)} FROM build
        ),
        words AS (
            SELECT p // {BLOOM_WORD} AS w,
                   BIT_OR(CAST(1 AS BIGINT) << CAST(p % {BLOOM_WORD} AS INT)) AS bits
            FROM pos GROUP BY p // {BLOOM_WORD}
        ),
        probe AS (SELECT c_custkey AS k FROM customer),
        probe_pos AS (
            SELECT k, {_md5_pos_sql('k', 'b0', BLOOM_BITS)} AS p FROM probe
            UNION ALL
            SELECT k, {_md5_pos_sql('k', 'b1', BLOOM_BITS)} FROM probe
            UNION ALL
            SELECT k, {_md5_pos_sql('k', 'b2', BLOOM_BITS)} FROM probe
        ),
        checked AS (
            SELECT pp.k,
                   SUM(CASE WHEN (w.bits & (CAST(1 AS BIGINT) << CAST(pp.p % {BLOOM_WORD} AS INT)))
                            <> 0 THEN 1 ELSE 0 END) AS hits
            FROM probe_pos pp LEFT JOIN words w ON pp.p // {BLOOM_WORD} = w.w
            GROUP BY pp.k
        ),
        verdicts AS (
            SELECT c.k,
                   c.hits = {BLOOM_K} AS pass,
                   b.k IS NOT NULL AS member
            FROM checked c LEFT JOIN build b ON c.k = b.k
        )
        SELECT CAST((SELECT COUNT(*) FROM build) AS BIGINT) AS n_build_keys,
               CAST((SELECT SUM(bit_count(bits)) FROM words) AS BIGINT) AS n_bits_set,
               CAST(COUNT(*) AS BIGINT) AS n_probe,
               CAST(SUM(CASE WHEN pass THEN 1 ELSE 0 END) AS BIGINT) AS n_pass,
               CAST(SUM(CASE WHEN member THEN 1 ELSE 0 END) AS BIGINT) AS n_true_members,
               CAST(SUM(CASE WHEN pass AND NOT member THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_false_positives,
               FLOOR(SUM(CASE WHEN pass AND NOT member THEN 1 ELSE 0 END) * 1000000
                     / NULLIF(SUM(CASE WHEN NOT member THEN 1 ELSE 0 END), 0)) / 1000000.0
                   AS fp_rate,
               BOOL_AND(NOT member OR pass) AS no_false_negatives
        FROM verdicts
    """,
)
def bloom_filter_prejoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit Bloom-filter join pruning with exact accounting: build a
    {BLOOM_BITS}-bit, k={BLOOM_K} filter over the urgent-orders customer
    keys, probe every customer through it, and emit the one-row audit —
    fill (bits set), pass counts, TRUE membership vs Bloom verdict, the
    measured false-positive rate, and `no_false_negatives`, which the
    Bloom construction guarantees (a member's bits are all set by its
    own inserts); a kernel bug that drops or misaddresses a bit flips
    it and fails the gate.

    Scale (100 TB): the filter is an AGGREGATE — the build side
    collapses to <= {BLOOM_BITS // BLOOM_WORD} (word, bits) rows via
    bit_or partials (never a driver-side set), broadcast to the probe
    scan; probing is a map-side broadcast join + bitwise AND, so the
    expensive equi-join downstream only ever sees survivors. This is
    Spark's runtime bloom-pruning made explicit, sized, and measurable
    (the fp_rate column is the knob-tuning feedback)."""
    build = (
        load_table(spark, "orders", sf_dir)
        .where(F.col("o_orderpriority") == "1-URGENT")
        .select(F.col("o_custkey").alias("k"))
        .distinct()
        .localCheckpoint(eager=False)  # consumed by words + membership join
    )
    pos = build.select(
        "k",
        F.explode(
            F.array(*[_md5_pos_spark("k", f"b{i}", BLOOM_BITS) for i in range(BLOOM_K)])
        ).alias("p"),
    )
    words = (
        pos.groupBy(F.expr(f"p div {BLOOM_WORD}").alias("w"))
        .agg(F.expr(f"bit_or(shiftleft(cast(1 as bigint), cast(p % {BLOOM_WORD} as int)))").alias("bits"))
        .localCheckpoint(eager=False)  # consumed by probe join + fill stat
    )
    probe = load_table(spark, "customer", sf_dir).select(F.col("c_custkey").alias("k"))
    probe_pos = probe.select(
        "k",
        F.explode(
            F.array(*[_md5_pos_spark("k", f"b{i}", BLOOM_BITS) for i in range(BLOOM_K)])
        ).alias("p"),
    )
    checked = (
        probe_pos.join(F.broadcast(words), F.expr(f"p div {BLOOM_WORD}") == F.col("w"), "left")
        .select(
            "k",
            F.when(
                F.col("bits")
                .bitwiseAND(F.expr(f"shiftleft(cast(1 as bigint), cast(p % {BLOOM_WORD} as int))"))
                != 0,
                F.lit(1),
            )
            .otherwise(F.lit(0))
            .alias("hit"),
        )
        .groupBy("k")
        .agg(F.sum("hit").alias("hits"))
    )
    verdicts = checked.join(
        F.broadcast(build.select(F.col("k").alias("bk"))), F.col("k") == F.col("bk"), "left"
    ).select(
        (F.col("hits") == BLOOM_K).alias("pass"),
        F.col("bk").isNotNull().alias("member"),
    )
    n_build = build.agg(F.count(F.lit(1)).cast("long").alias("v"))
    n_bits = words.agg(F.sum(F.expr("bit_count(bits)")).cast("long").alias("v"))
    fp = F.sum(F.when(F.col("pass") & ~F.col("member"), 1).otherwise(0))
    nonmember = F.sum(F.when(~F.col("member"), 1).otherwise(0))
    return (
        verdicts.agg(
            F.count(F.lit(1)).cast("long").alias("n_probe"),
            F.sum(F.when(F.col("pass"), 1).otherwise(0)).cast("long").alias("n_pass"),
            F.sum(F.when(F.col("member"), 1).otherwise(0)).cast("long").alias("n_true_members"),
            fp.cast("long").alias("n_false_positives"),
            (F.floor(fp * 1000000 / F.nullif(nonmember, F.lit(0))) / 1000000.0).alias("fp_rate"),
            F.min(F.when(F.col("member"), F.col("pass").cast("int")).otherwise(1)).cast(
                "boolean"
            ).alias("no_false_negatives"),
        )
        .crossJoin(F.broadcast(n_build.select(F.col("v").alias("n_build_keys"))))
        .crossJoin(F.broadcast(n_bits.select(F.col("v").alias("n_bits_set"))))
        .select(
            "n_build_keys",
            "n_bits_set",
            "n_probe",
            "n_pass",
            "n_true_members",
            "n_false_positives",
            "fp_rate",
            "no_false_negatives",
        )
    )


@query(
    "countmin_frequency_audit",
    tier="EXT sketch (count-min point queries vs exact counts; overestimate guarantee)",
    oracle=f"""
        WITH per_user AS (
            SELECT user_id, COUNT(*) AS exact_cnt FROM events GROUP BY user_id
        ),
        hashed AS (
            SELECT user_id, exact_cnt, r,
                   CASE r
                     WHEN 0 THEN {_md5_pos_sql('user_id', 'c0', CMS_WIDTH)}
                     WHEN 1 THEN {_md5_pos_sql('user_id', 'c1', CMS_WIDTH)}
                     ELSE {_md5_pos_sql('user_id', 'c2', CMS_WIDTH)}
                   END AS bkt
            FROM per_user CROSS JOIN (SELECT UNNEST([0, 1, 2]) AS r)
        ),
        cells AS (
            SELECT r, bkt, SUM(exact_cnt) AS total
            FROM hashed GROUP BY r, bkt
        ),
        est AS (
            SELECT h.user_id,
                   MAX(h.exact_cnt) AS exact_cnt,
                   MIN(c.total) AS cms_est
            FROM hashed h JOIN cells c ON h.r = c.r AND h.bkt = c.bkt
            GROUP BY h.user_id
        )
        SELECT user_id,
               CAST(exact_cnt AS BIGINT) AS exact_cnt,
               CAST(cms_est AS BIGINT) AS cms_est,
               CAST(cms_est - exact_cnt AS BIGINT) AS overcount,
               cms_est >= exact_cnt AS is_overestimate
        FROM est
        ORDER BY exact_cnt DESC, user_id ASC
        LIMIT 20
    """,
)
def countmin_frequency_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch (d={CMS_DEPTH} x w={CMS_WIDTH}) over per-user
    event counts, audited against the exact counts: for the top-20
    users the query emits the exact frequency, the CMS point estimate
    (min over the d hashed cells), the measured overcount, and the CMS
    guarantee `is_overestimate` (every cell containing a key also sums
    that key's own count, so the min can never undercount — a hashing
    or merge bug flips it and fails the gate).

    Scale (100 TB): the corpus collapses to per-key counts in ONE
    partial-aggregated pass; the sketch itself is d*w = {CMS_DEPTH * CMS_WIDTH}
    cells built FROM those partials (cells, not events, cross the
    shuffle — and in a real deployment each executor would sketch its
    partition and bit-merge, which is exactly what the groupBy's
    partial aggregation does here); point queries join the broadcast
    cell table. Unlike Misra-Gries (quality.py) the memory bound is
    independent of how many DISTINCT keys exist — this is the filter
    for unbounded key domains."""
    per_user = (
        load_table(spark, "events", sf_dir)
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("exact_cnt"))
    )
    hashed = per_user.select(
        "user_id",
        "exact_cnt",
        F.posexplode(
            F.array(*[_md5_pos_spark("user_id", f"c{r}", CMS_WIDTH) for r in range(CMS_DEPTH)])
        ).alias("r", "bkt"),
    ).localCheckpoint(eager=False)  # consumed by cells + point queries
    cells = hashed.groupBy("r", "bkt").agg(F.sum("exact_cnt").alias("total"))
    return (
        hashed.join(F.broadcast(cells), ["r", "bkt"])
        .groupBy("user_id")
        .agg(
            F.max("exact_cnt").cast("long").alias("exact_cnt"),
            F.min("total").cast("long").alias("cms_est"),
        )
        .select(
            "user_id",
            "exact_cnt",
            "cms_est",
            (F.col("cms_est") - F.col("exact_cnt")).cast("long").alias("overcount"),
            (F.col("cms_est") >= F.col("exact_cnt")).alias("is_overestimate"),
        )
        .orderBy(F.col("exact_cnt").desc(), F.col("user_id").asc())
        .limit(20)
    )


@query(
    "cms_join_cardinality",
    tier="EXT sketch (count-min inner-product join-size estimate vs exact F2; overestimate guarantee)",
    oracle=f"""
        WITH per_key AS (
            SELECT l_partkey AS k, COUNT(*) AS cnt FROM lineitem GROUP BY l_partkey
        ),
        hashed AS (
            SELECT k, cnt, r,
                   CASE r
                     WHEN 0 THEN {_md5_pos_sql('k', 'j0', CMS_WIDTH)}
                     WHEN 1 THEN {_md5_pos_sql('k', 'j1', CMS_WIDTH)}
                     ELSE {_md5_pos_sql('k', 'j2', CMS_WIDTH)}
                   END AS bkt
            FROM per_key CROSS JOIN (SELECT UNNEST([0, 1, 2]) AS r)
        ),
        cells AS (
            SELECT r, bkt, CAST(SUM(cnt) AS BIGINT) AS total
            FROM hashed GROUP BY r, bkt
        ),
        per_row AS (
            SELECT r, CAST(SUM(total * total) AS BIGINT) AS est
            FROM cells GROUP BY r
        ),
        exact AS (
            SELECT CAST(SUM(cnt) AS BIGINT) AS n_rows,
                   CAST(COUNT(*) AS BIGINT) AS n_keys,
                   CAST(SUM(cnt * cnt) AS BIGINT) AS exact_join_rows
            FROM per_key
        )
        SELECT e.n_rows, e.n_keys, e.exact_join_rows,
               CAST(MAX(CASE WHEN p.r = 0 THEN p.est END) AS BIGINT) AS est_d0,
               CAST(MAX(CASE WHEN p.r = 1 THEN p.est END) AS BIGINT) AS est_d1,
               CAST(MAX(CASE WHEN p.r = 2 THEN p.est END) AS BIGINT) AS est_d2,
               CAST(MIN(p.est) AS BIGINT) AS cms_est,
               CAST(MIN(p.est) - e.exact_join_rows AS BIGINT) AS overcount,
               MIN(p.est) >= e.exact_join_rows AS is_overestimate,
               CAST(FLOOR((MIN(p.est) - e.exact_join_rows) * 1000000
                          / e.exact_join_rows) AS BIGINT) AS overcount_ppm
        FROM exact e CROSS JOIN per_row p
        GROUP BY e.n_rows, e.n_keys, e.exact_join_rows
    """,
)
def cms_join_cardinality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-size estimation from count-min sketches — the optimizer
    statistic behind join reordering: the self-equi-join cardinality of
    ``lineitem`` on ``l_partkey`` is the second frequency moment
    F2 = sum(c(k)^2), and a CMS estimates it WITHOUT the key table as
    the inner product of the sketch with itself, min'd over the d
    rows: est_r = sum_bkt C_r[bkt]^2. Colliding keys only ADD
    non-negative cross terms, so every est_r >= F2 — the emitted
    `is_overestimate` is the construction guarantee (a bucketing or
    merge bug flips it), and the exact-vs-estimate columns measure the
    error a planner would actually eat (overcount_ppm).

    Scale (100 TB): per-key counts are ONE partial-aggregated pass over
    the column-pruned scan; everything downstream lives on <=
    {CMS_DEPTH}x{CMS_WIDTH} cells. In a real two-table deployment each
    side sketches independently (the groupBy partials ARE the per-
    executor sketch merge) and the estimate is a {CMS_DEPTH * CMS_WIDTH}-
    cell dot product on the driver — this query audits that machinery
    against the exact answer while both still fit."""
    per_key = (
        load_table(spark, "lineitem", sf_dir)
        .groupBy(F.col("l_partkey").alias("k"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .localCheckpoint(eager=False)  # consumed by the sketch AND the exact side
    )
    cells = (
        per_key.select(
            "cnt",
            F.posexplode(
                F.array(*[_md5_pos_spark("k", f"j{r}", CMS_WIDTH) for r in range(CMS_DEPTH)])
            ).alias("r", "bkt"),
        )
        .groupBy("r", "bkt")
        .agg(F.sum("cnt").cast("long").alias("total"))
    )
    per_row = cells.groupBy("r").agg(F.sum(F.col("total") * F.col("total")).cast("long").alias("est"))
    ests = per_row.agg(
        F.max(F.when(F.col("r") == 0, F.col("est"))).cast("long").alias("est_d0"),
        F.max(F.when(F.col("r") == 1, F.col("est"))).cast("long").alias("est_d1"),
        F.max(F.when(F.col("r") == 2, F.col("est"))).cast("long").alias("est_d2"),
        F.min("est").cast("long").alias("cms_est"),
    )
    exact = per_key.agg(
        F.sum("cnt").cast("long").alias("n_rows"),
        F.count(F.lit(1)).cast("long").alias("n_keys"),
        F.sum(F.col("cnt") * F.col("cnt")).cast("long").alias("exact_join_rows"),
    )
    return (
        exact.crossJoin(F.broadcast(ests))
        .select(
            "n_rows",
            "n_keys",
            "exact_join_rows",
            "est_d0",
            "est_d1",
            "est_d2",
            "cms_est",
            (F.col("cms_est") - F.col("exact_join_rows")).cast("long").alias("overcount"),
            (F.col("cms_est") >= F.col("exact_join_rows")).alias("is_overestimate"),
            F.floor(
                (F.col("cms_est") - F.col("exact_join_rows")) * 1000000 / F.col("exact_join_rows")
            )
            .cast("long")
            .alias("overcount_ppm"),
        )
    )
