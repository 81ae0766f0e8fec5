"""Scalar-function surface (SURVEY.md §2.8 F1-F9): date/time, string,
JSON, array, map, casts. All JVM-side built-ins — no Python UDFs in any
of these paths (whole-stage codegen keeps them vectorized at scale).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..sources.tables import load_table
from .catalog import query


@query(
    "date_parts",
    tier="F1+F4 (year/quarter/month/day/dow extraction)",
    oracle="""
        SELECT YEAR(o_orderdate)                 AS yr,
               QUARTER(o_orderdate)              AS qtr,
               MONTH(o_orderdate)                AS mo,
               DAYOFWEEK(o_orderdate)            AS dow,
               COUNT(*)                          AS n,
               ROUND(SUM(o_totalprice), 2)       AS revenue
        FROM orders
        WHERE YEAR(o_orderdate) BETWEEN 1996 AND 1998
        GROUP BY 1, 2, 3, 4
    """,
)
def date_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar-part extraction (the Power BI month slicer, SURVEY P5/F4).
    DuckDB dayofweek is 0=Sunday..6; Spark's is 1=Sunday..7 → shift by 1."""
    o = load_table(spark, "orders", sf_dir)
    return (
        o.filter(F.year("o_orderdate").between(1996, 1998))
        .groupBy(
            F.year("o_orderdate").cast("long").alias("yr"),
            F.quarter("o_orderdate").cast("long").alias("qtr"),
            F.month("o_orderdate").cast("long").alias("mo"),
            (F.dayofweek("o_orderdate") - 1).cast("long").alias("dow"),
        )
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("o_totalprice"), 2).alias("revenue"))
    )


@query(
    "date_arithmetic",
    tier="F1 (date add/diff/trunc/last_day)",
    oracle="""
        SELECT o_orderkey,
               CAST(o_orderdate AS DATE) + 30                                   AS ship_by,
               CAST(DATE_TRUNC('month', o_orderdate) AS DATE)                   AS order_month,
               LAST_DAY(CAST(o_orderdate AS DATE))                              AS month_end,
               DATEDIFF('day', DATE '1995-01-01', CAST(o_orderdate AS DATE))    AS days_since_epoch
        FROM orders
        WHERE o_orderkey < 500
    """,
)
def date_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, "orders", sf_dir)
    od = F.to_date("o_orderdate")
    return o.filter(F.col("o_orderkey") < 500).select(
        "o_orderkey",
        F.date_add(od, 30).alias("ship_by"),
        F.trunc(od, "month").alias("order_month"),
        F.last_day(od).alias("month_end"),
        F.datediff(od, F.lit("1995-01-01").cast("date")).cast("long").alias("days_since_epoch"),
    )


@query(
    "string_surface",
    tier="F2 (string functions: case, substr, pad, concat, regexp, split)",
    oracle="""
        SELECT p_partkey,
               UPPER(p_name)                                    AS name_upper,
               LENGTH(p_name)                                   AS name_len,
               SUBSTRING(p_name, 1, 5)                          AS name_pfx,
               CONCAT_WS('|', p_brand, p_type)                  AS brand_type,
               LPAD(CAST(p_size AS VARCHAR), 4, '0')            AS size_padded,
               REPLACE(p_type, ' ', '_')                        AS type_snake,
               CAST(REGEXP_EXTRACT(p_brand, '([0-9]+)', 1) AS INT) AS brand_num,
               STRING_SPLIT(p_name, ' ')[1]                     AS first_word
        FROM part
        WHERE p_partkey < 300
    """,
)
def string_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String expression surface incl. the reference's zero-padded URL
    formatting (energy_etl.py:19,56 → lpad/concat_ws/format)."""
    p = load_table(spark, "part", sf_dir)
    return p.filter(F.col("p_partkey") < 300).select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.length("p_name").cast("long").alias("name_len"),
        F.substring("p_name", 1, 5).alias("name_pfx"),
        F.concat_ws("|", "p_brand", "p_type").alias("brand_type"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_padded"),
        F.replace(F.col("p_type"), F.lit(" "), F.lit("_")).alias("type_snake"),
        F.regexp_extract("p_brand", r"([0-9]+)", 1).cast("int").alias("brand_num"),
        F.split("p_name", " ").getItem(0).alias("first_word"),
    )


@query(
    "json_extraction",
    tier="F5 (JSON parse/extract — events.props)",
    oracle="""
        SELECT event_type,
               COUNT(*)                                               AS n,
               CAST(SUM(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT) AS sum_k,
               ROUND(AVG(CAST(json_extract_string(props, '$.k') AS INT)), 6) AS avg_k,
               COUNT(DISTINCT CAST(json_extract_string(props, '$.k') AS INT)) AS distinct_k
        FROM events
        GROUP BY event_type
    """,
)
def json_extraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-in-string extraction (the reference parses API JSON,
    energy_etl.py:67-69; fixture: events.props like '{"k": 87}')."""
    ev = load_table(spark, "events", sf_dir)
    # project k ONCE (a single JSON parse per row), then aggregate —
    # aggregating over the raw expression would re-parse per aggregate
    k = F.get_json_object("props", "$.k").cast("int").alias("k")
    return (
        ev.select("event_type", k)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("k").alias("sum_k"),
            F.round(F.avg("k"), 6).alias("avg_k"),
            F.countDistinct("k").alias("distinct_k"),
        )
    )


@query(
    "cast_matrix",
    tier="F9 (cast surface: int↔string, double→decimal, bool→int, date→string)",
    oracle="""
        SELECT o_orderkey,
               CAST(o_orderkey AS VARCHAR)                   AS key_str,
               CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS DOUBLE) AS price_dec2,
               CAST(FLOOR(o_totalprice) AS BIGINT)           AS price_floor,
               CAST(CEIL(o_totalprice) AS BIGINT)            AS price_ceil,
               CAST(o_totalprice > 200000 AS INT)            AS is_big,
               CAST(CAST(o_orderdate AS DATE) AS VARCHAR)    AS date_str
        FROM orders
        WHERE o_orderkey < 400
    """,
)
def cast_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deliberate-cast matrix. double→int is avoided cross-engine (Spark
    truncates, DuckDB rounds) — FLOOR/CEIL first, then cast."""
    o = load_table(spark, "orders", sf_dir)
    return o.filter(F.col("o_orderkey") < 400).select(
        "o_orderkey",
        F.col("o_orderkey").cast("string").alias("key_str"),
        F.col("o_totalprice").cast("decimal(12,2)").cast("double").alias("price_dec2"),
        F.floor("o_totalprice").cast("bigint").alias("price_floor"),
        F.ceil("o_totalprice").cast("bigint").alias("price_ceil"),
        (F.col("o_totalprice") > 200000).cast("int").alias("is_big"),
        F.to_date("o_orderdate").cast("string").alias("date_str"),
    )


@query(
    "array_surface",
    tier="F6+L5 (array size/element/slice/transform/aggregate on embeddings)",
    oracle="""
        SELECT vec_id,
               label,
               LEN(embedding)                                                        AS dim,
               ROUND(CAST(embedding[1] AS DOUBLE), 6)                                AS first_val,
               ROUND(LIST_AGGREGATE(LIST_TRANSFORM(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum'), 6) AS sq_norm,
               ARRAY_TO_STRING(LIST_TRANSFORM(embedding[1:3], x -> PRINTF('%.4f', ROUND(CAST(x AS DOUBLE), 4))), ',') AS head3
        FROM embeddings
        WHERE vec_id < 50
    """,
)
def array_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array functions over the embedding column — the
    vector column type of the LLM tier (SURVEY L5), all JVM-side.

    The array-valued `head3` column is emitted as a printf-formatted
    comma-joined STRING on both engines: raw array columns are not
    hashable/sortable by the driver's canonicalizer (CORRECTNESS_r01
    err). Values are ROUNDed to 4dp BEFORE '%.4f' on both sides —
    formatter tie-breaking differs (Java HALF_UP vs fmt-lib half-even),
    so exact decimal ties like 0.03125 would otherwise print 0.0313 vs
    0.0312; both engines' ROUND is half-away-from-zero, and a pre-rounded
    value is never a formatter tie."""
    e = load_table(spark, "embeddings", sf_dir)
    xd = lambda x: x.cast("double")  # noqa: E731 — float32→double before arithmetic, both engines
    return e.filter(F.col("vec_id") < 50).select(
        "vec_id",
        "label",
        F.size("embedding").cast("long").alias("dim"),
        F.round(F.element_at("embedding", 1).cast("double"), 6).alias("first_val"),
        F.round(F.aggregate("embedding", F.lit(0.0), lambda acc, x: acc + xd(x) * xd(x)), 6).alias("sq_norm"),
        F.concat_ws(
            ",", F.transform(F.slice("embedding", 1, 3), lambda x: F.format_string("%.4f", F.round(xd(x), 4)))
        ).alias("head3"),
    )


@query(
    "explode_word_counts",
    tier="F6 (explode/unnest) + L4 (token analysis)",
    oracle="""
        SELECT word, COUNT(*) AS n
        FROM (SELECT UNNEST(STRING_SPLIT(text, ' ')) AS word FROM documents) t
        WHERE LENGTH(word) > 0
        GROUP BY word
        ORDER BY n DESC, word ASC
        LIMIT 50
    """,
)
def explode_word_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lateral array expansion → word frequencies: explode is the engine's
    UNNEST; generation (split) stays in codegen, only the agg shuffles."""
    d = load_table(spark, "documents", sf_dir)
    return (
        d.select(F.explode(F.split("text", " ")).alias("word"))
        .filter(F.length("word") > 0)
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("word").asc())
        .limit(50)
    )


@query(
    "map_functions",
    tier="F5+F7 (from_json to map, map_keys/map_values)",
    oracle="""
        SELECT event_id,
               ARRAY_TO_STRING(json_keys(props), ',')                  AS ks,
               CAST(CAST(json_extract_string(props, '$.k') AS INT) AS VARCHAR) AS vs
        FROM events
        WHERE event_id < 200
    """,
)
def map_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """props JSON → MapType, then map_keys/map_values (SURVEY F7). The
    DuckDB twin reads the same structure via json_keys/extract.

    Key/value arrays are emitted comma-joined as STRING columns — raw
    array/map columns break the driver canonicalizer's sort+hash
    (CORRECTNESS_r01 err); the string encoding is lossless here. The
    concat_ws calls are guarded on a non-NULL map: concat_ws alone maps
    NULL→'' while DuckDB's ARRAY_TO_STRING maps NULL→NULL, so an
    unparseable/NULL props row would silently mismatch."""
    ev = load_table(spark, "events", sf_dir)
    m = F.from_json("props", "map<string,int>")
    return ev.filter(F.col("event_id") < 200).select(
        "event_id",
        F.when(m.isNotNull(), F.concat_ws(",", F.map_keys(m))).alias("ks"),
        F.when(m.isNotNull(), F.concat_ws(",", F.transform(F.map_values(m), lambda v: v.cast("string")))).alias("vs"),
    )


@query(
    "calendar_coverage",
    tier="F1 (sequence+explode calendar generation ⋈ facts — gap detection)",
    oracle="""
        WITH cal AS (
            SELECT CAST(UNNEST(GENERATE_SERIES(DATE '2024-01-01', DATE '2024-02-10', INTERVAL 1 DAY)) AS DATE) AS day
        ), daily AS (
            SELECT CAST(ts AS DATE) AS day, COUNT(*) AS n FROM events GROUP BY 1
        )
        SELECT cal.day,
               CAST(COALESCE(daily.n, 0) AS BIGINT) AS n_events,
               COALESCE(daily.n, 0) = 0 AS is_gap
        FROM cal LEFT JOIN daily USING (day)
    """,
)
def calendar_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Generated calendar (sequence→explode, the reference's backfill
    day-loop energy_etl.py:54-79 as data) LEFT JOINed to daily counts —
    the gap-detection query every incremental pipeline needs (the
    events fixture ends Jan 30, so February days report as gaps)."""
    ev = load_table(spark, "events", sf_dir)
    cal = spark.range(1).select(
        F.explode(
            F.sequence(
                F.lit("2024-01-01").cast("date"), F.lit("2024-02-10").cast("date"), F.expr("interval 1 day")
            )
        ).alias("day")
    )
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(F.count(F.lit(1)).alias("n"))
    return cal.join(daily, "day", "left").select(
        "day",
        F.coalesce("n", F.lit(0)).cast("long").alias("n_events"),
        (F.coalesce("n", F.lit(0)) == 0).alias("is_gap"),
    )


@query(
    "format_strings",
    tier="F2 (format_string — the reference's URL builder)",
    oracle="""
        SELECT n_nationkey,
               PRINTF('%02d/%s_%d.json', n_regionkey, n_name, n_nationkey) AS url_path
        FROM nation
    """,
)
def format_strings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zero-padded path construction — the reference builds per-zone-day
    URLs with '{:02d}' formatting (energy_etl.py:19,56)."""
    n = load_table(spark, "nation", sf_dir)
    return n.select(
        "n_nationkey",
        F.format_string("%02d/%s_%d.json", "n_regionkey", "n_name", "n_nationkey").alias("url_path"),
    )


@query(
    "variant_shredding_agg",
    tier="F5 (VARIANT semi-structured shredding: parse_json -> typed variant_get)",
    oracle="""
        SELECT o_orderstatus AS status, o_orderpriority AS priority,
               CAST(COUNT(*) AS BIGINT)             AS n,
               CAST(SUM(o_orderkey) AS BIGINT)      AS sum_keys,
               ROUND(CAST(SUM(o_totalprice) AS DOUBLE), 2) AS total_price
        FROM orders
        GROUP BY 1, 2
    """,
)
def variant_shredding_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4's VARIANT is the semi-structured path that scales:
    parse once into a binary columnar encoding, then typed
    `variant_get` extractions that Catalyst can shred and prune —
    versus get_json_object re-parsing the string per expression
    (json_extraction's documented hazard). Exercised as a full
    roundtrip so values are certifiable from first principles: orders
    rows are serialized to a NESTED JSON payload, parsed to VARIANT,
    shredded back out with typed paths (bigint/string/double, one
    nested level), and aggregated; the oracle computes the identical
    aggregate straight from the raw columns, so any loss in the
    serialize->parse->extract chain (dropped rows, mistyped paths,
    double roundtrip drift) breaks the hash."""
    o = load_table(spark, "orders", sf_dir)
    payload = F.to_json(
        F.struct(
            F.col("o_orderkey").alias("k"),
            F.col("o_orderstatus").alias("s"),
            F.struct(
                F.col("o_totalprice").alias("p"), F.col("o_orderpriority").alias("pr")
            ).alias("nest"),
        )
    )
    shred = o.select(F.parse_json(payload).alias("v")).select(
        F.variant_get("v", "$.s", "string").alias("status"),
        F.variant_get("v", "$.nest.pr", "string").alias("priority"),
        F.variant_get("v", "$.k", "bigint").alias("k"),
        F.variant_get("v", "$.nest.p", "double").alias("p"),
    )
    return shred.groupBy("status", "priority").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("k").alias("sum_keys"),
        F.round(F.sum("p"), 2).alias("total_price"),
    )


@query(
    "collation_ci_grouping",
    tier="F2-ext (collation-aware comparison: case-insensitive grouping semantics)",
    oracle="""
        WITH variants AS (
            SELECT CASE WHEN c_custkey % 2 = 0 THEN LOWER(c_mktsegment)
                        ELSE c_mktsegment END AS s
            FROM customer
        )
        SELECT MIN(s)                          AS segment,
               CAST(COUNT(*) AS BIGINT)        AS n,
               CAST(COUNT(DISTINCT s) AS BIGINT) AS n_raw_variants
        FROM variants
        GROUP BY s COLLATE NOCASE
    """,
)
def collation_ci_grouping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 collations push comparison semantics INTO the type
    system: `collate(s, 'UTF8_LCASE')` groups/joins case-insensitively
    in the JVM comparator itself — no LOWER() wrapper, so the optimizer
    still sees the raw column for pruning and stats, and the same
    spelling works for joins, ORDER BY, and DISTINCT. The fixture
    manufactures case drift deterministically (even keys lowered), the
    case-insensitive groups must merge the variants (n_raw_variants=2
    proves the group really spans both spellings), and the emitted
    representative is the binary MIN so both engines pick the same
    one (a collated group's 'first' value is engine-arbitrary —
    never emit it raw)."""
    c = load_table(spark, "customer", sf_dir)
    variants = c.select(
        F.when(F.col("c_custkey") % 2 == 0, F.lower("c_mktsegment"))
        .otherwise(F.col("c_mktsegment"))
        .alias("s")
    )
    return variants.groupBy(F.collate("s", "UTF8_LCASE").alias("__g")).agg(
        F.min("s").alias("segment"),
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("s").alias("n_raw_variants"),
    ).drop("__g")


@query(
    "pipe_syntax_surface",
    tier="F-surface (Spark 4 SQL pipe syntax: FROM ... |> WHERE |> AGGREGATE |> ORDER BY)",
    oracle="""
        SELECT o_orderpriority,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               ROUND(SUM(o_totalprice), 2) AS revenue,
               ROUND(AVG(o_totalprice), 4) AS avg_price
        FROM orders
        WHERE o_orderstatus = 'O' AND o_orderdate >= DATE '1996-01-01'
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
    """,
)
def pipe_syntax_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4's SQL pipe syntax (`|>` — probed working in this build):
    the linear FROM -> WHERE -> AGGREGATE -> ORDER BY chain compiles to
    exactly the plan the nested-SELECT form produces (same Catalyst
    tree, same pushdown — certified by the plain-SQL DuckDB oracle
    hashing identical values). Surface parity for users migrating
    pipelines written in the pipe dialect; the view is left registered
    because the returned plan is lazy (r07 rule)."""
    load_table(spark, "orders", sf_dir).createOrReplaceTempView("__pipe_orders")
    return spark.sql(
        """
        FROM __pipe_orders
        |> WHERE o_orderstatus = 'O' AND o_orderdate >= TIMESTAMP_NTZ '1996-01-01'
        |> AGGREGATE CAST(COUNT(*) AS BIGINT) AS n_orders,
                     ROUND(SUM(o_totalprice), 2) AS revenue,
                     ROUND(AVG(o_totalprice), 4) AS avg_price
           GROUP BY o_orderpriority
        |> ORDER BY o_orderpriority
        """
    )


@query(
    "xml_file_roundtrip",
    tier="S-tier (Spark 4 NATIVE XML file source: write -> read_any('xml') -> re-aggregate, value-lossless)",
    oracle="""
        SELECT CAST(DATE_TRUNC('day', ts) AS DATE) AS date,
               event_type,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(FLOOR(value * 100) AS BIGINT)) AS BIGINT) AS cents
        FROM events
        GROUP BY 1, 2
        ORDER BY 1, 2
    """,
)
def xml_file_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The XML FILE format (Spark 4 ships a native `format("xml")`
    source — distinct from the to_xml/from_xml expression surface
    certified by xml_roundtrip_extract): the daily rollup is written as
    XML documents and read back through `read_any(..., "xml")` with an
    explicit schema (the pipeline never infers), completing the
    multi-format IO matrix (parquet/orc/csv/json/xml). The payload is
    deliberately all-integer — counts and FLOOR(value*100) cents (exact
    IEEE multiply + floor on both engines, the r08 rule) — so the
    text round-trip is lossless by construction and the oracle can
    recompute straight from events: a value match proves the writer,
    the reader, the schema mapping AND the date/ISO-string round-trip.
    Scale: XML is an exchange format here, not a table format — full
    scan, no pushdown (read_any docstring); durable tables stay
    parquet."""
    from ..session import scratch_dir
    from ..sources.tables import read_any

    rolled = (
        load_table(spark, "events", sf_dir)
        .groupBy(
            F.to_date("ts").alias("date"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.floor(F.col("value") * 100)).alias("cents"),
        )
    )
    d = scratch_dir("xmlio_")
    (
        rolled.repartition(4)
        .write.format("xml")
        .option("rootTag", "days")
        .option("rowTag", "day")
        .mode("overwrite")
        .save(f"{d}/rollup_xml")
    )
    back = read_any(
        spark,
        f"{d}/rollup_xml",
        "xml",
        schema="date date, event_type string, n bigint, cents bigint",
        rowTag="day",
    )
    return back.orderBy("date", "event_type")


@query(
    "xml_roundtrip_extract",
    tier="F5-ext (XML functions: to_xml -> from_xml round-trip, value-certified)",
    oracle="""
        SELECT c_nationkey,
               CAST(COUNT(*) AS BIGINT) AS n_customers,
               CAST(SUM(c_custkey) AS BIGINT) AS key_sum,
               ROUND(SUM(c_acctbal), 2) AS acctbal_sum,
               TRUE AS roundtrip_ok
        FROM customer
        GROUP BY c_nationkey
        ORDER BY c_nationkey
    """,
)
def xml_roundtrip_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XML surface (Spark 4 `to_xml` / `from_xml`, probed working):
    serialize each customer row to XML, parse it back with an explicit
    schema, and aggregate the PARSED values per nation. The oracle
    aggregates the RAW columns — a hash match therefore certifies the
    XML round-trip is value-lossless (doubles included: to_xml emits
    shortest-roundtrip decimal strings), and `roundtrip_ok` pins the
    per-row field equality explicitly.

    Scale: both conversions are per-row codegen'd projections (no
    shuffle added); the rollup partial-aggregates as usual. The
    expensive mistake this query guards against — XML parsing with
    schema inference (schema_of_xml over the corpus) — is deliberately
    absent: the schema is declared, so no extra pass ever runs."""
    c = load_table(spark, "customer", sf_dir)
    parsed = c.select(
        "c_nationkey",
        "c_custkey",
        "c_acctbal",
        F.from_xml(
            F.to_xml(F.struct("c_custkey", "c_acctbal", "c_mktsegment")),
            "c_custkey BIGINT, c_acctbal DOUBLE, c_mktsegment STRING",
        ).alias("p"),
    )
    return (
        parsed.groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_customers"),
            F.sum("p.c_custkey").cast("long").alias("key_sum"),
            F.round(F.sum("p.c_acctbal"), 2).alias("acctbal_sum"),
            F.min(
                (F.col("p.c_custkey") == F.col("c_custkey"))
                & (F.col("p.c_acctbal") == F.col("c_acctbal"))
            ).alias("roundtrip_ok"),
        )
        .orderBy("c_nationkey")
    )


@query(
    "sql_sugar_surface",
    tier="F-surface (Spark 4 SQL sugar: SELECT * EXCEPT, GROUP BY ALL, ORDER BY ALL)",
    oracle="""
        SELECT o_orderstatus, o_orderpriority,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               ROUND(SUM(o_totalprice), 2) AS revenue
        FROM orders
        GROUP BY o_orderstatus, o_orderpriority
        ORDER BY o_orderstatus, o_orderpriority, n_orders, revenue
    """,
)
def sql_sugar_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Spark 4 SQL shorthand surface (each probed working in this
    build): `SELECT * EXCEPT (...)` prunes columns positionally,
    `GROUP BY ALL` infers the grouping keys from the non-aggregate
    select items, and `ORDER BY ALL` orders by every output column
    left-to-right. The inner star-EXCEPT projection feeds the sugared
    aggregate, and the explicit-SQL DuckDB oracle hashing identical
    values certifies the sugar desugars to exactly the classic query —
    surface parity for users migrating DuckDB/BigQuery-dialect SQL.

    Scale: sugar is parse-time only — the Catalyst tree is the same
    grouped aggregate (partial-agg, one shuffle) the explicit form
    plans; column pruning still reaches the scan because EXCEPT
    resolves before optimization."""
    load_table(spark, "orders", sf_dir).createOrReplaceTempView("__sugar_orders")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               ROUND(SUM(o_totalprice), 2) AS revenue
        FROM (SELECT * EXCEPT (o_orderkey, o_custkey, o_orderdate) FROM __sugar_orders)
        GROUP BY ALL
        ORDER BY ALL
        """
    )
