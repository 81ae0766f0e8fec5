"""Analytics extensions: TF-IDF (SURVEY.md L4), pivot/unpivot
reshaping. All pure DataFrame ops with DuckDB oracles.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ..operators import text as X
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
