"""energi_data_etl_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the query and data-processing
capabilities of the reference repo Saaliis/Energi-Data-ETL (a scheduled
batch ETL over Swedish hourly electricity prices: see
/root/reference/scripts/energy_etl.py), generalized into a full analytics
engine: relational operators, joins, window functions, incremental /
streaming ingestion, and LLM-data-pipeline operators (dedup, similarity
search, text analysis, multimodal columns) — all designed for a
multi-executor cluster at 100 TB scale, expressed declaratively through
the DataFrame API so Catalyst/Tungsten pick the physical strategy.

Layout:
    session     SparkSession builder with engine defaults
    sources     table loaders, HTTP-JSON ingest, sinks
    operators   relational / join / window / dedup / similarity / text /
                multimodal operator library
    functions   scalar & vector expression helpers (JVM-side)
    plans       plan-inspection utilities (pushdown / broadcast asserts)
    streaming   watermark manager + Structured Streaming operators
    pipeline    the energy daily-average flagship pipeline
    queries     the declared query catalog (drives __spark_entry__ and bench)
"""

__version__ = "0.1.0"
