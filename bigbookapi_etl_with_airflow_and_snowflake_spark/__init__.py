"""PySpark-native analytics engine with the query and data-processing
capabilities of the reference ETL system (BigbookAPI → Postgres →
Snowflake, plus HuggingFace-models upsert), re-expressed Spark-first.

Layout
------
- ``session``      — SparkSession factory tuned for local[N] and cluster use
- ``schemas``      — declared StructType schemas (no inference in prod paths)
- ``operators``    — dataflow operators (transforms, dedup, similarity, text,
                     topk, multimodal) as composable DataFrame functions
- ``sources``      — REST / JSON / Parquet / JDBC / HuggingFace sources
- ``sinks``        — Parquet / JSON / JDBC (append + upsert) / Snowflake sinks
- ``plans``        — the three reference pipelines as single Spark lineages
- ``streaming``    — Structured Streaming operators over event streams
- ``queries``      — driver-facing registry: named queries + DuckDB oracle SQL
"""

__version__ = "0.1.0"
