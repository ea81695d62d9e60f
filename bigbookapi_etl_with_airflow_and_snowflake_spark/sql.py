"""SQL facade: the corpus as named views + free-form Spark SQL.

The engine's queries are DataFrame-first, but every capability is
equally reachable through ``spark.sql`` once the corpus tables are
registered — same Catalyst plans, same optimizations. This is the entry
point for users who bring SQL instead of Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .sources.files import read_table

CORPUS_TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def register_corpus(spark: SparkSession, sf_dir: str) -> None:
    """Register every corpus table as a temp view (ns-timestamp
    normalization and scan-parallelism floors included — views carry the
    same normalized lineage the DataFrame API uses)."""
    for name in CORPUS_TABLES:
        read_table(spark, sf_dir, name).createOrReplaceTempView(name)


def sql(spark: SparkSession, query: str) -> DataFrame:
    """Run SQL against the registered corpus."""
    return spark.sql(query)
