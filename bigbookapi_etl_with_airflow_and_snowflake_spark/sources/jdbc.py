"""JDBC source (S4) — the reference's `select * from books` full scan
(reference dags/db_to_snowflake.py:36-39), made partition-parallel.

The reference reads the whole table through one connection into one
pandas frame. Spark's JDBC source splits the scan into ``num_partitions``
range predicates on a numeric column — each executor opens its own
connection and reads a slice, so a 10⁹-row table arrives as parallel
streams instead of one. Filters written *before* a JDBC-backed scan are
pushed into the remote WHERE clause by Catalyst (predicate pushdown to
the database), and selecting columns prunes the remote SELECT list.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def jdbc_scan_options(
    url: str,
    table: str,
    driver: str,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int = 8,
    fetchsize: int = 10_000,
) -> dict[str, str]:
    """Options for a (parallel) JDBC scan. Without a partition column the
    scan is single-stream (reference behavior); with one, Spark issues
    ``num_partitions`` bounded range queries."""
    opts = {
        "url": url,
        "dbtable": table,
        "driver": driver,
        "fetchsize": str(fetchsize),
    }
    if partition_column is not None:
        if lower_bound is None or upper_bound is None:
            raise ValueError("partitioned scan needs lower_bound and upper_bound")
        opts.update(
            partitionColumn=partition_column,
            lowerBound=str(lower_bound),
            upperBound=str(upper_bound),
            numPartitions=str(num_partitions),
        )
    return opts


def read_jdbc_table(spark: SparkSession, **options: str) -> DataFrame:
    """S4 — ``spark.read.format("jdbc")`` with the assembled options."""
    return spark.read.format("jdbc").options(**options).load()
