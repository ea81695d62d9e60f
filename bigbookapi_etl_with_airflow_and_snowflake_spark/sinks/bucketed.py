"""Bucketed tables — shuffle-free co-located joins (100 TB posture).

A join between two tables bucketed by the join key into the same bucket
count needs NO exchange: rows with equal keys are already in matching
buckets, so the sort-merge join reads bucket i of both sides directly.
For a fact table joined repeatedly on the same key (orders⋈lineitem on
orderkey every day), paying one bucketed write amortizes the shuffle
out of every subsequent join.

Bucketing requires the table catalog (``saveAsTable``): bucket metadata
lives in the metastore, not the parquet footer.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_by: Sequence[str],
    num_buckets: int,
    path: str | None = None,
    sort_by: Sequence[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as a bucketed (optionally sorted) catalog table.

    ``sort_by`` inside buckets lets the sort-merge join skip its sort
    too — the join becomes a pure linear merge of pre-sorted buckets.
    """
    writer = df.write.mode(mode).bucketBy(num_buckets, *bucket_by)
    if sort_by:
        writer = writer.sortBy(*sort_by)
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table (bucket metadata comes from the catalog)."""
    return spark.table(table)
