"""Hypertable-style incremental rollup (continuous aggregate).

A time-series table at 100 TB can't re-aggregate history every time a
dashboard wants hourly counts. The hypertable pattern: maintain a
materialized rollup keyed by (time bucket, dims) and fold each new
increment into it — work proportional to the INCREMENT, not history.

Correctness rests on decomposable aggregates: per-bucket partials
(count, sum, min, max) merge exactly, so
``rollup(history ∪ increment) == merge(rollup(history),
rollup(increment))`` — asserted by tests against the from-scratch
aggregation. The merge itself is the keyed parquet MERGE with
re-aggregation on key collision (an arriving bucket that already exists
combines with, not replaces, the stored row — late data within a bucket
is folded in exactly).

Scale: the stored rollup is bucket-keyed and tiny relative to raw data
(cardinality = buckets × dims); each refresh shuffles only the
increment's partials. Partition the rollup path by coarse time for
partition-pruned dashboard reads.
"""

from __future__ import annotations

import os
import shutil
import uuid
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# decomposable aggregates: value column → (partial, merge) builders
_MERGE_OPS = {
    "count": F.sum,  # partial counts merge by summing
    "sum": F.sum,
    "min": F.min,
    "max": F.max,
}


def rollup_increment(
    df: DataFrame,
    ts_col: str,
    bucket: str,
    keys: Sequence[str],
    aggs: Sequence[tuple[str, str, str]],
) -> DataFrame:
    """Aggregate one increment to (bucket, keys) partials.

    ``aggs``: (op, column, alias) with op ∈ count/sum/min/max.
    """
    for op, _, _ in aggs:
        if op not in _MERGE_OPS:
            raise ValueError(f"{op} is not decomposable")
    exprs = [
        (F.count(F.lit(1)) if op == "count" else getattr(F, op)(F.col(col))).alias(a)
        for op, col, a in aggs
    ]
    return (
        df.withColumn("__bucket", F.date_trunc(bucket, F.col(ts_col)))
        .groupBy("__bucket", *keys)
        .agg(*exprs)
        .withColumnRenamed("__bucket", "bucket_start")
    )


def refresh_rollup(
    spark: SparkSession,
    increment: DataFrame,
    rollup_path: str,
    ts_col: str,
    bucket: str,
    keys: Sequence[str],
    aggs: Sequence[tuple[str, str, str]],
) -> int:
    """Fold ``increment`` into the materialized rollup at
    ``rollup_path``; returns the rollup's row count. Colliding buckets
    merge partials (late rows within an existing bucket are added in,
    not dropped or double-counted on replay of DISTINCT increments)."""
    partial = rollup_increment(increment, ts_col, bucket, keys, aggs)
    if os.path.exists(rollup_path):
        current = spark.read.parquet(rollup_path)
        merged = (
            current.unionByName(partial)
            .groupBy("bucket_start", *keys)
            .agg(*[_MERGE_OPS[op](F.col(a)).alias(a) for op, _, a in aggs])
        )
    else:
        merged = partial

    staging = f"{rollup_path}.__staging_{uuid.uuid4().hex[:8]}"
    merged.write.mode("overwrite").parquet(staging)
    n = spark.read.parquet(staging).count()
    backup = f"{rollup_path}.__old_{uuid.uuid4().hex[:8]}"
    if os.path.exists(rollup_path):
        os.rename(rollup_path, backup)
    os.rename(staging, rollup_path)
    if os.path.exists(backup):
        shutil.rmtree(backup)
    return n
