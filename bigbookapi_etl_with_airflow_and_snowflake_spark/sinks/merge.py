"""Idempotent key-based merge into a parquet table.

The reference's P1/P2 sinks are append-only — every rerun duplicates
every row (reference dags/bigbookapi.py:163-177; SURVEY.md §3.1 note).
This sink is the engine's default replacement: MERGE semantics (new
rows win by key under an explicit recency ordering) over a plain
parquet directory, so any pipeline built on it is safely re-runnable.

Write protocol: read current ∪ incoming → keep-first per key → write to
a fresh staging directory → swap directories. The swap is atomic on a
POSIX filesystem (rename); on object stores, point readers at a
manifest/table format (Delta/Iceberg) instead — the merge lineage here
is identical, only the commit differs.

Scale: one shuffle on the merge keys (the keep-first window), same cost
profile as any dedup. For very large tables partition the path by a
stable column and merge only the partitions the increment touches.
"""

from __future__ import annotations

import os
import shutil
import uuid
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession

from ..operators.dedup import keep_first_dedup


def merge_parquet(
    spark: SparkSession,
    incoming: DataFrame,
    path: str,
    keys: Sequence[str],
    order_by: Sequence = (),
) -> int:
    """Merge ``incoming`` into the parquet table at ``path`` by ``keys``.

    ``order_by`` picks the surviving row per key (default: incoming
    beats existing via a source-rank column, ties by nothing further —
    pass explicit recency columns for deterministic history merges).
    Returns the post-merge row count.
    """
    from pyspark.sql import functions as F

    if os.path.exists(path):
        current = spark.read.parquet(path).withColumn("__src", F.lit(1))
    else:
        current = None
    inc = incoming.withColumn("__src", F.lit(0))
    unioned = inc if current is None else inc.unionByName(current)

    order = list(order_by) + [F.asc("__src")]  # incoming (0) wins ties
    merged = keep_first_dedup(unioned, list(keys), order).drop("__src")

    staging = f"{path}.__staging_{uuid.uuid4().hex[:8]}"
    merged.write.mode("overwrite").parquet(staging)
    n = spark.read.parquet(staging).count()

    backup = f"{path}.__old_{uuid.uuid4().hex[:8]}"
    if os.path.exists(path):
        os.rename(path, backup)
    os.rename(staging, path)
    if os.path.exists(backup):
        shutil.rmtree(backup)
    return n
