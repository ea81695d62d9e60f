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

    _swap_dirs(staging, path)
    return n


def _swap_dirs(staging: str, path: str) -> None:
    """Atomic-on-POSIX table swap: rename current aside, promote
    staging, drop the old generation."""
    backup = f"{path}.__old_{uuid.uuid4().hex[:8]}"
    if os.path.exists(path):
        os.rename(path, backup)
    os.rename(staging, path)
    if os.path.exists(backup):
        shutil.rmtree(backup)


def scd2_merge(
    spark: SparkSession,
    incoming: DataFrame,
    path: str,
    keys: Sequence[str],
    tracked: Sequence[str],
    batch_ts,
) -> int:
    """Slowly-changing-dimension **Type 2** merge: instead of
    overwriting changed attributes (:func:`merge_parquet`'s Type-1
    semantics), history is preserved — the previously current row is
    CLOSED (``valid_to`` = ``batch_ts``, ``is_current`` = false) and a
    new current row opens at ``batch_ts``. The standard warehouse
    dimension-history pattern (Kimball SCD2), as one declarative plan:

    - change detection = null-safe inequality (``<=>`` negated) over
      ``tracked``, so NULL→value and value→NULL both count as changes;
    - unchanged keys and already-closed history pass through UNTOUCHED;
    - brand-new keys open their first row at ``batch_ts``.

    One shuffle (the key join of current-open rows against the batch);
    history rows never join anything. Same staging-swap write protocol
    as :func:`merge_parquet`. Returns the post-merge row count.

    ``incoming`` carries (keys + tracked); ``batch_ts`` is the
    effective timestamp (a literal or Column). The table schema is
    keys + tracked + (valid_from, valid_to, is_current).
    """
    from pyspark.sql import functions as F

    ts = batch_ts if hasattr(batch_ts, "_jc") else F.lit(batch_ts)
    inc = incoming.select(*keys, *tracked)
    if os.path.exists(path):
        current = spark.read.parquet(path)
        open_rows = current.filter(F.col("is_current"))
        closed_rows = current.filter(~F.col("is_current"))
        changed = F.lit(False)
        for c in tracked:
            changed = changed | ~F.col(f"__cur.{c}").eqNullSafe(F.col(f"__inc.{c}"))
        # full-outer on the keys: one side only ⇒ new key (open) or
        # absent from batch (pass through); both ⇒ close+reopen iff
        # changed. Presence can't be read off nullable attrs, so each
        # side carries a non-null literal tag.
        j = (
            open_rows.withColumn("__has_cur", F.lit(True)).alias("__cur")
            .join(
                inc.withColumn("__has_inc", F.lit(True)).alias("__inc"),
                list(keys),
                "full_outer",
            )
        )
        keep_open = j.filter(
            F.col("__has_cur").isNotNull()
            & (F.col("__has_inc").isNull() | ~changed)
        ).select(
            *keys, *[F.col(f"__cur.{c}").alias(c) for c in tracked],
            "valid_from", "valid_to", "is_current",
        )
        closed_now = j.filter(
            F.col("__has_cur").isNotNull() & F.col("__has_inc").isNotNull() & changed
        ).select(
            *keys, *[F.col(f"__cur.{c}").alias(c) for c in tracked],
            "valid_from", ts.alias("valid_to"), F.lit(False).alias("is_current"),
        )
        opened_now = j.filter(
            F.col("__has_inc").isNotNull()
            & (F.col("__has_cur").isNull() | changed)
        ).select(
            *keys, *[F.col(f"__inc.{c}").alias(c) for c in tracked],
            ts.alias("valid_from"),
            F.lit(None).cast(ts_type(ts, spark)).alias("valid_to"),
            F.lit(True).alias("is_current"),
        )
        merged = closed_rows.unionByName(keep_open).unionByName(
            closed_now
        ).unionByName(opened_now)
    else:
        merged = inc.select(
            *keys, *tracked,
            ts.alias("valid_from"),
            F.lit(None).cast(ts_type(ts, spark)).alias("valid_to"),
            F.lit(True).alias("is_current"),
        )

    staging = f"{path}.__staging_{uuid.uuid4().hex[:8]}"
    merged.write.mode("overwrite").parquet(staging)
    n = spark.read.parquet(staging).count()
    _swap_dirs(staging, path)
    return n


def ts_type(ts, spark: SparkSession) -> str:
    """DDL type of the effective-timestamp expression, so the open
    rows' null valid_to matches valid_from's type exactly."""
    return spark.range(1).select(ts.alias("t")).schema[0].dataType.simpleString()
