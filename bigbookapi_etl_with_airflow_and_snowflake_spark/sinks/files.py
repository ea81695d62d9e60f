"""File sinks (K1 JSON raw zone, K2 Parquet) with scale discipline.

The reference writes single unpartitioned files (reference
dags/bigbookapi.py:100, scripts/extract.py:75-80). At 100 TB the same
sinks must partition: ``partition_by`` date/key columns gives partition
pruning to every downstream scan, and ``target_file_rows`` bounds file
count (too many small files kills the namenode; too few giant files
kills parallelism).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame


def write_parquet(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: Sequence[str] = (),
    coalesce: int | None = None,
) -> None:
    """K2 — columnar sink. ``partition_by`` produces hive-style
    directories (partition pruning for readers); ``coalesce`` caps output
    file count for small results without a shuffle."""
    if coalesce is not None:
        df = df.coalesce(coalesce)
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def write_json(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: Sequence[str] = (),
) -> None:
    """K1 — raw/bronze zone sink (JSONL; the reference's pretty-printed
    indent=4 is presentation, not semantics — line-delimited JSON is the
    splittable form a distributed reader needs)."""
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.json(path)
