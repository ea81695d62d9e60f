"""File sources (S2 JSON, S3 Parquet) with schema discipline.

``read_table`` is the one entry point for the analytics corpus: plain
parquet scans, plus two normalizations:

1. **TIMESTAMP(NANOS) columns** — Spark's parquet reader has no ns type;
   with ``spark.sql.legacy.parquet.nanosAsLong=true`` (set in
   session.py) the column arrives as a raw long and is converted to a
   µs timestamp with integer ``div`` — exact for µs-aligned data. The
   conversion is a codegen'd projection; every other column keeps full
   pushdown.

2. **Scan-parallelism floor.** Parquet parallelism is bounded by row
   groups: a single-row-group file yields ALL its rows in one task no
   matter how many byte-range splits Spark makes, so a 600k-row
   single-group file serializes every downstream map on one core. When
   the row-group count is below the cluster's parallelism (and the file
   is big enough to matter), the scan is followed by one round-robin
   repartition to fan the rows out. On real multi-file/multi-group
   layouts (any production 100 TB table) the condition is false and no
   extra shuffle is added.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# tables whose parquet files carry TIMESTAMP(NANOS) columns
_NANOS_COLS: dict[str, tuple[str, ...]] = {"events": ("ts",)}

# Tables whose per-row work is CPU-heavy (regex tokenization, shingling,
# 64-dim float math) — for these the round-robin fan-out pays every time
# (A/B at sf0.1: embedding_neardup 61s→4.3s, jaccard 2.0s→1.2s, minhash
# 1.1s→0.7s). Relational tables are shuffle-bound, not map-bound: the
# same A/B shows the extra exchange costs more than single-core scanning
# saves (shipping_priority 2.3s→5.3s with a spread lineitem), so they
# are NOT spread.
_SPREAD_TABLES = {"documents", "embeddings"}

# don't bother spreading scans smaller than this (shuffle overhead would
# exceed the map-parallelism win)
_SPREAD_MIN_BYTES = 64 * 1024


def _row_groups(path: str) -> int:
    try:
        import pyarrow.parquet as pq

        return pq.ParquetFile(path).metadata.num_row_groups
    except Exception:
        return 1 << 30  # unknown layout → assume parallel enough


def read_table(
    spark: SparkSession, sf_dir: str, name: str, spread: bool = True
) -> DataFrame:
    """Read one corpus table; normalizes ns-timestamp columns and floors
    scan parallelism (see module docstring)."""
    path = f"{sf_dir}/{name}.parquet"
    df = spark.read.parquet(path)
    for col in _NANOS_COLS.get(name, ()):
        if col in df.columns and isinstance(df.schema[col].dataType, T.LongType):
            df = df.withColumn(col, F.timestamp_micros(F.expr(f"`{col}` div 1000")))
    # Naive parquet timestamps (isAdjustedToUTC=false) arrive as
    # TIMESTAMP_NTZ under Spark 4's inferTimestampNTZ default, which
    # rejects unix_micros()/BIGINT casts and diverges from the engine's
    # epoch-based timestamp algebra. Canonicalize to TIMESTAMP — under
    # the UTC session timezone (session.py) the cast is value-identical
    # to the naive reading, so oracle semantics are unchanged.
    for f_ in df.schema.fields:
        if isinstance(f_.dataType, T.TimestampNTZType):
            df = df.withColumn(f_.name, F.col(f_.name).cast("timestamp"))
    if spread and name in _SPREAD_TABLES and os.path.isfile(path):
        parallelism = spark.sparkContext.defaultParallelism
        if (
            os.path.getsize(path) >= _SPREAD_MIN_BYTES
            and _row_groups(path) < parallelism
        ):
            df = df.repartition(parallelism)
    return df
