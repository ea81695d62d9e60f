"""File sources (S2 JSON, S3 Parquet) with schema discipline.

``read_table`` is the one entry point for the analytics corpus: plain
parquet scans, plus transparent handling of TIMESTAMP(NANOS) columns,
which Spark's parquet reader rejects. With
``spark.sql.legacy.parquet.nanosAsLong=true`` (set in session.py) the ns
column arrives as a raw long; we convert to a µs timestamp with integer
``div`` — exact for µs-aligned data, truncating (like any engine reading
ns into µs) otherwise. The conversion is a codegen'd projection — scans
stay fully pushdown-capable on every other column.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# tables whose parquet files carry TIMESTAMP(NANOS) columns
_NANOS_COLS: dict[str, tuple[str, ...]] = {"events": ("ts",)}


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one corpus table; normalizes ns-timestamp columns to µs."""
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    for col in _NANOS_COLS.get(name, ()):
        if col in df.columns and isinstance(df.schema[col].dataType, T.LongType):
            df = df.withColumn(col, F.timestamp_micros(F.expr(f"`{col}` div 1000")))
    return df
