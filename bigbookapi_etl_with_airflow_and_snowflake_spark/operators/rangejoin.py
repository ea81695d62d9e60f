"""Range (interval) join — points ⋈ intervals (SURVEY.md §2.5).

``range_join(points, intervals)``: rows of ``points`` matched to every
interval ``[lo, hi]`` (inclusive) that contains them, with optional
equi-keys.

Spark-first plan — bucket expansion, NOT the naive inequality join:
Catalyst executes a bare ``p.ts BETWEEN i.lo AND i.hi`` predicate as a
broadcast *nested-loop* join (O(|P|·|I|) comparisons) — fine when one
side is tiny, catastrophic when both sides are large. Bucketing makes
it a hash join:

    bucket(point)   = floor(ts / width)           — one row per point
    bucket(interval) = explode(floor(lo/w) … floor(hi/w))  — one row
                       per covered bucket
    equi-join on (keys…, bucket) → exact BETWEEN filter

The equi-join hash-partitions both sides — shuffle volume is linear in
rows + interval-replication (span/width per interval), and every
comparison inside a bucket is a real candidate. ``bucket_width`` trades
replication (small width → more interval copies) against selectivity
(large width → more false candidates filtered after the join); set it
near the median interval span.

A point falls in exactly one bucket, so a (point, interval) pair meets
at most once — no dedup needed.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    lo_col: str,
    hi_col: str,
    by: Sequence[str] = (),
    bucket_width: int = 3600,
    point_as_long: Column | None = None,
) -> DataFrame:
    """Inner range join: point ∈ [lo, hi] (inclusive), plus equi-keys.

    ``point_col`` / ``lo_col`` / ``hi_col`` may be timestamps (bucketed
    by epoch-µs with ``bucket_width`` in seconds) or numerics (bucketed
    by value with ``bucket_width`` in the same unit).
    """
    by = list(by)

    def _as_long(df: DataFrame, col: str) -> Column:
        dt = df.schema[col].dataType.simpleString()
        if dt == "timestamp":
            return F.unix_micros(F.col(col))
        return F.col(col).cast("long")

    width = bucket_width * 1_000_000 if (
        points.schema[point_col].dataType.simpleString() == "timestamp"
    ) else bucket_width

    p = points.withColumn("__b", F.floor(_as_long(points, point_col) / F.lit(width)))
    i = intervals.withColumn(
        "__b",
        F.explode(
            F.sequence(
                F.floor(_as_long(intervals, lo_col) / F.lit(width)),
                F.floor(_as_long(intervals, hi_col) / F.lit(width)),
            )
        ),
    )
    joined = p.join(i, by + ["__b"])
    return joined.filter(
        (F.col(point_col) >= F.col(lo_col)) & (F.col(point_col) <= F.col(hi_col))
    ).drop("__b")
