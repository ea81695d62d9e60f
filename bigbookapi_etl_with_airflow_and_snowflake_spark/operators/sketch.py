"""Approximate sketches (the brief's "novel sketch" slot): bounded-error
aggregates whose cost stays O(sketch size) per group no matter how many
rows flow through — the only viable shape for distinct-counts and
quantiles at 100 TB.

All built on Spark's native sketch aggregates (HyperLogLog++ for
distinct counts, Greenwald-Khanna for quantiles) — JVM-side, mergeable
across partitions (the sketch property that makes them distributable:
partial sketches combine losslessly in the shuffle). Error bounds are
asserted against exact answers in tests; sketches are engine-specific
by nature, so the driver gets rows-only checks.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def approx_distinct(
    df: DataFrame,
    value_col: str,
    group_by: Sequence[str] = (),
    rsd: float = 0.05,
) -> DataFrame:
    """HyperLogLog++ distinct count (relative standard deviation
    ``rsd``). Memory per group is O(1/rsd²) regardless of cardinality —
    contrast exact countDistinct, whose per-group state grows with the
    distinct set."""
    agg = F.approx_count_distinct(value_col, rsd).alias("approx_distinct")
    if group_by:
        return df.groupBy(*group_by).agg(agg)
    return df.agg(agg)


def approx_quantiles(
    df: DataFrame,
    value_col: str,
    probabilities: Sequence[float] = (0.25, 0.5, 0.75),
    accuracy: int = 10_000,
    group_by: Sequence[str] = (),
) -> DataFrame:
    """Mergeable quantile sketch (error ≤ 1/accuracy of rank)."""
    pct = F.percentile_approx(
        value_col,
        F.array(*[F.lit(float(p)) for p in probabilities]),
        F.lit(accuracy),
    )
    cols = [
        pct[i].alias(f"q{int(p * 100)}") for i, p in enumerate(probabilities)
    ]
    if group_by:
        base = df.groupBy(*group_by).agg(pct.alias("__q"))
        return base.select(
            *group_by,
            *[
                F.col("__q")[i].alias(f"q{int(p * 100)}")
                for i, p in enumerate(probabilities)
            ],
        )
    return df.agg(pct.alias("__q")).select(
        *[
            F.col("__q")[i].alias(f"q{int(p * 100)}")
            for i, p in enumerate(probabilities)
        ]
    )
