"""Generic as-of join (SURVEY.md §2.5 — an operator Spark lacks).

``asof_join(left, right)``: for every left row, attach the payload of
the latest right row with ``right.ts <= left.ts`` within the same key
(backward as-of; the time-series point-in-time join).

Spark-first plan — union + window, NOT a range join:

    tag sides → unionByName → per-key window sorted by (ts, side) →
    last non-null right-payload up to current row → keep left rows

This is one shuffle on the key (the window's own partitioning) and
linear work per row, versus the naive ``left ⋈ right ON key AND r.ts <=
l.ts`` + max-filter, whose intermediate blows up quadratically in rows
per key. At 100 TB the union form's cost profile is identical to any
windowed aggregation — partition by key, sort within partition, one
pass; skewed keys fall under the same AQE/salting remedies as any hot
window key.

Tie semantics: a right row at exactly ``left.ts`` matches (<=). When
several right rows share one timestamp, the last under a deterministic
tiebreak column (``right_order``) wins.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: Sequence[str],
    payload_cols: Sequence[str] | None = None,
    right_order: str | None = None,
    suffix: str = "_asof",
) -> DataFrame:
    """Backward as-of join.

    Parameters
    ----------
    on : ordering column (timestamp or numeric), present in both sides.
    by : equi-key columns present in both sides.
    payload_cols : right-side columns to attach (default: all non-key,
        non-ordering columns). Attached as ``<name><suffix>``.
    right_order : optional deterministic tiebreak among right rows that
        share the same ``on`` value.
    """
    by = list(by)
    if payload_cols is None:
        payload_cols = [c for c in right.columns if c not in set(by) | {on, right_order}]

    # tag: right rows sort BEFORE left rows at equal ts so `<=` matches
    lhs = left.withColumn("__side", F.lit(1))
    for c in payload_cols:
        lhs = lhs.withColumn(f"__p_{c}", F.lit(None).cast(right.schema[c].dataType))
    rhs = right.select(
        *by,
        F.col(on).alias(on),
        F.lit(0).alias("__side"),
        *[F.col(c).alias(f"__p_{c}") for c in payload_cols],
    )
    # left columns the right side lacks → null-fill for unionByName
    rhs_full = rhs
    for c in left.columns:
        if c not in rhs.columns:
            rhs_full = rhs_full.withColumn(c, F.lit(None).cast(left.schema[c].dataType))

    order = [F.col(on).asc(), F.col("__side").asc()]
    if right_order is not None:
        lhs = lhs.withColumn("__ro", F.lit(None).cast(right.schema[right_order].dataType))
        rhs_full = rhs_full.withColumn("__ro", F.col(right_order) if right_order in right.columns else F.lit(None))
        order = [F.col(on).asc(), F.col("__side").asc(), F.col("__ro").asc_nulls_first()]

    unioned = lhs.unionByName(rhs_full.select(*lhs.columns))
    w = (
        Window.partitionBy(*by)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = unioned
    for c in payload_cols:
        out = out.withColumn(
            f"{c}{suffix}", F.last(F.col(f"__p_{c}"), ignorenulls=True).over(w)
        )
    drop = ["__side"] + [f"__p_{c}" for c in payload_cols]
    if right_order is not None:
        drop.append("__ro")
    return out.filter(F.col("__side") == 1).drop(*drop)
