"""Change-data-capture style snapshot comparison.

The reference pipeline overwrite-loads daily and keeps no change
history (`/root/reference/dags/bigbookapi.py` truncates + reloads);
an incremental 100 TB pipeline needs the inverse operator: given two
snapshots of a keyed table, emit exactly what changed — the feed for
incremental downstream refresh (see operators/rollup.py) and for audit.

One full-outer join on the key columns; change classification is one
null-safe struct comparison per row (no per-column join, no window).
At scale both snapshots should be bucketed/co-partitioned on the key
(see sinks/bucketed.py) so the join is shuffle-free; value comparison
uses ``IS DISTINCT FROM`` semantics (null-safe), so NULL→value and
value→NULL transitions classify as updates, matching the SQL replay.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["snapshot_diff"]


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    keys: Sequence[str],
    compare_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Diff two snapshots of a keyed table.

    Output: key columns + ``change_type`` ('insert' | 'delete' |
    'update') + ``old_<c>`` / ``new_<c>`` for every compared column.
    Unchanged rows are not emitted (the point of CDC is the delta).
    Key sets must be unique per snapshot — a duplicated key would make
    "the" old/new row ambiguous; callers dedup first (operators/dedup).
    """
    keys = list(keys)
    if compare_cols is None:
        compare_cols = [c for c in old.columns if c not in keys]
    missing = [c for c in [*keys, *compare_cols] if c not in new.columns]
    if missing:
        raise ValueError(f"columns missing from new snapshot: {missing}")

    o = old.select(
        *keys, F.struct(*[F.col(c).alias(c) for c in compare_cols]).alias("__old")
    )
    n = new.select(
        *keys, F.struct(*[F.col(c).alias(c) for c in compare_cols]).alias("__new")
    )
    j = o.join(n, keys, "full_outer")
    change = (
        F.when(F.col("__old").isNull(), F.lit("insert"))
        .when(F.col("__new").isNull(), F.lit("delete"))
        .when(~F.col("__old").eqNullSafe(F.col("__new")), F.lit("update"))
    )
    out_cols = [*keys, change.alias("change_type")]
    for c in compare_cols:
        out_cols.append(F.col("__old")[c].alias(f"old_{c}"))
        out_cols.append(F.col("__new")[c].alias(f"new_{c}"))
    return j.select(*out_cols).filter(F.col("change_type").isNotNull())
