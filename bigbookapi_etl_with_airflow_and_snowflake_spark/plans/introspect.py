"""Physical-plan introspection — the scale-discipline feedback loop.

"Would this plan survive a 100× scale-up?" is answerable from the
physical plan string: how many Exchanges (shuffles), did the small side
broadcast, did filters reach the parquet scan. These helpers turn those
questions into assertions so tests lock the *plan shape*, not just the
result values — a regression that silently turns a broadcast join into a
sort-merge join, or drops a pushed filter, fails CI here long before it
melts a cluster.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    """The physical plan as a string (what ``df.explain(mode)`` prints)."""
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), mode
    )


def has_broadcast_join(df: DataFrame) -> bool:
    """True if any join in the plan is broadcast (hash or nested loop)."""
    plan = explain_str(df, "simple")
    return "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def pushed_filters(df: DataFrame) -> list[str]:
    """The PushedFilters lists from every file scan in the plan."""
    plan = explain_str(df, "formatted")
    return re.findall(r"PushedFilters: \[([^\]]*)\]", plan)


def shuffle_count(df: DataFrame) -> int:
    """Shuffle (hash/range repartition) exchange count in the plan."""
    plan = explain_str(df, "simple")
    return len(re.findall(r"Exchange (?:hash|range)partitioning", plan))
