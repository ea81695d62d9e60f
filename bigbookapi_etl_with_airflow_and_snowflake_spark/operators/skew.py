"""Skew mitigation (100 TB posture).

A hash-shuffle sends every row of one key to one reducer; a hot key
(one user with 10⁹ events, the null key, a default value) turns the
whole stage into one straggler task. AQE's skew-join splitting covers
*joins*; hot-key *aggregations* need pre-aggregation over a salted key:

    phase 1: groupBy(keys + salt) — partial results, hot key split
             across `buckets` reducers
    phase 2: groupBy(keys)        — combine partials; each key now has
             at most `buckets` rows entering the final shuffle

Correct for any decomposable aggregate (sum/count/min/max — combine of
partials equals aggregate of whole). The salt is derived
deterministically from a row-distinguishing column (not rand()), so
results and plans are reproducible run-to-run.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# decomposable aggregates: (partial op, combine op)
_DECOMPOSABLE = {
    "sum": (F.sum, F.sum),
    "count": (F.count, F.sum),
    "min": (F.min, F.min),
    "max": (F.max, F.max),
}


def salt_column(distinct_col: str | Column, buckets: int) -> Column:
    """Deterministic salt in [0, buckets): hash of a row-distinguishing
    column (an id, a timestamp — anything spread within the hot key)."""
    c = F.col(distinct_col) if isinstance(distinct_col, str) else distinct_col
    return F.pmod(F.xxhash64(c), F.lit(buckets)).cast("int")


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    aggs: Sequence[tuple[str, str, str]],
    salt_on: str,
    buckets: int = 32,
) -> DataFrame:
    """Two-phase salted aggregation.

    ``aggs``: (op, column, alias) triples with op in sum/count/min/max.
    ``salt_on``: column whose hash spreads the hot key's rows.

    Result is value-identical to ``df.groupBy(keys).agg(...)`` — only the
    shuffle layout differs (no reducer ever sees a whole hot key).
    """
    for op, _, _ in aggs:
        if op not in _DECOMPOSABLE:
            raise ValueError(f"{op} is not decomposable; use plain groupBy")

    salted = df.withColumn("__salt", salt_column(salt_on, buckets))
    partial = salted.groupBy(*keys, "__salt").agg(
        *[
            _DECOMPOSABLE[op][0](F.col(col)).alias(f"__p_{alias}")
            for op, col, alias in aggs
        ]
    )
    return partial.groupBy(*keys).agg(
        *[
            _DECOMPOSABLE[op][1](F.col(f"__p_{alias}")).alias(alias)
            for op, _, alias in aggs
        ]
    )


def replicate_broadcast_join(
    skewed: DataFrame,
    small: DataFrame,
    on: str,
    buckets: int = 8,
    salt_on: str | None = None,
) -> DataFrame:
    """Salted join for when the *big* side has hot join keys and the
    small side is still too large to broadcast outright: the big side
    gets a deterministic salt, the small side is exploded ``buckets``
    times, and the join key becomes (key, salt) — each hot key's rows
    spread over ``buckets`` reducers.

    (With a genuinely broadcastable small side, just ``F.broadcast`` —
    no shuffle at all. With AQE skew-join on, sort-merge skew is split
    automatically; this helper is the explicit form for engines/configs
    where neither applies.)
    """
    salt_src = salt_on or on
    big = skewed.withColumn("__salt", salt_column(salt_src, buckets))
    exploded = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(buckets - 1)))
    ).withColumn("__salt", F.col("__salt").cast("int"))
    out = big.join(exploded, [on, "__salt"])
    return out.drop("__salt")
