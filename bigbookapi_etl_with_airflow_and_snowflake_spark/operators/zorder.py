"""Z-order (Morton) data layout for multi-dimensional data skipping —
the lake-maintenance operator behind "OPTIMIZE ... ZORDER BY" in
modern table formats, re-expressed as plain DataFrame algebra.

Why it matters at 100 TB: parquet scans prune files (and row groups)
by min/max column statistics. A range-sorted layout gives perfect
pruning on ONE column and none on the others; interleaving the bits of
k rank-normalized columns gives every column locality ~n^(1/k), so a
selective filter on ANY indexed dimension skips most files. The
operator is pure expression + one range repartition — no UDFs, no
driver data besides a k-value min/max row.

``zorder_key`` is deterministic and engine-portable: min-max
normalization to a 2^bits integer grid in IEEE double arithmetic
(identical operation order on any engine), then bit interleave with
shift/and/or — the oracle replays it in SQL bit-for-bit.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _normalize(col: Column, lo: Column, hi: Column, bits: int) -> Column:
    """Map a numeric column onto the [0, 2^bits) integer grid. Constant
    columns (hi == lo) collapse to 0 — they contribute nothing to
    ordering, which is correct. The expression order is fixed so every
    IEEE engine computes identical doubles: ((v - lo) / (hi - lo)) *
    (2^bits - 1), then floor."""
    scale = F.lit(float((1 << bits) - 1))
    span = hi - lo
    return F.when(span == 0, F.lit(0).cast("long")).otherwise(
        F.floor((col.cast("double") - lo) / span * scale).cast("long")
    )


def _interleave(cols: Sequence[Column], bits: int) -> Column:
    """Morton interleave: bit i of column j lands at position
    ``i * k + j``. Built as a k·bits-term bitwise sum — Catalyst folds
    it into one codegen'd projection, no shuffle, no Python."""
    k = len(cols)
    terms = []
    for j, c in enumerate(cols):
        for i in range(bits):
            terms.append(
                F.shiftleft(F.shiftright(c, i).bitwiseAND(F.lit(1)), i * k + j)
            )
    out = terms[0]
    for t in terms[1:]:
        out = out.bitwiseOR(t)
    return out


def zorder_key(
    df: DataFrame, cols: Sequence[str], bits: int = 16, key_col: str = "zkey"
) -> DataFrame:
    """Append a Morton key over ``cols``. One stats aggregate (k mins +
    k maxes, a single broadcastable row) + one stateless projection.
    ``bits`` per dimension; k·bits must fit a signed 64-bit key."""
    if not cols:
        raise ValueError("zorder_key needs at least one column")
    if len(cols) * bits > 63:
        raise ValueError(
            f"{len(cols)} dims x {bits} bits = {len(cols) * bits} key bits "
            "exceeds a signed 64-bit key — lower bits"
        )
    if key_col in df.columns:
        raise ValueError(f"column {key_col!r} already exists")
    stats = df.agg(
        *[F.min(F.col(c).cast("double")).alias(f"__lo_{c}") for c in cols],
        *[F.max(F.col(c).cast("double")).alias(f"__hi_{c}") for c in cols],
    )
    normed = [
        _normalize(
            F.col(c),
            F.col(f"__lo_{c}"),
            F.col(f"__hi_{c}"),
            bits,
        )
        for c in cols
    ]
    # 1-row stats side rides a broadcast nested-loop join: every
    # executor gets the k min/max doubles, nothing else moves
    return (
        df.crossJoin(F.broadcast(stats))
        .withColumn(key_col, _interleave(normed, bits))
        .drop(*[f"__lo_{c}" for c in cols], *[f"__hi_{c}" for c in cols])
    )


def zorder_layout(
    df: DataFrame,
    cols: Sequence[str],
    path: str,
    n_files: int,
    bits: int = 16,
) -> None:
    """Rewrite ``df`` as ``n_files`` parquet files in Z-order: range
    repartition on the Morton key (contiguous key spans per file → tight
    per-file min/max envelopes on EVERY indexed column), sort within
    partitions (tight row-group stats too), drop the key on write.

    At 100 TB this is the compaction job: run per partition of a date-
    partitioned table, producing files a selective filter on any of
    ``cols`` can skip by footer stats alone."""
    keyed = zorder_key(df, cols, bits=bits)
    (
        keyed.repartitionByRange(n_files, "zkey")
        .sortWithinPartitions("zkey")
        .drop("zkey")
        .write.mode("overwrite")
        .parquet(path)
    )


def zorder_oracle_sql(
    table: str, cols: Sequence[str], bits: int = 16, id_cols: str = "*"
) -> str:
    """The engine-portable SQL replay of :func:`zorder_key` — same
    normalization expression order, same interleave — so any ANSI engine
    with bitwise ops verifies the key bit-for-bit."""
    k = len(cols)
    scale = repr(float((1 << bits) - 1))
    stats = ", ".join(
        f"MIN(CAST({c} AS DOUBLE)) AS lo_{j}, MAX(CAST({c} AS DOUBLE)) AS hi_{j}"
        for j, c in enumerate(cols)
    )
    norms = ", ".join(
        f"CASE WHEN hi_{j} - lo_{j} = 0 THEN 0 ELSE CAST(floor("
        f"(CAST({c} AS DOUBLE) - lo_{j}) / (hi_{j} - lo_{j}) * {scale}"
        f") AS BIGINT) END AS z_{j}"
        for j, c in enumerate(cols)
    )
    terms = " | ".join(
        f"(((z_{j} >> {i}) & 1) << {i * k + j})"
        for j in range(k)
        for i in range(bits)
    )
    return (
        f"WITH st AS (SELECT {stats} FROM {table}), "
        f"n AS (SELECT t.*, {norms} FROM {table} t CROSS JOIN st) "
        f"SELECT {id_cols}, ({terms}) AS zkey FROM n"
    )
