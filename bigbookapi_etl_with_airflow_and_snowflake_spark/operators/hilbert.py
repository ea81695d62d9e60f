"""Hilbert-curve data layout for 2-dimensional data skipping — the
space-filling-curve upgrade over Z-order (operators/zorder.py) used by
lake "liquid clustering" style maintenance: the Hilbert curve visits
every cell of the grid exactly once WITHOUT the long diagonal jumps of
the Morton curve, so contiguous key ranges map to tighter spatial
rectangles and per-file min/max envelopes shrink on both dimensions.

Same engine contract as zorder: deterministic, engine-portable integer
math (min-max normalization to a 2^bits grid in fixed-order IEEE double
arithmetic, then the classic d2xy/xy2d bit transform unrolled ``bits``
times), pure expressions + one range repartition — no UDFs, no driver
data beyond a 1-row stats broadcast. The oracle generator emits SQL
that replays the unrolled transform bit-for-bit.

Scope: exactly 2 dimensions (the textbook xy2d transform). For k ≥ 3
use :func:`operators.zorder.zorder_key` — Morton generalizes trivially;
Hilbert's k-d state machine (Skilling 2004) does not pay for itself
over bit-interleave at file-pruning granularity.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .zorder import _normalize


def _quadrant(rx, ry):
    """(3*rx) XOR ry for bit values, written arithmetically —
    rx*(3-ry) + (1-rx)*ry — so both engines replay it with +/* only
    (portable; no dialect-specific XOR)."""
    return rx * (F.lit(3) - ry) + (F.lit(1) - rx) * ry


def hilbert_key(
    df: DataFrame, cols: Sequence[str], bits: int = 16, key_col: str = "hkey"
) -> DataFrame:
    """Append the Hilbert index over exactly two numeric columns. One
    stats aggregate (2 mins + 2 maxes, a single broadcastable row) +
    ``bits`` chained narrow projections (the xy2d iteration unrolled —
    each step rewrites (x, y, d) from the previous step's columns, so
    the expression tree stays LINEAR in ``bits``; Catalyst keeps the
    steps as one codegen stage but will not inline-duplicate them).
    ``2*bits`` must fit a signed 64-bit key."""
    if len(cols) != 2:
        raise ValueError(
            f"hilbert_key is 2-D (got {len(cols)} cols) — use zorder_key "
            "for other dimensionalities"
        )
    if 2 * bits > 63:
        raise ValueError(
            f"2 dims x {bits} bits = {2 * bits} key bits exceeds a signed "
            "64-bit key — lower bits"
        )
    if key_col in df.columns:
        raise ValueError(f"column {key_col!r} already exists")
    stats = df.agg(
        *[F.min(F.col(c).cast("double")).alias(f"__lo_{c}") for c in cols],
        *[F.max(F.col(c).cast("double")).alias(f"__hi_{c}") for c in cols],
    )
    out = df.crossJoin(F.broadcast(stats))
    out = out.withColumn(
        "__hx", _normalize(F.col(cols[0]), F.col(f"__lo_{cols[0]}"),
                           F.col(f"__hi_{cols[0]}"), bits)
    ).withColumn(
        "__hy", _normalize(F.col(cols[1]), F.col(f"__lo_{cols[1]}"),
                           F.col(f"__hi_{cols[1]}"), bits)
    ).withColumn("__hd", F.lit(0).cast("long"))
    for i in range(bits - 1, -1, -1):
        s = 1 << i
        x, y, d = F.col("__hx"), F.col("__hy"), F.col("__hd")
        rx = F.shiftright(x, i).bitwiseAND(F.lit(1))
        ry = F.shiftright(y, i).bitwiseAND(F.lit(1))
        # materialize rx/ry once per step: the rotation below uses each
        # twice, and per-step columns keep the plan linear in `bits`
        out = out.withColumn("__rx", rx).withColumn("__ry", ry)
        rx, ry = F.col("__rx"), F.col("__ry")
        new_d = d + F.lit(s * s) * _quadrant(rx, ry)
        # rotation (classic xy2d): inside the ry==0 half, reflect when
        # rx==1, then swap x/y
        new_x = F.when(
            ry == 0, F.when(rx == 1, F.lit(s - 1) - y).otherwise(y)
        ).otherwise(x)
        new_y = F.when(
            ry == 0, F.when(rx == 1, F.lit(s - 1) - x).otherwise(x)
        ).otherwise(y)
        out = (
            out.withColumn("__nx", new_x)
            .withColumn("__ny", new_y)
            .withColumn("__nd", new_d)
            .drop("__hx", "__hy", "__hd", "__rx", "__ry")
            .withColumnRenamed("__nx", "__hx")
            .withColumnRenamed("__ny", "__hy")
            .withColumnRenamed("__nd", "__hd")
        )
    return (
        out.withColumn(key_col, F.col("__hd"))
        .drop("__hx", "__hy", "__hd")
        .drop(*[f"__lo_{c}" for c in cols], *[f"__hi_{c}" for c in cols])
    )


def hilbert_layout(
    df: DataFrame,
    cols: Sequence[str],
    path: str,
    n_files: int,
    bits: int = 16,
) -> None:
    """Rewrite ``df`` as ``n_files`` parquet files in Hilbert order:
    range repartition on the key (contiguous curve spans per file →
    compact spatial tiles → tight min/max envelopes on BOTH columns),
    sort within partitions, drop the key on write. The same compaction
    job shape as :func:`operators.zorder.zorder_layout`."""
    keyed = hilbert_key(df, cols, bits=bits)
    (
        keyed.repartitionByRange(n_files, "hkey")
        .sortWithinPartitions("hkey")
        .drop("hkey")
        .write.mode("overwrite")
        .parquet(path)
    )


def hilbert_oracle_sql(
    table: str, cols: Sequence[str], id_cols: str, bits: int = 16
) -> str:
    """Engine-portable SQL replay of :func:`hilbert_key`: the same
    normalization and the same unrolled xy2d iteration as chained CTEs
    (one per bit, highest first), each carrying ``id_cols`` through.
    Arithmetic-only quadrant term — no dialect XOR."""
    if len(cols) != 2:
        raise ValueError("hilbert_oracle_sql is 2-D")
    if 2 * bits > 63:
        raise ValueError(
            f"2 dims x {bits} bits = {2 * bits} key bits exceeds a signed "
            "64-bit key — lower bits (same guard as hilbert_key; without "
            "it the generated SQL would overflow BIGINT differently per "
            "engine instead of failing loudly)"
        )
    scale = repr(float((1 << bits) - 1))
    stats = ", ".join(
        f"MIN(CAST({c} AS DOUBLE)) AS lo_{j}, MAX(CAST({c} AS DOUBLE)) AS hi_{j}"
        for j, c in enumerate(cols)
    )
    norms = ", ".join(
        f"CASE WHEN hi_{j} - lo_{j} = 0 THEN CAST(0 AS BIGINT) ELSE CAST(floor("
        f"(CAST({c} AS DOUBLE) - lo_{j}) / (hi_{j} - lo_{j}) * {scale}"
        f") AS BIGINT) END AS x{j}"
        for j, c in enumerate(cols)
    )
    ctes = [
        f"st AS (SELECT {stats} FROM {table})",
        f"it{bits} AS (SELECT {id_cols}, {norms}, CAST(0 AS BIGINT) AS d "
        f"FROM {table} t CROSS JOIN st)",
    ]
    for i in range(bits - 1, -1, -1):
        s = 1 << i
        prev = f"it{i + 1}"
        rx, ry = f"((x0 >> {i}) & 1)", f"((x1 >> {i}) & 1)"
        quad = f"({rx} * (3 - {ry}) + (1 - {rx}) * {ry})"
        new_x = (
            f"CASE WHEN {ry} = 0 THEN "
            f"(CASE WHEN {rx} = 1 THEN {s - 1} - x1 ELSE x1 END) "
            f"ELSE x0 END"
        )
        new_y = (
            f"CASE WHEN {ry} = 0 THEN "
            f"(CASE WHEN {rx} = 1 THEN {s - 1} - x0 ELSE x0 END) "
            f"ELSE x1 END"
        )
        ctes.append(
            f"it{i} AS (SELECT {id_cols}, {new_x} AS x0, {new_y} AS x1, "
            f"d + {s * s} * {quad} AS d FROM {prev})"
        )
    return (
        "WITH " + ", ".join(ctes) + f" SELECT {id_cols}, d AS hkey FROM it0"
    )
