"""Dataset profiling and data-quality screening operators.

The reference's only profiling is a row-count log line per load
(`/root/reference/dags/bigbookapi.py:179-180`); a 100 TB ingest needs a
real first-look profile (nulls, cardinalities, ranges per column) and a
distribution-aware outlier screen — both as single-pass aggregations.

- ``profile_columns``: ONE distributed aggregation computes every
  column's null count, exact distinct count, and min/max; the driver
  then unpivots the single result row into a tidy (column, metric)
  table. One pass over the data regardless of column count — never a
  per-column scan. (Exact distincts expand the aggregate; the
  ``approx=True`` flag swaps in HLL++ ``approx_count_distinct`` for the
  100 TB default, same shape, no expansion.)

- ``integer_sigma_outliers``: flag rows more than k standard deviations
  from their group mean — entirely in integer arithmetic on fixed-point
  cents. |x−μ| > kσ is algebraically rescaled to integers:
  ``(n·x − S)² > k²·(n·Q − S²)`` with S=Σx, Q=Σx² (exact integer sums,
  so the verdict is bit-identical on any partitioning and any engine;
  no float mean/variance ever materializes). Group stats are a tiny
  aggregate broadcast back to the fact scan — no window over the fact
  table, no second shuffle.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["profile_columns", "integer_sigma_outliers", "snapshot_drift"]


def profile_columns(df: DataFrame, approx: bool = False) -> DataFrame:
    """Profile every column of ``df`` in one aggregation pass.

    Output: ``(col_name, n_null, n_distinct, min_num, max_num, min_str,
    max_str)`` — numeric/timestamp columns fill the ``_num`` fields
    (timestamps as epoch microseconds, numerics cast to double — a pure
    representation cast, no arithmetic, hence engine-exact), string
    columns fill the ``_str`` fields; the other pair is null.
    """
    aggs = []
    kinds: list[tuple[str, str]] = []
    for f in df.schema.fields:
        c, t = f.name, f.dataType.simpleString()
        if t == "string":
            num = None
            kinds.append((c, "str"))
        elif t.startswith("timestamp"):
            num = F.unix_micros(F.col(c)).cast("double")
            kinds.append((c, "num"))
        elif t in ("tinyint", "smallint", "int", "bigint", "float", "double") or t.startswith(
            "decimal"
        ):
            num = F.col(c).cast("double")
            kinds.append((c, "num"))
        else:
            raise ValueError(f"unsupported column type for profiling: {c}: {t}")
        distinct = (
            F.approx_count_distinct(c) if approx else F.count_distinct(F.col(c))
        )
        aggs += [
            F.sum(F.col(c).isNull().cast("long")).alias(f"{c}__nn"),
            distinct.alias(f"{c}__nd"),
            (F.min(num) if num is not None else F.min(c)).alias(f"{c}__mn"),
            (F.max(num) if num is not None else F.max(c)).alias(f"{c}__mx"),
        ]
    row = df.agg(*aggs).first()
    out = [
        (
            c,
            int(row[f"{c}__nn"] or 0),  # SUM over zero rows is NULL
            int(row[f"{c}__nd"] or 0),
            float(row[f"{c}__mn"]) if kind == "num" and row[f"{c}__mn"] is not None else None,
            float(row[f"{c}__mx"]) if kind == "num" and row[f"{c}__mx"] is not None else None,
            row[f"{c}__mn"] if kind == "str" else None,
            row[f"{c}__mx"] if kind == "str" else None,
        )
        for c, kind in kinds
    ]
    return df.sparkSession.createDataFrame(
        out,
        "col_name string, n_null long, n_distinct long, min_num double, "
        "max_num double, min_str string, max_str string",
    )


def integer_sigma_outliers(
    df: DataFrame,
    group_cols: list[str],
    cents_col: str,
    k: int = 3,
) -> DataFrame:
    """Rows where ``|x - mean(group)| > k * stddev_pop(group)``, decided
    in exact integer arithmetic on ``cents_col`` (an integral column).

    Per group: ``n``, ``S = Σx``, ``Q = Σx²`` as DECIMAL(38,0) — exact,
    associative, order-free. The test multiplies through by ``n²``:
    ``(n·x − S)² > k²·(n·Q − S²)``. Fits DECIMAL(38,0)/HUGEINT up to
    ~10⁹ rows of ~10⁸-cent values per group. The stats side is
    |groups| rows — broadcast to the fact scan.
    """
    d38 = "decimal(38,0)"
    x = F.col(cents_col).cast(d38)
    stats = df.groupBy(*group_cols).agg(
        F.count("*").cast(d38).alias("__n"),
        F.sum(x).cast(d38).alias("__s"),
        F.sum(x * x).cast(d38).alias("__q"),
    )
    joined = df.join(F.broadcast(stats), group_cols)
    lhs = (F.col("__n") * x - F.col("__s"))
    rhs = F.lit(k * k).cast(d38) * (
        F.col("__n") * F.col("__q") - F.col("__s") * F.col("__s")
    )
    return joined.filter(lhs * lhs > rhs).drop("__n", "__s", "__q")


def snapshot_drift(
    ref: DataFrame,
    cur: DataFrame,
    numeric_cols: Sequence[str] = (),
    categorical_cols: Sequence[str] = (),
    n_bins: int = 20,
) -> DataFrame:
    """Distribution drift between two snapshots of the same table — the
    per-ingest monitor a production pipeline runs before promoting new
    data (the role PSI plays in ML scorecards). The metric is TOTAL
    VARIATION distance in per-mille, ``tv_pm = ⌊500·Σ|p_ref − p_cur|·
    1000 / 1⌋``, chosen over PSI deliberately: PSI's ``ln`` is not
    bit-portable across engines, while TV over integer bin counts is
    exact rational arithmetic — partition-invariant AND replayable in
    SQL to the last digit (the cross-multiplied form
    ``Σ|cur_n·N_ref − ref_n·N_cur|`` never forms a float; DECIMAL(38,0)
    carries it past 2^63, the same routing as ``mixture_plan``).

    ``numeric_cols`` must be integer-valued (fixed-point them first —
    cents, micros); each is binned on the REFERENCE range: ``width =
    ceil((max−min+1)/n_bins)``, bin = ``(x−min) div width`` (never a
    negative dividend: values below the reference min take the
    dedicated underflow bin ``-1``, values above clamp into overflow
    bin ``n_bins`` — new mass outside the reference range is exactly
    what drift must surface, and Spark's truncating ``div`` vs
    DuckDB's flooring ``//`` only disagree on negative dividends, so
    the underflow short-circuit is also what keeps the oracle exact).
    NULL numeric values take their OWN bin (missing data is a
    different drift signal than out-of-range mass). ``categorical_cols``
    bin by value, NULLs under a ``\\x00null`` sentinel with genuine
    ``\\x00`` bytes escaped by doubling so no real value can collide
    with the sentinel. Output, one row per column:
    ``(col_name, n_ref, n_cur, tv_pm, top_shift_bin)`` where
    ``top_shift_bin`` is the bin contributing the largest absolute
    proportion shift (ties → lexicographically smallest label).

    Scale: ONE scan per side for ALL columns (each row melts into
    (col, bin-label) pairs via an inline array→explode — no per-column
    passes), one groupBy on (col, bin), then arithmetic over the
    bounded (cols × bins) count table. The reference min/max come from
    one bounded aggregation (2 values per numeric column). Nothing
    data-sized ever concentrates.
    """
    if not numeric_cols and not categorical_cols:
        raise ValueError("no columns to compare")
    if n_bins <= 0:
        raise ValueError("n_bins must be positive")
    ranges: dict[str, tuple[int, int]] = {}
    if numeric_cols:
        row = ref.agg(
            *[F.min(c).alias(f"lo_{c}") for c in numeric_cols],
            *[F.max(c).alias(f"hi_{c}") for c in numeric_cols],
        ).first()
        for c in numeric_cols:
            lo, hi = row[f"lo_{c}"], row[f"hi_{c}"]
            if lo is None:
                raise ValueError(f"reference snapshot has no rows for {c!r}")
            ranges[c] = (int(lo), int(hi))

    def melt(df: DataFrame) -> DataFrame:
        pairs = []
        for c in numeric_cols:
            lo, hi = ranges[c]
            width = (hi - lo + n_bins) // n_bins  # ceil((hi-lo+1)/n_bins)
            # NULL is its own bin — missing data is a different drift
            # signal than out-of-range mass, and `least` would otherwise
            # silently fold NULLs into the overflow bin (it skips nulls)
            bin_ = (
                F.when(F.col(c).isNull(), F.lit("\x00null"))
                .when(F.col(c) < lo, F.lit("-1"))
                .otherwise(
                    F.least(
                        F.expr(f"(`{c}` - {lo}) div {width}"), F.lit(n_bins)
                    )
                    .cast("long")
                    .cast("string")
                )
            )
            pairs.append(F.struct(F.lit(c).alias("col_name"), bin_.alias("bin")))
        for c in categorical_cols:
            # escape genuine \x00 bytes (doubling) so the \x00null NULL
            # sentinel can never collide with a real category value —
            # the sentinel-conflation lesson from the hive empty-string
            # partition bug
            esc = F.replace(
                F.col(c).cast("string"), F.lit("\x00"), F.lit("\x00\x00")
            )
            pairs.append(
                F.struct(
                    F.lit(c).alias("col_name"),
                    F.coalesce(esc, F.lit("\x00null")).alias("bin"),
                )
            )
        return df.select(F.explode(F.array(*pairs)).alias("p")).select(
            "p.col_name", "p.bin"
        )

    d38 = "decimal(38,0)"
    rc = melt(ref).groupBy("col_name", "bin").agg(F.count("*").alias("ref_n"))
    cc = melt(cur).groupBy("col_name", "bin").agg(F.count("*").alias("cur_n"))
    bins = (
        rc.join(cc, ["col_name", "bin"], "full_outer")
        .fillna(0, subset=["ref_n", "cur_n"])
    )
    totals = bins.groupBy("col_name").agg(
        F.sum("ref_n").alias("n_ref"), F.sum("cur_n").alias("n_cur")
    )
    b = bins.join(F.broadcast(totals), "col_name")
    shift = F.abs(
        F.col("cur_n").cast(d38) * F.col("n_ref").cast(d38)
        - F.col("ref_n").cast(d38) * F.col("n_cur").cast(d38)
    )
    per_col = b.groupBy("col_name", "n_ref", "n_cur").agg(
        F.sum(shift).alias("__t"),
        F.min(F.struct((-shift).alias("s"), F.col("bin").alias("b"))).alias("__m"),
    )
    num = (F.lit(500).cast(d38) * F.col("__t")).cast(d38)
    den = (F.col("n_ref").cast(d38) * F.col("n_cur").cast(d38)).cast(d38)
    # an empty side is total drift by definition (and would divide by 0)
    tv_pm = F.when(
        (F.col("n_ref") == 0) | (F.col("n_cur") == 0), F.lit(1000)
    ).otherwise(((num - F.pmod(num, den)) / den).cast("long"))
    return per_col.select(
        "col_name",
        "n_ref",
        "n_cur",
        tv_pm.alias("tv_pm"),
        F.col("__m.b").alias("top_shift_bin"),
    )
