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

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["profile_columns", "integer_sigma_outliers"]


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
