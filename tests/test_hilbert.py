"""Hilbert-curve layout (operators/hilbert.py): exactness of the
unrolled xy2d transform against the textbook iterative reference, the
curve's bijectivity on the grid, the locality property the operator
exists for, and the adjacency property that distinguishes it from
Z-order (consecutive curve cells are always grid neighbors — Morton
has diagonal jumps)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bigbookapi_etl_with_airflow_and_snowflake_spark.operators.hilbert import (
    hilbert_key,
    hilbert_layout,
)
from bigbookapi_etl_with_airflow_and_snowflake_spark.sources.files import read_table


def _xy2d(n: int, x: int, y: int) -> int:
    """Textbook iterative Hilbert index (the Wikipedia/Hacker's Delight
    form) — the independent reference the Spark expressions must match."""
    d, s = 0, n // 2
    while s > 0:
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x, y = s - 1 - x, s - 1 - y
            x, y = y, x
        s //= 2
    return d


def test_key_matches_reference_on_full_grid(spark):
    """Every cell of the 16x16 grid: the Spark key equals the reference
    index, and the mapping is a bijection onto [0, 256)."""
    bits, n = 4, 16
    rows = [
        (i, x, y)
        for i, (x, y) in enumerate((x, y) for x in range(n) for y in range(n))
    ]
    df = spark.createDataFrame(rows, "id long, a long, b long")
    got = {r.id: r.hkey for r in hilbert_key(df, ["a", "b"], bits=bits).collect()}
    assert got == {i: _xy2d(n, x, y) for i, x, y in rows}
    assert sorted(got.values()) == list(range(n * n))


def test_consecutive_cells_are_grid_neighbors(spark):
    """The Hilbert property Z-order lacks: |curve step| == 1 in
    Manhattan distance for EVERY consecutive pair."""
    bits, n = 4, 16
    rows = [(x * n + y, x, y) for x in range(n) for y in range(n)]
    df = spark.createDataFrame(rows, "id long, a long, b long")
    cells = {
        r.hkey: (r.a, r.b)
        for r in hilbert_key(df, ["a", "b"], bits=bits).collect()
    }
    for d in range(n * n - 1):
        (x1, y1), (x2, y2) = cells[d], cells[d + 1]
        assert abs(x1 - x2) + abs(y1 - y2) == 1, (d, cells[d], cells[d + 1])


def test_validations(spark):
    df = spark.range(4).select(
        F.col("id").alias("a"), (F.col("id") * 2).alias("b"), F.lit(7).alias("c")
    )
    with pytest.raises(ValueError, match="64-bit"):
        hilbert_key(df, ["a", "b"], bits=32)
    with pytest.raises(ValueError, match="2-D"):
        hilbert_key(df, ["a"])
    with pytest.raises(ValueError, match="2-D"):
        hilbert_key(df, ["a", "b", "c"])
    with pytest.raises(ValueError, match="already exists"):
        hilbert_key(df.withColumn("hkey", F.lit(1)), ["a", "b"])
    # constant column collapses to grid 0 without dividing by zero
    rows = hilbert_key(df, ["a", "c"], bits=8).collect()
    assert len(rows) == 4


def test_layout_locality_beats_linear_sort(spark, sf_dir, tmp_path):
    """Same audit as the zorder test: a centered box filter on the two
    indexed dims must intersect strictly fewer Hilbert-ordered file
    envelopes than the event_id-sorted layout, on both dims at once and
    on each single dim."""
    e = read_table(spark, sf_dir, "events").select("event_id", "user_id", "value")
    hpath = str(tmp_path / "hilbert")
    lpath = str(tmp_path / "linear")
    hilbert_layout(e, ["user_id", "value"], hpath, n_files=16)
    e.repartitionByRange(16, "event_id").write.mode("overwrite").parquet(lpath)

    def envelopes(path):
        return (
            spark.read.parquet(path)
            .groupBy(F.input_file_name().alias("f"))
            .agg(
                F.min("user_id").alias("ulo"), F.max("user_id").alias("uhi"),
                F.min("value").alias("vlo"), F.max("value").alias("vhi"),
            )
            .collect()
        )

    stats = e.agg(
        F.expr("percentile(user_id, 0.45)").alias("u0"),
        F.expr("percentile(user_id, 0.55)").alias("u1"),
        F.expr("percentile(value, 0.45)").alias("v0"),
        F.expr("percentile(value, 0.55)").alias("v1"),
    ).collect()[0]

    def hits(env, u0, u1, v0, v1):
        return sum(
            1
            for r in env
            if (u1 is None or r["ulo"] <= u1)
            and (u0 is None or r["uhi"] >= u0)
            and (v1 is None or r["vlo"] <= v1)
            and (v0 is None or r["vhi"] >= v0)
        )

    henv, lenv = envelopes(hpath), envelopes(lpath)
    assert len(henv) == 16 and len(lenv) == 16
    hh = hits(henv, stats["u0"], stats["u1"], stats["v0"], stats["v1"])
    lh = hits(lenv, stats["u0"], stats["u1"], stats["v0"], stats["v1"])
    assert hh < lh, f"hilbert box hit {hh} files vs linear {lh}"
    assert hh <= 8, f"hilbert box should prune most files, hit {hh}/16"
    hh_u = hits(henv, stats["u0"], stats["u1"], None, None)
    lh_u = hits(lenv, stats["u0"], stats["u1"], None, None)
    hh_v = hits(henv, None, None, stats["v0"], stats["v1"])
    lh_v = hits(lenv, None, None, stats["v0"], stats["v1"])
    assert hh_u < lh_u and hh_v < lh_v
