"""Z-order layout (operators/zorder.py): key portability and the
property the operator exists for — per-file min/max envelopes tight
enough that a selective box filter skips most files on EITHER
dimension."""

from __future__ import annotations

import os

import pytest

from pyspark.sql import functions as F

from bigbookapi_etl_with_airflow_and_snowflake_spark.operators.zorder import (
    zorder_key,
    zorder_layout,
)
from bigbookapi_etl_with_airflow_and_snowflake_spark.sources.files import read_table


def test_zorder_key_locality_beats_linear_sort(spark, sf_dir, tmp_path):
    """Lay the events table out 16-ways (a) Z-ordered on
    (user_id, value) and (b) range-sorted on event_id (the naive
    layout). A centered box filter on the two indexed dims must
    intersect the min/max envelope of strictly fewer Z-ordered files —
    on both dimensions at once AND on each single dimension."""
    e = read_table(spark, sf_dir, "events").select("event_id", "user_id", "value")
    zpath = str(tmp_path / "zorder")
    lpath = str(tmp_path / "linear")
    zorder_layout(e, ["user_id", "value"], zpath, n_files=16)
    (
        e.repartitionByRange(16, "event_id")
        .write.mode("overwrite")
        .parquet(lpath)
    )

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

    zenv, lenv = envelopes(zpath), envelopes(lpath)
    assert len(zenv) == 16 and len(lenv) == 16
    # box on both dims
    zh = hits(zenv, stats["u0"], stats["u1"], stats["v0"], stats["v1"])
    lh = hits(lenv, stats["u0"], stats["u1"], stats["v0"], stats["v1"])
    assert zh < lh, f"z-order box hit {zh} files vs linear {lh}"
    assert zh <= 8, f"z-order box should prune most files, hit {zh}/16"
    # single-dim selectivity: z-order must prune on EACH dimension;
    # the event_id-sorted layout prunes on neither
    zh_u = hits(zenv, stats["u0"], stats["u1"], None, None)
    lh_u = hits(lenv, stats["u0"], stats["u1"], None, None)
    zh_v = hits(zenv, None, None, stats["v0"], stats["v1"])
    lh_v = hits(lenv, None, None, stats["v0"], stats["v1"])
    assert zh_u < lh_u and zh_v < lh_v


def test_zorder_key_validations(spark):
    df = spark.range(4).select(
        F.col("id").alias("a"), (F.col("id") * 2).alias("b"), F.lit(7).alias("c")
    )
    with pytest.raises(ValueError, match="64-bit"):
        zorder_key(df, ["a", "b"], bits=32)
    with pytest.raises(ValueError, match="at least one"):
        zorder_key(df, [])
    with pytest.raises(ValueError, match="already exists"):
        zorder_key(df.withColumn("zkey", F.lit(1)), ["a"])
    # constant column contributes nothing but must not divide by zero
    rows = zorder_key(df, ["a", "c"], bits=8).collect()
    assert len(rows) == 4
    # with the constant dim zeroed, key order follows the varying dim
    keys = [r["zkey"] for r in sorted(rows, key=lambda r: r["a"])]
    assert keys == sorted(keys)


def test_parquet_footer_stats_audits_layout(spark, sf_dir, tmp_path):
    """parquet_footer_stats must agree with a full scan of the same
    files, and the zorder-vs-linear envelope comparison must be
    reproducible from footers alone (the operator's audit use-case)."""
    from bigbookapi_etl_with_airflow_and_snowflake_spark.operators.lake import (
        parquet_footer_stats,
    )

    e = read_table(spark, sf_dir, "events").select("event_id", "user_id", "value")
    zpath = str(tmp_path / "z")
    zorder_layout(e, ["user_id", "value"], zpath, n_files=8)

    stats = {
        (r["file"], r["column"]): r
        for r in parquet_footer_stats(spark, zpath, ["user_id", "value"]).collect()
    }
    truth = {
        (r["f"], r["c"]): r
        for c in ("user_id", "value")
        for r in spark.read.parquet(zpath)
        .groupBy(F.input_file_name().alias("f"))
        .agg(
            F.count(c).alias("nv"),
            F.min(F.col(c).cast("double")).alias("mn"),
            F.max(F.col(c).cast("double")).alias("mx"),
        )
        .withColumn("c", F.lit(c))
        .collect()
    }
    assert len(stats) == len(truth) == 16
    for (f, c), t in truth.items():
        s = stats[(os.path.basename(f), c)]
        assert (s["n_values"], s["min_val"], s["max_val"]) == (
            t["nv"], t["mn"], t["mx"],
        ), (f, c)

    with pytest.raises(ValueError, match="not in"):
        parquet_footer_stats(spark, zpath, ["no_such_col"]).collect()


def test_compact_small_files_bin_packs_and_clusters(spark, tmp_path):
    from bigbookapi_etl_with_airflow_and_snowflake_spark.operators.lake import (
        compact_small_files,
        parquet_footer_stats,
    )

    frag = str(tmp_path / "frag")
    packed = str(tmp_path / "packed")
    df = spark.range(20000).selectExpr("id", "CAST(id % 1000 AS DOUBLE) AS v")
    df.repartition(32).write.parquet(frag)

    stats = compact_small_files(
        spark, frag, packed, target_file_bytes=64 * 1024, order_cols=["id"]
    )
    assert stats["n_files_in"] == 32
    assert 1 < stats["n_files_out"] < 32

    # contents preserved exactly
    back = spark.read.parquet(packed)
    assert back.count() == 20000
    assert back.agg({"id": "sum"}).first()[0] == sum(range(20000))

    # range clustering: per-file id envelopes must be disjoint-ish —
    # total envelope width ~ N, not n_files * N (round-robin would give
    # every file the full [0, 20000) span)
    foot = parquet_footer_stats(spark, packed, ["id"]).collect()
    width = sum(r["max_val"] - r["min_val"] for r in foot)
    assert width < 20000 * 1.2


def test_compact_single_file_floor(spark, tmp_path):
    from bigbookapi_etl_with_airflow_and_snowflake_spark.operators.lake import (
        compact_small_files,
    )

    frag = str(tmp_path / "f2")
    packed = str(tmp_path / "p2")
    spark.range(100).repartition(8).write.parquet(frag)
    stats = compact_small_files(spark, frag, packed)  # default 128 MB target
    assert stats["n_files_out"] == 1
    assert spark.read.parquet(packed).count() == 100
