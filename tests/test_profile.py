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


def test_snapshot_drift_exact(spark):
    from bigbookapi_etl_with_airflow_and_snowflake_spark.operators.profile import (
        snapshot_drift,
    )

    ref = spark.createDataFrame(
        [(i, "a" if i < 8 else "b") for i in range(10)], "x long, cat string"
    )
    # cur shifts 2 rows out of 'a' into 'b' and pushes one value past max
    cur = spark.createDataFrame(
        [(i, "a" if i < 6 else "b") for i in range(9)] + [(99, "b")],
        "x long, cat string",
    )
    out = {
        r["col_name"]: r
        for r in snapshot_drift(ref, cur, ["x"], ["cat"], n_bins=5).collect()
    }
    # ref range 0..9 → width 2, bins 0..4; cur's 99 lands in overflow bin 5
    x = out["x"]
    assert (x["n_ref"], x["n_cur"]) == (10, 10)
    # per-bin ref counts: 2,2,2,2,2 / cur: 2,2,2,2,1 + 1 in overflow
    # TV = 0.5*(0+0+0+0+0.1+0.1) = 0.1 → 100 pm; top bin tie → '4' < '5'
    assert x["tv_pm"] == 100
    assert x["top_shift_bin"] == "4"
    c = out["cat"]
    # a: 8→6, b: 2→4 → TV = 0.2 → 200 pm; top bin tie → 'a' < 'b'
    assert c["tv_pm"] == 200
    assert c["top_shift_bin"] == "a"


def test_snapshot_drift_underflow_and_null_bins(spark):
    from bigbookapi_etl_with_airflow_and_snowflake_spark.operators.profile import (
        snapshot_drift,
    )

    ref = spark.createDataFrame([(10, "a"), (20, "a")], "x long, cat string")
    cur = spark.createDataFrame([(-5, None), (15, "a")], "x long, cat string")
    out = {
        r["col_name"]: r
        for r in snapshot_drift(ref, cur, ["x"], ["cat"], n_bins=2).collect()
    }
    assert out["x"]["top_shift_bin"] == "-1"  # mass below the ref range
    assert out["cat"]["tv_pm"] == 500  # half the mass moved to the null bin


def test_snapshot_drift_identical_and_empty(spark):
    from bigbookapi_etl_with_airflow_and_snowflake_spark.operators.profile import (
        snapshot_drift,
    )

    ref = spark.createDataFrame([(i,) for i in range(20)], "x long")
    same = snapshot_drift(ref, ref, ["x"], n_bins=4).collect()
    assert same[0]["tv_pm"] == 0
    empty = ref.filter("x < 0")
    gone = snapshot_drift(ref, empty, ["x"], n_bins=4).collect()
    assert gone[0]["tv_pm"] == 1000  # empty side = total drift by definition


def test_snapshot_drift_validation(spark):
    from bigbookapi_etl_with_airflow_and_snowflake_spark.operators.profile import (
        snapshot_drift,
    )

    df = spark.createDataFrame([(1,)], "x long")
    with pytest.raises(ValueError, match="no columns"):
        snapshot_drift(df, df)
    with pytest.raises(ValueError, match="n_bins"):
        snapshot_drift(df, df, ["x"], n_bins=0)
    with pytest.raises(ValueError, match="no rows"):
        snapshot_drift(df.filter("x < 0"), df, ["x"])


def test_snapshot_drift_numeric_nulls_get_own_bin(spark):
    from bigbookapi_etl_with_airflow_and_snowflake_spark.operators.profile import (
        snapshot_drift,
    )

    ref = spark.createDataFrame([(i,) for i in range(10)], "x long")
    cur = spark.createDataFrame([(None,)] * 5 + [(5,)] * 5, "x long")
    out = snapshot_drift(ref, cur, ["x"], n_bins=5).collect()[0]
    # half the mass is MISSING, not out-of-range — the null bin wins
    assert out["top_shift_bin"] == "\x00null"
    assert out["tv_pm"] >= 500
