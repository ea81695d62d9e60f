"""CDC snapshot diff: classification, null transitions, validation."""

from __future__ import annotations

import pytest

from bigbookapi_etl_with_airflow_and_snowflake_spark.operators.cdc import snapshot_diff


def _d(spark, rows):
    return spark.createDataFrame(rows, "k int, a string, v double")


def test_classifies_all_three_changes(spark):
    old = _d(spark, [(1, "x", 1.0), (2, "y", 2.0), (3, "z", 3.0)])
    new = _d(spark, [(2, "y", 2.0), (3, "z", 9.0), (4, "w", 4.0)])
    got = {r["k"]: r["change_type"] for r in snapshot_diff(old, new, ["k"]).collect()}
    assert got == {1: "delete", 3: "update", 4: "insert"}  # 2 unchanged, absent


def test_null_transitions_are_updates(spark):
    old = _d(spark, [(1, None, 1.0), (2, "b", None)])
    new = _d(spark, [(1, "a", 1.0), (2, "b", None)])
    rows = snapshot_diff(old, new, ["k"]).collect()
    assert {r["k"]: r["change_type"] for r in rows} == {1: "update"}
    r = rows[0]
    assert r["old_a"] is None and r["new_a"] == "a"


def test_payload_columns_carry_both_sides(spark):
    old = _d(spark, [(1, "x", 1.0)])
    new = _d(spark, [(1, "x", 5.0)])
    r = snapshot_diff(old, new, ["k"]).collect()[0]
    assert (r["old_v"], r["new_v"]) == (1.0, 5.0)


def test_compare_cols_subset_ignores_other_changes(spark):
    old = _d(spark, [(1, "x", 1.0)])
    new = _d(spark, [(1, "CHANGED", 1.0)])
    assert snapshot_diff(old, new, ["k"], compare_cols=["v"]).count() == 0


def test_missing_column_in_new_rejected(spark):
    old = _d(spark, [(1, "x", 1.0)])
    new = spark.createDataFrame([(1, "x")], "k int, a string")
    with pytest.raises(ValueError, match="missing"):
        snapshot_diff(old, new, ["k"])


def test_url_parts_fields(spark):
    from pyspark.sql import functions as F

    from bigbookapi_etl_with_airflow_and_snowflake_spark.operators.text import url_parts

    df = spark.createDataFrame(
        [
            ("https://a.b.example.com/x/y?q=hi&r=2#f",),
            ("http://example.org?q=1",),
            ("ftp://h/",),
            ("not a url",),
        ],
        "u string",
    )
    rows = df.select(url_parts(F.col("u")).alias("p")).collect()
    p0 = rows[0]["p"]
    assert (p0["scheme"], p0["host"], p0["domain"], p0["path"], p0["q"]) == (
        "https", "a.b.example.com", "example.com", "/x/y", "hi",
    )
    p1 = rows[1]["p"]
    assert (p1["scheme"], p1["host"], p1["domain"], p1["path"], p1["q"]) == (
        "http", "example.org", "example.org", "", "1",
    )
    assert rows[2]["p"]["domain"] == ""  # single-label host: no blocklist key
    assert rows[3]["p"]["scheme"] == ""


def test_normalize_nfc_composes(spark):
    from pyspark.sql import functions as F

    from bigbookapi_etl_with_airflow_and_snowflake_spark.operators.text import (
        normalize_nfc,
    )

    df = spark.createDataFrame([("cafe\u0301",), ("A\u030a",), (None,)], "t string")
    got = [r["n"] for r in df.select(normalize_nfc(F.col("t")).alias("n")).collect()]
    assert got == ["caf\u00e9", "\u00c5", None]
