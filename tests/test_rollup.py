"""Incremental rollup correctness: folding increments must equal
aggregating from scratch, including late data landing in existing
buckets."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from bigbookapi_etl_with_airflow_and_snowflake_spark.operators.rollup import (
    refresh_rollup,
    rollup_increment,
)
from bigbookapi_etl_with_airflow_and_snowflake_spark.sources.files import read_table

AGGS = [
    ("count", "event_id", "n_events"),
    ("sum", "value", "sum_value"),
    ("min", "value", "min_value"),
    ("max", "value", "max_value"),
]


def _rows(df):
    return sorted(
        (r["bucket_start"], r["event_type"], r["n_events"],
         None if r["sum_value"] is None else round(r["sum_value"], 6),
         r["min_value"], r["max_value"])
        for r in df.collect()
    )


def test_incremental_equals_from_scratch(spark, sf_dir, tmp_path):
    events = read_table(spark, sf_dir, "events").cache()
    path = str(tmp_path / "rollup")

    # three increments split arbitrarily (by event_id mod 3) — each
    # lands rows into MANY already-existing buckets (the late-data case)
    for i in range(3):
        inc = events.filter(F.col("event_id") % 3 == i)
        refresh_rollup(spark, inc, path, "ts", "hour", ["event_type"], AGGS)

    got = spark.read.parquet(path)
    want = rollup_increment(events, "ts", "hour", ["event_type"], AGGS)
    assert _rows(got) == _rows(want)


def test_rollup_grows_with_new_buckets(spark, sf_dir, tmp_path):
    events = read_table(spark, sf_dir, "events")
    path = str(tmp_path / "rollup2")
    half_ts = events.approxQuantile("event_id", [0.5], 0)[0]
    early = events.filter(F.col("event_id") <= half_ts)
    late = events.filter(F.col("event_id") > half_ts)
    n1 = refresh_rollup(spark, early, path, "ts", "hour", ["event_type"], AGGS)
    n2 = refresh_rollup(spark, late, path, "ts", "hour", ["event_type"], AGGS)
    assert n2 >= n1
    total = spark.read.parquet(path).agg(F.sum("n_events")).first()[0]
    assert total == events.count()


def test_rollup_rejects_non_decomposable(spark, sf_dir, tmp_path):
    events = read_table(spark, sf_dir, "events")
    with pytest.raises(ValueError):
        rollup_increment(events, "ts", "hour", ["event_type"], [("avg", "value", "a")])
