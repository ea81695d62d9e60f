"""Grouped applyInPandas features verified against DataFrame-native
equivalents (session counts vs the sessionize window logic)."""

from __future__ import annotations

from pyspark.sql import functions as F

from bigbookapi_etl_with_airflow_and_snowflake_spark.operators.grouped import (
    user_behavior_features,
)
from bigbookapi_etl_with_airflow_and_snowflake_spark import queries as Q
from bigbookapi_etl_with_airflow_and_snowflake_spark.sources.files import read_table


def test_features_match_native(spark, sf_dir):
    events = read_table(spark, sf_dir, "events").cache()
    feats = user_behavior_features(events).cache()

    # n_events per user matches a plain groupBy
    got_n = {r["user_id"]: r["n_events"] for r in feats.collect()}
    want_n = {
        r["user_id"]: r["n"]
        for r in events.groupBy("user_id").agg(F.count("*").alias("n")).collect()
    }
    assert got_n == want_n

    # n_sessions matches the sessionize window query (session_id starts
    # at 1 on the first event, so max(session_id) IS the session count)
    sess = Q.q_sessionize(spark, sf_dir)
    want_s = {
        r["user_id"]: r["m"]
        for r in sess.groupBy("user_id").agg(F.max("session_id").alias("m")).collect()
    }
    got_s = {r["user_id"]: r["n_sessions"] for r in feats.collect()}
    assert got_s == want_s

    # n_types bounded by the 5-type domain; gaps sane
    rows = feats.collect()
    assert all(1 <= r["n_types"] <= 5 for r in rows)
    assert all(
        r["mean_gap_s"] is None or r["mean_gap_s"] >= 0 for r in rows
    )


def test_features_partition_independent(spark, sf_dir):
    events = read_table(spark, sf_dir, "events")
    a = sorted(map(tuple, user_behavior_features(events.repartition(1)).collect()))
    b = sorted(map(tuple, user_behavior_features(events.repartition(13)).collect()))
    assert a == b
