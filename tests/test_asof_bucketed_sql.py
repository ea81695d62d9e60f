"""Tests: generic as-of join semantics, bucketed shuffle-free joins,
and the SQL facade."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from bigbookapi_etl_with_airflow_and_snowflake_spark.operators.asof import asof_join
from bigbookapi_etl_with_airflow_and_snowflake_spark.plans.introspect import (
    explain_str,
    shuffle_count,
)
from bigbookapi_etl_with_airflow_and_snowflake_spark.sinks.bucketed import (
    read_bucketed,
    write_bucketed,
)
from bigbookapi_etl_with_airflow_and_snowflake_spark.sources.files import read_table
from bigbookapi_etl_with_airflow_and_snowflake_spark import sql as sqlmod


# --- as-of join ---------------------------------------------------------


def test_asof_join_basic(spark):
    trades = spark.createDataFrame(
        [("A", 10, 1), ("A", 20, 2), ("B", 15, 3), ("A", 5, 4)],
        "sym string, t long, trade_id long",
    )
    quotes = spark.createDataFrame(
        [("A", 8, 100.0), ("A", 10, 101.0), ("A", 18, 102.0), ("B", 999, 9.0)],
        "sym string, t long, px double",
    )
    out = asof_join(trades, quotes, on="t", by=["sym"], payload_cols=["px"])
    got = {r["trade_id"]: r["px_asof"] for r in out.collect()}
    assert got == {
        1: 101.0,  # quote at exactly t=10 matches (<=)
        2: 102.0,  # latest quote before t=20
        3: None,  # B has no quote at/before 15
        4: None,  # A has no quote at/before 5
    }


def test_asof_join_is_one_shuffle(spark):
    trades = spark.createDataFrame([("A", 10, 1)], "sym string, t long, trade_id long")
    quotes = spark.createDataFrame([("A", 8, 1.0)], "sym string, t long, px double")
    out = asof_join(trades, quotes, on="t", by=["sym"], payload_cols=["px"])
    # union + window → exactly one hash shuffle (the window partition)
    assert shuffle_count(out) == 1


# --- bucketed co-located join ------------------------------------------


def test_bucketed_join_has_no_shuffle(spark, sf_dir, tmp_path):
    orders = read_table(spark, sf_dir, "orders")
    li = read_table(spark, sf_dir, "lineitem")
    write_bucketed(
        orders, "b_orders", ["o_orderkey"], 8,
        path=str(tmp_path / "b_orders"), sort_by=["o_orderkey"],
    )
    write_bucketed(
        li, "b_lineitem", ["l_orderkey"], 8,
        path=str(tmp_path / "b_lineitem"), sort_by=["l_orderkey"],
    )
    a = read_bucketed(spark, "b_orders")
    b = read_bucketed(spark, "b_lineitem")
    # force the non-broadcast path: at cluster scale neither side of a
    # fact⋈fact join broadcasts — that's the case bucketing exists for
    threshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = a.join(b, a.o_orderkey == b.l_orderkey).select(
            "o_orderkey", "l_linenumber", "o_totalprice", "l_quantity"
        )
        # co-located: the sort-merge join needs NO exchange on either side
        assert shuffle_count(joined) == 0
        assert "SortMergeJoin" in explain_str(joined, "simple")
        # and results match the plain (shuffling) join
        plain = orders.join(li, orders.o_orderkey == li.l_orderkey)
        assert joined.count() == plain.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold)


# --- SQL facade ---------------------------------------------------------


def test_sql_facade_matches_dataframe(spark, sf_dir):
    sqlmod.register_corpus(spark, sf_dir)
    got = sqlmod.sql(
        spark,
        """
        SELECT o_orderstatus, COUNT(*) AS n
        FROM orders GROUP BY o_orderstatus
        """,
    ).collect()
    want = (
        read_table(spark, sf_dir, "orders")
        .groupBy("o_orderstatus")
        .agg(F.count("*").alias("n"))
        .collect()
    )
    assert sorted(map(tuple, got)) == sorted(map(tuple, want))


def test_sql_facade_events_ts_normalized(spark, sf_dir):
    sqlmod.register_corpus(spark, sf_dir)
    row = sqlmod.sql(spark, "SELECT MAX(ts) AS m FROM events").first()
    # ts must be a usable timestamp (ns→µs normalization applied in views)
    assert row["m"].year >= 1999
