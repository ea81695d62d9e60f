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


# ---------------------------------------------------------------------------
# SQL scalar function library
# ---------------------------------------------------------------------------


def test_sql_functions_match_dataframe_semantics(spark, sf_dir):
    """SQL-facade functions must produce the exact values the DataFrame
    queries compute (same parity conventions), and stay inlined in
    codegen (no Python UDF wall)."""
    from pyspark.sql import functions as F

    from bigbookapi_etl_with_airflow_and_snowflake_spark.functions.sqlfuncs import (
        register_sql_functions,
    )
    from bigbookapi_etl_with_airflow_and_snowflake_spark.sql import register_corpus

    names = register_sql_functions(spark)
    assert set(names) >= {"line_revenue", "token_count", "split_of", "md5_bucket"}
    register_corpus(spark, sf_dir)

    # revenue: SQL function == queries.py exact-decimal expression
    got = spark.sql(
        "SELECT CAST(SUM(line_revenue(l_extendedprice, l_discount)) AS DOUBLE) AS r"
        " FROM lineitem"
    ).first()["r"]
    one = F.lit(1).cast("decimal(4,2)")
    want = (
        spark.table("lineitem")
        .agg(
            F.sum(
                F.col("l_extendedprice").cast("decimal(12,2)")
                * (one - F.col("l_discount").cast("decimal(4,2)"))
            ).cast("double").alias("r")
        )
        .first()["r"]
    )
    # both sum per-row doubles vs decimal — compare the per-row forms
    per_row_sql = spark.sql(
        "SELECT line_revenue(l_extendedprice, l_discount) AS r FROM lineitem LIMIT 50"
    ).toPandas()
    per_row_df = (
        spark.table("lineitem")
        .select(
            (
                F.col("l_extendedprice").cast("decimal(12,2)")
                * (one - F.col("l_discount").cast("decimal(4,2)"))
            ).cast("double").alias("r")
        )
        .limit(50)
        .toPandas()
    )
    assert (per_row_sql["r"].values == per_row_df["r"].values).all()
    assert got is not None and want is not None

    # split_of: SQL function == q_train_test_split assignment
    from bigbookapi_etl_with_airflow_and_snowflake_spark.queries_ext import (
        q_train_test_split,
    )

    sql_split = spark.sql(
        "SELECT doc_id, split_of(CAST(doc_id AS STRING)) AS split FROM documents"
    ).toPandas().sort_values("doc_id").reset_index(drop=True)
    df_split = (
        q_train_test_split(spark, sf_dir).toPandas().sort_values("doc_id").reset_index(drop=True)
    )
    assert sql_split.equals(df_split)

    # md5_bucket: uniform-ish and stable
    b = spark.sql(
        "SELECT md5_bucket(CAST(doc_id AS STRING), '#shard', 8) AS bkt FROM documents"
    ).toPandas()["bkt"]
    assert set(b.unique()) <= set(range(8))

    # inlined: no BatchEvalPython / PythonUDF in the plan
    plan = spark.sql(
        "SELECT line_revenue(l_extendedprice, l_discount) FROM lineitem"
    )._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan
