"""Salted-aggregation/join equivalence: skew-mitigated plans must be
value-identical to their plain forms."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from bigbookapi_etl_with_airflow_and_snowflake_spark.operators.skew import (
    replicate_broadcast_join,
    salted_agg,
)
from bigbookapi_etl_with_airflow_and_snowflake_spark.sources.files import read_table


def _sorted_rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_salted_agg_matches_plain(spark, sf_dir):
    li = read_table(spark, sf_dir, "lineitem")
    got = salted_agg(
        li,
        keys=["l_returnflag"],
        aggs=[
            ("sum", "l_quantity", "sum_qty"),
            ("count", "l_orderkey", "n_rows"),
            ("min", "l_shipdate", "first_ship"),
            ("max", "l_shipdate", "last_ship"),
        ],
        salt_on="l_orderkey",
        buckets=16,
    )
    want = li.groupBy("l_returnflag").agg(
        F.sum("l_quantity").alias("sum_qty"),
        F.count("l_orderkey").alias("n_rows"),
        F.min("l_shipdate").alias("first_ship"),
        F.max("l_shipdate").alias("last_ship"),
    )
    assert _sorted_rows(got) == _sorted_rows(want)


def test_salted_agg_on_skewed_data(spark):
    # 90% of rows share one hot key — the case salting exists for
    rows = [(("hot" if i % 10 else f"k{i}"), i, float(i)) for i in range(5000)]
    df = spark.createDataFrame(rows, "key string, id long, v double")
    got = salted_agg(
        df, ["key"], [("sum", "v", "sv"), ("count", "id", "n")], salt_on="id"
    )
    want = df.groupBy("key").agg(F.sum("v").alias("sv"), F.count("id").alias("n"))
    assert _sorted_rows(got) == _sorted_rows(want)


def test_salted_agg_rejects_non_decomposable(spark, sf_dir):
    li = read_table(spark, sf_dir, "lineitem")
    with pytest.raises(ValueError):
        salted_agg(li, ["l_returnflag"], [("avg", "l_quantity", "a")], "l_orderkey")


def test_replicated_join_matches_plain(spark, sf_dir):
    orders = read_table(spark, sf_dir, "orders").withColumnRenamed(
        "o_custkey", "custkey"
    )
    cust = read_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("custkey"), "c_name"
    )
    got = replicate_broadcast_join(
        orders, cust, on="custkey", buckets=4, salt_on="o_orderkey"
    )
    want = orders.join(cust, "custkey")
    assert got.count() == want.count()
    assert _sorted_rows(got.select("o_orderkey", "c_name")) == _sorted_rows(
        want.select("o_orderkey", "c_name")
    )
