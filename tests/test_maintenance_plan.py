"""Metadata-only maintenance advisor (sinks/versioned.py
layout_report / maintenance_plan): fragmentation, DV pressure, and
declustering each trigger an OPTIMIZE recommendation from manifest +
recorded stats alone; running optimize_table resets all three.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bigbookapi_etl_with_airflow_and_snowflake_spark.sinks.versioned import (
    delete_version,
    layout_report,
    maintenance_plan,
    optimize_table,
    write_version,
)


@pytest.fixture()
def table(tmp_path):
    return str(tmp_path / "tbl")


def _df(spark, n=4000):
    return spark.range(n).select(
        F.col("id"), (F.col("id") % 7).alias("g"), (F.col("id") * 2).alias("v")
    )


def test_layout_report_clustered_vs_scattered(spark, table):
    write_version(
        spark, _df(spark).repartitionByRange(8, "id"), table,
        stats_cols=["id"],
    )
    clustered = layout_report(table, "id")
    assert clustered["n_covered"] == clustered["n_files"]
    assert clustered["avg_point_reads"] < 2.0  # disjoint ranges ≈ 1.0
    write_version(
        spark, _df(spark).repartition(8), table, mode="overwrite",
        stats_cols=["id"],
    )
    scattered = layout_report(table, "id")
    # every round-robin file spans the whole id domain: probes read all
    assert scattered["avg_point_reads"] > 6.0


def test_layout_report_without_stats_is_honest(spark, table):
    write_version(spark, _df(spark), table)
    rep = layout_report(table, "id")
    assert rep["n_covered"] == 0 and rep["avg_point_reads"] is None


def test_maintenance_triggers_and_reset(spark, table):
    # fragmented + declustered + DV-heavy, all at once
    write_version(
        spark, _df(spark).repartition(16), table, stats_cols=["id"]
    )
    for i in range(5):
        delete_version(spark, table, f"id % 97 = {i}", mode="mor")
    plan = maintenance_plan(table, cluster_col="id")
    assert plan["fragmented"]  # 16 tiny files
    assert plan["dv_heavy"]  # 5 sidecars > 4
    assert plan["declustered"]  # hash layout
    assert plan["recommend_optimize"]
    optimize_table(spark, table, cluster_by=["id"])
    after = maintenance_plan(
        table, cluster_col="id", small_file_bytes=1024
    )
    assert not after["dv_heavy"] and not after["declustered"]
    assert not after["fragmented"]  # packed files exceed the tiny bar
    assert not after["recommend_optimize"]


def test_healthy_table_gets_no_recommendation(spark, table):
    write_version(
        spark, _df(spark).repartitionByRange(2, "id"), table,
        stats_cols=["id"],
    )
    plan = maintenance_plan(table, cluster_col="id", small_file_bytes=1024)
    assert plan == {
        "n_files": 2,
        "n_small_files": 0,
        "n_dv_files": 0,
        "avg_point_reads": plan["avg_point_reads"],
        "fragmented": False,
        "dv_heavy": False,
        "declustered": False,
        "recommend_optimize": False,
    }
    assert plan["avg_point_reads"] < 2.0
