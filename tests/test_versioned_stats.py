"""Recorded per-file stats in the manifest (write_version stats_cols —
the Delta add-file-stats pattern): range pruning decides driver-side
with zero footer I/O, the column list inherits across appends, every
DML path carries entries for surviving files and records the rewritten
increment, and files without entries degrade to the footer pass.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bigbookapi_etl_with_airflow_and_snowflake_spark.sinks.versioned import (
    _load_manifest,
    delete_version,
    merge_version,
    optimize_table,
    read_version,
    read_version_pruned,
    restore_version,
    update_version,
    write_version,
)


@pytest.fixture()
def table(tmp_path):
    return str(tmp_path / "tbl")


def _df(spark, lo=0, hi=1000):
    return spark.range(lo, hi).select(
        F.col("id"), (F.col("id") % 7).alias("g"), (F.col("id") * 2).alias("v")
    )


def _probe(spark, table, lo, hi):
    df, info = read_version_pruned(spark, table, ranges={"id": (lo, hi)})
    return sorted(r["id"] for r in df.collect()), info


def test_recorded_stats_prune_with_zero_footer_reads(spark, table):
    write_version(
        spark, _df(spark).repartitionByRange(4, "id"), table,
        stats_cols=["id"],
    )
    ids, info = _probe(spark, table, 10, 20)
    assert ids == list(range(10, 21))
    assert info["files_read"] < info["files_total"] == 4
    assert info["footer_files"] == 0  # decided from the manifest alone


def test_stats_cols_inherit_across_appends(spark, table):
    write_version(
        spark, _df(spark, 0, 500).repartitionByRange(2, "id"), table,
        stats_cols=["id"],
    )
    write_version(
        spark, _df(spark, 500, 1000).repartitionByRange(2, "id"), table,
        mode="append",  # no stats_cols passed: inherited
    )
    m = _load_manifest(table, 2)
    assert m["stats_cols"] == ["id"]
    assert len(m["stats"]) == len(m["files"])  # every file has an entry
    ids, info = _probe(spark, table, 700, 710)
    assert ids == list(range(700, 711))
    assert info["footer_files"] == 0


def test_dml_paths_carry_and_record(spark, table):
    write_version(
        spark, _df(spark).repartitionByRange(4, "id"), table,
        stats_cols=["id"],
    )
    delete_version(spark, table, "id >= 900")  # COW: rewrites one file
    update_version(spark, table, "id < 50", {"v": F.lit(0)})  # COW
    delete_version(spark, table, "id % 97 = 0", mode="mor")  # files same
    update_version(
        spark, table, "id = 123", {"v": F.lit(1)}, mode="mor"
    )  # appends an image file
    inc = spark.range(2000, 2100).select(
        F.col("id"), (F.col("id") % 7).alias("g"), (F.col("id") * 2).alias("v")
    )
    merge_version(spark, inc, table, keys=["id"])
    m = _load_manifest(table, None)
    assert m["stats_cols"] == ["id"]
    assert set(m["stats"]) == set(m["files"])  # full coverage after 5 DMLs
    ids, info = _probe(spark, table, 2050, 2060)
    assert ids == list(range(2050, 2061))
    assert info["footer_files"] == 0


def test_restore_copies_stats(spark, table):
    write_version(
        spark, _df(spark).repartitionByRange(4, "id"), table,
        stats_cols=["id"],
    )
    delete_version(spark, table, "id >= 500")
    restore_version(spark, table, 1)
    m = _load_manifest(table, 3)
    assert set(m["stats"]) == set(m["files"])
    _, info = _probe(spark, table, 900, 910)
    assert info["footer_files"] == 0


def test_optimize_overwrite_inherits_stats(spark, table):
    write_version(
        spark, _df(spark).repartition(8), table, stats_cols=["id"]
    )
    optimize_table(spark, table, cluster_by=["id"], target_file_bytes=4096)
    m = _load_manifest(table, None)
    assert m["stats_cols"] == ["id"]
    assert set(m["stats"]) == set(m["files"])
    _, info = _probe(spark, table, 10, 20)
    assert info["files_read"] < info["files_total"]
    assert info["footer_files"] == 0


def test_uncovered_files_degrade_to_footers_only_for_themselves(spark, table):
    # v1 has NO stats; the append introduces them — only v1's files
    # should need footers on a later probe
    write_version(spark, _df(spark, 0, 500).repartitionByRange(2, "id"), table)
    write_version(
        spark,
        _df(spark, 500, 1000).repartitionByRange(2, "id"),
        table,
        mode="append",
        stats_cols=["id"],
    )
    ids, info = _probe(spark, table, 600, 610)
    assert ids == list(range(600, 611))
    assert info["footer_files"] == 2  # exactly v1's uncovered files
    assert info["files_read"] < info["files_total"]


def test_pruned_equals_unpruned(spark, table):
    write_version(
        spark, _df(spark).repartitionByRange(4, "id"), table,
        stats_cols=["id"],
    )
    got, _ = _probe(spark, table, 240, 260)
    want = sorted(
        r["id"]
        for r in read_version(spark, table)
        .filter("id >= 240 AND id <= 260")
        .collect()
    )
    assert got == want
