"""Change data feed (read_changes) on versioned tables: manifest-driven
scoping (carried files never scanned), row-level diffs for COW rewrites,
DV-diff rows for MOR deletes, multiset multiplicity, schema evolution,
and the composition with the incremental rollup consumer."""

from __future__ import annotations

from collections import Counter

import pytest
from pyspark.sql import functions as F

from bigbookapi_etl_with_airflow_and_snowflake_spark.sinks.versioned import (
    delete_version,
    merge_version,
    read_changes,
    read_version,
    write_version,
)


@pytest.fixture()
def table(tmp_path):
    return str(tmp_path / "tbl")


def _df(spark, lo=0, hi=100):
    return spark.range(lo, hi).select(
        F.col("id"), (F.col("id") % 7).alias("g"), (F.col("id") * 2).alias("v")
    )


def _changes(spark, table, a, b, info=None):
    return sorted(
        (r["id"], r["_change_type"])
        for r in read_changes(spark, table, a, b, info=info).collect()
    )


def test_cdf_across_append_cow_mor(spark, table):
    write_version(spark, _df(spark).repartitionByRange(4, "id"), table)
    write_version(spark, _df(spark, 100, 120).coalesce(1), table, mode="append")
    delete_version(spark, table, "id < 10", mode="cow")
    delete_version(spark, table, "id >= 50 AND id < 60", mode="mor")
    info = {}
    got = _changes(spark, table, 1, 4, info=info)
    assert got == sorted(
        [(i, "insert") for i in range(100, 120)]
        + [(i, "delete") for i in range(10)]
        + [(i, "delete") for i in range(50, 60)]
    )
    # the carried high-key files were never scanned
    assert info["files_scanned_before"] < info["files_before"]


def test_cdf_carried_files_contribute_nothing(spark, table):
    """A version step that touches nothing (append of an empty frame
    aside — use a MOR no-op) scans zero files."""
    write_version(spark, _df(spark).repartitionByRange(4, "id"), table)
    delete_version(spark, table, "id = -1", mode="mor")  # matches nothing
    info = {}
    assert _changes(spark, table, 1, 2, info=info) == []
    assert info["files_scanned_before"] == 0
    assert info["files_scanned_after"] == 0


def test_cdf_consecutive_mor_scans_only_dv_changed_files(spark, table):
    write_version(spark, _df(spark).repartitionByRange(4, "id"), table)
    delete_version(spark, table, "id >= 50 AND id < 60", mode="mor")
    info = {}
    got = _changes(spark, table, 1, 2, info=info)
    assert got == [(i, "delete") for i in range(50, 60)]
    # only the file(s) holding [50, 60) — the range clustering bounds it
    assert info["files_scanned_before"] <= 2
    assert info["files_scanned_before"] == info["files_scanned_after"]


def test_cdf_bootstrap_from_zero_is_all_inserts(spark, table):
    write_version(spark, _df(spark).repartition(2), table)
    delete_version(spark, table, "g = 3", mode="cow")
    ch = read_changes(spark, table, 0, 2)
    c = Counter(r["_change_type"] for r in ch.collect())
    assert c == {"insert": read_version(spark, table).count()}


def test_cdf_same_version_is_empty_and_backward_is_loud(spark, table):
    write_version(spark, _df(spark), table)
    write_version(spark, _df(spark, 100, 110), table, mode="append")
    assert read_changes(spark, table, 2, 2).count() == 0
    with pytest.raises(ValueError, match="forward-only"):
        read_changes(spark, table, 2, 1)


def test_cdf_update_is_delete_insert_pair(spark, table):
    write_version(spark, _df(spark).repartitionByRange(4, "id"), table)
    inc = spark.range(20, 25).select(
        "id", (F.col("id") % 7).alias("g"), F.lit(999).cast("long").alias("v")
    )
    merge_version(spark, inc, table, keys=["id"])
    got = sorted(
        (r["id"], r["v"], r["_change_type"])
        for r in read_changes(spark, table, 1, 2).collect()
    )
    assert got == sorted(
        [(i, i * 2, "delete") for i in range(20, 25)]
        + [(i, 999, "insert") for i in range(20, 25)]
    )


def test_cdf_multiset_multiplicity(spark, table):
    dup = spark.createDataFrame([(1, "a")] * 3 + [(2, "b")], "k long, s string")
    write_version(spark, dup.repartition(1), table)
    delete_version(spark, table, "k = 1", mode="mor")
    c = Counter(
        (r["k"], r["_change_type"])
        for r in read_changes(spark, table, 1, 2).collect()
    )
    assert c == {(1, "delete"): 3}


def test_cdf_high_multiplicity_is_chunked_not_one_array(spark, table):
    """A duplicate-heavy group (multiplicity far past the 4096 chunk)
    must expand to exactly net rows — the expansion is two nested
    bounded explodes, never one sequence(1, net) array whose size grows
    with the multiplicity (1e8 duplicates would be ~800MB in one unsafe
    row; dedup corpora make that realistic)."""
    n = 10_001  # 3 chunks: 4096 + 4096 + 1809
    dup = spark.range(n).select(
        F.lit(7).alias("k"), F.lit("same").alias("s")
    )
    write_version(spark, dup.repartition(2), table)
    write_version(spark, dup.limit(0), table)  # overwrite-to-empty
    c = Counter(
        (r["k"], r["_change_type"])
        for r in read_changes(spark, table, 1, 2).collect()
    )
    assert c == {(7, "delete"): n}


def test_cdf_unchanged_dv_lists_short_circuit(spark, table):
    """Appends AFTER a MOR delete carry the sidecar list verbatim —
    the DV delta between such versions is provably empty from the
    manifests alone, so no sidecar may be scanned and the carried
    files stay out of scope."""
    write_version(spark, _df(spark).repartitionByRange(4, "id"), table)
    delete_version(spark, table, "id < 5", mode="mor")  # v2: DV sidecar
    write_version(spark, _df(spark, 100, 110), table, mode="append")  # v3
    info = {}
    got = _changes(spark, table, 2, 3, info=info)
    assert got == [(i, "insert") for i in range(100, 110)]
    # only the appended files were scanned; the DV-carrying common
    # files contributed nothing and were never opened
    assert info["files_scanned_before"] == 0
    assert info["files_scanned_after"] > 0


def test_cdf_schema_evolution_null_fills_older_side(spark, table):
    write_version(spark, _df(spark, 0, 10).repartition(1), table)
    evolved = _df(spark, 10, 15).withColumn("extra", F.col("id") + 1)
    write_version(spark, evolved, table, mode="append", merge_schema=True)
    rows = {
        r["id"]: (r["extra"], r["_change_type"])
        for r in read_changes(spark, table, 1, 2).collect()
    }
    assert set(rows) == set(range(10, 15))
    assert all(rows[i] == (i + 1, "insert") for i in range(10, 15))
    # union schema carries the evolved column even when diffing v1→v1
    assert "extra" in read_changes(spark, table, 1, 2).columns


def test_cdf_type_change_across_overwrite_is_loud(spark, table):
    write_version(spark, spark.range(5).select(F.col("id").cast("long")), table)
    write_version(spark, spark.range(5).select(F.col("id").cast("int")), table)
    with pytest.raises(ValueError, match="types changed"):
        read_changes(spark, table, 1, 2)


def test_cdf_reserved_column_collision_is_loud(spark, table):
    df = spark.range(3).select(F.col("id"), F.lit("x").alias("_change_type"))
    write_version(spark, df, table)
    with pytest.raises(ValueError, match="_change_type"):
        read_changes(spark, table, 0, 1)


def test_cdf_feeds_incremental_rollup(spark, table, tmp_path):
    """The incremental producer meets the incremental consumer: an
    append-only versioned events table, with each version step's insert
    feed folded into the materialized rollup — final rollup equals the
    from-scratch aggregation of the latest snapshot."""
    from bigbookapi_etl_with_airflow_and_snowflake_spark.operators.rollup import (
        refresh_rollup,
    )

    ev = spark.range(300).select(
        F.col("id").alias("event_id"),
        F.timestamp_micros(
            (F.lit(1_700_000_000_000_000) + F.col("id") * 600_000_000).cast("long")
        ).alias("ts"),
        (F.col("id") % 3).cast("string").alias("event_type"),
        (F.col("id") % 11).cast("double").alias("value"),
    )
    write_version(spark, ev.filter("event_id < 100"), table)
    write_version(spark, ev.filter("event_id >= 100 AND event_id < 200"), table, mode="append")
    write_version(spark, ev.filter("event_id >= 200"), table, mode="append")

    aggs = [("count", "event_id", "n"), ("min", "value", "vmin"), ("max", "value", "vmax")]
    rollup = str(tmp_path / "rollup")
    for prev, cur in [(0, 1), (1, 2), (2, 3)]:
        inc = read_changes(spark, table, prev, cur).filter(
            "_change_type = 'insert'"
        ).drop("_change_type")
        refresh_rollup(spark, inc, rollup, "ts", "hour", ["event_type"], aggs)

    got = sorted(
        map(tuple, spark.read.parquet(rollup).select(
            "bucket_start", "event_type", "n", "vmin", "vmax"
        ).collect())
    )
    want = sorted(
        map(tuple, read_version(spark, table)
            .withColumn("bucket_start", F.date_trunc("hour", "ts"))
            .groupBy("bucket_start", "event_type")
            .agg(F.count("*").alias("n"), F.min("value").alias("vmin"),
                 F.max("value").alias("vmax"))
            .collect())
    )
    assert got == want
