"""Commit-time change files (the Delta ``_change_data`` pattern):
rewrite commits that record their exact row-level change set become
(a) exactly streamable — the change stream crosses COW delete/update,
OPTIMIZE, replaceWhere and RESTORE instead of refusing — and
(b) exactly diffable with zero snapshot I/O (read_changes' fast path).
Plus lifecycle: vacuum sweep, fsck audit, clash guard, conflict
cleanup."""

from __future__ import annotations

import os
import shutil
import tempfile
import uuid

import pytest
from pyspark.sql import functions as F

from bigbookapi_etl_with_airflow_and_snowflake_spark.sinks.versioned import (
    CommitConflict,
    delete_version,
    optimize_table,
    overwrite_partitions,
    read_changes,
    read_version,
    restore_version,
    update_version,
    vacuum,
    verify_table,
    write_version,
)
from bigbookapi_etl_with_airflow_and_snowflake_spark.sources.versioned_stream import (
    read_changes_stream,
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


def _drain(spark, df):
    name = f"cfs_{uuid.uuid4().hex[:8]}"
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
        q.awaitTermination()
    return spark.table(name).localCheckpoint(eager=True)


# ---------------------------------------------------------------------------
# recording + read_changes fast path
# ---------------------------------------------------------------------------


def test_cow_delete_records_change_set(spark, table):
    write_version(spark, _df(spark).repartitionByRange(4, "id"), table)
    res = delete_version(spark, table, "id < 10", change_files=True)
    assert res["change_files_added"] >= 1
    info = {}
    got = _changes(spark, table, 1, 2, info=info)
    assert got == [(i, "delete") for i in range(10)]
    # the fast path read the recorded set, not the snapshots
    assert info["files_scanned_before"] == 0
    assert info["files_scanned_after"] == 0
    assert info["change_files_used"] == res["change_files_added"]


def test_fast_path_matches_snapshot_diff(spark, table):
    """Same history twice — with and without recorded change sets —
    must yield identical feeds (the fast path is an optimization, not
    a semantics change)."""
    twin = table + "_twin"
    for t, flag in ((table, True), (twin, False)):
        write_version(spark, _df(spark).repartitionByRange(4, "id"), t)
        update_version(
            spark, t, "id % 10 = 3", {"v": "v + 1000"}, change_files=flag
        )
        delete_version(spark, t, "id >= 90", change_files=flag)
    info_fast, info_slow = {}, {}
    fast = _changes(spark, table, 1, 3, info=info_fast)
    slow = _changes(spark, twin, 1, 3, info=info_slow)
    assert fast == slow
    assert "change_files_used" in info_fast
    assert "change_files_used" not in info_slow


def test_mixed_history_falls_back(spark, table):
    """One commit without a recorded set → snapshot diff (correct,
    just not the fast path)."""
    write_version(spark, _df(spark).repartitionByRange(4, "id"), table)
    delete_version(spark, table, "id < 5", change_files=True)
    delete_version(spark, table, "id >= 95")  # no change files
    info = {}
    got = _changes(spark, table, 1, 3, info=info)
    assert got == sorted(
        [(i, "delete") for i in range(5)]
        + [(i, "delete") for i in range(95, 100)]
    )
    assert "change_files_used" not in info


def test_update_change_set_is_old_and_new_images(spark, table):
    write_version(spark, _df(spark).coalesce(2), table)
    update_version(
        spark, table, "id = 7", {"v": "v * 10"}, change_files=True
    )
    rows = sorted(
        (r["id"], r["_change_type"], r["v"])
        for r in read_changes(spark, table, 1, 2).collect()
    )
    assert rows == [(7, "delete", 14), (7, "insert", 140)]


def test_mor_delete_change_set(spark, table):
    write_version(spark, _df(spark).coalesce(2), table)
    res = delete_version(
        spark, table, "id % 11 = 0", mode="mor", change_files=True
    )
    assert res["files_rewritten"] == 0 and res["change_files_added"] >= 1
    info = {}
    got = _changes(spark, table, 1, 2, info=info)
    assert got == [(i, "delete") for i in range(0, 100, 11)]
    assert info["files_scanned_before"] == 0


def test_replace_where_change_set(spark, table):
    df = _df(spark).withColumn("p", (F.col("id") % 2).cast("string"))
    write_version(
        spark, df.repartition("p"), table, partition_by=["p"]
    )
    repl = _df(spark, 200, 210).withColumn("p", F.lit("1"))
    overwrite_partitions(
        spark, repl, table, partition_scope={"p": ["1"]}, change_files=True
    )
    got = _changes(spark, table, 1, 2)
    assert got == sorted(
        [(i, "delete") for i in range(1, 100, 2)]
        + [(i, "insert") for i in range(200, 210)]
    )


def test_optimize_records_empty_set(spark, table):
    write_version(spark, _df(spark).repartition(6), table)
    delete_version(spark, table, "id < 3", mode="mor", change_files=True)
    optimize_table(spark, table, change_files=True)
    # the optimize commit nets zero change rows
    assert _changes(spark, table, 2, 3) == []
    # and the whole range stays on the fast path
    info = {}
    got = _changes(spark, table, 1, 3, info=info)
    assert got == [(i, "delete") for i in range(3)]
    assert "change_files_used" in info


def test_restore_change_set_is_exact_undo(spark, table):
    write_version(spark, _df(spark).repartitionByRange(4, "id"), table)
    delete_version(spark, table, "id < 10")  # bad commit, v2
    write_version(
        spark, _df(spark, 500, 505).coalesce(1), table, mode="append"
    )  # v3
    restore_version(spark, table, 1, change_files=True)  # v4
    got = _changes(spark, table, 3, 4)
    assert got == sorted(
        [(i, "insert") for i in range(10)]
        + [(i, "delete") for i in range(500, 505)]
    )
    # head content equals v1 exactly
    assert read_version(spark, table).count() == 100


# ---------------------------------------------------------------------------
# streaming across rewrites
# ---------------------------------------------------------------------------


def test_stream_crosses_cow_update_and_optimize(spark, table):
    write_version(spark, _df(spark).repartitionByRange(4, "id"), table)
    update_version(
        spark, table, "id % 10 = 3", {"v": "v + 1000"}, change_files=True
    )
    optimize_table(spark, table, change_files=True)
    delete_version(spark, table, "id >= 90", mode="mor")

    got = _drain(spark, read_changes_stream(spark, table))
    by_commit = {
        (r["_commit_version"], r["_change_type"]): r["cnt"]
        for r in got.groupBy("_commit_version", "_change_type")
        .agg(F.count("*").alias("cnt"))
        .collect()
    }
    assert by_commit[(1, "insert")] == 100
    assert by_commit[(2, "delete")] == 10  # old images
    assert by_commit[(2, "insert")] == 10  # new images
    assert (3, "insert") not in by_commit and (3, "delete") not in by_commit
    assert by_commit[(4, "delete")] == 10
    # row-level: the v2 new images carry the updated values
    v2_new = sorted(
        r["v"]
        for r in got.filter(
            (F.col("_commit_version") == 2)
            & (F.col("_change_type") == "insert")
        ).collect()
    )
    assert v2_new == sorted(i * 2 + 1000 for i in range(3, 100, 10))


def test_stream_still_refuses_unrecorded_rewrite(spark, table):
    from pyspark.errors.exceptions.captured import StreamingQueryException

    write_version(spark, _df(spark).coalesce(2), table)
    delete_version(spark, table, "id < 10")  # COW, no change files
    with pytest.raises(StreamingQueryException, match="change_files=True"):
        _drain(spark, read_changes_stream(spark, table))


def test_stream_crosses_restore(spark, table):
    write_version(spark, _df(spark).coalesce(2), table)
    delete_version(spark, table, "id < 10")  # v2, bad
    restore_version(spark, table, 1, change_files=True)  # v3
    got = _drain(
        spark, read_changes_stream(spark, table, starting_version=2)
    )
    assert sorted(
        (r["id"], r["_change_type"]) for r in got.collect()
    ) == [(i, "insert") for i in range(10)]


# ---------------------------------------------------------------------------
# lifecycle: guards, fsck, vacuum, conflict cleanup
# ---------------------------------------------------------------------------


def test_reserved_column_clash_refused(spark, table):
    df = _df(spark).withColumn("_change_type", F.lit("x"))
    write_version(spark, df.coalesce(1), table)
    with pytest.raises(ValueError, match="_change_type"):
        delete_version(spark, table, "id < 10", change_files=True)


def test_fsck_audits_change_files(spark, table):
    write_version(spark, _df(spark).coalesce(2), table)
    delete_version(spark, table, "id < 10", change_files=True)
    rep = verify_table(spark, table)
    assert rep["checks"]["change_files_exist"]["ok"]
    # corrupt: remove a recorded change file out-of-band
    from bigbookapi_etl_with_airflow_and_snowflake_spark.sinks.versioned import (
        _load_manifest,
    )

    os.remove(_load_manifest(table, None)["change_files"][0])
    rep2 = verify_table(spark, table)
    assert not rep2["ok"]
    assert not rep2["checks"]["change_files_exist"]["ok"]


def test_vacuum_sweeps_unreferenced_change_dirs(spark, table):
    write_version(spark, _df(spark).coalesce(2), table)
    delete_version(spark, table, "id < 10", change_files=True)  # v2
    delete_version(spark, table, "id >= 90", change_files=True)  # v3
    write_version(
        spark, _df(spark, 10, 90).coalesce(2), table
    )  # v4 overwrite
    cf_root = os.path.join(table, "_change_data")
    assert len(os.listdir(cf_root)) == 2
    # keep_last=2 retains v3+v4: v2's change dir is unreferenced
    res = vacuum(table, keep_last=2)
    assert res["change_dirs_dropped"] == 1
    assert len(os.listdir(cf_root)) == 1
    # the retained version's recorded change files survived the sweep
    from bigbookapi_etl_with_airflow_and_snowflake_spark.sinks.versioned import (
        _load_manifest,
    )

    kept = _load_manifest(table, 3)["change_files"]
    assert kept and all(os.path.exists(p) for p in kept)


def test_conflict_abort_discards_change_staging(spark, table):
    write_version(spark, _df(spark).coalesce(2), table)  # v1
    write_version(
        spark, _df(spark, 100, 110).coalesce(1), table, mode="append"
    )  # v2
    with pytest.raises(CommitConflict):
        delete_version(
            spark, table, "id < 10", base_version=1, change_files=True
        )
    cf_root = os.path.join(table, "_change_data")
    assert not os.path.isdir(cf_root) or os.listdir(cf_root) == []
