"""Versioned parquet tables: snapshot isolation, time travel, append
composition, vacuum retention, commit-collision detection."""

from __future__ import annotations

import os

import pytest

from bigbookapi_etl_with_airflow_and_snowflake_spark.sinks.versioned import (
    read_version,
    vacuum,
    versions,
    write_version,
)


@pytest.fixture()
def table(tmp_path):
    return str(tmp_path / "tbl")


def test_versions_accumulate_and_latest_wins(spark, table):
    assert versions(table) == []
    v1 = write_version(spark, spark.range(10), table)
    v2 = write_version(spark, spark.range(100), table)
    assert (v1, v2) == (1, 2)
    assert read_version(spark, table).count() == 100
    assert [v["version"] for v in versions(table)] == [1, 2]


def test_time_travel_is_isolated_from_later_commits(spark, table):
    write_version(spark, spark.range(10), table)
    pinned = read_version(spark, table, version=1)
    write_version(spark, spark.range(0), table)  # destroy latest
    assert pinned.count() == 10  # the pinned snapshot is untouched
    assert read_version(spark, table, version=1).count() == 10
    assert read_version(spark, table).count() == 0


def test_append_composes_without_rewriting(spark, table):
    write_version(spark, spark.range(10), table)
    files_v1 = set(
        f for v in [1] for f in __manifest_files(table, v)
    )
    write_version(spark, spark.range(10, 15), table, mode="append")
    files_v2 = set(__manifest_files(table, 2))
    assert files_v1 < files_v2  # v2 reuses v1's files untouched
    assert read_version(spark, table).count() == 15
    got = sorted(r["id"] for r in read_version(spark, table).collect())
    assert got == list(range(15))


def __manifest_files(table, version):
    import json

    with open(os.path.join(table, "_versions", f"v{version:08d}.json")) as fh:
        return json.load(fh)["files"]


def test_vacuum_retains_window_and_deletes_orphans(spark, table):
    write_version(spark, spark.range(5), table)
    write_version(spark, spark.range(6), table)
    write_version(spark, spark.range(7), table, mode="append")
    stats = vacuum(table, keep_last=2)
    assert stats["versions_dropped"] == 1
    assert [v["version"] for v in versions(table)] == [2, 3]
    # v2's files survive (v3 references them via append); v1's are gone
    assert read_version(spark, table, version=3).count() == 13
    with pytest.raises(ValueError, match="not found"):
        read_version(spark, table, version=1)
    # the orphaned v1 data files were actually removed
    assert stats["files_deleted"] >= 1


def test_unknown_version_and_empty_table_error(spark, table):
    with pytest.raises(ValueError, match="no committed versions"):
        read_version(spark, table)
    write_version(spark, spark.range(3), table)
    with pytest.raises(ValueError, match="not found"):
        read_version(spark, table, version=99)


def test_commit_collision_is_detected_not_overwritten(spark, table):
    # simulate a racing writer that already created the next manifest
    write_version(spark, spark.range(3), table)
    os.makedirs(os.path.join(table, "_versions"), exist_ok=True)
    blocker = os.path.join(table, "_versions", "v00000002.json")
    with open(blocker, "w") as fh:
        fh.write('{"version": 2, "mode": "overwrite", "files": [], '
                 '"n_rows": 0, "committed_at": 0}')
    # our writer must NOT clobber v2 — it commits as v3
    v = write_version(spark, spark.range(4), table)
    assert v == 3
    assert read_version(spark, table, version=3).count() == 4
    # the racing writer's manifest is untouched
    assert __manifest_files(table, 2) == []


def test_streaming_ingest_commits_a_version_per_batch(spark, table):
    """Structured Streaming → versioned table: each micro-batch lands
    as one append commit, so the table gains a readable, time-travelable
    version per batch and a reader pinned mid-stream is isolated from
    later batches."""
    from bigbookapi_etl_with_airflow_and_snowflake_spark.sinks.versioned import (
        read_version,
        versions,
        write_version,
    )
    from bigbookapi_etl_with_airflow_and_snowflake_spark.streaming.events import (
        read_rate_stream,
    )

    stream = read_rate_stream(spark, rows_per_batch=50, num_partitions=2)

    def commit_batch(batch_df, batch_id):
        write_version(batch_df.sparkSession, batch_df, table, mode="append")

    qy = (
        stream.writeStream.foreachBatch(commit_batch)
        .option("checkpointLocation", table + "_ckpt")
        .trigger(availableNow=True)
        .start()
    )
    qy.awaitTermination(120)
    vs = versions(table)
    assert len(vs) >= 1
    latest = read_version(spark, table)
    assert latest.count() == sum(v["n_rows"] for v in [vs[-1]])
    assert latest.count() == 50 * len(vs)
    # a pinned early version stays smaller than the latest
    if len(vs) > 1:
        assert read_version(spark, table, version=1).count() == 50
