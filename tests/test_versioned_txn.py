"""Idempotent transactional writes on versioned tables (the Delta
txnAppId/txnVersion contract): a replayed batch is a silent skip —
nothing stages, the table stays exactly-once — bounded by vacuum's
retention window (documented caveat).
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from bigbookapi_etl_with_airflow_and_snowflake_spark.sinks.versioned import (
    create_branch,
    read_version,
    vacuum,
    versions,
    write_version,
)


@pytest.fixture()
def table(tmp_path):
    return str(tmp_path / "tbl")


def _df(spark, lo, hi):
    return spark.range(lo, hi).select(F.col("id"), (F.col("id") * 2).alias("v"))


def _ids(spark, table, **kw):
    return sorted(r["id"] for r in read_version(spark, table, **kw).collect())


def _data_files(table):
    return sorted(
        os.path.join(dp, f)
        for dp, _, fs in os.walk(os.path.join(table, "data"))
        for f in fs
        if f.endswith(".parquet")
    )


def test_replayed_batch_is_silent_skip(spark, table):
    write_version(spark, _df(spark, 0, 10), table, txn_app="etl", txn_version=0)
    v2 = write_version(
        spark, _df(spark, 10, 20), table, mode="append",
        txn_app="etl", txn_version=1,
    )
    before = _data_files(table)
    # the restarted stream re-offers batch 1 (possibly recomputed)
    v_replay = write_version(
        spark, _df(spark, 10, 20), table, mode="append",
        txn_app="etl", txn_version=1,
    )
    assert v_replay == v2 == 2
    assert len(versions(table)) == 2  # no third commit
    assert _data_files(table) == before  # nothing staged
    assert _ids(spark, table) == list(range(20))  # exactly-once


def test_older_txn_skips_newer_applies(spark, table):
    write_version(spark, _df(spark, 0, 5), table, txn_app="a", txn_version=7)
    write_version(
        spark, _df(spark, 5, 8), table, mode="append",
        txn_app="a", txn_version=3,  # stale replay from before a restart
    )
    assert _ids(spark, table) == list(range(5))
    write_version(
        spark, _df(spark, 5, 8), table, mode="append",
        txn_app="a", txn_version=8,
    )
    assert _ids(spark, table) == list(range(8))


def test_apps_are_independent(spark, table):
    write_version(spark, _df(spark, 0, 5), table, txn_app="a", txn_version=1)
    write_version(
        spark, _df(spark, 5, 10), table, mode="append",
        txn_app="b", txn_version=1,  # same number, different app: applies
    )
    assert _ids(spark, table) == list(range(10))


def test_txn_args_come_together(spark, table):
    with pytest.raises(ValueError, match="come together"):
        write_version(spark, _df(spark, 0, 5), table, txn_app="a")


def test_vacuum_retention_bounds_replay_memory(spark, table):
    """Documented caveat: a txn recorded only in a vacuumed manifest is
    forgotten — retention must outlast the longest replay gap."""
    write_version(spark, _df(spark, 0, 5), table)
    write_version(
        spark, _df(spark, 5, 10), table, mode="append",
        txn_app="etl", txn_version=1,
    )
    write_version(spark, _df(spark, 10, 15), table, mode="append")
    vacuum(table, keep_last=1)  # drops the txn-carrying v2
    write_version(
        spark, _df(spark, 5, 10), table, mode="append",
        txn_app="etl", txn_version=1,
    )
    # the replay RE-APPLIED: ids 5..9 now duplicated — the caveat, pinned
    got = sorted(r["id"] for r in read_version(spark, table).collect())
    assert got == sorted(list(range(15)) + list(range(5, 10)))


def test_txn_on_branch_chain(spark, table):
    write_version(spark, _df(spark, 0, 5), table)
    create_branch(table, "wip")
    write_version(
        spark, _df(spark, 5, 8), table, mode="append", branch="wip",
        txn_app="etl", txn_version=1,
    )
    v = write_version(
        spark, _df(spark, 5, 8), table, mode="append", branch="wip",
        txn_app="etl", txn_version=1,
    )
    assert v == 2
    assert _ids(spark, table, branch="wip") == list(range(8))
    # main never saw the txn: the same pair applies there independently
    write_version(
        spark, _df(spark, 100, 102), table, mode="append",
        txn_app="etl", txn_version=1,
    )
    assert 100 in _ids(spark, table)
