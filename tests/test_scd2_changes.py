"""SCD Type-2 dimension maintained from a change data feed
(sinks/versioned.py scd2_apply_changes) — the CDC-to-warehouse
composition: feed names the changed keys (O(changed files)), the apply
touches only dimension files holding them, retirements close without
reopening, and one merge commits opens + closes together.
"""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from bigbookapi_etl_with_airflow_and_snowflake_spark.sinks.versioned import (
    delete_version,
    read_version,
    scd2_apply_changes,
    update_version,
    write_version,
)


@pytest.fixture()
def src(tmp_path):
    return str(tmp_path / "src")


@pytest.fixture()
def dim(tmp_path):
    return str(tmp_path / "dim")


def _df(spark, n=20):
    return spark.range(n).select(
        F.col("id"), (F.col("id") % 4).alias("seg"), (F.col("id") * 2).alias("bal")
    )


def _hist(spark, dim):
    return {
        (r["id"], r["valid_from"]): (
            r["seg"], r["bal"], r["valid_to"], r["is_current"]
        )
        for r in read_version(spark, dim).collect()
    }


def test_bootstrap_opens_all_current(spark, src, dim):
    write_version(spark, _df(spark), src)
    r = scd2_apply_changes(spark, src, dim, ["id"], "2024-01-01")
    assert r["n_opened"] == 20 and r["n_closed"] == 0
    h = _hist(spark, dim)
    assert len(h) == 20
    assert all(
        vt is None and cur for (_, _, vt, cur) in h.values()
    )


def test_update_closes_and_reopens(spark, src, dim):
    write_version(spark, _df(spark), src)
    scd2_apply_changes(spark, src, dim, ["id"], "2024-01-01")
    update_version(spark, src, "id % 5 = 0", {"seg": F.lit(9)})
    r = scd2_apply_changes(spark, src, dim, ["id"], "2024-02-01")
    assert r["n_opened"] == 4 and r["n_closed"] == 4  # ids 0,5,10,15
    h = _hist(spark, dim)
    assert len(h) == 24
    assert h[(5, "2024-01-01")] == (1, 10, "2024-02-01", False)
    assert h[(5, "2024-02-01")] == (9, 10, None, True)
    # untouched keys: single open row
    assert h[(1, "2024-01-01")] == (1, 2, None, True)


def test_retirement_closes_without_reopen(spark, src, dim):
    write_version(spark, _df(spark, 10), src)
    scd2_apply_changes(spark, src, dim, ["id"], "2024-01-01")
    delete_version(spark, src, "id = 7")
    r = scd2_apply_changes(spark, src, dim, ["id"], "2024-02-01")
    assert r["n_opened"] == 0 and r["n_closed"] == 1
    h = _hist(spark, dim)
    assert h[(7, "2024-01-01")][2:] == ("2024-02-01", False)
    assert not any(k == 7 and vf != "2024-01-01" for (k, vf) in h)


def test_new_key_opens_first_row(spark, src, dim):
    write_version(spark, _df(spark, 5), src)
    scd2_apply_changes(spark, src, dim, ["id"], "2024-01-01")
    write_version(
        spark,
        spark.range(100, 102).select(
            F.col("id"),
            F.lit(0).cast("bigint").alias("seg"),
            F.lit(0).cast("bigint").alias("bal"),
        ),
        src,
        mode="append",
    )
    r = scd2_apply_changes(spark, src, dim, ["id"], "2024-02-01")
    assert r["n_opened"] == 2 and r["n_closed"] == 0
    h = _hist(spark, dim)
    assert h[(100, "2024-02-01")] == (0, 0, None, True)


def test_noop_when_cursor_current_and_idempotent_replay(spark, src, dim):
    write_version(spark, _df(spark, 10), src)
    scd2_apply_changes(spark, src, dim, ["id"], "2024-01-01")
    r = scd2_apply_changes(spark, src, dim, ["id"], "2024-01-15")
    assert r["dim_version"] is None
    update_version(spark, src, "id = 1", {"bal": F.lit(0)})
    scd2_apply_changes(spark, src, dim, ["id"], "2024-02-01")
    want = _hist(spark, dim)
    # crash replay: rewind cursor, re-apply the same feed with same ts
    cur_path = os.path.join(dim, "_scd2_cursor.json")
    cur = json.load(open(cur_path))
    cur["applied"] = 1
    json.dump(cur, open(cur_path, "w"))
    scd2_apply_changes(spark, src, dim, ["id"], "2024-02-01")
    assert _hist(spark, dim) == want


def test_netting_between_applies_is_documented_granularity(spark, src, dim):
    write_version(spark, _df(spark, 5), src)
    scd2_apply_changes(spark, src, dim, ["id"], "2024-01-01")
    update_version(spark, src, "id = 2", {"seg": F.lit(7)})
    update_version(spark, src, "id = 2", {"seg": F.lit(8)})
    r = scd2_apply_changes(spark, src, dim, ["id"], "2024-02-01")
    # two source commits, one apply: intermediates net away
    assert r["n_opened"] == 1 and r["n_closed"] == 1
    h = _hist(spark, dim)
    assert h[(2, "2024-02-01")][0] == 8


def test_reserved_column_collision_is_loud(spark, src, dim):
    df = spark.range(3).select(F.col("id"), F.lit(True).alias("is_current"))
    write_version(spark, df, src)
    with pytest.raises(ValueError, match="SCD2 columns"):
        scd2_apply_changes(spark, src, dim, ["id"], "2024-01-01")
