"""Per-file Bloom index: point-lookup scan pruning that min-max
envelopes can't provide on unclustered high-cardinality columns."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from bigbookapi_etl_with_airflow_and_snowflake_spark.operators.lake import (
    bloom_file_lookup,
    build_file_bloom_index,
)


@pytest.fixture()
def layout(spark, tmp_path):
    """16 files clustered by group, looked up by id (unclustered for
    pruning purposes: each file holds a distinct contiguous id span,
    so a handful of point ids live in few files)."""
    path = str(tmp_path / "tbl")
    df = spark.range(4000).select(
        F.col("id"), (F.col("id") % 7).alias("grp"), (F.col("id") * 3).alias("val")
    )
    df.repartitionByRange(16, "id").write.parquet(path)
    files = sorted(
        os.path.join(path, f) for f in os.listdir(path) if f.endswith(".parquet")
    )
    assert len(files) == 16
    return files


def test_lookup_is_exact_and_prunes_files(spark, layout):
    idx = build_file_bloom_index(spark, layout, "id")
    keys = [5, 1234, 3999]
    got = bloom_file_lookup(spark, layout, idx, "id", keys)
    rows = {r["id"]: (r["grp"], r["val"]) for r in got.collect()}
    assert rows == {x: (x % 7, x * 3) for x in keys}
    # the scan behind the result read strictly fewer files than the table
    import re

    read = {re.sub("^file:(//)?", "", f) for f in got.inputFiles()}
    assert len(read) < 16
    # no false negatives: every file actually holding a key was read
    full = spark.read.parquet(*layout).withColumn(
        "f", F.regexp_replace(F.col("_metadata.file_path"), "^file:(//)?", "")
    )
    need = {
        r["f"] for r in full.filter(F.col("id").isin(keys)).select("f").collect()
    }
    assert need <= read


def test_tiny_bitmap_stays_exact_just_less_selective(spark, layout):
    # 64 bits for 250 keys/file → saturated filter, every file qualifies;
    # results must STILL be exact (false positives cost reads, not rows)
    idx = build_file_bloom_index(spark, layout, "id", m_bits=64, k=2)
    got = bloom_file_lookup(spark, layout, idx, "id", [77], m_bits=64, k=2)
    assert [r["id"] for r in got.collect()] == [77]


def test_empty_key_list_and_missing_keys(spark, layout):
    idx = build_file_bloom_index(spark, layout, "id")
    assert bloom_file_lookup(spark, layout, idx, "id", []).count() == 0
    # keys absent from the table: usually zero qualifying files → the
    # no-file branch must return an empty, schema-correct frame
    got = bloom_file_lookup(spark, layout, idx, "id", [10**12])
    assert got.count() == 0
    assert set(got.columns) == {"id", "grp", "val"}


def test_index_is_sparse(spark, layout):
    idx = build_file_bloom_index(spark, layout, "id", m_bits=1 << 16, k=3)
    per_file = idx.groupBy("file").count().collect()
    assert len(per_file) == 16
    assert all(r["count"] <= (1 << 16) // 64 for r in per_file)
