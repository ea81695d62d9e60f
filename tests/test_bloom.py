"""Bloom semi-join reduction: exactness vs the plain join, pruning
behavior, the no-shuffle prefilter plan, and the false-positive regime
(tiny bitmap → FPs must still be eliminated by the exact join)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from bigbookapi_etl_with_airflow_and_snowflake_spark.operators import bloom
from bigbookapi_etl_with_airflow_and_snowflake_spark.plans.introspect import (
    explain_str,
    shuffle_count,
)
from bigbookapi_etl_with_airflow_and_snowflake_spark.sources.files import read_table


@pytest.fixture(scope="module")
def li(spark, sf_dir):
    return read_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice"
    )


@pytest.fixture(scope="module")
def keys(spark, sf_dir):
    return (
        read_table(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 250000)
        .select("o_orderkey")
    )


def test_bloom_join_equals_plain_join(li, keys):
    plain = li.join(keys, li.l_orderkey == keys.o_orderkey)
    got = bloom.bloom_semi_join(li, keys, "l_orderkey", "o_orderkey")
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, plain.collect()))


def test_bloom_prefilter_superset_never_drops_matches(li, keys):
    bm = bloom.build_bloom_bitmap(keys, "o_orderkey")
    pruned = {r["l_orderkey"] for r in bloom.bloom_prefilter(li, bm, "l_orderkey").collect()}
    true_keys = {r["o_orderkey"] for r in keys.collect()}
    fact_keys = {r["l_orderkey"] for r in li.collect()}
    # no false negatives: every true match survives
    assert (true_keys & fact_keys) <= pruned
    # and it actually prunes (the key set is a strict subset of orders)
    assert len(pruned) < len(fact_keys)


def test_bloom_false_positive_regime_still_exact(li, keys):
    """A deliberately tiny bitmap (256 bits, k=1) saturates with false
    positives — the final exact join must still produce the plain-join
    result (Bloom can only over-admit, never under-admit)."""
    plain = li.join(keys, li.l_orderkey == keys.o_orderkey).count()
    got = bloom.bloom_semi_join(
        li, keys, "l_orderkey", "o_orderkey", m_bits=256, k=1
    ).count()
    assert got == plain


def test_bloom_prefilter_no_fact_shuffle(li, keys):
    """The prefilter must be k broadcast joins — zero exchanges of the
    fact side (the bitmap build aggregates, but the probe side plan
    hanging off the fact scan must not shuffle)."""
    bm = bloom.build_bloom_bitmap(keys, "o_orderkey")
    bm.collect()  # materialize so the probe plan is measured alone
    bm = bm.cache()
    bm.count()
    pruned = bloom.bloom_prefilter(li, bm, "l_orderkey")
    plan = explain_str(pruned, "simple")
    assert plan.count("BroadcastHashJoin") == 3
    # the probe spine (everything before the first cached-bitmap
    # subplan) must contain no hash-partition exchange — the fact side
    # flows scan → k broadcast joins without shuffling; the bitmap's
    # own build-time exchange lives inside the InMemoryRelation block
    spine = plan.split("InMemoryRelation", 1)[0]
    assert "Exchange hashpartitioning" not in spine, plan


def test_bitmap_is_sparse_and_bounded(keys):
    m = 1 << 14
    bm = bloom.build_bloom_bitmap(keys, "o_orderkey", m_bits=m, k=3)
    rows = bm.collect()
    assert len(rows) <= m // 64
    assert all(r["bits"] != 0 for r in rows)


def test_prefilter_refuses_temp_column_collision(spark):
    bm = bloom.build_bloom_bitmap(
        spark.createDataFrame([(1,)], "k long"), "k", m_bits=1 << 10
    )
    fact = spark.createDataFrame([(1, 5)], "k long, _w long")
    with pytest.raises(ValueError, match="_w"):
        bloom.bloom_prefilter(fact, bm, "k", m_bits=1 << 10)
