"""Sampling operators: two-pass prefix sums, stable ids, PPS systematic,
A-ES weighted reservoir."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from bigbookapi_etl_with_airflow_and_snowflake_spark.operators.sampling import (
    _aes_replay,
    assign_stable_ids,
    distributed_prefix_sum,
    pps_systematic_sample,
    weighted_sample_aes,
)


@pytest.fixture(scope="module")
def jumbled(spark):
    # 997 rows in a deliberately scrambled, skewed partitioning
    rows = [(i * 7919 % 997, (i % 13) + 1) for i in range(997)]
    return (
        spark.createDataFrame(rows, "k int, w int")
        .repartition(7, F.col("w"))  # nothing to do with the key order
    )


def test_prefix_sum_matches_window(spark, jumbled):
    got = {
        r["k"]: r["cum"]
        for r in distributed_prefix_sum(jumbled, "k", "w", num_partitions=5).collect()
    }
    rows = sorted(jumbled.collect(), key=lambda r: r["k"])
    run = 0
    for r in rows:
        run += r["w"]
        assert got[r["k"]] == run
    assert len(got) == 997


def test_prefix_sum_partition_invariance(spark, jumbled):
    a = distributed_prefix_sum(jumbled, "k", "w", num_partitions=2).collect()
    b = distributed_prefix_sum(jumbled.coalesce(1), "k", "w", num_partitions=9).collect()
    assert sorted((r["k"], r["cum"]) for r in a) == sorted(
        (r["k"], r["cum"]) for r in b
    )


def test_prefix_sum_collision_guard(spark):
    df = spark.createDataFrame([(1, 1)], "k int, cum int")
    with pytest.raises(ValueError, match="collision"):
        distributed_prefix_sum(df, "k", "cum")


def test_stable_ids_dense_and_ordered(spark, jumbled):
    out = assign_stable_ids(jumbled, "k", num_partitions=6).collect()
    ids = {r["k"]: r["row_id"] for r in out}
    assert sorted(ids.values()) == list(range(997))
    # id order == key order
    by_key = sorted(ids)
    assert [ids[k] for k in by_key] == list(range(997))
    assert "__one" not in {c for r in out for c in r.asDict()}


def test_pps_deterministic_and_weight_biased(spark, jumbled):
    k = 100
    a = pps_systematic_sample(jumbled, "k", "w", k, num_partitions=3).collect()
    b = pps_systematic_sample(jumbled, "k", "w", k, num_partitions=8).collect()
    assert sorted(r["k"] for r in a) == sorted(r["k"] for r in b)
    assert k <= len(a) <= 2 * k  # floor(total/step) overshoot is < k
    # inclusion is weight-biased: mean weight of sample > population mean
    pop_mean = jumbled.agg(F.avg("w")).first()[0]
    samp_mean = sum(r["w"] for r in a) / len(a)
    assert samp_mean > pop_mean


def test_pps_heavy_row_always_included(spark):
    rows = [(i, 1) for i in range(100)] + [(100, 1000)]
    df = spark.createDataFrame(rows, "k int, w int")
    out = pps_systematic_sample(df, "k", "w", 10)
    assert 100 in {r["k"] for r in out.collect()}


def test_pps_rejects_bad_weights(spark):
    df = spark.createDataFrame([(1, 0), (2, 5)], "k int, w int")
    with pytest.raises(ValueError, match="positive"):
        pps_systematic_sample(df, "k", "w", 1)


def test_aes_matches_pure_replay(spark):
    rows = [(i, (i % 7) + 1) for i in range(500)]
    df = spark.createDataFrame(rows, "k int, w int").repartition(5)
    got = sorted(r["k"] for r in weighted_sample_aes(df, "k", "w", 50).collect())
    want = sorted(_aes_replay([(k, w) for k, w in rows], 50))
    assert got == want


def test_aes_weight_bias(spark):
    # two strata, heavy weights 10x: heavies should dominate the sample
    rows = [(i, 10 if i < 250 else 1) for i in range(500)]
    df = spark.createDataFrame(rows, "k int, w int")
    out = weighted_sample_aes(df, "k", "w", 100).collect()
    heavies = sum(1 for r in out if r["k"] < 250)
    assert heavies > 70  # E[heavies] ≈ 91; md5-deterministic so no flake


def test_aes_plan_is_take_ordered(spark):
    df = spark.createDataFrame([(i, 1) for i in range(100)], "k int, w int")
    plan = weighted_sample_aes(df, "k", "w", 5)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_aes_nonpositive_weights_never_sampled(spark):
    rows = [(1, 5), (2, 0), (3, -4), (4, 5), (5, 5)]
    df = spark.createDataFrame(rows, "k int, w int")
    got = {r["k"] for r in weighted_sample_aes(df, "k", "w", 10).collect()}
    assert got == {1, 4, 5}


def test_cap_per_group_bounds_and_determinism(spark):
    """At most n rows per group; which rows survive is a deterministic
    function of (order_col, salt) — identical across partitionings —
    and groups smaller than the cap pass through whole."""
    from bigbookapi_etl_with_airflow_and_snowflake_spark.operators.sampling import (
        cap_per_group,
    )

    rows = [(i, f"g{i % 3}") for i in range(40)] + [(100, "tiny")]
    df = spark.createDataFrame(rows, "id long, grp string")
    out = cap_per_group(df, "grp", 5, "id")
    by_grp = {
        r["grp"]: r["n"]
        for r in out.groupBy("grp").agg(F.count("*").alias("n")).collect()
    }
    assert by_grp == {"g0": 5, "g1": 5, "g2": 5, "tiny": 1}
    again = cap_per_group(df.repartition(7), "grp", 5, "id")
    assert sorted(map(tuple, out.collect())) == sorted(map(tuple, again.collect()))
    with pytest.raises(ValueError, match="n must be >= 1"):
        cap_per_group(df, "grp", 0, "id")
    with pytest.raises(ValueError, match="collision"):
        cap_per_group(df.withColumnRenamed("id", "__cap_rn"), "grp", 5, "grp")


def test_group_split_is_constant_within_group(spark):
    """Every row of a group gets the SAME split (the leakage guard),
    and the assignment matches the row-level convention applied to the
    group key (shared thresholds — one definition)."""
    from bigbookapi_etl_with_airflow_and_snowflake_spark.functions.splits import (
        SPLIT_SALT,
        TRAIN_UPPER_HEX,
        VAL_UPPER_HEX,
    )
    from bigbookapi_etl_with_airflow_and_snowflake_spark.operators.sampling import (
        group_split,
    )

    rows = [(i, f"d{i % 37}") for i in range(500)]
    df = spark.createDataFrame(rows, "id long, domain string")
    out = group_split(df, "domain")
    per_group = (
        out.groupBy("domain")
        .agg(F.count_distinct("split").alias("n_splits"))
        .collect()
    )
    assert all(r["n_splits"] == 1 for r in per_group)
    import hashlib

    for r in out.select("domain", "split").distinct().collect():
        h = hashlib.md5((r["domain"] + SPLIT_SALT).encode()).hexdigest()
        want = (
            "train" if h < TRAIN_UPPER_HEX else "val" if h < VAL_UPPER_HEX else "test"
        )
        assert r["split"] == want, r


def test_mixture_plan_integer_exact_and_explicit_zeros(spark):
    """target/rate/epochs are exact integer arithmetic; a source absent
    from the weights yields an explicit zero row; upsample fires iff
    target exceeds one epoch of the source."""
    from bigbookapi_etl_with_airflow_and_snowflake_spark.operators.sampling import (
        mixture_plan,
    )

    rows = (
        [(i, "a", "w1 w2 w3 w4") for i in range(10)]        # 40 tokens
        + [(100 + i, "b", "w1 w2") for i in range(50)]       # 100 tokens
        + [(200 + i, "c", "w1") for i in range(5)]           # 5 tokens
    )
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    got = {
        r["source"]: r.asDict()
        for r in mixture_plan(df, {"a": 500, "b": 10}, 1000).collect()
    }
    a = got["a"]  # target = 1000*500//1000 = 500 over 40 avail
    assert (a["n_docs"], a["n_tokens"], a["weight_pm"]) == (10, 40, 500)
    assert (a["target_tokens"], a["rate_pm"], a["epochs"], a["upsample"]) == (
        500, 12500, 13, True,
    )
    b = got["b"]  # target = 10 over 100 avail: downsample
    assert (b["target_tokens"], b["rate_pm"], b["epochs"], b["upsample"]) == (
        10, 100, 1, False,
    )
    c = got["c"]  # absent from weights: explicit zero row
    assert (c["weight_pm"], c["target_tokens"], c["rate_pm"], c["epochs"]) == (
        0, 0, 0, 0,
    )
    assert not c["upsample"]
    with pytest.raises(ValueError, match="budget_tokens must be >= 1"):
        mixture_plan(df, {"a": 1}, 0)
    with pytest.raises(ValueError, match="weights_pm must be >= 0"):
        mixture_plan(df, {"a": -1}, 10)
