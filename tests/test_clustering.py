"""Distributed Lloyd's k-means: exactness vs a pure-Python reference,
partition-invariance (the decimal-accumulation guarantee), and the
cluster-balanced sampler's contract."""

from __future__ import annotations

from decimal import ROUND_HALF_UP, Decimal

import pytest

from bigbookapi_etl_with_airflow_and_snowflake_spark.operators import clustering as C
from bigbookapi_etl_with_airflow_and_snowflake_spark.sources.files import read_table


def _py_kmeans(rows, k, iters):
    """Reference Lloyd's with the SAME decimal accumulation rules:
    init = k smallest ids, sums in Decimal (quantized like the
    decimal(28,10) cast), means Decimal/int, distances in float,
    ties to the lowest cluster."""
    q = Decimal("1e-10")
    rows = sorted(rows, key=lambda r: r[0])
    cents = [[float(x) for x in rows[i][1]] for i in range(k)]
    dim = len(cents[0])
    for _ in range(iters):
        assign = {}
        for rid, vec in rows:
            best, best_d = 0, None
            for c in range(k):
                d = sum((float(x) - cents[c][j]) ** 2 for j, x in enumerate(vec))
                if best_d is None or d < best_d:
                    best, best_d = c, d
            assign[rid] = best
        sums = {c: [Decimal(0)] * dim for c in range(k)}
        cnts = {c: 0 for c in range(k)}
        for rid, vec in rows:
            c = assign[rid]
            cnts[c] += 1
            for j, x in enumerate(vec):
                # Spark's cast to decimal(28,10) rounds HALF_UP;
                # quantize's default HALF_EVEN would diverge on exact
                # ties at the 10th decimal (odd multiples of 2^-11)
                sums[c][j] += Decimal(float(x)).quantize(q, rounding=ROUND_HALF_UP)
        cents = [
            [float(sums[c][j] / cnts[c]) for j in range(dim)] if cnts[c] else cents[c]
            for c in range(k)
        ]
    assign = {}
    for rid, vec in rows:
        best, best_d = 0, None
        for c in range(k):
            d = sum((float(x) - cents[c][j]) ** 2 for j, x in enumerate(vec))
            if best_d is None or d < best_d:
                best, best_d = c, d
        assign[rid] = best
    return assign, cents


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return read_table(spark, sf_dir, "embeddings")


def test_kmeans_matches_python_reference(spark, emb):
    assignments, cents = C.kmeans_lloyd(emb, k=4, iters=3)
    got = {r["vec_id"]: r["cluster"] for r in assignments.collect()}
    rows = [(r["vec_id"], list(r["embedding"])) for r in emb.collect()]
    want, want_cents = _py_kmeans(rows, k=4, iters=3)
    assert got == want
    for a, b in zip(cents, want_cents):
        for x, y in zip(a, b):
            assert x == pytest.approx(y, abs=1e-12)


def test_kmeans_partition_invariant(spark, emb):
    a1, c1 = C.kmeans_lloyd(emb.repartition(1), k=4, iters=2)
    a7, c7 = C.kmeans_lloyd(emb.repartition(7), k=4, iters=2)
    assert c1 == c7  # decimal sums → bit-identical centroids
    assert {tuple(r) for r in a1.collect()} == {tuple(r) for r in a7.collect()}


def test_kmeans_covers_all_rows_with_k_clusters(spark, emb):
    n = emb.count()
    assignments, cents = C.kmeans_lloyd(emb, k=8, iters=2)
    pdf = assignments.toPandas()
    assert len(pdf) == n and pdf["vec_id"].is_unique
    assert set(pdf["cluster"]) <= set(range(8))
    assert len(cents) == 8


def test_cluster_balanced_sample_contract(spark, emb):
    s = C.cluster_balanced_sample(emb, k=4, iters=2, per_cluster=10).toPandas()
    assert (s["sample_rank"] >= 1).all() and (s["sample_rank"] <= 10).all()
    # at most per_cluster rows per cluster, ranks dense from 1
    for c, grp in s.groupby("cluster"):
        assert sorted(grp["sample_rank"]) == list(range(1, len(grp) + 1))
    # deterministic across runs
    s2 = C.cluster_balanced_sample(emb, k=4, iters=2, per_cluster=10).toPandas()
    assert s.sort_values(["vec_id"]).values.tolist() == s2.sort_values(["vec_id"]).values.tolist()


def test_kmeans_clamps_k_to_row_count(spark):
    """Inputs smaller than k must not IndexError: k clamps to the
    collected init size and every row still gets a cluster."""
    rows = [(i, [float(i), float(i) + 1.0]) for i in range(3)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    assignments, cents = C.kmeans_lloyd(df, k=8, iters=2)
    pdf = assignments.toPandas()
    assert len(pdf) == 3
    assert len(cents) == 3
    assert set(pdf["cluster"]) <= {0, 1, 2}


def test_kmeans_empty_input_raises(spark):
    df = spark.createDataFrame([], "vec_id long, embedding array<float>")
    with pytest.raises(ValueError, match="no rows"):
        C.kmeans_lloyd(df, k=4, iters=1)


def test_label_centroids_fixed_point_exact(spark):
    from bigbookapi_etl_with_airflow_and_snowflake_spark.operators.clustering import (
        label_centroids,
    )

    rows = [
        ("a", [1.0, 2.0]),
        ("a", [3.0, 4.0]),
        ("b", [-0.5, 0.25]),
    ]
    df = spark.createDataFrame(rows, "label string, embedding array<double>")
    got = {
        (r["label"], r["dim"]): (r["mean_q"], r["n"])
        for r in label_centroids(df).collect()
    }
    assert got[("a", 0)] == (2.0, 2)
    assert got[("a", 1)] == (3.0, 2)
    assert got[("b", 0)] == (-0.5, 1)
    assert got[("b", 1)] == (0.25, 1)


def test_label_centroids_partition_invariant(spark):
    from bigbookapi_etl_with_airflow_and_snowflake_spark.operators.clustering import (
        label_centroids,
    )

    rows = [("g", [((i * 37) % 101) / 7.0, -i / 3.0]) for i in range(200)]
    df = spark.createDataFrame(rows, "label string, embedding array<double>")
    a = sorted(map(tuple, label_centroids(df.coalesce(1)).collect()))
    b = sorted(map(tuple, label_centroids(df.repartition(13)).collect()))
    assert a == b
