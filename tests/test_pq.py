"""Product quantization (operators/pq.py): encode semantics,
codebook training objective, ADC search behavior, engine-portable
determinism, and plan shape.

Recall note: the sf testdata embeddings are near-uniform random, so
ANY coarse quantizer's top-k recall is weak there (distances
concentrate) — recall is asserted on a CLUSTERED synthetic corpus
where neighbor structure exists, and on the real corpus we assert the
k-means training objective instead (trained codebooks quantize with
lower distortion than the fixed ones).
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from bigbookapi_etl_with_airflow_and_snowflake_spark.operators import pq
from bigbookapi_etl_with_airflow_and_snowflake_spark.sources.files import read_table

K = 5


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return read_table(spark, sf_dir, "embeddings").cache()


@pytest.fixture(scope="module")
def clustered(spark):
    """16 well-separated centers, 32 points each, tiny noise — the
    regime PQ is built for (one codeword per cluster is learnable).
    Deterministic generator."""
    rng = np.random.default_rng(7)
    centers = rng.normal(size=(16, 64)) * 10.0
    rows = []
    i = 0
    for c in range(16):
        for _ in range(32):
            v = centers[c] + rng.normal(size=64) * 0.05
            rows.append((i, [float(x) for x in v]))
            i += 1
    return spark.createDataFrame(
        rows, "vec_id bigint, embedding array<double>"
    ).cache()


def _np_matrix(df):
    rows = sorted(df.collect(), key=lambda r: r["vec_id"])
    return (
        np.array([r["embedding"] for r in rows], dtype=np.float64),
        np.array([r["vec_id"] for r in rows]),
    )


def _distortion(X, books, codes_by_id, ids):
    dsub = X.shape[1] // len(books)
    total = 0.0
    id_pos = {v: i for i, v in enumerate(ids)}
    for vid, codes in codes_by_id.items():
        x = X[id_pos[vid]]
        for m, c in enumerate(codes):
            cw = np.asarray(books[m][c])
            total += ((x[m * dsub : (m + 1) * dsub] - cw) ** 2).sum()
    return total


def test_codebook_vectors_encode_to_themselves(emb):
    books = pq.fixed_codebooks(emb)
    codes = pq.pq_encode(emb.filter(F.col("vec_id") < 16), books)
    for r in codes.collect():
        assert [r["c0"], r["c1"], r["c2"], r["c3"]] == [r["vec_id"]] * 4


def test_encode_is_partition_invariant(emb):
    books = pq.fixed_codebooks(emb)
    a = sorted(map(tuple, pq.pq_encode(emb, books).collect()))
    b = sorted(
        map(tuple, pq.pq_encode(emb.repartition(13), books).collect())
    )
    assert a == b


def test_trained_codebooks_reduce_distortion(emb):
    X, ids = _np_matrix(emb)
    fixed, trained = pq.fixed_codebooks(emb), pq.train_pq_codebooks(emb)
    d = {}
    for name, books in (("fixed", fixed), ("trained", trained)):
        codes = {
            r["vec_id"]: [r["c0"], r["c1"], r["c2"], r["c3"]]
            for r in pq.pq_encode(emb, books).collect()
        }
        d[name] = _distortion(X, books, codes, ids)
    # the k-means objective: trained quantizers fit the data strictly
    # better than arbitrary (first-16) codewords
    assert d["trained"] < d["fixed"]


def test_adc_matches_numpy_reconstruction(emb):
    """dist(q, n) must equal sum_m ||q_sub - cb_m[code_m(n)]||^2 —
    the table-lookup semantics, checked against numpy."""
    books = pq.fixed_codebooks(emb)
    q = emb.filter(F.col("vec_id") == 0)
    out = {
        r["n_id"]: r["dist"]
        for r in pq.pq_topk(emb.filter(F.col("vec_id") < 50), q, books, k=10).collect()
    }
    X, ids = _np_matrix(emb)
    codes = {
        r["vec_id"]: [r["c0"], r["c1"], r["c2"], r["c3"]]
        for r in pq.pq_encode(emb.filter(F.col("vec_id") < 50), books).collect()
    }
    qv = X[list(ids).index(0)]
    for n_id, dist in out.items():
        want = 0.0
        for m, c in enumerate(codes[n_id]):
            cw = np.asarray(books[m][c])
            want += ((qv[m * 16 : (m + 1) * 16] - cw) ** 2).sum()
        assert dist == pytest.approx(want, abs=2e-6)


def test_topk_is_k_sized_and_self_excluded(emb):
    books = pq.fixed_codebooks(emb)
    q = emb.filter(F.col("vec_id") < 10)
    out = pq.pq_topk(emb, q, books, k=K).collect()
    by_q = {}
    for r in out:
        assert r["q_id"] != r["n_id"]
        by_q.setdefault(r["q_id"], []).append(r)
    assert set(by_q) == set(range(10))
    assert all(len(v) == K for v in by_q.values())


def test_cluster_recall_on_clustered_corpus(clustered):
    """PQ's honest retrieval contract: ADC ranks by distance to the
    RECONSTRUCTION, so points sharing a cell tie — within-cell order
    is not recoverable (that is what makes the codes 64× smaller).
    What PQ must get right is the cell: on a corpus with real
    neighbor structure (0.05 noise vs 10.0 center spread, one
    learnable codeword per cluster), every retrieved neighbor of a
    cluster-0 query must itself be a cluster-0 member. Exact-rank
    reranking on top of a PQ shortlist is the standard second stage
    (ivf_topk's exact rescore plays that role in this module)."""
    books = pq.train_pq_codebooks(clustered, k_codes=16)
    q = clustered.filter(F.col("vec_id") < 8)  # 8 cluster-0 queries
    got = pq.pq_topk(clustered, q, books, k=K).collect()
    assert len(got) == 8 * K
    hits = sum(1 for r in got if r["n_id"] < 32)  # cluster 0 = ids 0..31
    assert hits / len(got) >= 0.9


def test_argmin_tie_breaks_to_lowest_codeword(spark):
    """Two identical codewords (duplicate vectors in the first 16) —
    every vector equidistant to both must take the LOWER index, the
    documented portable tie-break."""
    base = [float(i % 3) for i in range(64)]
    rows = [(i, base) for i in range(16)] + [(16, [x + 1.0 for x in base])]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    books = pq.fixed_codebooks(df)
    codes = pq.pq_encode(df, books).collect()
    for r in codes:
        assert [r["c0"], r["c1"], r["c2"], r["c3"]] == [0, 0, 0, 0]


def test_plan_is_codegen_broadcast_no_udf(emb):
    from bigbookapi_etl_with_airflow_and_snowflake_spark.plans.introspect import (
        explain_str,
    )

    books = pq.fixed_codebooks(emb)
    out = pq.pq_topk(emb, emb.filter(F.col("vec_id") < 10), books, k=K)
    plan = explain_str(out, "simple")
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "Broadcast" in plan  # query side broadcast


def test_dim_not_divisible_is_loud(spark):
    df = spark.createDataFrame(
        [(i, [float(i)] * 63) for i in range(20)],
        "vec_id bigint, embedding array<double>",
    )
    with pytest.raises(ValueError, match="not divisible"):
        pq.fixed_codebooks(df, m_sub=4)
