"""Product quantization (PQ) for compressed ANN search — Jégou,
Douze, Schmid, "Product Quantization for Nearest Neighbor Search"
(TPAMI 2011), the compression layer of the production FAISS
IVF+PQ layout.

A D-dim vector splits into M contiguous subvectors; each subspace
gets its own K-codeword codebook; a vector encodes as M small ints
(here M=4, K=16 over dim-64 → 4 codes ≈ 64× smaller than float32).
Search uses ADC (asymmetric distance computation): the query stays
exact, each subspace precomputes a K-entry distance table to the
codebook, and a candidate's approximate distance is M table lookups —
no decompression, no per-candidate float math beyond the adds.

Spark-first: codebooks are driver-trained on a bounded deterministic
sample (they are tiny — M·K·(D/M) floats — and broadcast as literals
into codegen'd expressions), encode/ADC are pure `pyspark.sql.functions`
column expressions (zip_with/aggregate folds — whole-stage codegen, no
UDF), and the ranking is the standard per-query row_number window.
Engine-portable determinism: every fold is a fixed-order sequential
sum, argmin ties break to the lowest codeword index, rank ties to the
lowest neighbor id — the exact-config twins replay bit-for-bit in SQL.

Reference scope note: the reference repo has no similarity search at
all (SURVEY.md §2.5 N3 is a from-scratch north-star tier); this module
extends the existing brute/LSH/IVF family with the compressed-index
path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = [
    "fixed_codebooks",
    "train_pq_codebooks",
    "pq_encode",
    "pq_topk",
]


def _subvector(vec: Column, m: int, dsub: int) -> Column:
    """Subspace ``m``'s slice, cast to double (parquet embeddings are
    float32; all arithmetic runs in float64 on both engines)."""
    return F.transform(
        F.slice(vec, m * dsub + 1, dsub), lambda x: x.cast("double")
    )


def _sqdist(a: Column, codeword: list[float]) -> Column:
    """Squared L2 distance between a (double) array column and a
    literal codeword — one zip_with + a sequential left fold, the same
    association order as the SQL oracle's list_reduce."""
    b = F.array(*[F.lit(float(v)) for v in codeword])
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def fixed_codebooks(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m_sub: int = 4,
    k_codes: int = 16,
) -> list[list[list[float]]]:
    """Deterministic 0-training codebooks: subspace ``m``'s codewords
    are the subvectors of the ``k_codes`` smallest-id vectors — the
    exact-config twin convention (kmeans_assign_init / ivf_topk_exact):
    data-derived, engine-portable, replayable in SQL with an ORDER BY
    id LIMIT k. Recall is worse than trained codebooks; correctness of
    the encode/ADC kernel is identical, which is what the oracle
    checks."""
    rows = (
        df.select(vec_col, id_col).orderBy(id_col).limit(k_codes).collect()
    )
    if len(rows) < k_codes:
        raise ValueError(
            f"fixed_codebooks: need {k_codes} vectors, have {len(rows)}"
        )
    dim = len(rows[0][0])
    dsub = dim // m_sub
    if m_sub * dsub != dim:
        raise ValueError(f"dim {dim} not divisible by m_sub {m_sub}")
    return [
        [[float(v) for v in r[0][m * dsub : (m + 1) * dsub]] for r in rows]
        for m in range(m_sub)
    ]


def train_pq_codebooks(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m_sub: int = 4,
    k_codes: int = 16,
    seed: int = 42,
    iters: int = 10,
    sample_size: int = 10_000,
) -> list[list[list[float]]]:
    """Production codebooks: per-subspace k-means (plain L2 Lloyd's)
    on a bounded deterministic sample — same driver-side pattern as
    the IVF trainer (`similarity._kmeans_centroids`): the model is
    M·K·(D/M) floats regardless of corpus size, so it broadcasts as
    expression literals. Seeded numpy → engine-local (registry twin
    rule: trained variants pair with a fixed-codebook exact twin)."""
    import numpy as np

    sample = [
        r[0]
        for r in df.select(vec_col, id_col)
        .orderBy(id_col)
        .limit(sample_size)
        .collect()
    ]
    if not sample:
        raise ValueError("train_pq_codebooks: empty input")
    x = np.asarray(sample, dtype=np.float64)
    dim = x.shape[1]
    dsub = dim // m_sub
    if m_sub * dsub != dim:
        raise ValueError(f"dim {dim} not divisible by m_sub {m_sub}")
    rng = np.random.default_rng(seed)
    books = []
    for m in range(m_sub):
        sub = x[:, m * dsub : (m + 1) * dsub]
        k = min(k_codes, len(sub))
        cents = sub[rng.choice(len(sub), size=k, replace=False)]
        for _ in range(iters):
            d = ((sub[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
            assign = d.argmin(axis=1)
            for c in range(k):
                members = sub[assign == c]
                if len(members):
                    cents[c] = members.mean(axis=0)
        books.append(cents.tolist())
    return books


def _code_col(vec: Column, book: list[list[float]], m: int, dsub: int) -> Column:
    """Codeword index (0-based) for subspace ``m``: argmin of squared
    L2 over the codebook, ties to the LOWEST index (array_position
    returns the first occurrence)."""
    sub = _subvector(vec, m, dsub)
    dists = F.array(*[_sqdist(sub, cw) for cw in book])
    return (F.array_position(dists, F.array_min(dists)) - 1).cast("int")


def pq_encode(
    df: DataFrame,
    codebooks: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Compress each vector to its PQ codes: ``(id, c0..c{M-1})``.
    Pure column expressions (M·K literal-codeword distance folds in
    one codegen'd projection) — this output IS the at-rest compressed
    index; write it to parquet and the original float corpus never
    needs to be scanned again for ADC search."""
    dim = sum(len(b[0]) for b in codebooks)
    dsub = dim // len(codebooks)
    return df.select(
        F.col(id_col),
        *[
            _code_col(F.col(vec_col), book, m, dsub).alias(f"c{m}")
            for m, book in enumerate(codebooks)
        ],
    )


def pq_topk(
    candidates: DataFrame,
    queries: DataFrame,
    codebooks: list[list[list[float]]],
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate L2 top-k by ADC over PQ codes: candidates are
    encoded (M small ints each), each query precomputes an M×K
    distance table as literal-codebook expressions, and the scored
    join evaluates ``dist = Σ_m table_m[code_m]`` — M array lookups
    and adds per (query, candidate), never a D-dim float loop.

    The query side is broadcast (queries are the small side by
    construction); the ranking window partitions by query id. Output:
    (q_id, n_id, dist) with dist rounded to 6 (the N3 convention) and
    rank ties broken by ascending neighbor id."""
    dim = sum(len(b[0]) for b in codebooks)
    m_sub = len(codebooks)
    dsub = dim // m_sub
    codes = pq_encode(candidates, codebooks, id_col, vec_col).withColumnRenamed(
        id_col, "n_id"
    )
    q = queries.select(
        F.col(id_col).alias("q_id"),
        *[
            F.array(
                *[
                    _sqdist(_subvector(F.col(vec_col), m, dsub), cw)
                    for cw in book
                ]
            ).alias(f"t{m}")
            for m, book in enumerate(codebooks)
        ],
    )
    scored = (
        codes.join(F.broadcast(q), F.col("q_id") != F.col("n_id"))
        .select(
            "q_id",
            "n_id",
            F.round(
                sum(
                    F.element_at(F.col(f"t{m}"), F.col(f"c{m}") + 1)
                    for m in range(m_sub)
                ),
                6,
            ).alias("dist"),
        )
    )
    w = Window.partitionBy("q_id").orderBy(F.asc("dist"), F.asc("n_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("q_id", "n_id", "dist")
    )
