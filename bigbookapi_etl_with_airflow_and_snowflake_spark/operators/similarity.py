"""Similarity search over embedding columns (SURVEY.md §2.5 N3).

Two tiers, same API:

- :func:`cosine_topk` — exact brute force. The query side is small by
  contract (a handful of probe vectors) and is **broadcast**, so the
  candidate scan is a single map stage (no shuffle of the 100 TB side);
  top-k is a per-query window over the scored rows.
- :func:`lsh_topk` — the scale path: random-hyperplane LSH buckets both
  sides, the join touches only matching buckets, then exact rescoring
  within buckets. Recall < 1.0 by design; ``probes`` widens buckets.

Dot products use ``zip_with`` + ``aggregate`` — builtin higher-order
functions evaluated in the JVM, element-order-deterministic (left fold),
no Python or Arrow transfer in the hot loop.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Sequential left-fold dot product of two array<float|double> cols."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def cosine_topk(
    candidates: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int | None = 6,
) -> DataFrame:
    """Exact cosine top-k: for every query vector, the k nearest
    candidates (self-matches excluded).

    Output: (q_id, n_id, sim) ranked deterministically by
    (sim desc, n_id) so ties are stable. The query side is broadcast —
    the big side is scanned once, never shuffled; the only shuffle is
    the per-query top-k, whose input is already pruned to scored rows.
    """
    q = queries.select(
        F.col(id_col).alias("q_id"), F.col(vec_col).alias("q_vec")
    )
    c = candidates.select(
        F.col(id_col).alias("n_id"), F.col(vec_col).alias("n_vec")
    )
    sim = cosine(F.col("q_vec"), F.col("n_vec"))
    if round_to is not None:
        sim = F.round(sim, round_to)
    scored = (
        c.join(F.broadcast(q), F.col("q_id") != F.col("n_id"))
        .select("q_id", "n_id", sim.alias("sim"))
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("sim"), F.asc("n_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("q_id", "n_id", "sim")
    )


def knn_label_vote(
    candidates: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """k-NN majority-label classification of each query vector.

    Ties broken by smaller label (deterministic). Output (q_id, pred_label).
    """
    topk = cosine_topk(candidates, queries, k, id_col, vec_col)
    labeled = topk.join(
        candidates.select(F.col(id_col).alias("n_id"), F.col(label_col)), "n_id"
    )
    votes = labeled.groupBy("q_id", label_col).agg(F.count("*").alias("n_votes"))
    w = Window.partitionBy("q_id").orderBy(F.desc("n_votes"), F.asc(label_col))
    return (
        votes.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") == 1)
        .select("q_id", F.col(label_col).alias("pred_label"))
    )


def embedding_neardup_pairs(
    df: DataFrame,
    threshold: float = 0.4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int | None = 6,
) -> DataFrame:
    """N2 (embedding variant): exact cosine near-duplicate pairs —
    all (id_a < id_b) pairs with similarity ≥ ``threshold``.

    This exact form is the correctness oracle; at 100 TB the same
    semantics run through :func:`lsh_topk`-style bucketing (hyperplane
    buckets prune the pair space, exact rescore inside buckets) — see
    ``queries.q_lsh_topk`` for the bucketed path.
    """
    a = df.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("vec_a"))
    b = df.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vec_b"))
    sim = cosine(F.col("vec_a"), F.col("vec_b"))
    if round_to is not None:
        sim = F.round(sim, round_to)
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", sim.alias("sim"))
        .filter(F.col("sim") >= threshold)
    )


def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    """Deterministic pseudo-random unit hyperplanes (driver-side, tiny)."""
    import numpy as np

    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_planes, dim))
    planes /= np.linalg.norm(planes, axis=1, keepdims=True)
    return planes.tolist()


def lsh_bucket(vec: Column, planes: list[list[float]]) -> Column:
    """Sign-pattern bucket id for ``vec`` under the given hyperplanes."""
    bits = [
        F.when(
            dot(vec, F.array(*[F.lit(float(p)) for p in plane])) >= 0, F.lit("1")
        ).otherwise(F.lit("0"))
        for plane in planes
    ]
    return F.concat(*bits)


def lsh_topk(
    candidates: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 8,
    dim: int = 64,
    seed: int = 42,
) -> DataFrame:
    """Approximate cosine top-k via random-hyperplane LSH.

    Both sides are bucketed by the sign pattern of ``n_planes``
    hyperplane projections; the scoring join runs per-bucket, touching
    ~n/2^planes of the candidate set per query instead of all of it.
    The 100 TB path: the bucket column becomes the partition key, so
    a query only reads its bucket's partitions (partition pruning).
    """
    planes = _hyperplanes(dim, n_planes, seed)
    q = queries.select(
        F.col(id_col).alias("q_id"),
        F.col(vec_col).alias("q_vec"),
        lsh_bucket(F.col(vec_col), planes).alias("bucket"),
    )
    c = candidates.select(
        F.col(id_col).alias("n_id"),
        F.col(vec_col).alias("n_vec"),
        lsh_bucket(F.col(vec_col), planes).alias("bucket"),
    )
    scored = (
        c.join(F.broadcast(q), "bucket")
        .filter(F.col("q_id") != F.col("n_id"))
        .select("q_id", "n_id", F.round(cosine(F.col("q_vec"), F.col("n_vec")), 6).alias("sim"))
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("sim"), F.asc("n_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("q_id", "n_id", "sim")
    )
