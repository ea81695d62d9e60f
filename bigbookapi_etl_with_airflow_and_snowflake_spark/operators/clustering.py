"""Distributed corpus clustering (LLM-pipeline op: diversity-aware
curation, IVF index training at corpus scale).

:func:`kmeans_lloyd` is Lloyd's algorithm expressed as Spark jobs:

- **Assignment** is a narrow map over the embedding table — centroids
  (k × dim doubles, a few KB) ride a broadcast literal into a JVM
  higher-order-function expression; the corpus is scanned once per
  iteration and never shuffled for assignment.
- **Update** aggregates per-(cluster, dimension) sums via one
  posexplode + groupBy per iteration — map-side partial aggregation
  shrinks the shuffle to (k × dim × partitions) rows; only the k × dim
  result (a few hundred rows) reaches the driver for the next round's
  broadcast.
- **Determinism**: per-dimension sums accumulate in DECIMAL(28,10)
  (every float32 embedding value casts to it exactly at 10 dp, and
  decimal addition is associative), so centroid means are identical on
  any partitioning, executor count, or reduce order — unlike double
  sums, whose last-ULP drift can flip boundary assignments between
  runs. Distances then evaluate in doubles OF deterministic inputs;
  ties break on the lower cluster id.

At 100 TB: assignment is embarrassingly parallel; the update shuffle is
k × dim per partition regardless of corpus size; driver state is k × dim
— constants, not corpus-scaled. The driver-side loop runs a fixed,
small number of iterations (Lloyd's converges fast; curation pipelines
run 5-20).

The reference (youraverageTech/BigbookAPI-etl-with-airflow-and-snowflake)
has no clustering surface (SURVEY.md §2.5) — this is north-star scope.
"""

from __future__ import annotations

from decimal import Decimal

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# exact container for float32-valued sums: 10 dp covers float32's
# decimal cast output; 28 digits of headroom covers ~1e17 rows per
# cluster before overflow
_ACC = "decimal(28,10)"


def _dist2_to(vec, cent: list[float]):
    """Squared L2 distance from an array column to a Python centroid —
    a JVM fold over zip-with-literal, no Python in the hot path."""
    carr = F.array(*[F.lit(float(c)) for c in cent])
    return F.aggregate(
        F.zip_with(vec, carr, lambda x, y: (x.cast("double") - y) * (x.cast("double") - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def assign_clusters(
    df: DataFrame,
    centroids: list[list[float]],
    vec_col: str = "embedding",
) -> DataFrame:
    """Add a ``cluster`` column: index of the nearest centroid (squared
    L2, ties to the lowest index). One narrow map, centroids inlined as
    literals (broadcast by the closure)."""
    dists = F.array(*[_dist2_to(F.col(vec_col), c) for c in centroids])
    # array_position finds the FIRST occurrence of the min → lowest
    # cluster id wins ties deterministically
    cluster = (F.array_position(dists, F.array_min(dists)) - 1).cast("int")
    return df.withColumn("cluster", cluster)


def kmeans_lloyd(
    df: DataFrame,
    k: int = 8,
    iters: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    persist: bool = True,
) -> tuple[DataFrame, list[list[float]]]:
    """Lloyd's k-means over an embedding column.

    Init: the k vectors with the smallest ids (deterministic, no RNG —
    ids are corpus-stable). Returns ``(assignments, centroids)`` where
    assignments is (id, cluster) and centroids the final k × dim list.

    Each iteration: one scan for assignment + one posexplode/groupBy
    for the update. Sums ride exact decimals (see module docstring), so
    results are bit-identical on any partitioning.

    This runs ``2 + iters`` actions over the same (id, vec) projection
    (init collect, one update collect per iteration, the caller
    consuming the returned assignment), so by default that projection
    is ``persist()``-ed (MEMORY_AND_DISK, lineage kept — eviction
    recomputes, never fails): an upstream pipeline feeding this
    executes once, not once per action. Spark's cache manager matches
    on the logical plan, so a caller composing the same
    ``df.select(id, vec)`` (e.g. semantic_dedup's count + final
    assignment) reuses the block. Pass ``persist=False`` when the
    caller already cached upstream; the cache is left registered
    because the returned assignment frame reads it — callers needing
    it gone unpersist after consuming."""
    src = df.select(id_col, vec_col)
    if persist:
        from pyspark import StorageLevel

        src = src.persist(StorageLevel.MEMORY_AND_DISK)
    init = (
        src.orderBy(id_col)
        .limit(k)
        .collect()
    )
    if not init:
        raise ValueError("kmeans_lloyd: input has no rows")
    # inputs smaller than k collect fewer init vectors; the update loop
    # indexes centroids[c] for c in range(k), so clamp k to what exists
    k = min(k, len(init))
    centroids = [[float(x) for x in r[vec_col]] for r in init]

    for _ in range(iters):
        assigned = assign_clusters(src, centroids, vec_col)
        sums = (
            assigned.select(
                "cluster", F.posexplode(vec_col).alias("dim", "val")
            )
            .groupBy("cluster", "dim")
            .agg(
                F.sum(F.col("val").cast(_ACC)).alias("s"),
                F.count("*").alias("n"),
            )
            .collect()
        )
        dim = len(centroids[0])
        acc: dict[int, list[Decimal]] = {}
        cnt: dict[int, int] = {}
        for r in sums:
            acc.setdefault(r["cluster"], [Decimal(0)] * dim)[r["dim"]] = r["s"]
            cnt[r["cluster"]] = r["n"]
        centroids = [
            [float(acc[c][d] / cnt[c]) for d in range(dim)]
            if c in acc
            else centroids[c]  # empty cluster keeps its centroid
            for c in range(k)
        ]

    return assign_clusters(src, centroids, vec_col).select(id_col, "cluster"), centroids


def cluster_balanced_sample(
    df: DataFrame,
    k: int = 8,
    iters: int = 5,
    per_cluster: int = 50,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Diversity sampling: cluster the corpus, then take a deterministic
    md5-ordered sample of ``per_cluster`` items from each cluster — the
    curation move that keeps long-tail content a uniform sample would
    drown. Output: (id, cluster, sample_rank).

    Scale: the rank window partitions by cluster (k partitions of
    corpus/k rows); for skew-prone corpora raise k or pre-split hot
    clusters — the sample itself is top-N per partition, which
    TakeOrderedAndProject-style early-stops per group."""
    from pyspark.sql import Window

    assignments, _ = kmeans_lloyd(df, k, iters, id_col, vec_col)
    h = F.md5(F.concat(F.col(id_col).cast("string"), F.lit("#csample")))
    w = Window.partitionBy("cluster").orderBy(h, id_col)
    return (
        assignments.withColumn("sample_rank", F.row_number().over(w))
        .filter(F.col("sample_rank") <= per_cluster)
        .select(id_col, "cluster", "sample_rank")
    )


def label_centroids(
    df: DataFrame,
    vec_col: str = "embedding",
    label_col: str = "label",
    quantum: int = 10**6,
) -> DataFrame:
    """Per-label embedding centroids (class prototypes) with
    cross-engine, cross-topology exact semantics.

    Float vector sums are shuffle-order dependent, and double→decimal
    casts round differently across engines (Spark HALF_UP vs DuckDB) —
    so the operator SPECIFIES fixed-point arithmetic: each component is
    quantized to integer ``1/quantum`` units via floor(v·q + 0.5)
    (multiply, add, floor — all exactly-rounded IEEE ops, identical
    everywhere), summed as int64 (associative → partition-invariant),
    and the mean is one IEEE division. Output: (label, dim, mean_q, n)
    with ``dim`` 0-based; mean error vs true float mean ≤ 1/(2·quantum).

    One explode + one aggregation; the shuffle key (label, dim) is
    well-distributed for any real label/dim cardinality.
    """
    ex = df.select(
        F.col(label_col).alias("label"),
        F.posexplode(F.col(vec_col).cast("array<double>")).alias("dim", "v"),
    )
    q = F.floor(F.col("v") * F.lit(float(quantum)) + F.lit(0.5)).cast("long")
    return (
        ex.groupBy("label", "dim")
        .agg(F.sum(q).alias("s"), F.count("*").alias("n"))
        .select(
            "label",
            F.col("dim").cast("long").alias("dim"),
            (F.col("s").cast("double") / F.col("n") / F.lit(float(quantum))).alias(
                "mean_q"
            ),
            F.col("n").cast("long").alias("n"),
        )
    )
