"""Bigram language-model quality scoring (the CCNet-style LM filter).

Production pretraining pipelines score every document against a
reference-domain language model and drop the high-perplexity tail
(CCNet, Gopher/MassiveText, RefinedWeb all do a variant). The reference
repo has no corpus-quality tier at all; this is the Spark-first
formulation:

- **Train** = two aggregations over the reference slice's token
  stream: bigram counts c(a,b) and context counts c(a) (the latter a
  rollup of the former, so training is ONE pass over the corpus).
- **Score** = explode each document into bigrams, LEFT JOIN the two
  count tables, aggregate per document. No Python in the hot path; the
  joins shuffle on the bigram/context keys and AQE handles hot-token
  skew (stopword bigrams) the same way it handles any hot join key.

At 100 TB the count tables are |distinct bigrams| rows — millions, not
corpus-sized — and broadcast when they fit; the per-doc score is one
pass over the document stream. Add-one smoothing keeps the model free
of hyperparameter state beyond the vocabulary size.

Cross-entropy sums IEEE doubles, so it is deterministic only up to
aggregation order — the registry entry (`lm_quality` in
queries_ops.py) therefore exposes the INTEGER-exact signals
(bigram/context hit counts and a fixed-point coverage score) under the
DuckDB oracle, while `cross_entropy`/`perplexity` are locked by the
pure-Python replay in tests/test_lm.py. (Same pattern as the sketch
tier: engine-order-sensitive floats ride rows-only, exact twins carry
the oracle.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["doc_bigrams", "train_bigram_lm", "score_bigram_lm", "quality_buckets"]


def doc_bigrams(df: DataFrame, text_col: str = "text", id_col: str = "doc_id"):
    """(id, a, b) — one row per adjacent whitespace-token pair; docs
    with fewer than two tokens contribute nothing. Tokenization is the
    module-standard whitespace split (operators/text.py tokens) so the
    LM tier can never silently diverge from the rest of the text
    operators or their SQL-oracle convention."""
    from .text import tokens

    toks = tokens(F.col(text_col))
    pairs = F.expr(
        "CASE WHEN size(__t) >= 2 THEN "
        "transform(sequence(1, size(__t) - 1), "
        "i -> struct(element_at(__t, i) AS a, element_at(__t, i + 1) AS b)) "
        "ELSE array() END"
    )
    return (
        df.select(F.col(id_col), toks.alias("__t"))
        .select(F.col(id_col), F.explode(pairs).alias("__p"))
        .select(F.col(id_col), F.col("__p.a").alias("a"), F.col("__p.b").alias("b"))
    )


def train_bigram_lm(
    ref: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> tuple[DataFrame, DataFrame, int]:
    """Train on the reference slice: returns ``(bigrams, contexts,
    vocab_size)`` where ``bigrams`` = (a, b, c_ab), ``contexts`` =
    (a, c_a) (the per-context rollup of the same counts), and
    ``vocab_size`` = distinct context tokens — the V in add-one
    smoothing. One corpus pass; the rollup and the distinct both read
    the already-aggregated bigram table."""
    bigrams = (
        doc_bigrams(ref, text_col, id_col)
        .groupBy("a", "b")
        .agg(F.count("*").alias("c_ab"))
    )
    contexts = bigrams.groupBy("a").agg(F.sum("c_ab").alias("c_a"))
    vocab_size = contexts.count()
    return bigrams, contexts, vocab_size


def score_bigram_lm(
    docs: DataFrame,
    bigrams: DataFrame,
    contexts: DataFrame,
    vocab_size: int,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document LM quality: explode to bigrams, LEFT JOIN the count
    tables, aggregate. Output per doc (docs with ≥2 tokens):

    - ``n_bigrams``, ``known_bigrams`` (c(a,b) > 0 in training),
      ``known_contexts`` (context token seen in training) — exact ints;
    - ``coverage_pm`` — known_bigrams per mille of n_bigrams, exact
      integer arithmetic (the oracle-friendly fixed-point score);
    - ``cross_entropy`` — −mean ln((c(a,b)+1)/(c(a)+V)), add-one
      smoothed, nats; ``perplexity`` = exp(cross_entropy). IEEE sums:
      deterministic up to aggregation order (see module docstring).
    """
    if vocab_size < 1:
        raise ValueError(
            "empty reference corpus (vocab_size == 0): the smoothed "
            "probability (c+1)/(c+V) degenerates to division by zero — "
            "train on a non-empty slice"
        )
    d = doc_bigrams(docs, text_col, id_col)
    joined = (
        d.join(bigrams, ["a", "b"], "left")
        .join(contexts, ["a"], "left")
        .select(
            F.col(id_col),
            F.col("c_ab"),
            F.col("c_a"),
        )
    )
    v = F.lit(float(vocab_size))
    logp = F.log(
        (F.coalesce(F.col("c_ab"), F.lit(0)).cast("double") + F.lit(1.0))
        / (F.coalesce(F.col("c_a"), F.lit(0)).cast("double") + v)
    )
    out = joined.groupBy(id_col).agg(
        F.count("*").alias("n_bigrams"),
        F.count("c_ab").alias("known_bigrams"),
        F.count("c_a").alias("known_contexts"),
        F.avg(-logp).alias("cross_entropy"),
    )
    return out.select(
        id_col,
        "n_bigrams",
        "known_bigrams",
        "known_contexts",
        F.floor(F.lit(1000) * F.col("known_bigrams") / F.col("n_bigrams"))
        .cast("long")
        .alias("coverage_pm"),
        "cross_entropy",
        F.exp("cross_entropy").alias("perplexity"),
    )


def quality_buckets(
    scored: DataFrame,
    score_col: str,
    id_col: str = "doc_id",
    labels: tuple[str, str, str] = ("head", "middle", "tail"),
    persist: bool = True,
) -> DataFrame:
    """CCNet's head/middle/tail quality bucketing (Wenzek et al. 2020
    §4.3: score every document with the reference LM, then split the
    corpus into thirds by score and keep/weight the buckets
    differently downstream). Threshold semantics, exactly as CCNet
    applies them: the cut points are SCORE VALUES, so equal-scoring
    documents always share a bucket (an NTILE would split ties by row
    order — and would also be a single-partition window).

    ``score_col`` must be integer-exact and bounded-domain (the
    per-mille ``coverage_pm`` from :func:`score_bigram_lm` here;
    CCNet's own perplexities would first be quantized the same way).
    That bound is the scale story: ONE pass over the corpus builds the
    per-value counts (≤ domain-size rows — a metadata-sized collect,
    same convention as centroid/manifest reads), the cut points are
    integer arithmetic over that tiny result driver-side, and the
    per-document assignment is a literal CASE projection — no global
    sort, no second scan of the upstream pipeline (a ``count()`` here
    would re-run the whole LM train+score lineage just for n).

    This is a TWO-ACTION operator (the threshold collect, then the
    caller consuming the returned frame), so by default ``scored`` is
    ``persist()``-ed (MEMORY_AND_DISK, lineage kept — eviction falls
    back to recompute, never fails) before the collect and the
    assignment projection reads the cached frame: the upstream lineage
    — for CCNet the full LM train+score — executes ONCE, not once per
    action. Pass ``persist=False`` when the caller already
    cached/checkpointed upstream. The cache is left registered (the
    returned frame depends on it); callers that need it gone call
    ``scored.unpersist()`` after consuming the result.

    Cut points: with n documents, ``head`` is every doc scoring ≥ the
    ⌈n/3⌉-th best document's score, ``tail`` every doc scoring < the
    ⌈2n/3⌉-th best document's score, ``middle`` the rest. Integer
    arithmetic only — bit-replayable in SQL.
    """
    if persist:
        from pyspark import StorageLevel

        scored = scored.persist(StorageLevel.MEMORY_AND_DISK)
    sc = F.col(score_col)
    by_value = sorted(
        (
            (r[score_col], r["__c"])
            for r in scored.groupBy(score_col)
            .agg(F.count("*").alias("__c"))
            .collect()
        ),
        key=lambda t: t[0],
        reverse=True,
    )
    n = sum(c for _, c in by_value)
    if n == 0:
        return scored.select(F.col(id_col), sc, F.lit(labels[2]).alias("bucket"))
    head_rank, mid_rank = (n + 2) // 3, (2 * n + 2) // 3
    cum, head_thr, mid_thr = 0, None, None
    for s, c in by_value:  # score descending; cum is monotone
        cum += c
        if head_thr is None and cum >= head_rank:
            head_thr = s
        if mid_thr is None and cum >= mid_rank:
            mid_thr = s
    return scored.select(
        F.col(id_col),
        sc,
        F.when(sc >= F.lit(head_thr), labels[0])
        .when(sc >= F.lit(mid_thr), labels[1])
        .otherwise(labels[2])
        .alias("bucket"),
    )
