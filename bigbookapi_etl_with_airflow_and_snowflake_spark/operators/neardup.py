"""Near-duplicate detection (SURVEY.md §2.5 N2): n-gram Jaccard,
MinHash + LSH banding, SimHash.

Scale design
------------
- The O(n²) pair space is never materialized: candidate pairs come from
  an *inverted index* — an equi-self-join on the bucket key (shared
  shingle hash / MinHash band / SimHash value). One shuffle on the
  bucket key, pair volume proportional to actual collisions.
- Expression staging matters: higher-order functions run interpreted
  (no whole-stage codegen, no common-subexpression elimination), so the
  token/shingle arrays are bound to real projection columns once per
  row, never re-derived inside downstream lambdas. This is the
  difference between O(rows) and O(rows × shingles) regex splits.
- MinHash values use md5 (engine-portable, uniformly distributed), so
  signatures computed here match signatures computed by any other system
  on the same text — the dedup keys are infrastructure-independent, and
  band keys are uniform → the bucket shuffle is skew-free.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions import bind
from .text import tokens, word_shingles


def _bucket_pairs(keyed: DataFrame, key_col: str, id_col: str) -> DataFrame:
    """Inverted-index candidate pairs: (id_a, id_b) per shared key.

    Implemented as an equi-self-join on the bucket key with ``id_a <
    id_b`` — a plain hash join whose output volume equals actual
    collisions, never n². (A collect_list + in-bucket pair-explosion
    variant was measured 2-3× slower at sf0.1: array building and the
    nested-transform explode run interpreted, while the self-join stays
    in codegen'd hash-join machinery.)

    Input: one (key, id) row per membership. Output keeps one row per
    (key, pair) — callers dedup or count as their semantics require.
    """
    a = keyed.select(F.col(id_col).alias("id_a"), key_col)
    b = keyed.select(F.col(id_col).alias("id_b"), key_col)
    return a.join(b, key_col).filter(F.col("id_a") < F.col("id_b")).select(
        "id_a", "id_b"
    )


def shingle_table(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", n: int = 3
) -> DataFrame:
    """(id, shingle) rows — distinct word n-grams per doc. One bound
    shingling expression per row (see functions/expr.py) feeding a
    single explode."""
    return df.select(
        F.col(id_col),
        F.explode(word_shingles(F.col(text_col), n)).alias("shingle"),
    )


def jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Exact n-gram Jaccard similarity, prefix-filtered: keeps pairs
    with J ≥ threshold — identical results to the naive
    every-pair-sharing-a-shingle join, at a fraction of the pair volume.

    Plan: rarity-ordered shingle arrays per doc → inverted index over
    each doc's *prefix* (the |S| − ⌈t·|S|⌉ + 1 rarest shingles; by the
    prefix-filtering principle any pair with J ≥ t collides there) →
    exact |∩| via array_intersect per surviving candidate → J = |∩| /
    (|A|+|B|−|∩|), an IEEE division of exact ints.
    Output: (id_a, id_b, jaccard), id_a < id_b.
    """
    sh = shingle_table(df, text_col, id_col, n)
    # shuffle the 8-byte shingle hash, not the shingle text (collision
    # odds over the whole corpus ~2⁻⁶⁴ per co-occurring shingle pair —
    # immaterial next to the I/O halved per shuffled row)
    hashed = sh.select(id_col, F.xxhash64("shingle").alias("__h"))
    # Prefix filtering (PPJoin / Vernica et al.): under any global total
    # order of shingles, two sets with J ≥ t MUST share a shingle inside
    # each one's first (|S| − ⌈t·|S|⌉ + 1) shingles. Ordering by
    # ascending document frequency puts the *rarest* shingles in the
    # prefix, so the inverted index is built over rare shingles only —
    # the hot-shingle pair explosion (the quadratic term at 100 TB)
    # never happens, and the result is provably identical.
    dfreq = hashed.groupBy("__h").agg(F.count("*").alias("__df"))
    docs = (
        hashed.join(dfreq, "__h")
        .groupBy(id_col)
        .agg(F.sort_array(F.collect_list(F.struct("__df", "__h"))).alias("__s"))
        .select(
            F.col(id_col),
            F.transform("__s", lambda s: s["__h"]).alias("__sh"),
            F.size("__s").alias("n_sh"),
        )
    )
    # Duplicate-aware collapse: Jaccard is a function of the shingle
    # SET, so docs with identical sets (exact copies, reorderings) are
    # grouped and only one representative enters the quadratic-ish
    # candidate stage. Within-group pairs are emitted directly with
    # J = |S|/|S| = 1.0; cross-group member pairs inherit their reps'
    # exact J. On duplicate-heavy corpora (the common 100 TB reality)
    # this removes the clique term entirely; results are identical.
    # The shingle pipeline above (explode → dfreq join → collect_list
    # agg) feeds three independent branches (groups, rep_docs, members)
    # whose downstream references compound multiplicatively — without
    # truncation the executed plan holds 28 scans of the source, each
    # replaying both shuffles, and AQE exchange reuse does not collapse
    # them (0 ReusedExchange observed). Same tradeoff as
    # dedup.connected_components: materializing docs and rep_docs
    # (bounded by the shuffle this stage already pays) caps source
    # replays at one. Locally the fixed overhead is ~1 s at sf0.1 and
    # within run noise at 10×; the win is the bounded recompute at real
    # corpus sizes, where 28 replays of scan+explode+2 shuffles
    # dominate everything else in the query.
    docs = docs.withColumn(
        "__gk", F.md5(F.concat_ws(",", F.col("__sh").cast("array<string>")))
    ).localCheckpoint(eager=True)
    groups = docs.groupBy(F.col("__gk").alias("__gg")).agg(
        F.min(id_col).alias("__rep")
    )
    rep_docs = docs.join(
        groups, (docs["__gk"] == groups["__gg"]) & (docs[id_col] == groups["__rep"])
    ).select("__rep", "__sh", "n_sh").localCheckpoint(eager=True)

    prefix_len = F.col("n_sh") - F.ceil(F.lit(threshold) * F.col("n_sh")).cast(
        "int"
    ) + F.lit(1)
    prefix = rep_docs.select(
        F.col("__rep"),
        F.col("n_sh"),
        F.explode(F.slice("__sh", F.lit(1), prefix_len)).alias("__h"),
    )
    # length filter rides the candidate join: J ≥ t ⇒ t·|A| ≤ |B| ≤ |A|/t
    pa = prefix.select(F.col("__rep").alias("ra"), F.col("n_sh").alias("__na"), "__h")
    pb = prefix.select(F.col("__rep").alias("rb"), F.col("n_sh").alias("__nb"), "__h")
    cand = (
        pa.join(pb, "__h")
        .filter(
            (F.col("ra") < F.col("rb"))
            & (
                F.greatest("__na", "__nb") * F.lit(threshold)
                <= F.least("__na", "__nb")
            )
        )
        .select("ra", "rb")
        .distinct()
    )
    a = rep_docs.select(
        F.col("__rep").alias("ra"), F.col("__sh").alias("__sh_a"), F.col("n_sh").alias("n_a")
    )
    b = rep_docs.select(
        F.col("__rep").alias("rb"), F.col("__sh").alias("__sh_b"), F.col("n_sh").alias("n_b")
    )
    n_inter = F.size(F.array_intersect("__sh_a", "__sh_b"))
    rep_pairs = (
        cand.join(a, "ra")
        .join(b, "rb")
        .select(
            "ra",
            "rb",
            (
                n_inter.cast("double")
                / (F.col("n_a") + F.col("n_b") - n_inter)
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )

    members = docs.select(F.col("__gk"), F.col(id_col).alias("__m"))
    # within-group pairs: identical sets, J exactly 1.0
    intra = (
        members.alias("x")
        .join(members.alias("y"), "__gk")
        .filter(F.col("x.__m") < F.col("y.__m"))
        .select(
            F.col("x.__m").alias("id_a"),
            F.col("y.__m").alias("id_b"),
            F.lit(1.0).alias("jaccard"),
        )
    )
    # cross-group expansion: every member pair inherits the reps' J
    r2g = groups.select(F.col("__rep"), F.col("__gg").alias("__gk"))
    inter = (
        rep_pairs.join(
            r2g.select(F.col("__rep").alias("ra"), F.col("__gk").alias("__gka")), "ra"
        )
        .join(r2g.select(F.col("__rep").alias("rb"), F.col("__gk").alias("__gkb")), "rb")
        .join(members.select(F.col("__gk").alias("__gka"), F.col("__m").alias("__ma")), "__gka")
        .join(members.select(F.col("__gk").alias("__gkb"), F.col("__m").alias("__mb")), "__gkb")
        .select(
            F.least("__ma", "__mb").alias("id_a"),
            F.greatest("__ma", "__mb").alias("id_b"),
            "jaccard",
        )
    )
    return intra.unionByName(inter)


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 4,
    n: int = 3,
) -> DataFrame:
    """MinHash signature per document: ``mh{i} = min(md5(shingle ⊕ seed_i))``.

    Computed as ``num_hashes`` min-aggregates over the exploded shingle
    table: shingling runs once, map-side partial mins shrink the shuffle
    to one narrow row per (doc, partition), and the doc_id grouping key
    is unique → skew-free. (An array-expression variant without the
    shuffle exists, but optimizer project-collapsing re-inlined the
    shingling per hash — the aggregate form is robust.)
    """
    sh = shingle_table(df, text_col, id_col, n)
    aggs = [
        F.min(F.md5(F.concat(F.col("shingle"), F.lit(f"#seed{i}")))).alias(f"mh{i}")
        for i in range(num_hashes)
    ]
    return sh.groupBy(id_col).agg(*aggs)


def minhash_band_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 4,
    rows_per_band: int = 2,
    n: int = 3,
) -> DataFrame:
    """LSH banding over MinHash signatures → candidate near-dup pairs.

    Bands of ``rows_per_band`` hashes concatenate into bucket keys; the
    inverted index over band keys yields pairs (computed once — the
    signature stage is not re-derived per join side). Output: distinct
    (id_a, id_b), id_a < id_b.
    """
    sig = minhash_signatures(df, text_col, id_col, num_hashes, n)
    n_bands = num_hashes // rows_per_band
    bands = sig.select(
        F.col(id_col),
        F.explode(
            F.array(
                *[
                    F.concat_ws(
                        "|",
                        F.lit(str(b)),
                        *[
                            F.col(f"mh{b * rows_per_band + r}")
                            for r in range(rows_per_band)
                        ],
                    )
                    for b in range(n_bands)
                ]
            )
        ).alias("band_key"),
    )
    return _bucket_pairs(bands, "band_key", id_col).distinct()


def simhash(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bits: int = 32,
) -> DataFrame:
    """SimHash per document — majority vote over token-hash bit vectors.

    Uses ``xxhash64`` (JVM-side, fast, *not* engine-portable — SimHash
    here is an intra-engine near-dup key, checked rows-only by the
    driver). The token-hash array is staged once; each bit's majority
    vote is a size/filter over it.
    """
    toks = df.select(F.col(id_col), tokens(F.col(text_col)).alias("__toks"))
    hashed = toks.select(
        F.col(id_col),
        F.transform(F.col("__toks"), lambda t: F.xxhash64(t)).alias("__h"),
        F.size("__toks").alias("__n"),
    )
    one = F.lit(1).cast("long")
    bit_cols = []
    for b in range(bits):
        mask = F.shiftleft(one, b)
        ones = F.size(F.filter(F.col("__h"), lambda x: x.bitwiseAND(mask) != 0))
        vote = (ones * 2) > F.col("__n")  # majority of tokens set this bit
        bit_cols.append(F.when(vote, mask).otherwise(F.lit(0).cast("long")))
    sim = bit_cols[0]
    for c in bit_cols[1:]:
        sim = sim.bitwiseOR(c)
    return hashed.select(F.col(id_col), sim.alias("simhash"))
