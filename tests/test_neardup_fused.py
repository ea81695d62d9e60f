"""Round-14 optimization locks: the fused (shuffle-free) minhash
signature/band path and the single-pass simhash vote fold must be
value-identical to the aggregate/per-bit reference forms they replaced,
including the degenerate inputs (NULL text, shingle-less docs)."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import Window as W

from bigbookapi_etl_with_airflow_and_snowflake_spark.operators import neardup
from bigbookapi_etl_with_airflow_and_snowflake_spark.operators.neardup import (
    band_keys_from_text,
    minhash_band_keys,
    minhash_signatures,
    portable_simhash,
    shingle_table,
)

DOCS = [
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, "the quick brown fox jumps over the lazy cat"),
    (3, "completely different text with many unusual words here"),
    (4, "too short"),  # < 3 tokens -> no shingles
    (5, None),  # NULL text
    (6, ""),  # empty text -> one empty token
    (7, "the quick brown fox jumps over the lazy dog"),  # exact dup of 1
]


def _docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_fused_signatures_match_aggregate_form(spark):
    df = _docs(spark)
    fused = minhash_signatures(df).toPandas().sort_values("doc_id").reset_index(drop=True)
    # reference: the pre-r14 aggregate form (min over the exploded table)
    sh = shingle_table(df)
    aggs = [
        F.min(F.md5(F.concat(F.col("shingle"), F.lit(f"#seed{i}")))).alias(f"mh{i}")
        for i in range(4)
    ]
    ref = (
        sh.groupBy("doc_id").agg(*aggs).toPandas()
        .sort_values("doc_id").reset_index(drop=True)
    )
    assert fused.equals(ref)
    # shingle-less docs (4, 5, 6) are absent, like the aggregate form
    assert set(fused["doc_id"]) == {1, 2, 3, 7}


def test_fused_band_keys_match_signature_banding(spark):
    df = _docs(spark)
    fused = (
        band_keys_from_text(df).toPandas()
        .sort_values(["doc_id", "band_key"]).reset_index(drop=True)
    )
    ref = (
        minhash_band_keys(minhash_signatures(df)).toPandas()
        .sort_values(["doc_id", "band_key"]).reset_index(drop=True)
    )
    assert fused.equals(ref)
    assert fused["band_key"].notna().all()


def test_simhash_single_pass_matches_per_bit_votes(spark):
    df = _docs(spark)
    bits = 16
    got = (
        portable_simhash(df, bits=bits).toPandas()
        .sort_values("doc_id").reset_index(drop=True)
    )
    # reference: the pre-r14 per-bit filter form
    from bigbookapi_etl_with_airflow_and_snowflake_spark.operators.text import tokens

    toks = df.select("doc_id", tokens(F.col("text")).alias("__toks"))
    hashed = toks.select(
        "doc_id",
        F.transform(F.col("__toks"), lambda t: F.md5(t)).alias("__md5s"),
        F.size("__toks").alias("__n"),
    )
    bit_cols = []
    for i in range(1, bits + 1):
        ones = F.size(F.filter(F.col("__md5s"), lambda s: F.substring(s, i, 1) >= "8"))
        bit_cols.append(F.when(ones * 2 > F.col("__n"), "1").otherwise("0"))
    ref = (
        hashed.select("doc_id", F.concat(*bit_cols).alias("simhash_bits")).toPandas()
        .sort_values("doc_id").reset_index(drop=True)
    )
    assert got.equals(ref)
    # NULL text keeps the all-zeros signature (width-uniform downstream)
    null_row = got[got["doc_id"] == 5]["simhash_bits"].iloc[0]
    assert null_row == "0" * bits
