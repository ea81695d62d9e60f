"""Sequence packing (concat-and-split) and RAG document chunking."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from bigbookapi_etl_with_airflow_and_snowflake_spark.operators.packing import (
    chunk_documents,
    pack_sequences,
)


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (0, "a b c d e"),  # 5 tokens
        (1, "f g  h"),  # 3 tokens (double space collapses)
        (2, "   "),  # whitespace-only: dropped entirely
        (3, " i j k l m n o "),  # 7 tokens (leading/trailing trimmed)
        (4, "p"),  # 1 token
    ]
    # scrambled partitioning: packing order must come from doc_id, not layout
    return spark.createDataFrame(rows, "doc_id long, text string").repartition(3)


def test_pack_sequences_exact(spark, corpus):
    # token stream: a b c d e | f g h | i j k l m n o | p  (16 tokens)
    out = {r["seq_id"]: r for r in pack_sequences(corpus, seq_len=4).collect()}
    assert sorted(out) == [0, 1, 2, 3]
    # seq 0: a b c d          — doc 0 starts at 0
    assert (out[0]["n_tokens"], out[0]["n_docs"]) == (4, 1)
    assert (out[0]["first_doc"], out[0]["last_doc"]) == (0, 0)
    assert out[0]["doc_starts"] == "0"
    # seq 1: e f g h          — doc 1 starts at offset 1
    assert (out[1]["n_tokens"], out[1]["n_docs"]) == (4, 2)
    assert (out[1]["first_doc"], out[1]["last_doc"]) == (0, 1)
    assert out[1]["doc_starts"] == "1"
    # seq 2: i j k l          — doc 3 starts at offset 0
    assert (out[2]["n_tokens"], out[2]["n_docs"]) == (4, 1)
    assert out[2]["doc_starts"] == "0"
    # seq 3: m n o p (full)   — doc 4 starts at offset 3
    assert (out[3]["n_tokens"], out[3]["n_docs"]) == (4, 2)
    assert (out[3]["first_doc"], out[3]["last_doc"]) == (3, 4)
    assert out[3]["doc_starts"] == "3"


def test_pack_sequences_partial_tail_and_interior(spark):
    # one long doc spanning several sequences: interior sequences have
    # no doc start ('' boundary list), tail sequence is partial
    docs = spark.createDataFrame(
        [(7, " ".join(f"t{i}" for i in range(10)))], "doc_id long, text string"
    )
    out = {r["seq_id"]: r for r in pack_sequences(docs, seq_len=4).collect()}
    assert out[0]["doc_starts"] == "0"
    assert out[1]["doc_starts"] == ""  # interior of doc 7
    assert out[2]["n_tokens"] == 2  # 10 = 4 + 4 + 2
    assert out[2]["doc_starts"] == ""


def test_pack_sequences_fingerprint_is_content(spark, corpus):
    # same corpus, different partitioning / different seq ordering →
    # identical fingerprints (md5 is over tokens in global order)
    a = {r["seq_id"]: r["seq_md5"] for r in pack_sequences(corpus, 4).collect()}
    b = {
        r["seq_id"]: r["seq_md5"]
        for r in pack_sequences(corpus.coalesce(1), 4, num_partitions=5).collect()
    }
    assert a == b


def test_pack_sequences_validation(spark, corpus):
    with pytest.raises(ValueError, match="seq_len"):
        pack_sequences(corpus, 0)
    with pytest.raises(ValueError, match="collision"):
        pack_sequences(corpus.withColumn("__start", F.lit(1)), 4)


def test_chunk_documents_exact(spark):
    docs = spark.createDataFrame(
        [(1, "abcdefghij"), (2, "ab"), (3, "")], "doc_id long, text string"
    )
    rows = sorted(
        chunk_documents(docs, chunk_size=4, overlap=2).collect(),
        key=lambda r: (r["doc_id"], r["chunk_idx"]),
    )
    got = [(r["doc_id"], r["chunk_idx"], r["char_start"], r["chunk_text"]) for r in rows]
    # doc 1: stride 2 → starts 0,2,4,6 cover all 10 chars
    assert got == [
        (1, 0, 0, "abcd"),
        (1, 1, 2, "cdef"),
        (1, 2, 4, "efgh"),
        (1, 3, 6, "ghij"),
        (2, 0, 0, "ab"),
        (3, 0, 0, ""),
    ]
    # every character is covered and chunk_len is consistent
    assert all(r["chunk_len"] == len(r["chunk_text"]) for r in rows)


def test_chunk_documents_covers_exact_multiple(spark):
    # len - chunk_size an exact multiple of stride: no empty tail chunk
    docs = spark.createDataFrame([(1, "abcdefgh")], "doc_id long, text string")
    rows = chunk_documents(docs, chunk_size=4, overlap=0).collect()
    assert sorted(r["chunk_text"] for r in rows) == ["abcd", "efgh"]


def test_chunk_documents_validation(spark):
    docs = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(ValueError, match="chunk_size"):
        chunk_documents(docs, 0)
    with pytest.raises(ValueError, match="overlap"):
        chunk_documents(docs, 4, overlap=4)


def test_pack_plan_has_no_global_window(spark, corpus):
    """The whole point of the operator: the plan must not contain a
    single-partition Window (SUM OVER (ORDER BY) with no PARTITION BY)
    — offsets come from the two-pass prefix sum instead."""
    plan = pack_sequences(corpus, 4)._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan


def test_pack_sequences_duplicate_ids_refused(spark):
    docs = spark.createDataFrame(
        [(5, "a b"), (5, "c")], "doc_id long, text string"
    )
    with pytest.raises(Exception, match="unique"):
        pack_sequences(docs, 4).collect()


def test_chunk_documents_null_text_yields_no_chunks(spark):
    docs = spark.createDataFrame(
        [(1, None), (2, "ab")], "doc_id long, text string"
    )
    rows = chunk_documents(docs, chunk_size=4).collect()
    assert [(r["doc_id"], r["chunk_text"]) for r in rows] == [(2, "ab")]
