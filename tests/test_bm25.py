"""BM25 ranked retrieval (operators/text.py bm25_topk): hand-computed
scores on a tiny corpus, ranking semantics, and the no-shuffle plan
shape (the oracle-parity replay covers the full-corpus equivalence).
"""

from __future__ import annotations

import math

import pytest

from bigbookapi_etl_with_airflow_and_snowflake_spark.operators.text import bm25_topk


def _corpus(spark):
    rows = [
        (1, "apple banana apple"),          # tf(apple)=2, len 3
        (2, "apple cherry"),                # tf(apple)=1, len 2
        (3, "banana banana cherry durian"),  # tf(apple)=0, len 4
    ]
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def _bm25(tf, dl, n, sl, df, k1=1.2, b=0.75):
    idf = math.log((float(n) - df + 0.5) / (df + 0.5) + 1.0)
    return idf * (tf * (k1 + 1.0)) / (tf + k1 * ((1.0 - b) + b * (dl * float(n) / float(sl))))


def test_scores_match_hand_computation(spark):
    out = {r["doc_id"]: r["score"] for r in bm25_topk(_corpus(spark), ["apple"]).collect()}
    n, sl = 3, 9
    want1 = round(_bm25(2, 3, n, sl, df=2), 6)
    want2 = round(_bm25(1, 2, n, sl, df=2), 6)
    assert out == {1: pytest.approx(want1), 2: pytest.approx(want2)}
    # doc 3 has no query term: score 0, filtered out
    assert 3 not in out


def test_rank_order_and_k(spark):
    rows = bm25_topk(_corpus(spark), ["apple", "cherry"], k=2).collect()
    assert len(rows) == 2
    assert rows[0]["score"] >= rows[1]["score"]
    # cherry appears in shorter doc 2 AND doc 3; apple dominates doc 1
    assert {r["doc_id"] for r in rows} <= {1, 2, 3}


def test_empty_corpus_is_loud(spark):
    empty = spark.createDataFrame([], "doc_id bigint, text string")
    with pytest.raises(ValueError, match="empty corpus"):
        bm25_topk(empty, ["apple"])


def test_plan_has_no_shuffle_in_scoring_pass(spark):
    from bigbookapi_etl_with_airflow_and_snowflake_spark.plans.introspect import (
        explain_str,
    )

    plan = explain_str(bm25_topk(_corpus(spark), ["apple"]), "simple")
    assert "TakeOrderedAndProject" in plan  # heap top-k, no global sort
    assert "Exchange" not in plan  # scoring is one narrow map
