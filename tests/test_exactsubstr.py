"""ExactSubstr dedup (operators/text.py duplicated_spans /
exact_substr_scrub): maximal-span extraction and applied scrubbing on
handcrafted corpora where every boundary is known by construction.

Semantics under test (Lee et al. 2022 §4.1, token granularity, k=4 for
readable fixtures):
- a k-window is duplicated iff its value occurs in ≥2 DISTINCT docs;
- duplicated windows merge into maximal spans when their covered
  regions overlap or touch (position gap ≤ k);
- scrubbing cuts every span from EVERY occurrence (not all-but-one).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from bigbookapi_etl_with_airflow_and_snowflake_spark.operators.text import (
    duplicated_spans,
    exact_substr_scrub,
)

K = 4


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _spans(spark, rows):
    return {
        (r.doc_id, r.span_start, r.span_end, r.span_tokens)
        for r in duplicated_spans(_docs(spark, rows), k=K).collect()
    }


def test_shared_prefix_spans_both_docs(spark):
    # "a b c d e" shared verbatim; doc 1 continues differently after.
    rows = [(1, "a b c d e x y z w"), (2, "a b c d e")]
    got = _spans(spark, rows)
    # windows at pos 0,1 dup in doc1 (covering tokens 0..4); doc2 has
    # windows 0,1 both dup → span 0..4 in both docs.
    assert got == {(1, 0, 4, 5), (2, 0, 4, 5)}


def test_adjacent_windows_merge_and_gap_splits(spark):
    # Two shared 4-token runs separated by >k unique tokens in doc 1
    # → two disjoint spans; doc 2 and 3 each carry one run.
    rows = [
        (1, "p q r s u1 u2 u3 u4 u5 m n o t"),
        (2, "p q r s"),
        (3, "m n o t"),
    ]
    got = _spans(spark, rows)
    assert got == {
        (1, 0, 3, 4),
        (1, 9, 12, 4),
        (2, 0, 3, 4),
        (3, 0, 3, 4),
    }


def test_within_doc_repeat_alone_is_not_duplicated(spark):
    # The repeated run lives only in doc 1 → <2 distinct docs → nothing.
    rows = [(1, "a b c d a b c d"), (2, "totally different words here")]
    assert _spans(spark, rows) == set()


def test_short_docs_emit_no_windows(spark):
    rows = [(1, "a b c"), (2, "a b c")]  # 3 tokens < k=4
    assert _spans(spark, rows) == set()


def test_scrub_cuts_every_occurrence(spark):
    rows = [(1, "a b c d e x y z w"), (2, "a b c d e")]
    got = {
        r.doc_id: (r.n_tokens, r.n_removed, r.clean_text)
        for r in exact_substr_scrub(_docs(spark, rows), k=K).collect()
    }
    # Lee et al. cut ALL occurrences: doc 2 scrubs to empty.
    assert got[1] == (9, 5, "x y z w")
    assert got[2] == (5, 5, "")


def test_scrub_passthrough_without_duplicates(spark):
    rows = [(1, "one two three four five"), (2, "six seven eight nine ten")]
    got = {
        r.doc_id: (r.n_tokens, r.n_removed, r.clean_text)
        for r in exact_substr_scrub(_docs(spark, rows), k=K).collect()
    }
    assert got[1] == (5, 0, "one two three four five")
    assert got[2] == (5, 0, "six seven eight nine ten")


def test_scrub_interior_span_keeps_flanks(spark):
    rows = [
        (1, "h1 h2 p q r s t1 t2"),  # shared run p q r s interior
        (2, "z0 p q r s z1"),
    ]
    got = {
        r.doc_id: r.clean_text
        for r in exact_substr_scrub(_docs(spark, rows), k=K).collect()
    }
    assert got[1] == "h1 h2 t1 t2"
    assert got[2] == "z0 z1"


def test_spans_disjoint_and_consistent_with_scrub(spark, sf_dir):
    """Corpus-level invariants at sf0.001: spans within a doc are
    disjoint and non-adjacent (merge is maximal), and the scrub's
    n_removed equals the summed span lengths per doc."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    spans = duplicated_spans(docs).collect()
    by_doc: dict[int, list[tuple[int, int]]] = {}
    for r in spans:
        assert r.span_tokens == r.span_end - r.span_start + 1
        by_doc.setdefault(r.doc_id, []).append((r.span_start, r.span_end))
    for intervals in by_doc.values():
        intervals.sort()
        for (_, e1), (s2, _) in zip(intervals, intervals[1:]):
            assert s2 > e1 + 1  # disjoint AND non-adjacent (maximality)
    removed = {
        r.doc_id: r.n_removed
        for r in exact_substr_scrub(docs).filter(F.col("n_removed") > 0).collect()
    }
    expected = {
        d: sum(e - s + 1 for s, e in iv) for d, iv in by_doc.items()
    }
    assert removed == expected
