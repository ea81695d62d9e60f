"""Fuzzy test-set decontamination (operators/neardup.py
fuzzy_decontaminate): MinHash-LSH candidates between train and eval,
exact-Jaccard verify, one best-match row per contaminated train doc.
The GPT-3 App. C / Dolma decontamination pattern at near-dup (not just
verbatim) sensitivity.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from bigbookapi_etl_with_airflow_and_snowflake_spark.operators.neardup import (
    fuzzy_decontaminate,
)

WORDS = "alpha bravo charlie delta echo foxtrot golf hotel india juliet".split()


def _doc(i, words):
    return (f"d{i}", " ".join(words))


def _frame(spark, rows):
    return spark.createDataFrame(rows, "doc_id string, text string")


def test_verbatim_leak_flagged_with_exact_jaccard(spark):
    eval_df = _frame(spark, [_doc(0, WORDS)])
    train = _frame(
        spark,
        [
            ("t_leak", " ".join(WORDS)),  # verbatim copy: J = 1.0
            ("t_clean", "one two three four five six seven eight"),
        ],
    )
    out = {r["doc_id"]: r for r in fuzzy_decontaminate(train, eval_df).collect()}
    assert set(out) == {"t_leak"}
    r = out["t_leak"]
    assert r["eval_id"] == "d0"
    assert r["n_inter"] == r["n_union"] == 8  # 10 words -> 8 3-shingles
    assert r["jaccard_pm"] == 1000


def test_near_dup_leak_flagged_below_thresh_not(spark):
    eval_df = _frame(spark, [_doc(0, WORDS)])
    # one word changed at the END: shares the first 7 of 8 shingles
    near = WORDS[:9] + ["zulu"]
    train = _frame(spark, [("t_near", " ".join(near))])
    out = fuzzy_decontaminate(train, eval_df, threshold_pm=500).collect()
    assert [r["doc_id"] for r in out] == ["t_near"]
    # inter=7, union=9 -> J = 777 pm
    assert out[0]["n_inter"] == 7 and out[0]["n_union"] == 9
    assert out[0]["jaccard_pm"] == 777
    # a stricter threshold (0.9) rejects the same pair
    assert (
        fuzzy_decontaminate(train, eval_df, threshold_pm=900).count() == 0
    )


def test_best_match_is_deterministic_total_order(spark):
    eval_df = _frame(
        spark,
        [_doc(0, WORDS), _doc(1, WORDS)],  # two identical eval docs
    )
    train = _frame(spark, [("t", " ".join(WORDS))])
    out = fuzzy_decontaminate(train, eval_df).collect()
    assert len(out) == 1  # one row per contaminated doc, not per pair
    assert out[0]["eval_id"] == "d0"  # tie broken by eval_id asc


def test_eval_side_never_flagged_and_empty_inputs(spark):
    eval_df = _frame(spark, [_doc(0, WORDS)])
    train = _frame(spark, [])
    assert fuzzy_decontaminate(train, eval_df).count() == 0
    # short docs (< n words) have no shingles and never flag
    train2 = _frame(spark, [("t_short", "alpha bravo")])
    assert fuzzy_decontaminate(train2, eval_df).count() == 0


def test_lsh_candidates_gate_verification(spark):
    """A pair sharing SOME shingles but no full band never becomes a
    candidate — documented LSH recall semantics (the oracle replays
    the same banding, so this is a fixed property, not flakiness)."""
    eval_df = _frame(spark, [_doc(0, WORDS)])
    # shares shingles only in the middle: minhash over 4 seeds on a
    # mostly-different shingle set is unlikely to align any band, and
    # even if banding admitted it, J = 2/14 < 0.5 fails the verify
    train = _frame(
        spark,
        [("t_part", "x1 x2 alpha bravo charlie delta x3 x4 x5 x6")],
    )
    out = fuzzy_decontaminate(train, eval_df, threshold_pm=500)
    assert out.count() == 0


def test_broadcast_eval_side_in_plan(spark):
    from bigbookapi_etl_with_airflow_and_snowflake_spark.plans.introspect import (
        explain_str,
    )

    eval_df = _frame(spark, [_doc(0, WORDS)])
    train = _frame(spark, [("t", " ".join(WORDS))] * 3)
    plan = explain_str(fuzzy_decontaminate(train, eval_df), "simple")
    assert "BroadcastHashJoin" in plan