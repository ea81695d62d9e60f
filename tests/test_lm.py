"""Bigram-LM quality scoring vs a pure-Python reference."""

from __future__ import annotations

import math

import pytest

from bigbookapi_etl_with_airflow_and_snowflake_spark.operators.lm import (
    score_bigram_lm,
    train_bigram_lm,
)

REF = [
    (0, "the cat sat on the mat", "src0"),
    (1, "the dog sat on the rug", "src0"),
    (2, "the cat ate the fish", "src0"),
]
EVAL = [
    (10, "the cat sat on the rug", "src1"),  # fully in-domain bigrams
    (11, "quantum flux capacitors misfire", "src1"),  # fully OOV
    (12, "the cat juggled flaming torches", "src1"),  # mixed
    (13, "single", "src1"),  # <2 tokens: no bigrams, no output row
]


def _py_lm(ref_texts):
    c_ab: dict[tuple[str, str], int] = {}
    for t in ref_texts:
        w = t.split()
        for a, b in zip(w, w[1:]):
            c_ab[(a, b)] = c_ab.get((a, b), 0) + 1
    c_a: dict[str, int] = {}
    for (a, _), c in c_ab.items():
        c_a[a] = c_a.get(a, 0) + c
    return c_ab, c_a, len(c_a)


def _py_score(text, c_ab, c_a, v):
    w = text.split()
    pairs = list(zip(w, w[1:]))
    if not pairs:
        return None
    lps = [
        math.log((c_ab.get(p, 0) + 1) / (c_a.get(p[0], 0) + v)) for p in pairs
    ]
    ce = -sum(lps) / len(pairs)
    return {
        "n_bigrams": len(pairs),
        "known_bigrams": sum(1 for p in pairs if p in c_ab),
        "known_contexts": sum(1 for p in pairs if p[0] in c_a),
        "coverage_pm": 1000 * sum(1 for p in pairs if p in c_ab) // len(pairs),
        "cross_entropy": ce,
        "perplexity": math.exp(ce),
    }


def test_bigram_lm_matches_python_reference(spark):
    df = spark.createDataFrame(REF + EVAL, "doc_id long, text string, source string")
    bigrams, contexts, v = train_bigram_lm(df.filter("source = 'src0'"))
    c_ab, c_a, v_py = _py_lm([t for _, t, _ in REF])
    assert v == v_py

    got = {
        r["doc_id"]: r.asDict()
        for r in score_bigram_lm(df, bigrams, contexts, v).collect()
    }
    # doc 13 has one token: no bigrams, no row
    assert 13 not in got
    for doc_id, text, _ in REF + EVAL[:3]:
        want = _py_score(text, c_ab, c_a, v_py)
        g = got[doc_id]
        for k in ("n_bigrams", "known_bigrams", "known_contexts", "coverage_pm"):
            assert g[k] == want[k], (doc_id, k)
        assert g["cross_entropy"] == pytest.approx(want["cross_entropy"], rel=1e-12)
        assert g["perplexity"] == pytest.approx(want["perplexity"], rel=1e-12)

    # the filter signal orders docs as a quality score should: in-domain
    # beats mixed beats fully-OOV
    assert got[10]["cross_entropy"] < got[12]["cross_entropy"] < got[11]["cross_entropy"]
    assert got[10]["coverage_pm"] == 1000
    assert got[11]["known_bigrams"] == 0 and got[11]["known_contexts"] == 0


def test_bigram_lm_training_is_one_pass_shape(spark):
    """Contexts are a rollup of the bigram table (no second corpus
    scan): the context counts must equal the bigram-table sums."""
    df = spark.createDataFrame(REF, "doc_id long, text string, source string")
    bigrams, contexts, v = train_bigram_lm(df)
    from collections import defaultdict

    sums = defaultdict(int)
    for r in bigrams.collect():
        sums[r["a"]] += r["c_ab"]
    got = {r["a"]: r["c_a"] for r in contexts.collect()}
    assert got == dict(sums)
    assert v == len(sums)


def test_empty_reference_corpus_is_loud(spark):
    from bigbookapi_etl_with_airflow_and_snowflake_spark.operators.lm import (
        score_bigram_lm,
        train_bigram_lm,
    )

    df = spark.createDataFrame(EVAL, "doc_id long, text string, source string")
    bigrams, contexts, v = train_bigram_lm(df.filter("source = 'nope'"))
    assert v == 0
    with pytest.raises(ValueError, match="empty reference corpus"):
        score_bigram_lm(df, bigrams, contexts, v)


def test_quality_buckets_threshold_semantics(spark):
    """Cut points are score VALUES: equal scores share a bucket even
    when they straddle a tercile boundary; bucket sizes follow the
    ceil-rank rule on distinct-value cumulative counts."""
    import pyspark.sql.functions as F

    from bigbookapi_etl_with_airflow_and_snowflake_spark.operators.lm import (
        quality_buckets,
    )

    # 9 docs, scores desc: 900,800,800,800,500,500,300,200,100
    # n=9 → head_rank=ceil(9/3)=3 → head_thr = score of 3rd best = 800
    #       mid_rank=ceil(18/3)... (2n+2)//3 = 6 → mid_thr = 500
    rows = list(
        zip(range(9), [900, 800, 800, 800, 500, 500, 300, 200, 100], strict=True)
    )
    df = spark.createDataFrame(rows, "doc_id long, coverage_pm long")
    got = {
        r["doc_id"]: r["bucket"]
        for r in quality_buckets(df, "coverage_pm").collect()
    }
    # ALL three 800s are head (ties share), both 500s middle
    assert [got[i] for i in range(9)] == [
        "head", "head", "head", "head",
        "middle", "middle",
        "tail", "tail", "tail",
    ]
    # partition invariance
    again = {
        r["doc_id"]: r["bucket"]
        for r in quality_buckets(df.repartition(5), "coverage_pm").collect()
    }
    assert again == got


def test_dsir_weights_match_python_reference(spark):
    """Integer-exact DSIR scores: pure-Python bigram counting + whole-bit
    ilog2 quantization must reproduce the distributed result exactly."""
    from bigbookapi_etl_with_airflow_and_snowflake_spark.operators.lm import (
        dsir_weights,
    )

    corpus = [
        (0, "the cat sat on the mat", "tgt"),
        (1, "the dog sat on the log", "raw"),
        (2, "a b c d e f", "raw"),
        (3, "the cat sat", "raw"),
        (4, "one", "raw"),  # < 2 tokens → excluded
        (5, "the the the the", "tgt"),
    ]
    df = spark.createDataFrame(corpus, "doc_id long, text string, source string")
    got = {
        r["doc_id"]: (r["n_bigrams"], r["dsir_score"])
        for r in dsir_weights(df, df.filter("source = 'tgt'")).collect()
    }

    def bigrams(text):
        t = text.split()
        return list(zip(t, t[1:], strict=False))

    from collections import Counter

    tb = Counter(b for i, tx, s in corpus if s == "tgt" for b in bigrams(tx))
    rb = Counter(b for i, tx, s in corpus for b in bigrams(tx))
    want = {}
    for i, tx, _ in corpus:
        bs = bigrams(tx)
        if not bs:
            continue
        score = sum(
            (tb.get(b, 0) + 1).bit_length() - (rb[b] + 1).bit_length() for b in bs
        )
        want[i] = (len(bs), score)
    assert got == want
    assert 4 not in got


def test_dsir_sample_is_deterministic_and_weight_positive(spark):
    from bigbookapi_etl_with_airflow_and_snowflake_spark.operators.lm import (
        dsir_sample,
    )

    rows = [
        (i, " ".join(f"w{(i * j) % 17}" for j in range(12)), "src0" if i % 5 == 0 else "src1")
        for i in range(80)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    tgt = df.filter("source = 'src0'")
    a = sorted(r["doc_id"] for r in dsir_sample(df, tgt, k=10).collect())
    b = sorted(
        r["doc_id"] for r in dsir_sample(df.repartition(7), tgt, k=10).collect()
    )
    assert a == b and len(a) >= 1  # partition-invariant, non-empty
    w = dsir_sample(df, tgt, k=10).agg({"dsir_weight": "min"}).first()[0]
    assert w >= 1  # Madow needs positive integer weights


def test_dsir_sample_empty_corpus_is_loud(spark):
    from bigbookapi_etl_with_airflow_and_snowflake_spark.operators.lm import (
        dsir_sample,
    )

    df = spark.createDataFrame(
        [(0, "single", "src0")], "doc_id long, text string, source string"
    )
    with pytest.raises(ValueError, match="bigram-bearing"):
        dsir_sample(df, df, k=1)


# ---------------------------------------------------------------------------
# Naive-Bayes seed classifier (nb_token_weights / nb_classify)
# ---------------------------------------------------------------------------

POS_SEED = [
    (0, "good clean prose flows well", "seed"),
    (1, "clean prose reads well", "seed"),
]
NEG_SEED = [
    (100, "spam spam buy buy buy", "crawl"),
    (101, "click spam here buy", "crawl"),
]


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string, source string")


def _py_nb(pos_texts, neg_texts):
    cp: dict[str, int] = {}
    cn: dict[str, int] = {}
    for t in pos_texts:
        for w in t.split():
            cp[w] = cp.get(w, 0) + 1
    for t in neg_texts:
        for w in t.split():
            cn[w] = cn.get(w, 0) + 1

    def ilog2p1(c):
        return len(bin(c + 1)) - 2  # strip '0b'

    return {
        w: ilog2p1(cp.get(w, 0)) - ilog2p1(cn.get(w, 0))
        for w in set(cp) | set(cn)
    }


def test_nb_classifier_matches_python_reference(spark):
    from bigbookapi_etl_with_airflow_and_snowflake_spark.operators.lm import nb_classify

    docs = _docs(
        spark,
        [
            (10, "clean prose flows", "x"),       # all-positive tokens
            (11, "buy spam buy", "x"),            # all-negative tokens
            (12, "clean spam", "x"),              # mixed
            (13, "quantum flux unseen", "x"),     # fully unseen -> score 0
        ],
    )
    got = {
        r["doc_id"]: (r["n_tokens"], r["nb_score"], r["nb_positive"])
        for r in nb_classify(
            docs, _docs(spark, POS_SEED), _docs(spark, NEG_SEED)
        ).collect()
    }
    w = _py_nb([t for _, t, _ in POS_SEED], [t for _, t, _ in NEG_SEED])
    for doc_id, text in [(10, "clean prose flows"), (11, "buy spam buy"),
                         (12, "clean spam"), (13, "quantum flux unseen")]:
        toks = text.split()
        score = sum(w.get(t, 0) for t in toks)
        assert got[doc_id] == (len(toks), score, score > 0), doc_id
    assert got[10][2] and not got[11][2]  # signs are right
    assert got[13][1] == 0  # unseen vocabulary votes neutrally


def test_nb_weights_are_vocab_sized_and_exact(spark):
    from bigbookapi_etl_with_airflow_and_snowflake_spark.operators.lm import (
        nb_token_weights,
    )

    w = nb_token_weights(_docs(spark, POS_SEED), _docs(spark, NEG_SEED))
    rows = {r["tok"]: (r["c_pos"], r["c_neg"], r["delta"]) for r in w.collect()}
    ref = _py_nb([t for _, t, _ in POS_SEED], [t for _, t, _ in NEG_SEED])
    assert set(rows) == set(ref)  # exactly the union vocabulary
    for tok, (cp, cn, delta) in rows.items():
        assert delta == ref[tok], tok
    assert rows["buy"][2] < 0 < rows["clean"][2]
    # one-sided tokens carry counts from the side that saw them only
    assert rows["flows"][:2] == (1, 0) and rows["click"][:2] == (0, 1)


def test_nb_classifier_partition_invariance(spark):
    from bigbookapi_etl_with_airflow_and_snowflake_spark.operators.lm import nb_classify

    docs = _docs(
        spark, [(i, f"clean spam token{i % 3}", "x") for i in range(40)]
    )
    a = nb_classify(
        docs.repartition(1), _docs(spark, POS_SEED), _docs(spark, NEG_SEED)
    )
    b = nb_classify(
        docs.repartition(7), _docs(spark, POS_SEED), _docs(spark, NEG_SEED)
    )
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_nb_classifier_null_text_excluded_and_threshold(spark):
    from bigbookapi_etl_with_airflow_and_snowflake_spark.operators.lm import nb_classify

    docs = _docs(spark, [(1, None, "x"), (2, "clean prose", "x")])
    got = nb_classify(
        docs, _docs(spark, POS_SEED), _docs(spark, NEG_SEED), threshold=10**9
    ).collect()
    assert [r["doc_id"] for r in got] == [2]  # NULL text contributes no row
    assert not got[0]["nb_positive"]  # threshold is respected
