"""Distributed BPE training vs the reference Python algorithm."""

from __future__ import annotations

import pytest

from bigbookapi_etl_with_airflow_and_snowflake_spark.operators.bpe import (
    END,
    bpe_train,
    pair_counts,
    word_freq_table,
)


def _py_bpe(texts: list[str], n_merges: int):
    """Reference implementation (Sennrich et al.), greedy leftmost."""
    freq: dict[tuple[str, ...], int] = {}
    for t in texts:
        for w in t.split():
            syms = tuple(list(w) + [END])
            freq[syms] = freq.get(syms, 0) + 1
    merges = []
    for i in range(n_merges):
        pc: dict[tuple[str, str], int] = {}
        for syms, f in freq.items():
            for j in range(len(syms) - 1):
                pc[(syms[j], syms[j + 1])] = pc.get((syms[j], syms[j + 1]), 0) + f
        if not pc:
            break
        best = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        (a, b), cnt = best
        if cnt < 2:
            break
        merges.append((i, a, b, cnt))
        new_freq: dict[tuple[str, ...], int] = {}
        for syms, f in freq.items():
            out, j = [], 0
            while j < len(syms):
                if j + 1 < len(syms) and syms[j] == a and syms[j + 1] == b:
                    out.append(a + b)
                    j += 2
                else:
                    out.append(syms[j])
                    j += 1
            k = tuple(out)
            new_freq[k] = new_freq.get(k, 0) + f
        freq = new_freq
    return merges


CORPUS = [
    "low lower lowest low low",
    "new newer newest new",
    "wide wider widest",
    "low new low",
]


def test_bpe_matches_python_reference(spark):
    df = spark.createDataFrame([(t,) for t in CORPUS], "text string")
    got = bpe_train(df, n_merges=8)
    want = _py_bpe(CORPUS, 8)
    assert got == want
    assert len(got) == 8  # corpus is rich enough to not stop early


def test_bpe_partition_invariance(spark):
    df1 = spark.createDataFrame([(t,) for t in CORPUS], "text string").coalesce(1)
    df2 = spark.createDataFrame([(t,) for t in CORPUS], "text string").repartition(7)
    assert bpe_train(df1, n_merges=5) == bpe_train(df2, n_merges=5)


def test_bpe_greedy_leftmost_on_runs(spark):
    from pyspark.sql import functions as F

    from bigbookapi_etl_with_airflow_and_snowflake_spark.operators.bpe import (
        _apply_merge,
    )

    # 'aaaa' + END under merge (a,a): greedy leftmost fuses pairs 1-2
    # and 3-4 -> [aa, aa, </w>], never [a, aa, a, ...] or right-biased
    df = spark.createDataFrame([(["a", "a", "a", "a", END],)], "syms array<string>")
    got = df.select(_apply_merge(F.col("syms"), "a", "a").alias("m")).first()["m"]
    assert got == ["aa", "aa", END]
    # odd run: trailing singleton survives
    df3 = spark.createDataFrame([(["a", "a", "a", END],)], "syms array<string>")
    got3 = df3.select(_apply_merge(F.col("syms"), "a", "a").alias("m")).first()["m"]
    assert got3 == ["aa", "a", END]


def test_bpe_stops_when_dry(spark):
    df = spark.createDataFrame([("ab cd ef",)], "text string")
    # every pair occurs once -> no merge has cnt >= 2
    assert bpe_train(df, n_merges=5) == []


def test_bpe_stats_reports_rounds_and_saturation(spark):
    """``stats=`` mirrors the training trajectory: a dry corpus is
    saturated in one round with zero merges; a corpus that fills the
    request is not saturated and the round count reflects batching."""
    dry = spark.createDataFrame([("ab cd ef",)], "text string")
    s: dict = {}
    assert bpe_train(dry, n_merges=5, stats=s) == []
    assert s == {"rounds": 1, "merges": 0, "saturated": True}

    rich = spark.createDataFrame([("aaab aaab aaab ccc ccc",)], "text string")
    s = {}
    got = bpe_train(rich, n_merges=2, batch_k=2, stats=s)
    assert len(got) == 2
    assert s["merges"] == 2 and s["saturated"] is False
    assert s["rounds"] >= 1


def test_pair_counts_weighted_by_word_freq(spark):
    df = spark.createDataFrame([("go go go stop",)], "text string")
    pc = {
        (r["a"], r["b"]): r["cnt"]
        for r in pair_counts(word_freq_table(df)).collect()
    }
    assert pc[("g", "o")] == 3
    assert pc[("o", END)] == 3
    assert pc[("s", "t")] == 1


def _py_encode(texts, merges):
    out = {}
    for i, t in enumerate(texts):
        toks = []
        for w in t.split():
            syms = list(w) + [END]
            for _, a, b, _c in merges:
                res, j = [], 0
                while j < len(syms):
                    if j + 1 < len(syms) and syms[j] == a and syms[j + 1] == b:
                        res.append(a + b)
                        j += 2
                    else:
                        res.append(syms[j])
                        j += 1
                syms = res
            toks.extend(syms)
        out[i] = toks
    return out


def test_bpe_encode_matches_python(spark):
    from bigbookapi_etl_with_airflow_and_snowflake_spark.operators.bpe import (
        bpe_encode,
    )

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(CORPUS)], "doc_id int, text string"
    )
    merges = bpe_train(df, n_merges=6)
    got = {
        r["doc_id"]: list(r["tokens"])
        for r in bpe_encode(df, merges, id_col="doc_id").collect()
    }
    assert got == _py_encode(CORPUS, merges)


def test_bpe_encode_token_count_shrinks_with_merges(spark):
    from bigbookapi_etl_with_airflow_and_snowflake_spark.operators.bpe import (
        bpe_encode,
    )

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(CORPUS)], "doc_id int, text string"
    )
    merges = bpe_train(df, n_merges=6)
    n0 = bpe_encode(df, [], id_col="doc_id").agg({"n_tokens": "sum"}).first()[0]
    n6 = bpe_encode(df, merges, id_col="doc_id").agg({"n_tokens": "sum"}).first()[0]
    assert n6 < n0


def test_bpe_train_batched_builds_64_merges_in_4_rounds(spark, monkeypatch):
    """The production path: batch_k=16 must learn 64 merges in
    ceil(64/16) = 4 pair-count rounds — not 64 sequential Spark jobs.
    Fixture: 64 words over pairwise-disjoint character pairs, distinct
    frequencies, so each round has >= 16 count-disjoint selections
    (the per-word (last_char, </w>) sibling is skipped via the shared
    member, and at most one (merged, </w>) pair is selectable per
    round since they all share '</w>')."""
    from bigbookapi_etl_with_airflow_and_snowflake_spark.operators import bpe

    rounds = {"n": 0}
    orig = bpe.pair_counts

    def counting(words):
        rounds["n"] += 1
        return orig(words)

    monkeypatch.setattr(bpe, "pair_counts", counting)

    words = [chr(0x4E00 + 2 * i) + chr(0x4E00 + 2 * i + 1) for i in range(64)]
    rows = [(i, " ".join([w] * (10 + i))) for i, w in enumerate(words)]
    df = spark.createDataFrame(rows, "doc_id int, text string")

    merges = bpe.bpe_train(df, n_merges=64, batch_k=16)
    assert len(merges) == 64
    assert rounds["n"] <= 4  # == ceil(64 / 16)
    # merge indices are dense and ordered
    assert [m[0] for m in merges] == list(range(64))
    # within every round's selections the symbol sets are disjoint —
    # replay the invariant over the returned list
    for lo in range(0, 64, 16):
        seen: set[str] = set()
        for _, a, b, _cnt in merges[lo : lo + 16]:
            assert a not in seen and b not in seen
            seen.update((a, b, a + b))

    with pytest.raises(ValueError, match="batch_k"):
        bpe.bpe_train(df, n_merges=2, batch_k=0)


def test_bpe_train_batch_k1_is_classic_sequential(spark):
    """batch_k=1 must stay byte-identical to the exactness twin."""
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(CORPUS)], "doc_id int, text string"
    )
    assert bpe_train(df, n_merges=6, batch_k=1) == bpe_train(df, n_merges=6)
