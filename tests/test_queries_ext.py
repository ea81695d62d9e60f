"""Invariant + plan-shape tests for the extended registry
(queries_ext.py): TPC-H completions and training-data curation ops.

Value correctness is locked by tests/test_oracle_parity.py (every
registry entry runs against its DuckDB oracle); these tests lock the
*semantics* a hash can't express (split fractions, packing invariants,
contamination provenance) and the *plan shapes* that matter at 100 TB
(pure-map ops stay shuffle-free, scalar subqueries broadcast, top-k
avoids full sorts).
"""

from __future__ import annotations

import math

import pytest

from bigbookapi_etl_with_airflow_and_snowflake_spark import queries_ext as X
from bigbookapi_etl_with_airflow_and_snowflake_spark.plans.introspect import (
    explain_str,
    has_broadcast_join,
    pushed_filters,
    shuffle_count,
)


# ---------------------------------------------------------------------------
# Curation-op semantic invariants
# ---------------------------------------------------------------------------


def test_train_test_split_fractions_and_determinism(spark, sf_dir):
    pdf = X.q_train_test_split(spark, sf_dir).toPandas()
    n = len(pdf)
    frac = pdf["split"].value_counts(normalize=True)
    # md5 thresholds 'e6'/'f3' target ~89.8 / 5.1 / 5.1 %
    assert 0.80 <= frac.get("train", 0) <= 0.97, frac.to_dict()
    assert frac.get("val", 0) <= 0.15 and frac.get("test", 0) <= 0.15
    again = X.q_train_test_split(spark, sf_dir).toPandas()
    assert pdf.sort_values("doc_id").reset_index(drop=True).equals(
        again.sort_values("doc_id").reset_index(drop=True)
    )
    assert n == pdf["doc_id"].nunique()  # every doc assigned exactly once


def test_stratified_sample_exact_per_stratum(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    per_lang = {r["lang"]: r["count"] for r in docs.groupBy("lang").count().collect()}
    got = X.q_stratified_sample(spark, sf_dir).toPandas()
    sampled = got.groupby("lang")["doc_id"].count().to_dict()
    for lang, n in per_lang.items():
        assert sampled.get(lang, 0) == math.ceil(0.2 * n), (lang, n, sampled)


def test_pack_sequences_offsets_are_contiguous(spark, sf_dir):
    pdf = X.q_pack_sequences(spark, sf_dir).toPandas()
    assert (pdf["seq_offset"] >= 0).all() and (pdf["seq_offset"] < 2048).all()
    # docs within a shard tile the token stream with no gaps/overlaps:
    # global offset (seq_idx*2048 + seq_offset) of each doc must equal
    # the previous doc's offset + length
    pdf["shard"] = pdf["seq_id"].str.split("-").str[0]
    pdf["glob_off"] = (
        pdf["seq_id"].str.split("-").str[1].astype(int) * 2048 + pdf["seq_offset"]
    )
    for _, grp in pdf.groupby("shard"):
        grp = grp.sort_values("glob_off")
        expected = grp["n_tokens"].cumsum().shift(fill_value=0)
        assert (grp["glob_off"].values == expected.values).all()


def test_source_mixture_rates(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    per_src = {r["source"]: r["count"] for r in docs.groupBy("source").count().collect()}
    got = X.q_source_mixture(spark, sf_dir).toPandas()
    kept = got.groupby("source")["doc_id"].count()
    light = sum(kept.get(f"src{i}", 0) for i in range(10))
    heavy = sum(kept.get(f"src{i}", 0) for i in range(10, 20))
    n_light = sum(per_src.get(f"src{i}", 0) for i in range(10))
    n_heavy = sum(per_src.get(f"src{i}", 0) for i in range(10, 20))
    # loose CLT bounds — thresholds are 0.25 / 0.75
    assert abs(light / n_light - 0.25) < 0.12, light / n_light
    assert abs(heavy / n_heavy - 0.75) < 0.12, heavy / n_heavy


def test_decontaminate_provenance(spark, sf_dir):
    got = X.q_decontaminate(spark, sf_dir).toPandas()
    assert (got["n_contaminated"] >= 1).all()
    eval_ids = {
        r["doc_id"]
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet")
        .filter("source = 'src0'")
        .select("doc_id")
        .collect()
    }
    assert not (set(got["doc_id"]) & eval_ids)  # never flags the eval set itself


def test_vocab_coverage_monotone(spark, sf_dir):
    pdf = X.q_vocab_coverage(spark, sf_dir).toPandas().sort_values("rank")
    assert list(pdf["rank"]) == list(range(1, len(pdf) + 1))
    assert pdf["cum_share"].is_monotonic_increasing
    assert pdf["cum_share"].iloc[-1] <= 1.0
    assert pdf["n"].is_monotonic_decreasing


def test_large_orders_topk_contract(spark, sf_dir):
    pdf = X.q_large_orders(spark, sf_dir).toPandas()
    assert len(pdf) <= 100
    assert pdf["o_totalprice"].is_monotonic_decreasing
    assert (pdf.groupby("o_orderkey").size() == 1).all()


# ---------------------------------------------------------------------------
# Plan-shape locks (the 100 TB posture)
# ---------------------------------------------------------------------------


def test_pure_map_ops_are_shuffle_free(spark, sf_dir):
    for fn in (X.q_train_test_split, X.q_pii_scrub, X.q_repetition_stats):
        df = fn(spark, sf_dir)
        assert shuffle_count(df) == 0, fn.__name__


def test_scalar_subqueries_broadcast(spark, sf_dir):
    # Q11: threshold joined via broadcast, never a shuffled cross join
    assert has_broadcast_join(X.q_important_parts(spark, sf_dir))
    # Q22: 1-row average broadcast into the filter
    assert has_broadcast_join(X.q_idle_customers(spark, sf_dir))
    # Q15: 1-row MAX broadcast back into the per-supplier aggregate
    assert has_broadcast_join(X.q_top_revenue_supplier(spark, sf_dir))


def test_exists_shapes_use_semi_joins(spark, sf_dir):
    plan = explain_str(X.q_priority_exists_orders(spark, sf_dir), "simple")
    assert "LeftSemi" in plan
    pushed = pushed_filters(X.q_priority_exists_orders(spark, sf_dir))
    assert any("o_orderdate" in p for p in pushed), pushed
    # Q21 (round-14 rewrite): the EXISTS/NOT EXISTS pair is computed as
    # per-order supplier counts — one lineitem scan, two aggregations,
    # no self-joins (the old shape scanned lineitem 3x behind a
    # sort-merge anti join; optimization guide §2.4)
    plan21 = explain_str(X.q_waiting_suppliers(spark, sf_dir), "simple")
    assert "LeftSemi" not in plan21 and "LeftAnti" not in plan21
    assert "SortMergeJoin" not in plan21
    assert plan21.count("lineitem.parquet") == 1, plan21


def test_large_orders_takes_ordered_topk(spark, sf_dir):
    assert "TakeOrderedAndProject" in explain_str(X.q_large_orders(spark, sf_dir), "simple")


def test_market_share_broadcasts_dim_chain(spark, sf_dir):
    assert has_broadcast_join(X.q_market_share(spark, sf_dir))


def test_split_and_mixture_prune_columns(spark, sf_dir):
    # pure-map curation ops must not drag the text payload through
    plan = explain_str(X.q_train_test_split(spark, sf_dir), "formatted")
    assert "ReadSchema: struct<doc_id:bigint>" in plan, plan[plan.find("ReadSchema"):][:120]


@pytest.mark.parametrize(
    "fn",
    [X.q_pack_sequences, X.q_stratified_sample],
    ids=["pack_sequences", "stratified_sample"],
)
def test_windowed_curation_ops_single_shuffle(spark, sf_dir, fn):
    # sharded/stratified windows: exactly one hash exchange (the window
    # partition key), never a global range sort
    assert shuffle_count(fn(spark, sf_dir)) == 1


def test_global_shuffle_is_a_bijection(spark, sf_dir):
    """Every doc appears exactly once, positions are a dense 1..n
    permutation, and reruns are byte-identical."""
    pdf = X.q_global_shuffle(spark, sf_dir).toPandas()
    n = len(pdf)
    assert pdf["doc_id"].is_unique
    assert sorted(pdf["shuffle_pos"]) == list(range(1, n + 1))
    pdf2 = X.q_global_shuffle(spark, sf_dir).toPandas()
    a = pdf.sort_values("doc_id").reset_index(drop=True)
    b = pdf2.sort_values("doc_id").reset_index(drop=True)
    assert a.equals(b)


def test_incremental_dedup_consistent_with_band_pairs(spark, sf_dir):
    """The batch-vs-corpus screen must emit exactly the band-pair
    collisions that cross the batch/corpus boundary — no extra pairs,
    none lost."""
    from bigbookapi_etl_with_airflow_and_snowflake_spark.queries import (
        q_minhash_band_pairs,
    )

    inc = {
        (r["new_id"], r["existing_id"])
        for r in X.q_incremental_dedup(spark, sf_dir).collect()
    }
    crossing = set()
    for r in q_minhash_band_pairs(spark, sf_dir).collect():
        a, b = r["id_a"], r["id_b"]
        if a % 10 == 0 and b % 10 != 0:
            crossing.add((a, b))
        elif b % 10 == 0 and a % 10 != 0:
            crossing.add((b, a))
    assert inc == crossing


def test_strip_html_visible_text_only(spark):
    from pyspark.sql import functions as F

    from bigbookapi_etl_with_airflow_and_snowflake_spark.operators.text import (
        strip_html,
    )

    cases = [
        # (html, expected visible text)
        ("<p>hello <b>world</b></p>", "hello world"),
        ("<script>var a = '<p>not text</p>';</script>after", "after"),
        ("<style>p>span { x: 1 }</style>kept", "kept"),
        ("<!-- note -->a&nbsp;b&amp;c &lt;tag&gt;", "a b&c <tag>"),
        ("&amp;lt; stays literal", "&lt; stays literal"),
        ("no  markup\n at\tall", "no markup at all"),
        ("<SCRIPT TYPE='x'>s</SCRIPT><P>case</P>", "case"),
    ]
    df = spark.createDataFrame([(i, h) for i, (h, _) in enumerate(cases)], "i int, h string")
    got = {r["i"]: r["c"] for r in df.select("i", strip_html(F.col("h")).alias("c")).collect()}
    for i, (_, want) in enumerate(cases):
        assert got[i] == want, (i, got[i], want)


def test_gopher_rules_and_repetition_on_crafted_docs(spark):
    """The oracle corpus is single-line, so the line-based Gopher
    branches (bullet lines, ellipsis-ending lines, duplicate lines)
    only get exercised here, on crafted multi-line fixtures."""
    from bigbookapi_etl_with_airflow_and_snowflake_spark.operators.text import (
        gopher_repetition,
        gopher_rules,
    )

    good_words = ("the quick brown fox jumps over with lazy dogs and cats "
                  "that have been seen to run of late in every field ") * 3
    # genuinely non-repetitive two-line doc: 64 distinct words, two
    # distinct lines, no repeated 2-/5-grams
    clean = (
        "the " + " ".join(f"worda{i:02d}" for i in range(30)) + " of\n"
        "and " + " ".join(f"wordb{i:02d}" for i in range(30)) + " that"
    )
    docs = [
        # 0: clean multi-line prose — passes everything
        (0, clean),
        # 1: all bullet lines — bullet_line_ok must fail
        (1, "\n".join(f"- {good_words}" for _ in range(10))),
        # 2: every line ends with an ellipsis — ellipsis_line_ok fails
        (2, "\n".join(f"{good_words}..." for _ in range(10))),
        # 3: one line duplicated 9x — dup_line_ok and dup_line_char_ok fail
        (3, "\n".join(["copy of the same line with that and of"] * 10)),
        # 4: one 2-gram dominating — top_2gram_char_ok fails
        (4, "spam ham " * 40),
        # 5: hash-heavy — hash_ellipsis_ok fails
        (5, "# " * 60 + good_words),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")

    r = {x["doc_id"]: x.asDict() for x in gopher_rules(df).collect()}
    assert r[0]["gopher_pass"] is True
    assert r[1]["bullet_line_ok"] is False and r[1]["gopher_pass"] is False
    assert r[2]["ellipsis_line_ok"] is False
    assert r[5]["hash_ellipsis_ok"] is False
    # the clean doc passes each individual line rule
    assert r[0]["bullet_line_ok"] and r[0]["ellipsis_line_ok"]

    p = {x["doc_id"]: x.asDict() for x in gopher_repetition(df).collect()}
    assert p[0]["repetition_pass"] is True
    assert p[3]["dup_line_ok"] is False and p[3]["dup_line_char_ok"] is False
    assert p[4]["top_2gram_char_ok"] is False
    assert p[4]["dup_5gram_char_ok"] is False  # "spam ham" repeats as 5-grams too


def test_gopher_stopword_gate_boundaries(spark):
    """The MassiveText stopword screen at its exact boundary: 0, 1, and
    2 DISTINCT Gopher stopwords (repeats of one stopword still count
    once; matching is case-insensitive), plus the ``stopwords=`` /
    ``min_stopwords=`` overrides for corpus-specific vocabularies."""
    import pytest

    from bigbookapi_etl_with_airflow_and_snowflake_spark.operators.text import (
        gopher_rules,
    )

    filler = " ".join(f"word{i:02d}" for i in range(60))
    docs = [
        (0, filler),                                # 0 stopwords
        (1, f"the {filler}"),                       # 1 stopword
        (2, f"the the THE {filler}"),               # 1 DISTINCT (repeated, cased)
        (3, f"the And {filler}"),                   # 2 distinct → passes
        (4, f"the and that of {filler}"),           # 4 distinct → passes
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")

    r = {x["doc_id"]: x["stopword_ok"] for x in gopher_rules(df).collect()}
    assert r == {0: False, 1: False, 2: False, 3: True, 4: True}

    # corpus-specific list: the filler words themselves become stopwords
    custom = {
        x["doc_id"]: x["stopword_ok"]
        for x in gopher_rules(df, stopwords=["word00", "word01"]).collect()
    }
    assert custom == {0: True, 1: True, 2: True, 3: True, 4: True}

    # stricter threshold on the default list
    strict = {
        x["doc_id"]: x["stopword_ok"]
        for x in gopher_rules(df, min_stopwords=4).collect()
    }
    assert strict == {0: False, 1: False, 2: False, 3: False, 4: True}

    with pytest.raises(ValueError, match="non-empty"):
        gopher_rules(df, stopwords=[])
    with pytest.raises(ValueError, match="lowercase"):
        gopher_rules(df, stopwords=["The", "and"])
    with pytest.raises(ValueError, match="min_stopwords"):
        gopher_rules(df, min_stopwords=0)
    with pytest.raises(ValueError, match="could ever pass"):
        gopher_rules(df, stopwords=["the", "and"], min_stopwords=5)
    with pytest.raises(ValueError, match="could ever pass"):
        # repeated entries count once: n_stop is a DISTINCT-hit count,
        # so ['the','the'] can never reach min_stopwords=2 — the guard
        # must catch it rather than let the gate reject every document
        gopher_rules(df, stopwords=["the", "the"], min_stopwords=2)


def test_c4_rules_line_and_page_semantics(spark):
    """The C4 ruleset on hand-built pages: line keep = terminal punct +
    >=3 words + no 'javascript'; page flags on the ORIGINAL text;
    sentence floor counted on the CLEANED text; zero-kept-lines doc
    yields empty clean text (not null)."""
    from bigbookapi_etl_with_airflow_and_snowflake_spark.operators.text import (
        c4_rules,
    )

    import pytest as _pytest

    docs = [
        # 3 lines: kept, dropped (2 words), dropped (no terminal punct)
        (1, 'Good long sentence here.\nToo short.\nno punctuation line at all'),
        # javascript line dropped case-insensitively; quote terminal kept
        (2, 'Please enable JavaScript now.\nShe said "hello there friend."'),
        (3, "lorem ipsum dolor sit amet."),     # page drop: lorem
        (4, "if (x) { return y; } done here."),  # page drop: curly
        (5, "nothing survives"),                # 0 kept lines
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r["doc_id"]: r.asDict() for r in c4_rules(df, min_sentences=1).collect()}

    assert got[1]["n_lines"] == 3 and got[1]["n_kept_lines"] == 1
    assert got[1]["clean_text"] == "Good long sentence here."
    assert got[1]["n_sentences"] == 1 and got[1]["c4_pass"]

    assert got[2]["n_kept_lines"] == 1  # the JavaScript line is gone
    assert got[2]["clean_text"] == 'She said "hello there friend."'
    assert got[2]["n_sentences"] == 1  # the '.' inside the quotes

    assert not got[3]["no_lorem_ipsum"] and not got[3]["c4_pass"]
    assert got[3]["n_kept_lines"] == 1  # line itself is fine; page drops

    assert not got[4]["no_curly_brace"] and not got[4]["c4_pass"]

    assert got[5]["n_kept_lines"] == 0
    assert got[5]["clean_text"] == ""  # empty, never null
    assert got[5]["n_sentences"] == 0 and not got[5]["min_sentences_ok"]

    with _pytest.raises(ValueError, match="min_sentences must be >= 1"):
        c4_rules(df, min_sentences=0)
    with _pytest.raises(ValueError, match="min_words_per_line must be >= 1"):
        c4_rules(df, min_words_per_line=0)
