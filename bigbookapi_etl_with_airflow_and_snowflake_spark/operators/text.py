"""Text-analysis operators (SURVEY.md §2.5 N4) over a document table.

All hot-path logic is built-in ``pyspark.sql.functions`` — JVM-side,
whole-stage-codegen'd, no Python in the loop — so a 100 TB documents
scan stays a single narrow map stage with full predicate/column
pushdown. Shingling uses higher-order array functions (``transform`` /
``sequence``) instead of explode-early, keeping the per-doc work
columnar until the one shuffle that genuinely needs exploded rows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# Tiny multi-language stopword lists for the n-gram language heuristic.
STOPWORDS_EN = ["the", "a", "of", "and", "to", "in", "is"]
STOPWORDS_ES = ["el", "la", "de", "y", "que", "en"]
STOPWORDS_FR = ["le", "la", "de", "et", "que", "les"]
STOPWORDS_DE = ["der", "die", "das", "und", "ist", "von"]


def tokens(text: Column) -> Column:
    """Whitespace tokenization as a typed array column."""
    return F.split(F.trim(text), r"\s+")


def token_count(text: Column) -> Column:
    """N4 token counting — size of the whitespace split."""
    return F.size(tokens(text))


def word_shingles(text: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles of ``text`` as array<string>.

    The token array is ``bind``-ed so the tokenizer runs once per row —
    inlined, the regex split would re-run per ``element_at`` (measured
    26× slower on the documents corpus; see functions/expr.py).
    """
    from ..functions import bind

    return bind(tokens(text), lambda t: word_shingles_from_tokens(t, n))


def word_shingles_from_tokens(t: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles from an already-materialized token
    array column. One ``sequence`` + ``transform`` expression — no
    explode, no UDF. Fewer than ``n`` tokens yields an empty array."""
    starts = F.sequence(F.lit(1), F.size(t) - (n - 1))
    make = lambda i: F.concat_ws(  # noqa: E731
        " ", *[F.element_at(t, i + j) for j in range(n)]
    )
    # guard: sequence(1, 0) would generate a DESCENDING [1, 0] sequence
    # (and element_at(t, 0) throws under ANSI) — short docs get [].
    empty = F.array().cast("array<string>")
    return F.when(
        F.size(t) >= n, F.array_distinct(F.transform(starts, make))
    ).otherwise(empty)


# BPE-ish pre-tokenization: letter runs, single digits, single
# non-alnum marks — the split GPT-style byte-pair encoders apply before
# merging. Pattern is RE2/Java-compatible (portable across engines).
BPE_SPLIT_PATTERN = r"[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]"


def bpe_token_count(text: Column) -> Column:
    """N4 token counting, BPE-ish: counts the pre-tokenization pieces a
    byte-pair encoder would start from (letters runs / digits / marks).
    An upper bound on real BPE token count, computable JVM-side with no
    vocab file."""
    return F.size(F.regexp_extract_all(text, F.lit(BPE_SPLIT_PATTERN), F.lit(0)))


def stopword_hits(text: Column, words: list[str]) -> Column:
    """Number of tokens (with multiplicity) that are in ``words``."""
    return F.size(F.filter(tokens(text), lambda w: w.isin(*words)))


def text_stats(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-document length/token statistics (quality-signal inputs)."""
    t = F.col(text_col)
    n_tok = token_count(t)
    return df.select(
        F.col(id_col),
        F.length(t).alias("n_chars_obs"),
        n_tok.alias("n_tokens"),
        F.size(F.array_distinct(tokens(t))).alias("n_distinct_tokens"),
        # IEEE division of exact ints — deterministic across engines
        (F.length(F.regexp_replace(t, r"\s+", "")).cast("double") / n_tok).alias(
            "avg_token_len"
        ),
    )


def quality_score(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """N4 quality scoring — stopword / digit / punctuation ratios.

    Ratios are IEEE divisions of exact integer counts, so values are
    bit-identical on any engine computing the same counts.
    """
    t = F.col(text_col)
    n_tok = token_count(t)
    n_chars = F.length(t)
    return df.select(
        F.col(id_col),
        (stopword_hits(t, STOPWORDS_EN).cast("double") / n_tok).alias("stopword_ratio"),
        (
            F.length(F.regexp_replace(t, "[^0-9]", "")).cast("double") / n_chars
        ).alias("digit_ratio"),
        (
            F.length(F.regexp_replace(t, "[^.,;:!?]", "")).cast("double") / n_chars
        ).alias("punct_ratio"),
        (n_tok >= 5).alias("len_ok"),
    )


def lang_id(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """N4 language-ID heuristic — stopword-hit argmax over 4 languages.

    Returns ``lang_guess`` with deterministic tie-breaking (en > es > fr
    > de by strictly-greater cascade), so any engine computing the same
    counts gives the same label. 'und' (undetermined) when no list hits.
    """
    t = F.col(text_col)
    en, es, fr, de = (
        stopword_hits(t, STOPWORDS_EN),
        stopword_hits(t, STOPWORDS_ES),
        stopword_hits(t, STOPWORDS_FR),
        stopword_hits(t, STOPWORDS_DE),
    )
    best = F.greatest(en, es, fr, de)
    guess = (
        F.when(best == 0, F.lit("und"))
        .when(en == best, F.lit("en"))
        .when(es == best, F.lit("es"))
        .when(fr == best, F.lit("fr"))
        .otherwise(F.lit("de"))
    )
    return df.select(F.col(id_col), guess.alias("lang_guess"))


# rolling-hash parameters (Rabin-Karp base/modulus; winnowing per the
# MOSS scheme: min hash per sliding window of w k-gram hashes)
_RH_BASE = 257
_RH_MOD = 1_000_000_007


def rolling_fingerprints(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    w: int = 4,
) -> DataFrame:
    """N4 document fingerprinting via rolling hash + winnowing.

    Char k-gram Rabin-Karp hashes ``h = fold(chars, (h,c) -> (h·B + c)
    mod M)`` over the whitespace-normalized lowercase text, winnowed to
    the min hash per window of ``w`` consecutive positions (MOSS): any
    shared substring of length ≥ k+w−1 between two documents guarantees
    a shared fingerprint — the local-similarity detector exact-hash
    fingerprints can't provide. All integer arithmetic (exact, portable
    across engines); output is one (id, fp) row per distinct selected
    hash, ready for an inverted-index join like the shingle pipeline.

    Normalization runs JVM-side; the per-position hashing runs as
    Arrow-batched numpy in ``mapInPandas`` — k vectorized passes over
    the codepoint array instead of n·k interpreted expression calls
    (measured 38 s → ~1 s on the sf0.01 documents table, identical
    output: int64 mod arithmetic is exact in both).
    """
    import pandas as pd

    norm = F.lower(F.regexp_replace(F.trim(F.col(text_col)), r"\s+", " "))
    base, mod, min_len = _RH_BASE, _RH_MOD, k + w - 1

    def run(batches):
        import numpy as np
        from numpy.lib.stride_tricks import sliding_window_view

        for pdf in batches:
            ids: list = []
            fps: list = []
            for rid, s in zip(pdf[id_col], pdf["__norm"]):
                if s is None:
                    continue
                cp = np.frombuffer(s.encode("utf-32-le"), dtype=np.uint32).astype(
                    np.int64
                )
                n = len(cp)
                if n < min_len:
                    continue
                m = n - k + 1
                h = np.zeros(m, dtype=np.int64)
                for j in range(k):
                    h = (h * base + cp[j : j + m]) % mod
                sel = np.unique(sliding_window_view(h, w).min(axis=1))
                ids.extend([rid] * len(sel))
                fps.extend(sel.tolist())
            yield pd.DataFrame({id_col: ids, "fp": fps})

    return df.select(F.col(id_col), norm.alias("__norm")).mapInPandas(
        run, f"{id_col} long, fp long"
    )


def fingerprint(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """N4 document fingerprint — md5 of whitespace-normalized lowercase
    text. md5 is engine-independent, so fingerprints are portable keys
    for cross-system dedup."""
    norm = F.lower(F.regexp_replace(F.trim(F.col(text_col)), r"\s+", " "))
    return df.select(F.col(id_col), F.md5(norm).alias("fp"))


def strip_html(text: Column) -> Column:
    """Strip HTML to visible text: drop <script>/<style> blocks whole,
    then every remaining tag, decode the six common entities, squeeze
    whitespace. Pure built-in expressions (regexp_replace / replace) —
    codegen'd, no Python — and every pattern is chosen to mean the same
    thing in Java regex (Spark) and RE2 (the DuckDB oracle): no
    backreferences (RE2 lacks them — script and style get separate
    patterns), explicit [ \\t\\n\\r\\f] instead of \\s (whose class
    differs between the engines), and (?is) flags both support.

    The web-corpus extraction step (HTML → text) ahead of every text
    filter; the reference ingests pre-extracted JSON and never faces
    markup.
    """
    t = F.regexp_replace(text, r"(?is)<script\b[^>]*>.*?</script>", " ")
    t = F.regexp_replace(t, r"(?is)<style\b[^>]*>.*?</style>", " ")
    t = F.regexp_replace(t, r"(?s)<!--.*?-->", " ")
    t = F.regexp_replace(t, r"<[^>]+>", " ")
    for ent, ch in [
        ("&nbsp;", " "),
        ("&lt;", "<"),
        ("&gt;", ">"),
        ("&quot;", "\""),
        ("&#39;", "'"),
        ("&amp;", "&"),  # last, so &amp;lt; -> &lt; stays literal
    ]:
        t = F.replace(t, F.lit(ent), F.lit(ch))
    return F.trim(F.regexp_replace(t, "[ \t\n\r\f]+", " "))


def normalize_nfc(text: Column) -> Column:
    """Unicode NFC normalization — the canonicalization step ahead of
    any hash-keyed text operator (dedup keys, fingerprints: 'café'
    composed and decomposed must hash identically).

    Spark has no built-in Unicode normalizer, so this is the honest
    Python tier: an Arrow-batched pandas UDF over ``unicodedata``
    (both Python's unicodedata and DuckDB's utf8proc implement the same
    Unicode canonical composition, so the oracle's nfc_normalize
    replays it exactly). Vectorized batch transfer; no row-at-a-time
    Python UDF.
    """
    import unicodedata

    import pandas as pd

    def _nfc_batch(s: "pd.Series") -> "pd.Series":
        return s.map(
            lambda x: unicodedata.normalize("NFC", x) if x is not None else None
        )

    _nfc_batch.__annotations__ = {"s": pd.Series, "return": pd.Series}
    return F.pandas_udf(_nfc_batch, "string")(text)


def url_parts(url: Column) -> Column:
    """Decompose a URL into (scheme, host, domain, path, q) — the
    web-curation splitter behind domain blocklists and per-site quotas.
    Pure ``regexp_extract`` in the Java-regex ∩ RE2 intersection (see
    strip_html), so the SQL oracle runs the same patterns verbatim;
    ``domain`` is the last two host labels (the blocklist key).
    """
    scheme = F.regexp_extract(url, r"^([a-z][a-z0-9+.-]*)://", 1)
    host = F.regexp_extract(url, r"^[a-z][a-z0-9+.-]*://([^/?#]+)", 1)
    domain = F.regexp_extract(host, r"([^./]+\.[^./]+)$", 1)
    path = F.regexp_extract(url, r"^[a-z][a-z0-9+.-]*://[^/?#]*(/[^?#]*)", 1)
    q = F.regexp_extract(url, r"[?&]q=([^&#]*)", 1)
    return F.struct(
        scheme.alias("scheme"),
        host.alias("host"),
        domain.alias("domain"),
        path.alias("path"),
        q.alias("q"),
    )


GOPHER_STOPWORDS = ["the", "be", "to", "of", "and", "that", "have", "with"]


def gopher_rules(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    stopwords: list[str] | None = None,
    min_stopwords: int = 2,
) -> DataFrame:
    """The published Gopher/MassiveText document-quality gates (Rae et
    al. 2021, App. A) as per-rule boolean flags — the filter bundle a
    pretraining pipeline applies verbatim, kept INTEGER-exact so the
    decision is engine-portable (every threshold is a cross-multiplied
    integer comparison, no float ratios):

    - ``word_count_ok``: 50 ≤ words ≤ 100 000
    - ``mean_word_len_ok``: 3 ≤ mean word length ≤ 10
      (as 3·n ≤ Σlen ≤ 10·n)
    - ``hash_ellipsis_ok``: (# + …) symbols ≤ 10% of words
    - ``ellipsis_line_ok``: ≤ 30% of lines end with an ellipsis
    - ``bullet_line_ok``: ≤ 90% of lines start with a bullet
    - ``alpha_word_ok``: ≥ 80% of words contain an alphabetic char
    - ``stopword_ok``: ≥ ``min_stopwords`` (default 2, the MassiveText
      setting) DISTINCT stopwords from ``stopwords`` (default: the
      8-word Gopher list ``GOPHER_STOPWORDS``; pass a corpus-specific
      vocabulary for non-English data — the comparison is
      case-insensitive, the list must be lowercase)
    - ``gopher_pass``: AND of the above

    One narrow projection per document — no shuffle, no UDF; the whole
    ruleset is whole-stage-codegen'd expressions over the token and
    line arrays.
    """
    if stopwords is None:
        stopwords = GOPHER_STOPWORDS
    if not stopwords:
        raise ValueError("stopwords must be a non-empty list")
    bad = [w for w in stopwords if w != w.lower()]
    if bad:
        # tokens are lowercased before the intersect — a cased entry
        # could never match and would silently weaken the gate
        raise ValueError(f"stopwords must be lowercase, got {bad!r}")
    if min_stopwords < 1:
        # n_stop >= 0 is vacuously true: the gate would be silently
        # disabled rather than tuned
        raise ValueError(f"min_stopwords must be >= 1, got {min_stopwords}")
    if min_stopwords > len(set(stopwords)):
        # n_stop counts DISTINCT hits, bounded by the number of DISTINCT
        # list entries (a repeated word can only match once) — the gate
        # would silently reject every document
        raise ValueError(
            f"min_stopwords={min_stopwords} exceeds the "
            f"{len(set(stopwords))} distinct stopwords in the list; no "
            "document could ever pass"
        )
    t = tokens(F.col(text_col))
    lines = F.split(F.col(text_col), "\n")
    n_words = F.size(t)
    sum_len = F.aggregate(
        t, F.lit(0), lambda acc, x: acc + F.length(x)
    )
    n_hash = F.length(F.col(text_col)) - F.length(
        F.regexp_replace(F.col(text_col), "#", "")
    )
    # '…' plus the three-dot spelling, counted as symbols
    n_ell = (
        F.length(F.col(text_col))
        - F.length(F.regexp_replace(F.col(text_col), "…", ""))
        + F.size(F.split(F.col(text_col), r"\.\.\.")) - 1
    )
    n_lines = F.size(lines)
    n_ell_lines = F.size(
        F.filter(lines, lambda x: x.rlike(r"(\.\.\.|…)\s*$"))
    )
    n_bullet_lines = F.size(
        F.filter(lines, lambda x: x.rlike(r"^\s*[-*•]"))
    )
    n_alpha = F.size(F.filter(t, lambda x: x.rlike("[A-Za-z]")))
    n_stop = F.size(
        F.array_intersect(
            F.array_distinct(F.transform(t, F.lower)),
            F.array(*[F.lit(w) for w in stopwords]),
        )
    )
    word_count_ok = (n_words >= 50) & (n_words <= 100_000)
    mean_word_len_ok = (F.lit(3) * n_words <= sum_len) & (
        sum_len <= F.lit(10) * n_words
    )
    hash_ellipsis_ok = F.lit(10) * (n_hash + n_ell) <= n_words
    ellipsis_line_ok = F.lit(10) * n_ell_lines <= F.lit(3) * n_lines
    bullet_line_ok = F.lit(10) * n_bullet_lines <= F.lit(9) * n_lines
    alpha_word_ok = F.lit(5) * n_alpha >= F.lit(4) * n_words
    stopword_ok = n_stop >= min_stopwords
    return df.select(
        F.col(id_col),
        n_words.cast("long").alias("n_words"),
        word_count_ok.alias("word_count_ok"),
        mean_word_len_ok.alias("mean_word_len_ok"),
        hash_ellipsis_ok.alias("hash_ellipsis_ok"),
        ellipsis_line_ok.alias("ellipsis_line_ok"),
        bullet_line_ok.alias("bullet_line_ok"),
        alpha_word_ok.alias("alpha_word_ok"),
        stopword_ok.alias("stopword_ok"),
        (
            word_count_ok & mean_word_len_ok & hash_ellipsis_ok
            & ellipsis_line_ok & bullet_line_ok & alpha_word_ok & stopword_ok
        ).alias("gopher_pass"),
    )


def duplicated_span_stats(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", k: int = 8
) -> DataFrame:
    """Cross-document duplicated k-token spans (the ExactSubstr metric
    of Lee et al. 2022 at token granularity): every overlapping
    k-token window is hashed (md5 of the space-joined tokens —
    engine-portable); a window value occurring in ≥2 DISTINCT documents
    marks each of its instances as duplicated. Per document:
    ``n_windows``, ``dup_windows``, and ``dup_pm`` (duplicated
    instances per mille, exact integer arithmetic). Documents with
    fewer than ``k`` tokens emit nothing.

    Scale shape: the window table is corpus-token-sized but NARROW
    (id, md5) — one map-side-combined groupBy over the hash finds the
    duplicated values, one semi-join back marks instances, one per-doc
    aggregation emits stats. No n² anywhere; the hot-hash skew of
    boilerplate spans lands on the same AQE skew handling every hot
    join key gets.
    """
    t = tokens(F.col(text_col))
    wins = F.expr(
        f"transform(sequence(0, size(__t) - {k}), "
        f"i -> struct(i AS pos, md5(concat_ws(' ', slice(__t, i + 1, {k}))) AS h))"
    )
    w = (
        df.select(F.col(id_col), t.alias("__t"))
        .filter(F.size("__t") >= k)
        .select(F.col(id_col), F.explode(wins).alias("__w"))
        .select(F.col(id_col), F.col("__w.h").alias("__h"))
    )
    dup = (
        w.groupBy("__h")
        .agg(F.count_distinct(id_col).alias("__nd"))
        .filter(F.col("__nd") >= 2)
        .select("__h")
    )
    marked = w.join(dup.withColumn("__dup", F.lit(1)), "__h", "left")
    return (
        marked.groupBy(id_col)
        .agg(
            F.count("*").alias("n_windows"),
            F.count("__dup").alias("dup_windows"),
        )
        .select(
            id_col,
            "n_windows",
            "dup_windows",
            F.floor(F.lit(1000) * F.col("dup_windows") / F.col("n_windows"))
            .cast("long")
            .alias("dup_pm"),
        )
    )


def duplicated_spans(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", k: int = 8
) -> DataFrame:
    """Maximal cross-document duplicated token spans — the span
    *extraction* half of ExactSubstr dedup (Lee et al. 2022,
    "Deduplicating Training Data Makes Language Models Better", §4.1),
    at token granularity. :func:`duplicated_span_stats` counts the
    duplicated k-windows; this merges them into the maximal contiguous
    regions a deduplicator would actually cut.

    A k-token window at position ``p`` (0-based) covers tokens
    ``[p, p+k-1]``; a window is duplicated when its value occurs in ≥2
    distinct documents. Two duplicated windows at positions ``p1 < p2``
    belong to the same maximal span iff ``p2 - p1 <= k`` (their covered
    regions overlap or touch), so spans are merged with the classic
    gaps-and-islands pattern: break when the position gap exceeds k,
    island id = running sum of breaks, span = min/max over the island.
    Resulting spans within a document are disjoint and non-adjacent by
    construction. Returns ``(id_col, span_start, span_end,
    span_tokens)`` — inclusive 0-based token indices, all BIGINT.

    Scale shape: the window table is corpus-token-sized but narrow
    (id, pos, md5); one map-side-combined groupBy finds duplicated
    values, one semi-join marks instances, and the island merge is two
    window functions over doc-partitioned positions (per-partition sort
    bounded by document length — never a global sort). No n² anywhere.
    """
    t = tokens(F.col(text_col))
    wins = F.expr(
        f"transform(sequence(0, size(__t) - {k}), "
        f"i -> struct(CAST(i AS BIGINT) AS pos, "
        f"md5(concat_ws(' ', slice(__t, i + 1, {k}))) AS h))"
    )
    w = (
        df.select(F.col(id_col), t.alias("__t"))
        .filter(F.size("__t") >= k)
        .select(F.col(id_col), F.explode(wins).alias("__w"))
        .select(
            F.col(id_col),
            F.col("__w.pos").alias("__pos"),
            F.col("__w.h").alias("__h"),
        )
    )
    dup = (
        w.groupBy("__h")
        .agg(F.count_distinct(id_col).alias("__nd"))
        .filter(F.col("__nd") >= 2)
        .select("__h")
    )
    m = w.join(dup, "__h", "left_semi").select(id_col, "__pos")
    ow = Window.partitionBy(id_col).orderBy("__pos")
    brk = F.when(F.col("__pos") - F.lag("__pos").over(ow) > k, 1).otherwise(0)
    return (
        m.withColumn("__brk", brk)
        .withColumn("__isl", F.sum("__brk").over(ow))
        .groupBy(id_col, "__isl")
        .agg(
            F.min("__pos").alias("span_start"),
            (F.max("__pos") + (k - 1)).alias("span_end"),
        )
        .select(
            id_col,
            F.col("span_start").cast("long").alias("span_start"),
            F.col("span_end").cast("long").alias("span_end"),
            (F.col("span_end") - F.col("span_start") + 1)
            .cast("long")
            .alias("span_tokens"),
        )
    )


def exact_substr_scrub(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", k: int = 8
) -> DataFrame:
    """ExactSubstr deduplication applied (Lee et al. 2022 §4.1): cut
    every maximal duplicated span (:func:`duplicated_spans`) from every
    document it occurs in — Lee et al. remove ALL occurrences, not
    all-but-one — and emit the scrubbed text plus exact counts:
    ``(id_col, n_tokens, n_removed, clean_text)``. Documents with no
    duplicated spans (including those shorter than k tokens) pass
    through with ``n_removed = 0``.

    Scale shape: the span list is re-grouped per document (tiny — only
    documents that contain duplicated text have rows) and joined back
    on the id; token removal is a single higher-order ``filter`` over
    the in-row token array — tokens are NEVER exploded on the removal
    path, so the join input stays one row per document. The text column
    is scanned twice (once to find spans, once to scrub); callers
    looping over corpora can persist the source upstream, but at corpus
    scale a second columnar scan usually beats caching text twice.
    """
    spans = duplicated_spans(df, text_col=text_col, id_col=id_col, k=k)
    by_doc = spans.groupBy(id_col).agg(
        F.collect_list(F.struct("span_start", "span_end")).alias("__spans")
    )
    kept = F.expr(
        "filter(__t, (x, i) -> NOT coalesce("
        "exists(__spans, s -> i >= s.span_start AND i <= s.span_end), false))"
    )
    return (
        df.select(F.col(id_col), tokens(F.col(text_col)).alias("__t"))
        .join(by_doc, id_col, "left")
        .withColumn("__kept", kept)
        .select(
            id_col,
            F.size("__t").cast("long").alias("n_tokens"),
            (F.size("__t") - F.size("__kept")).cast("long").alias("n_removed"),
            F.concat_ws(" ", F.col("__kept")).alias("clean_text"),
        )
    )


def gopher_repetition(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """The REPETITION half of the Gopher/MassiveText ruleset (Rae et
    al. 2021 App. A; the static gates are :func:`gopher_rules`):
    per-document duplicate-line and repeated-n-gram screens, all
    integer-exact so the decision replays in any engine.

    - ``dup_line_ok``: duplicate-line fraction ≤ 0.30
      (10·(n_lines − n_distinct) ≤ 3·n_lines)
    - ``dup_line_char_ok``: characters inside duplicated lines ≤ 0.20
      of the document (5·dup_line_chars ≤ n_chars; line chars only,
      separators excluded — documented simplification)
    - ``top_2gram_char_ok``: characters covered by ALL occurrences of
      the most frequent word 2-gram ≤ 0.20 (ties broken lexically)
    - ``dup_5gram_char_ok``: characters covered by 5-grams occurring
      more than once ≤ 0.15 (20·dup5_chars ≤ 3·n_chars; the
      all-occurrences accounting, not Gopher's overlap-dedup — a
      stricter, still deterministic variant)
    - ``repetition_pass``: AND of the above.

    Scale shape: three narrow explode→groupBy aggregations (lines,
    2-grams, 5-grams) re-joined on the doc id — the same corpus-token-
    sized shuffles every shingling operator here pays, nothing n².
    """
    from pyspark.sql import Window as _W

    base = df.select(F.col(id_col), F.col(text_col).alias("__text")).filter(
        F.col("__text").isNotNull()
    )
    total = base.select(F.col(id_col), F.length("__text").alias("n_chars"))
    lines = base.select(
        F.col(id_col), F.explode(F.split("__text", "\n")).alias("__line")
    )
    line_stats = (
        lines.groupBy(id_col, "__line")
        .agg(F.count("*").alias("__c"))
        .groupBy(id_col)
        .agg(
            F.sum("__c").alias("n_lines"),
            F.count("*").alias("__nd"),
            F.coalesce(
                F.sum(
                    F.when(
                        F.col("__c") >= 2, F.col("__c") * F.length("__line")
                    ).otherwise(0)
                ),
                F.lit(0),
            ).alias("dup_line_chars"),
        )
    )
    toks = base.select(F.col(id_col), tokens(F.col("__text")).alias("__t"))

    def grams(n: int):
        return F.expr(
            f"CASE WHEN size(__t) >= {n} THEN "
            f"transform(sequence(1, size(__t) - {n - 1}), "
            f"i -> concat_ws(' ', slice(__t, i, {n}))) "
            "ELSE array() END"
        )

    c2 = (
        toks.select(F.col(id_col), F.explode(grams(2)).alias("__g"))
        .groupBy(id_col, "__g")
        .agg(F.count("*").alias("__c"))
    )
    w = _W.partitionBy(id_col).orderBy(F.desc("__c"), F.asc("__g"))
    top2 = (
        c2.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(F.col(id_col), (F.col("__c") * F.length("__g")).alias("top2_chars"))
    )
    dup5 = (
        toks.select(F.col(id_col), F.explode(grams(5)).alias("__g"))
        .groupBy(id_col, "__g")
        .agg(F.count("*").alias("__c"))
        .filter(F.col("__c") >= 2)
        .groupBy(id_col)
        .agg(F.sum(F.col("__c") * F.length("__g")).alias("dup5_chars"))
    )
    j = (
        total.join(line_stats, id_col, "left")
        .join(top2, id_col, "left")
        .join(dup5, id_col, "left")
        .select(
            F.col(id_col),
            "n_chars",
            F.col("n_lines"),
            F.col("__nd"),
            F.col("dup_line_chars"),
            F.coalesce("top2_chars", F.lit(0)).alias("top2_chars"),
            F.coalesce("dup5_chars", F.lit(0)).alias("dup5_chars"),
        )
    )
    dup_line_ok = F.lit(10) * (F.col("n_lines") - F.col("__nd")) <= F.lit(3) * F.col(
        "n_lines"
    )
    dup_line_char_ok = F.lit(5) * F.col("dup_line_chars") <= F.col("n_chars")
    top_2gram_char_ok = F.lit(5) * F.col("top2_chars") <= F.col("n_chars")
    dup_5gram_char_ok = F.lit(20) * F.col("dup5_chars") <= F.lit(3) * F.col("n_chars")
    return j.select(
        id_col,
        F.col("n_chars").cast("long").alias("n_chars"),
        F.col("n_lines").cast("long").alias("n_lines"),
        dup_line_ok.alias("dup_line_ok"),
        dup_line_char_ok.alias("dup_line_char_ok"),
        top_2gram_char_ok.alias("top_2gram_char_ok"),
        dup_5gram_char_ok.alias("dup_5gram_char_ok"),
        (dup_line_ok & dup_line_char_ok & top_2gram_char_ok & dup_5gram_char_ok).alias(
            "repetition_pass"
        ),
    )


def c4_rules(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_sentences: int = 5,
    min_words_per_line: int = 3,
) -> DataFrame:
    """The C4 cleaning heuristics (Raffel et al. 2020, *Exploring the
    Limits of Transfer Learning…*, §2.2 — the "Colossal Clean Crawled
    Corpus" ruleset), the third published filter bundle alongside
    :func:`gopher_rules` and :func:`gopher_repetition`. Line-level
    cleaning plus page-level drops, all engine-portable expressions
    (``right``/``contains``/``replace`` + length-difference counting —
    no regex dialect dependence, no UDF, no shuffle):

    Line KEPT iff (C4 §2.2 verbatim):
    - it ends in a terminal punctuation mark (``.``, ``!``, ``?``,
      ``"``), and
    - it has ≥ ``min_words_per_line`` whitespace words (C4: 3), and
    - it does not contain the word "javascript" (case-insensitive —
      C4 drops boilerplate "enable Javascript" lines).

    Page flags (on the ORIGINAL text — C4 discards the whole page):
    - ``no_lorem_ipsum``: "lorem ipsum" absent (case-insensitive)
    - ``no_curly_brace``: ``{`` absent (code marker)
    - ``min_sentences_ok``: the CLEANED text (kept lines only) carries
      ≥ ``min_sentences`` terminal marks (``.!?``) — C4's ≥-5-sentence
      floor, counted after line cleaning as the paper does
    - ``c4_pass``: AND of the three.

    Output: one row per input — (id, n_lines, n_kept_lines,
    n_sentences, clean_text, the flags). ``clean_text`` is the kept
    lines re-joined with ``\\n`` — the deliverable a C4-style pipeline
    feeds downstream. One narrow whole-stage-codegen projection per
    document, same scale shape as the Gopher gates.
    """
    if min_sentences < 1:
        raise ValueError(f"min_sentences must be >= 1, got {min_sentences}")
    if min_words_per_line < 1:
        raise ValueError(
            f"min_words_per_line must be >= 1, got {min_words_per_line}"
        )
    t = F.col(text_col)
    lines = F.split(t, "\n")

    def _line_ok(line):
        return (
            F.right(line, F.lit(1)).isin(".", "!", "?", '"')
            & (token_count(line) >= min_words_per_line)
            & ~F.contains(F.lower(line), F.lit("javascript"))
        )

    kept = F.filter(lines, _line_ok)
    clean = F.array_join(kept, "\n")

    def _count(s, ch):
        return F.length(s) - F.length(F.replace(s, F.lit(ch), F.lit("")))

    n_sentences = _count(clean, ".") + _count(clean, "!") + _count(clean, "?")
    no_lorem = ~F.contains(F.lower(t), F.lit("lorem ipsum"))
    no_curly = ~F.contains(t, F.lit("{"))
    min_sentences_ok = n_sentences >= min_sentences
    return df.select(
        F.col(id_col),
        F.size(lines).cast("long").alias("n_lines"),
        F.size(kept).cast("long").alias("n_kept_lines"),
        n_sentences.cast("long").alias("n_sentences"),
        clean.alias("clean_text"),
        no_lorem.alias("no_lorem_ipsum"),
        no_curly.alias("no_curly_brace"),
        min_sentences_ok.alias("min_sentences_ok"),
        (no_lorem & no_curly & min_sentences_ok).alias("c4_pass"),
    )


def bm25_topk(
    df,
    query_terms: list[str],
    k: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
):
    """BM25 ranked retrieval (Robertson-Spärck Jones / Okapi BM25 —
    the lexical baseline every RAG/retrieval pipeline keeps next to
    its embedding index): top-``k`` documents for a bag of
    ``query_terms``, scored

        Σ_t  ln((N − df_t + 0.5)/(df_t + 0.5) + 1)
             · tf_t·(k1+1) / (tf_t + k1·(1 − b + b·len/avgdl))

    Spark-first shape — NO explode, NO per-doc shuffle: per-document
    term frequencies and length come from one codegen'd projection
    over the token array (``size(filter(tokens, x -> x = t))`` per
    term); the corpus statistics (N, Σlen, df_t) reduce in ONE tiny
    all-integer aggregation collected to the driver (|terms|+2 ints at
    any corpus size) and return as expression literals; the final
    ranking is orderBy+limit — TakeOrderedAndProject's per-partition
    heap, never a global sort. Integer stats + a fixed float
    evaluation order make scores engine-portable (the oracle replays
    them bit-for-bit; ties break by ascending id).

    Scale: one scan for stats, one scan for scores. A standing corpus
    would persist (doc_len, tf_t) as a sidecar and pay only the second
    scan per query batch; at-rest inverted indexes are the
    similarity-module pattern (build_lsh_index) applied to terms."""
    toks = tokens(F.col(text_col))
    terms = list(query_terms)

    def _tf(term: str) -> Column:
        # NB: a two-parameter lambda would make F.filter pass
        # (element, index) — capture the term via closure instead
        return F.size(F.filter(toks, lambda x: x == F.lit(term)))

    prep = df.select(
        F.col(id_col),
        F.size(toks).cast("long").alias("__len"),
        *[
            _tf(t).cast("long").alias(f"__tf{i}")
            for i, t in enumerate(terms)
        ],
    )
    stats = prep.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("__len").alias("sum_len"),
        *[
            F.count(F.when(F.col(f"__tf{i}") > 0, 1)).alias(f"df{i}")
            for i in range(len(terms))
        ],
    ).first()
    n_docs, sum_len = stats["n_docs"], stats["sum_len"]
    if not n_docs or not sum_len:
        raise ValueError("bm25_topk: empty corpus")
    score = None
    for i in range(len(terms)):
        df_t = stats[f"df{i}"]
        idf = F.log(
            F.lit(float(n_docs) - df_t + 0.5) / F.lit(df_t + 0.5) + F.lit(1.0)
        )
        tf = F.col(f"__tf{i}").cast("double")
        norm = tf + F.lit(k1) * (
            F.lit(1.0 - b)
            + F.lit(b)
            * (F.col("__len").cast("double") * F.lit(float(n_docs)) / F.lit(float(sum_len)))
        )
        part = idf * (tf * F.lit(k1 + 1.0)) / norm
        score = part if score is None else score + part
    return (
        prep.select(
            F.col(id_col), F.round(score, 6).alias("score")
        )
        .filter(F.col("score") > 0)
        .orderBy(F.desc("score"), F.asc(id_col))
        .limit(k)
    )
