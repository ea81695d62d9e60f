"""Production-scale BPE smoke with MERGE HEADROOM.

The round-9 smoke trained on the replicated driver corpus and saturated
at 113/512 merges: a replicated synthetic vocabulary exhausts (no
remaining pair occurs twice) long before a production budget — which
left the 512-merge cost model extrapolated, not measured. This smoke
fixes the corpus, not the trainer: words are COMPOSED from a syllable
inventory (consonant·vowel pairs), so the corpus carries thousands of
distinct multi-syllable words, each frequent, and the achievable merge
count (≈ Σ per-distinct-word fusions) is tens of thousands — the
512-merge budget must actually execute.

Deterministic and fully distributed: word identity is
xxhash64(doc_id, pos) % vocab, syllables derive from the word id, docs
are built with Spark expressions (no driver-side corpus, no RNG).

Usage: python bpe_scale_smoke.py [n_docs] [words_per_doc] [n_merges] [batch_k]
Defaults: 150000 docs x 80 words, n_merges=512, batch_k=64 (the
round-9 configuration on the new corpus). Prints one JSON line with
rounds / merges / saturated / wall seconds; exits 1 if training
saturated below the budget (the regression this smoke exists to catch).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F

from bigbookapi_etl_with_airflow_and_snowflake_spark.operators.bpe import bpe_train
from bigbookapi_etl_with_airflow_and_snowflake_spark.session import get_spark

CONSONANTS = "bcdfghjklmnpqrstvwz"  # 19
VOWELS = "aeiou"  # 5 -> 95 syllables
VOCAB = 6000  # distinct composed words


def synth_corpus(spark, n_docs: int, words_per_doc: int):
    syls = [c + v for c in CONSONANTS for v in VOWELS]
    syl = F.array(*[F.lit(s) for s in syls])
    n_syl = len(syls)

    # word(wid): 2-4 syllables, each position's index an independent
    # hash of (wid, position) — the same wid always spells the same
    # word, and EVERY position is diverse (a base-n_syl digit
    # derivation would pin positions ≥ 2 to one syllable whenever
    # VOCAB < n_syl², skewing the corpus and the merge statistics)
    def word(wid):
        s = [
            F.element_at(
                syl,
                (F.pmod(F.xxhash64(wid, F.lit(i)), F.lit(n_syl)) + 1).cast("int"),
            )
            for i in range(4)
        ]
        two = F.concat(s[0], s[1])
        three = F.concat(two, s[2])
        four = F.concat(three, s[3])
        return (
            F.when(F.pmod(wid, 3) == 0, two)
            .when(F.pmod(wid, 3) == 1, three)
            .otherwise(four)
        )

    wid = lambda pos: F.pmod(F.xxhash64(F.col("id"), pos), F.lit(VOCAB))  # noqa: E731
    text = F.array_join(
        F.transform(
            F.sequence(F.lit(1), F.lit(words_per_doc)),
            lambda pos: word(wid(pos)),
        ),
        " ",
    )
    return spark.range(n_docs).select(
        F.col("id").alias("doc_id"), text.alias("text")
    )


def main() -> None:
    a = sys.argv[1:]
    n_docs = int(a[0]) if len(a) > 0 else 150_000
    words_per_doc = int(a[1]) if len(a) > 1 else 80
    n_merges = int(a[2]) if len(a) > 2 else 512
    batch_k = int(a[3]) if len(a) > 3 else 64

    spark = get_spark(app_name="bpe-scale-smoke")
    df = synth_corpus(spark, n_docs, words_per_doc).localCheckpoint(eager=True)
    n_tokens = n_docs * words_per_doc

    stats: dict = {}
    t0 = time.perf_counter()
    merges = bpe_train(
        df, n_merges=n_merges, batch_k=batch_k, stats=stats
    )
    wall = round(time.perf_counter() - t0, 2)
    result = {
        "metric": "bpe_scale_smoke",
        "n_docs": n_docs,
        "n_tokens": n_tokens,
        "vocab_distinct_words": VOCAB,
        "n_merges_requested": n_merges,
        "batch_k": batch_k,
        "merges_learned": len(merges),
        "rounds": stats["rounds"],
        "saturated": stats["saturated"],
        "wall_sec": wall,
        "sec_per_round": round(wall / max(stats["rounds"], 1), 2),
    }
    print(json.dumps(result))
    spark.stop()
    if stats["saturated"] and len(merges) < n_merges:
        sys.exit(1)


if __name__ == "__main__":
    main()
