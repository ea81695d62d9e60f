"""Round-14 lock: the PassJoin segment-index candidates behind
q_part_name_editdist must be COMPLETE — identical output to the naive
all-pairs levenshtein — including the degenerate lengths (empty,
shorter than the segment count) where zero-width segments match as
empty strings."""

from __future__ import annotations

import itertools

import pytest


def _lev(a: str, b: str) -> int:
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


NAMES = [
    "",  # empty
    "a", "b", "ab", "ba", "abc", "abd", "abcd",  # below/at segment count
    "goldenrod lavender spring chiffon midnight",
    "goldenrod lavender spring chiffon midnite",   # 2 subs at the tail
    "goldenrod lavender sprint chiffon midnight",  # 1 sub mid-string
    "oldenrod lavender spring chiffon midnight",   # 1 deletion at head
    "xgoldenrod lavender spring chiffon midnightx",  # 2 insertions, ends
    "completely unrelated name",
    "almond antique blue royal burnished",
    "almond antique blue royal burnishedx",
    "aaaaaaaaaa", "aaaaaaaaab", "aaaaaaaabb", "aaaaaabbbb",  # repeats
]


def test_passjoin_matches_bruteforce(spark, tmp_path):
    import pandas as pd
    from pyspark.sql import functions as F

    from bigbookapi_etl_with_airflow_and_snowflake_spark import queries as Q

    # write a miniature "part" table and aim the query at it
    sf_dir = str(tmp_path)
    df = spark.createDataFrame(
        [(i + 1, n) for i, n in enumerate(NAMES)], "p_partkey long, p_name string"
    )
    df.coalesce(1).write.mode("overwrite").parquet(f"{sf_dir}/part.parquet")

    got = (
        Q.q_part_name_editdist(spark, sf_dir)
        .toPandas()
        .sort_values(["id_a", "id_b"])
        .reset_index(drop=True)
    )
    want_rows = []
    for (ia, na), (ib, nb) in itertools.combinations(
        [(i + 1, n) for i, n in enumerate(NAMES)], 2
    ):
        d = _lev(na, nb)
        if d <= 2:
            want_rows.append((ia, ib, na, nb, d))
    want = (
        pd.DataFrame(want_rows, columns=["id_a", "id_b", "name_a", "name_b", "dist"])
        .sort_values(["id_a", "id_b"])
        .reset_index(drop=True)
    )
    assert len(got) == len(want), (len(got), len(want))
    assert got.astype({"dist": "int64"}).equals(want.astype({"dist": "int64"})), (
        got.to_dict("records"),
        want.to_dict("records"),
    )


def test_passjoin_matches_bruteforce_randomized(spark, tmp_path):
    """Round-15 lock for the multi-match-aware shift bounds: a seeded
    random corpus over a 3-letter alphabet (dense near-pair space, all
    lengths 0..8 — every segment-width/shift combination the bounds
    formula can produce for k=2) must still match brute force."""
    import random

    import pandas as pd

    from bigbookapi_etl_with_airflow_and_snowflake_spark import queries as Q

    rng = random.Random(15)
    names = list(
        {
            "".join(rng.choice("abc") for _ in range(rng.randrange(0, 9)))
            for _ in range(120)
        }
    )
    names.sort()
    sf_dir = str(tmp_path)
    df = spark.createDataFrame(
        [(i + 1, n) for i, n in enumerate(names)], "p_partkey long, p_name string"
    )
    df.coalesce(1).write.mode("overwrite").parquet(f"{sf_dir}/part.parquet")

    got = (
        Q.q_part_name_editdist(spark, sf_dir)
        .toPandas()
        .sort_values(["id_a", "id_b"])
        .reset_index(drop=True)
    )
    want_rows = []
    for (ia, na), (ib, nb) in itertools.combinations(
        [(i + 1, n) for i, n in enumerate(names)], 2
    ):
        d = _lev(na, nb)
        if d <= 2:
            want_rows.append((ia, ib, na, nb, d))
    want = (
        pd.DataFrame(want_rows, columns=["id_a", "id_b", "name_a", "name_b", "dist"])
        .sort_values(["id_a", "id_b"])
        .reset_index(drop=True)
    )
    assert len(got) == len(want), (len(got), len(want))
    assert got.astype({"dist": "int64"}).equals(want.astype({"dist": "int64"}))
