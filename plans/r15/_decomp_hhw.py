"""heavy_hitter_words decomposition + variants at 100x (VERDICT item 5).

Stages:
  1. scan+explode only (JVM) — the word stream without the Python hop
  2. current operator (explode -> mapInPandas MG fold)
  3. variant A: bigger Arrow batches (maxRecordsPerBatch 10k -> 100k)
  4. variant B: split INSIDE the kernel (documents text rows cross the
     boundary, pyarrow splits + counts per batch) — same MG fold
Run: python plans/r15/_decomp_hhw.py [corpus_dir] [passes]
"""

from __future__ import annotations

import os
import sys
from typing import Iterator

sys.path.insert(0, os.getcwd())
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import pandas as pd

from pyspark.sql import functions as F

from _stage_decomp import run_stages
from bigbookapi_etl_with_airflow_and_snowflake_spark.operators.sketch import (
    heavy_hitters,
)
from bigbookapi_etl_with_airflow_and_snowflake_spark.session import get_spark
from bigbookapi_etl_with_airflow_and_snowflake_spark.sources.files import read_table


def hh_split_inside(df, text_col: str, k: int, capacity: int):
    """Variant B: same MG fold, but the word explode happens inside the
    Python kernel on Arrow text batches (value_counts over the
    flattened split) — rows crossing the boundary drop by the
    words-per-doc factor; the per-partition word multiset is identical,
    so with capacity >= domain the result is exactly the same."""
    out_schema = "item string, cnt long, deducted long"

    def summarize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counts: dict[str, int] = {}
        deducted = 0
        for pdf in batches:
            words = pdf[text_col].dropna().str.split(" ").explode()
            vc = words.value_counts()
            for item, c in vc.items():
                counts[item] = counts.get(item, 0) + int(c)
            if len(counts) > capacity:
                s = sorted(counts.values(), reverse=True)[capacity]
                counts = {i: c - s for i, c in counts.items() if c > s}
                deducted += s
        yield pd.DataFrame(
            {
                "item": list(counts),
                "cnt": list(counts.values()),
                "deducted": [0] * len(counts),
            }
        )
        yield pd.DataFrame({"item": [None], "cnt": [0], "deducted": [deducted]})

    summaries = df.select(text_col).mapInPandas(summarize, schema=out_schema)
    merged = summaries.groupBy("item").agg(F.sum("cnt").alias("est_count"))
    bound = summaries.agg(F.sum("deducted").alias("max_undercount"))
    return (
        merged.filter(F.col("item").isNotNull())
        .crossJoin(F.broadcast(bound))
        .orderBy(F.desc("est_count"), F.asc("item"))
        .limit(k)
    )


def main() -> None:
    corpus = sys.argv[1] if len(sys.argv) > 1 else "/tmp/spark_graft_scale_sf100"
    passes = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark(app_name="r15-hhw-decomp")
    docs = lambda: read_table(spark, corpus, "documents")  # noqa: E731
    words = lambda: docs().select(  # noqa: E731
        F.explode(F.split("text", " ")).alias("word")
    )

    def with_batch(n, build):
        def run():
            spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", str(n))
            try:
                return build()
            finally:
                pass

        return run

    def reset_batch():
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")

    stages = [
        ("1_explode_only_jvm", words),
        ("2_current_operator", lambda: (reset_batch(), heavy_hitters(words(), "word", 20, 65536))[1]),
        ("3_batch100k", with_batch(100_000, lambda: heavy_hitters(words(), "word", 20, 65536))),
        ("4_split_inside", lambda: (reset_batch(), hh_split_inside(docs(), "text", 20, 65536))[1]),
    ]
    run_stages(spark, stages, passes)
    # equality check: variant B vs current
    reset_batch()
    cur = heavy_hitters(words(), "word", 20, 65536).collect()
    new = hh_split_inside(docs(), "text", 20, 65536).collect()
    assert [tuple(r) for r in cur] == [tuple(r) for r in new], "MISMATCH"
    print("variant B output identical to current operator:", len(cur), "rows")
    spark.stop()


if __name__ == "__main__":
    main()
