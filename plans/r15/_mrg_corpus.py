"""Multi-row-group measurement corpus (VERDICT r14 item 7).

The sf0.1 testdata is one parquet file with ONE row group per table, so
scan parallelism is structurally 1 task/table and the driver's c8/c32
scaling axis reads ~1.0 everywhere. This rewrites each table into a
multi-file directory (N files => >= N row groups) under /tmp so the
scan-bound relational set can be re-measured with real scan
parallelism. Measurement-only: nothing here is read by the engine or
the bench unless SPARK_GRAFT_SF_DIR is pointed at the output.

Usage: python plans/r15/_mrg_corpus.py [n_files] [out_dir]
Then:  SPARK_GRAFT_SF_DIR=<out_dir> SPARK_GRAFT_CPUS={8,32} python bench.py
"""

from __future__ import annotations

import os
import shutil
import sys

sys.path.insert(0, os.getcwd())

from bigbookapi_etl_with_airflow_and_snowflake_spark.session import get_spark

BASE = "/root/testdata/sf0.1"
TABLES = [
    "lineitem", "orders", "customer", "supplier", "part", "nation",
    "region", "events", "documents", "embeddings",
]


def main() -> None:
    n_files = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    out = sys.argv[2] if len(sys.argv) > 2 else f"/tmp/spark_graft_mrg{n_files}"
    spark = get_spark(app_name="r15-mrg-corpus")
    os.makedirs(out, exist_ok=True)
    for t in TABLES:
        dst = f"{out}/{t}.parquet"
        if os.path.exists(dst):
            shutil.rmtree(dst, ignore_errors=True)
        df = spark.read.parquet(f"{BASE}/{t}.parquet")
        n = max(1, min(n_files, df.count() // 1000 or 1))
        df.repartition(n).write.mode("overwrite").parquet(dst)
        print(t, "->", n, "files", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
