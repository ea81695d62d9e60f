"""Dump .explain('formatted') for the bench headline queries.

Usage: python plans/r15/_dump_plans.py <suffix> [query ...]
Writes plans/r15/<query>_<suffix>.txt for each query (default: all of
bench.BENCH_QUERIES). Run from the repo root.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.getcwd())

from bench import BENCH_QUERIES
from bigbookapi_etl_with_airflow_and_snowflake_spark import queries as _q
from bigbookapi_etl_with_airflow_and_snowflake_spark.session import get_spark


def main() -> None:
    suffix = sys.argv[1]
    names = sys.argv[2:] or BENCH_QUERIES
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name=f"plans-{suffix}")
    registry = _q.queries()
    out_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)))
    for name in names:
        df = registry[name](spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(buf.getvalue())
        print(f"wrote {name}_{suffix}.txt")
    spark.stop()


if __name__ == "__main__":
    main()
