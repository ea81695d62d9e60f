"""Driver contract for the spark-graft builder (PySpark target).

``entry``   — flagship query (6-table star join → per-nation revenue) at
              sf0.001.
``queries`` — one callable per implemented operator (SURVEY.md §2); all
              built Spark-first in
              ``bigbookapi_etl_with_airflow_and_snowflake_spark.queries``.
``oracle_sql`` — DuckDB-equivalent SQL per query (omitted only for ops
              whose outputs are engine-specific by construction:
              simhash (xxhash64 keys), lsh_topk / ivf_topk / pq_topk (seeded
              random planes / centroids), the approx_distinct /
              approx_quantile sketches, and iterative k-means. EVERY
              one of those has an oracle-checked twin in the registry
              running the same code path at an exact configuration:
              simhash_pairs (portable md5), lsh_topk_exact (zero
              planes = exhaustive), ivf_topk_exact (probe-all),
              pq_topk_fixed + pq_codes (fixed codebooks, full SQL replay
              of the lossy kernel),
              distinct_users_exact, price_quantiles_exact (discrete
              rank), kmeans_assign_init + cluster_sample_init
              (0-iteration assignment/sampling) — plus recall and
              replay tests in tests/.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bigbookapi_etl_with_airflow_and_snowflake_spark import queries as _q


def _session_defaults(spark: SparkSession) -> None:
    """The engine's own session (session.py) sets these; the driver may
    pass a session of its own — set them defensively per call.

    - nanosAsLong: corpora have shipped TIMESTAMP(NANOS) columns Spark
      rejects by default (read_table converts long → µs timestamp).
    - UTC session timezone: corpora have also shipped naive-µs
      timestamps that surface as TIMESTAMP_NTZ; read_table
      canonicalizes NTZ → TIMESTAMP, which is value-identical exactly
      when the session timezone is UTC (matching the DuckDB oracle's
      naive reading).
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    _session_defaults(spark)
    return _q.q_region_revenue(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    def _wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            _session_defaults(spark)
            return fn(spark, sf_dir)

        return run

    return {name: _wrap(fn) for name, fn in _q.queries().items()}


def oracle_sql() -> dict[str, str]:
    return _q.oracle_sql()
