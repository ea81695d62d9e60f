"""SQL scalar function library: the engine's core expressions exposed
as `CREATE TEMPORARY FUNCTION` SQL UDFs (Spark SQL-function syntax — a
function *body*, not a Python callable), so SQL-facade users get the
exact same semantics the DataFrame queries use.

These are declarative SQL bodies, so Catalyst inlines them into the
calling plan: full whole-stage codegen, predicate pushdown through the
function, zero Python in the loop — unlike `spark.udf.register`, which
would wall off the expression behind a black box. The definitions
mirror the parity conventions of queries.py (exact DECIMAL money math,
md5-keyed portable bucketing).
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from .splits import SPLIT_SALT, TRAIN_UPPER_HEX, VAL_UPPER_HEX

# name -> (signature, return type, body)
SQL_FUNCTIONS: dict[str, tuple[str, str, str]] = {
    # exact-decimal revenue (the queries.py _rev() convention)
    "line_revenue": (
        "(ep DOUBLE, disc DOUBLE)",
        "DOUBLE",
        "CAST(CAST(ep AS DECIMAL(12,2)) * (1 - CAST(disc AS DECIMAL(4,2))) AS DOUBLE)",
    ),
    # whitespace token count (operators/text.py token_count)
    "token_count": (
        "(t STRING)",
        "INT",
        r"size(split(trim(t), '\\s+'))",
    ),
    # digit ratio quality signal (operators/text.py quality_score)
    "digit_ratio": (
        "(t STRING)",
        "DOUBLE",
        "CAST(length(regexp_replace(t, '[^0-9]', '')) AS DOUBLE) / length(t)",
    ),
    # portable md5 bucket in [0, n) — the split/sample/shard primitive.
    # conv() returns STRING; the explicit BIGINT cast makes the modulo
    # integer arithmetic instead of leaning on implicit double coercion
    # (exact for the 8-hex-digit range, and type-stable across versions)
    "md5_bucket": (
        "(key STRING, salt STRING, n INT)",
        "INT",
        "CAST(CAST(conv(substring(md5(concat(key, salt)), 1, 8), 16, 10) AS BIGINT) % n AS INT)",
    ),
    # train/val/test assignment — thresholds/salt shared with
    # queries_ext.q_train_test_split via functions/splits.py
    "split_of": (
        "(key STRING)",
        "STRING",
        f"CASE WHEN md5(concat(key, '{SPLIT_SALT}')) < '{TRAIN_UPPER_HEX}' THEN 'train' "
        f"WHEN md5(concat(key, '{SPLIT_SALT}')) < '{VAL_UPPER_HEX}' THEN 'val' ELSE 'test' END",
    ),
}


def register_sql_functions(spark: SparkSession) -> list[str]:
    """Register the library as temporary SQL functions on the session.

    Idempotent (CREATE OR REPLACE). Returns the registered names.
    """
    for name, (sig, ret, body) in SQL_FUNCTIONS.items():
        spark.sql(
            f"CREATE OR REPLACE TEMPORARY FUNCTION {name}{sig} "
            f"RETURNS {ret} RETURN {body}"
        )
    return list(SQL_FUNCTIONS)
