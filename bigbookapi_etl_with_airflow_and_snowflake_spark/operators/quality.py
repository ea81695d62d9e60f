"""Data-quality validation — declarative expectation checks over any
table, evaluated in ONE aggregation pass.

A pipeline feeding a 100 TB lake needs cheap continuous validation:
null rates, range violations, key uniqueness. Naive implementations
run one job per rule; here every rule compiles to a conditional
count inside a single ``agg`` — one scan, one reduce, regardless of
rule count. Uniqueness (inherently a shuffle) is its own aggregation,
still one job via a cross-join of two single-row frames.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Rule:
    """One expectation: ``name`` labels the output column; ``violation``
    is a boolean Column that is true for BAD rows."""

    name: str
    violation: Column


def not_null(col: str) -> Rule:
    return Rule(f"{col}_null", F.col(col).isNull())


def in_range(col: str, lo, hi) -> Rule:
    return Rule(
        f"{col}_out_of_range",
        F.col(col).isNotNull() & ~F.col(col).between(lo, hi),
    )


def matches(col: str, pattern: str) -> Rule:
    return Rule(
        f"{col}_bad_format",
        F.col(col).isNotNull() & ~F.col(col).rlike(pattern),
    )


def validate(
    df: DataFrame, rules: list[Rule], unique_key: str | None = None
) -> DataFrame:
    """One-row violation report: total rows + violation count per rule
    (+ duplicate-key count when ``unique_key`` given)."""
    aggs = [F.count(F.lit(1)).alias("n_rows")] + [
        F.count(F.when(r.violation, 1)).alias(r.name) for r in rules
    ]
    report = df.agg(*aggs)
    if unique_key is not None:
        dups = (
            df.groupBy(unique_key)
            .agg(F.count(F.lit(1)).alias("__n"))
            .agg(
                F.coalesce(
                    F.sum(F.when(F.col("__n") > 1, F.col("__n") - 1)), F.lit(0)
                )
                .cast("long")
                .alias(f"{unique_key}_duplicates")
            )
        )
        report = report.crossJoin(dups)
    return report
