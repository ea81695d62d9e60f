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


def violations_column(rules: list[Rule]) -> Column:
    """``array<string>`` of the names of the rules a row violates
    (empty array = clean row). One expression, evaluated inside
    whole-stage codegen — rule count adds columns to a projection,
    never jobs or shuffles."""
    return F.filter(
        F.array(*[F.when(r.violation, F.lit(r.name)) for r in rules]),
        lambda x: x.isNotNull(),
    )


def enforce(
    df: DataFrame, rules: list[Rule]
) -> tuple[DataFrame, DataFrame]:
    """Write-time expectation enforcement (the Delta Live Tables
    ``expect_or_drop`` + quarantine pattern): split ``df`` into
    ``(valid, quarantined)`` — valid rows carry the original columns;
    quarantined rows additionally carry ``_violations``, the non-empty
    array of violated rule names, so a data steward can triage by
    cause without re-running the rules.

    Both frames derive from ONE annotated projection; callers that
    materialize both should persist the annotated parent (or use
    :func:`write_with_expectations`, which does) so the upstream
    lineage executes once — the multi-action discipline from
    VERDICT r10."""
    if "_violations" in df.columns:
        raise ValueError(
            "input already has a _violations column — enforce() would "
            "silently overwrite it; rename it first"
        )
    annotated = df.withColumn("_violations", violations_column(rules))
    valid = annotated.filter(F.size("_violations") == 0).drop("_violations")
    quarantined = annotated.filter(F.size("_violations") > 0)
    return valid, quarantined


def expect_or_fail(
    df: DataFrame, rules: list[Rule], unique_key: str | None = None
) -> DataFrame:
    """Gate a pipeline stage on expectations (DLT ``expect_or_fail``):
    returns ``df`` unchanged when every rule holds; raises ValueError
    naming each violated rule and its row count otherwise. One
    :func:`validate` aggregation pass — the failure message is the
    violation report, so the on-call engineer never re-runs the job
    just to learn what broke."""
    report = validate(df, rules, unique_key=unique_key).first().asDict()
    bad = {
        k: v for k, v in report.items() if k != "n_rows" and (v or 0) > 0
    }
    if bad:
        raise ValueError(
            "expectations failed: "
            + ", ".join(f"{k}={v} rows" for k, v in sorted(bad.items()))
            + f" (of {report['n_rows']} scanned)"
        )
    return df


def write_with_expectations(
    spark,
    df: DataFrame,
    rules: list[Rule],
    table_dir: str,
    quarantine_dir: str,
    mode: str = "append",
) -> dict:
    """Expectation-gated commit to a versioned table: valid rows
    commit to ``table_dir``, violating rows (with ``_violations``)
    commit to the ``quarantine_dir`` versioned table, and the returned
    metrics carry per-rule violation counts — the full DLT
    expect/quarantine/metrics loop on this module's lakehouse sink.

    One scan of the upstream lineage: the annotated frame is persisted
    across the two snapshot writes and the metrics aggregation, then
    unpersisted. The quarantine table commits FIRST — if the main
    commit then fails, re-running re-quarantines (append of the same
    bad rows is the idempotent-enough failure mode for a triage table)
    but never lets bad rows reach the main table; the reverse order
    could commit valid rows and lose the violation record.

    A run with zero violations skips the quarantine commit entirely
    (no empty version spam); ``quarantine_version`` is then None.

    Returns ``{"version", "quarantine_version", "n_valid",
    "n_quarantined", "by_rule"}``."""
    from ..sinks.versioned import write_version

    if "_violations" in df.columns:
        raise ValueError(
            "input already has a _violations column — rename it first"
        )
    annotated = df.withColumn("_violations", violations_column(rules)).persist()
    try:
        counts = annotated.agg(
            F.count(F.lit(1)).alias("__n"),
            F.count(F.when(F.size("_violations") > 0, 1)).alias("__bad"),
            *[
                F.count(
                    F.when(F.array_contains("_violations", r.name), 1)
                ).alias(r.name)
                for r in rules
            ],
        ).first()
        n_quarantined = counts["__bad"]
        q_version = None
        if n_quarantined:
            q_version = write_version(
                spark,
                annotated.filter(F.size("_violations") > 0),
                quarantine_dir,
                mode=mode,
            )
        version = write_version(
            spark,
            annotated.filter(F.size("_violations") == 0).drop("_violations"),
            table_dir,
            mode=mode,
        )
    finally:
        annotated.unpersist()
    return {
        "version": version,
        "quarantine_version": q_version,
        "n_valid": counts["__n"] - n_quarantined,
        "n_quarantined": n_quarantined,
        "by_rule": {r.name: counts[r.name] for r in rules},
    }


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
