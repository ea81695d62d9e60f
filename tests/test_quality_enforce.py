"""Write-time expectation enforcement (operators/quality.py enforce /
expect_or_fail / write_with_expectations) — the Delta Live Tables
expect / expect_or_drop / expect_or_fail triad plus quarantine routing
onto the versioned-table sink.

The reference loads whatever the API returned (no write gate at all —
/root/reference/scripts/transform.py drops unparseable rows silently);
at corpus scale the production pattern is: clean rows commit, dirty
rows land in a triage table WITH the reason, and the run reports
per-rule counts.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bigbookapi_etl_with_airflow_and_snowflake_spark.operators.quality import (
    enforce,
    expect_or_fail,
    in_range,
    matches,
    not_null,
    write_with_expectations,
)
from bigbookapi_etl_with_airflow_and_snowflake_spark.sinks.versioned import (
    read_version,
    versions,
)


def _dirty(spark, n=100):
    """id 0..n-1; name NULL when id%10=0; v negative when id%7=0."""
    return spark.range(n).select(
        F.col("id"),
        F.when(F.col("id") % 10 != 0, F.concat(F.lit("n"), F.col("id"))).alias(
            "name"
        ),
        F.when(F.col("id") % 7 == 0, -F.col("id") - 1)
        .otherwise(F.col("id"))
        .alias("v"),
    )


def _rules():
    # Column construction needs an active session - build per test
    return [not_null("name"), in_range("v", 0, 10**9)]


def test_enforce_splits_and_labels_causes(spark):
    valid, quarantined = enforce(_dirty(spark), _rules())
    assert valid.columns == ["id", "name", "v"]  # _violations dropped
    v_ids = {r["id"] for r in valid.collect()}
    assert v_ids == {i for i in range(100) if i % 10 != 0 and i % 7 != 0}
    q = {r["id"]: r["_violations"] for r in quarantined.collect()}
    assert q[10] == ["name_null"]
    assert q[7] == ["v_out_of_range"]
    assert q[70] == ["name_null", "v_out_of_range"]  # rule order kept
    assert set(q) == {i for i in range(100) if i % 10 == 0 or i % 7 == 0}


def test_enforce_refuses_violations_collision(spark):
    df = spark.range(3).withColumn("_violations", F.array())
    with pytest.raises(ValueError, match="_violations"):
        enforce(df, _rules())


def test_expect_or_fail_passes_clean_and_names_broken_rules(spark):
    clean = spark.range(5).select(
        F.col("id"), F.lit("x").alias("name"), F.col("id").alias("v")
    )
    assert expect_or_fail(clean, _rules()) is clean
    with pytest.raises(ValueError, match="name_null=10 rows.*v_out_of_range"):
        expect_or_fail(_dirty(spark), _rules())


def test_expect_or_fail_unique_key(spark):
    dup = spark.range(5).select(
        (F.col("id") % 2).alias("id"), F.lit("x").alias("name"),
        F.lit(1).alias("v"),
    )
    with pytest.raises(ValueError, match="id_duplicates=3"):
        expect_or_fail(dup, _rules(), unique_key="id")


def test_write_with_expectations_routes_and_counts(spark, tmp_path):
    t, q = str(tmp_path / "main"), str(tmp_path / "quarantine")
    r = write_with_expectations(spark, _dirty(spark), _rules(), t, q)
    assert r["version"] == 1 and r["quarantine_version"] == 1
    assert r["n_valid"] + r["n_quarantined"] == 100
    assert r["by_rule"] == {"name_null": 10, "v_out_of_range": 15}
    main = read_version(spark, t)
    assert main.columns == ["id", "name", "v"]
    assert main.count() == r["n_valid"]
    quar = read_version(spark, q)
    assert "_violations" in quar.columns
    assert quar.count() == r["n_quarantined"]
    # no bad row reached main
    assert main.filter("name IS NULL OR v < 0").count() == 0


def test_write_with_expectations_appends_accumulate(spark, tmp_path):
    t, q = str(tmp_path / "main"), str(tmp_path / "quarantine")
    write_with_expectations(spark, _dirty(spark), _rules(), t, q)
    r2 = write_with_expectations(spark, _dirty(spark), _rules(), t, q)
    assert r2["version"] == 2 and r2["quarantine_version"] == 2
    assert read_version(spark, t).count() == 2 * r2["n_valid"]
    assert read_version(spark, q).count() == 2 * r2["n_quarantined"]


def test_write_with_expectations_clean_run_skips_quarantine_commit(
    spark, tmp_path
):
    t, q = str(tmp_path / "main"), str(tmp_path / "quarantine")
    clean = spark.range(9).select(
        F.col("id"), F.lit("x").alias("name"), F.col("id").alias("v")
    )
    r = write_with_expectations(spark, clean, _rules(), t, q)
    assert r["quarantine_version"] is None and r["n_quarantined"] == 0
    assert versions(q) == []  # not even an empty version committed


def test_matches_rule_quarantines_bad_format(spark, tmp_path):
    df = spark.range(6).select(
        F.col("id"),
        F.concat(F.lit("u"), F.col("id")).alias("name"),
        F.col("id").alias("v"),
        F.when(F.col("id") % 2 == 0, F.concat(F.col("id"), F.lit("@x.com")))
        .otherwise(F.lit("not-an-email"))
        .alias("email"),
    )
    rules = [matches("email", r"^[^@]+@[^@]+$")]
    _, quarantined = enforce(df, rules)
    assert {r["id"] for r in quarantined.collect()} == {1, 3, 5}
