"""Plan-shape locks for the round-5 late additions: the scale posture
each operator claims is asserted against the physical plan."""

from __future__ import annotations

from bigbookapi_etl_with_airflow_and_snowflake_spark import queries as Q
from bigbookapi_etl_with_airflow_and_snowflake_spark.plans.introspect import (
    explain_str,
    has_broadcast_join,
    shuffle_count,
)

REG = Q.queries()


def test_pure_map_text_ops_are_exchange_free(spark, sf_dir):
    # html_strip / url_parts / unicode_nfc / chunk_documents are single
    # narrow map stages: no Exchange of any kind in the plan
    for name in ["html_strip", "url_parts", "unicode_nfc", "chunk_documents"]:
        plan = explain_str(REG[name](spark, sf_dir), "simple")
        assert "Exchange" not in plan, f"{name} plan shuffles:\n{plan}"


def test_stable_ids_never_single_partition(spark, sf_dir):
    # the whole point of the two-pass prefix sum: no global window, no
    # SinglePartition exchange anywhere in the executed lineage
    df = REG["stable_row_ids"](spark, sf_dir)
    plan = explain_str(df, "simple")
    assert "Exchange SinglePartition" not in plan
    assert "Window" not in plan


def test_pps_sample_never_single_partition(spark, sf_dir):
    df = REG["pps_sample_orders"](spark, sf_dir)
    plan = explain_str(df, "simple")
    assert "Exchange SinglePartition" not in plan
    assert "Window" not in plan


def test_weighted_sample_is_take_ordered(spark, sf_dir):
    plan = explain_str(REG["weighted_sample_orders"](spark, sf_dir), "simple")
    assert "TakeOrderedAndProject" in plan
    assert "Sort " not in plan  # no global sort feeding the limit


def test_outlier_screen_broadcasts_stats(spark, sf_dir):
    df = REG["outlier_events"](spark, sf_dir)
    assert has_broadcast_join(df)
    # one shuffle total: the group-stats aggregation; the fact scan
    # itself never repartitions
    assert shuffle_count(df) <= 1
    assert "Window" not in explain_str(df, "simple")


def test_snapshot_diff_is_one_join(spark, sf_dir):
    plan = explain_str(REG["snapshot_diff_orders"](spark, sf_dir), "simple")
    assert plan.count("FullOuter") == 1
    assert "Window" not in plan


def test_bpe_pair_counts_two_aggregations(spark, sf_dir):
    # word-freq collapse + pair-count aggregation: exactly two shuffles,
    # and the corpus-sized explode happens before the FIRST (so later
    # rounds never touch corpus rows)
    df = REG["bpe_pair_counts"](spark, sf_dir)
    assert shuffle_count(df) == 2
