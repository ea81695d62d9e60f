"""Empty-corpus sweep: every registry entry must either return a valid
(possibly empty) result or fail with a clean, documented ValueError /
RuntimeError — never an engine-level crash. The driver corpus is never
empty, but a library user's partition of it will be."""

from __future__ import annotations

import pytest

from bigbookapi_etl_with_airflow_and_snowflake_spark.queries import REGISTRY

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()

# Entries whose contract REQUIRES data (documented ValueError/RuntimeError
# on an empty corpus): sampling needs total weight ≥ k, clustering and
# IVF need at least one vector to train on, LM scoring needs a
# non-empty reference slice (empty vocab degenerates the smoothing).
EXPECT_RAISE = {
    "corpus_manifest",  # composes lm_quality's reference-LM gate
    "ccnet_buckets",  # same: buckets are cut over the reference-LM score
    "lm_quality",
    "pps_sample_orders",
    "dsir_sample",  # same: no bigram-bearing docs → no weight line to draw from
    "semantic_dedup",
    "semantic_dedup_scaled",  # ceil(0/8)=0 → the target guard raises
    "kmeans_clusters",
    "kmeans_assign_init",
    "cluster_balanced_sample",
    "cluster_sample_init",
    "ivf_topk",
    "ivf_topk_exact",
    "pq_codes",  # PQ codebooks need k_codes vectors to derive from
    "pq_topk",
    "pq_topk_fixed",
    "bm25_topk",  # corpus stats degenerate (N = 0, avgdl undefined)
    "versioned_optimize",  # packing zero rows is a documented refusal
    "versioned_optimize_incremental",  # same empty-snapshot refusal
    "versioned_rename_stats",  # its incremental optimize shares that refusal
    "versioned_nested_stats",  # same empty-snapshot optimize refusal
    "versioned_changes_recorded",  # its COW update shares the empty-snapshot refusal
    "maintenance_advisor",  # its optimize step shares that refusal
    "versioned_scoped_dml",  # update on an empty snapshot is a documented refusal
    "versioned_replace_where",  # empty incoming + derived scope: nothing says what to replace
    "snapshot_drift_events",  # drift needs a non-empty REFERENCE to define bins
    "streaming_cdf_rewrites",  # its COW update shares the empty-snapshot refusal
    "wap_drift_gate",  # same: the audit's reference snapshot is empty
}


@pytest.fixture(scope="module")
def empty_dir(spark, sf_dir, tmp_path_factory):
    d = tmp_path_factory.mktemp("empty_corpus")
    for t in TABLES:
        spark.read.parquet(f"{sf_dir}/{t}.parquet").limit(0).write.parquet(
            str(d / f"{t}.parquet")
        )
    return str(d)


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_entry_survives_empty_corpus(spark, empty_dir, name):
    fn = REGISTRY[name][0]
    if name in EXPECT_RAISE:
        with pytest.raises((ValueError, RuntimeError)):
            fn(spark, empty_dir).count()
    else:
        assert fn(spark, empty_dir).count() >= 0


@pytest.fixture(scope="module")
def dirty_dir(spark, sf_dir, tmp_path_factory):
    """Corpus with realistic dirt: null/empty/whitespace document text,
    null event values and props. Keys stay intact."""
    from pyspark.sql import functions as F

    d = tmp_path_factory.mktemp("dirty_corpus")
    for t in TABLES:
        df = spark.read.parquet(f"{sf_dir}/{t}.parquet")
        if t == "documents":
            df = df.withColumn(
                "text",
                F.when(F.col("doc_id") % 7 == 0, F.lit(None))
                .when(F.col("doc_id") % 7 == 1, F.lit(""))
                .when(F.col("doc_id") % 7 == 2, F.lit("   "))
                .otherwise(F.col("text")),
            )
        if t == "events":
            df = df.withColumn(
                "value",
                F.when(F.col("event_id") % 5 == 0, F.lit(None)).otherwise(
                    F.col("value")
                ),
            ).withColumn(
                "props",
                F.when(F.col("event_id") % 6 == 0, F.lit(None)).otherwise(
                    F.col("props")
                ),
            )
        df.write.parquet(str(d / f"{t}.parquet"))
    return str(d)


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_entry_survives_dirty_corpus(spark, dirty_dir, name):
    fn = REGISTRY[name][0]
    try:
        assert fn(spark, dirty_dir).count() >= 0
    except (ValueError, RuntimeError):
        pass  # documented data-requirement errors are acceptable
