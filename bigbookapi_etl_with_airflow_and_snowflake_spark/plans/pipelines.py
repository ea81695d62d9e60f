"""The reference's three DAGs as Spark lineages (SURVEY.md §3).

Each Airflow DAG of worker-process tasks passing file paths through XCom
becomes one function over a SparkSession: lazy DataFrame lineage, with
materialization only at the *semantic* persistence points the reference
has (bronze raw dump, silver parquet) — those are audit-trail contracts,
not execution necessities.

Sinks are injected so the same pipeline runs against Postgres in
production and sqlite/fakes in CI (SURVEY.md §7 "Snowflake semantics
without Snowflake in CI").
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from ..operators.dedup import keep_first_dedup
from ..operators.transforms import read_raw_books, standardize_models, transform_books
from ..sinks.files import write_parquet
from ..sources.rest import FetchPolicy, Transport, fetch_pages

from pyspark.sql import functions as F


def books_pipeline(
    spark: SparkSession,
    raw_json_path: str,
    silver_parquet_path: str,
    load: Callable[[DataFrame], None] | None = None,
    transport: Transport | None = None,
    policy: FetchPolicy = FetchPolicy(),
) -> DataFrame:
    """P1 `bigbookapi_etl` (reference dags/bigbookapi.py:48-195):
    extract (optional, when ``transport`` given) → bronze JSON →
    transform (T1-T8) → silver parquet → load (injected sink, K3).

    Returns the transformed DataFrame (the silver read-back, so the
    returned lineage matches what the sink consumed).
    """
    if transport is not None:
        import json

        records = fetch_pages(transport, policy)
        # bronze: persist the raw dump verbatim (audit contract, K1)
        with open(raw_json_path, "w") as f:
            json.dump(records, f)

    raw = read_raw_books(spark, raw_json_path)
    books = transform_books(raw)
    write_parquet(books, silver_parquet_path, coalesce=1)
    silver = spark.read.parquet(silver_parquet_path)
    if load is not None:
        load(silver)
    return silver


def warehouse_sync(
    extract: Callable[[], DataFrame],
    staging_parquet_path: str,
    load: Callable[[DataFrame], None],
    validate: bool = True,
) -> int:
    """P2 `DataDB_to_snowflake` (reference dags/db_to_snowflake.py:20-137):
    database extract → staging parquet → warehouse bulk load →
    row-count validation. Returns the loaded row count.

    ``extract`` is a JDBC read in production
    (``sources.jdbc.read_jdbc_table``); ``load`` is the Snowflake
    connector write (``sinks.snowflake``) or a fake in CI.
    """
    df = extract()
    write_parquet(df, staging_parquet_path, coalesce=1)
    staged = df.sparkSession.read.parquet(staging_parquet_path)
    load(staged)
    n = staged.count()
    if validate and n == 0:
        raise ValueError("warehouse_sync: 0 rows loaded")  # reference :120-125
    return n


def models_pipeline(
    spark: SparkSession,
    raw_models: DataFrame | None = None,
    lister=None,
    limit: int = 50,
    upsert: Callable[[DataFrame], None] | None = None,
) -> DataFrame:
    """P3 `huggingface_model_etl` (reference huggingface_extract.py (pyc)):
    top-k listing (S5) → standardize (T9-T11) → deterministic keep-first
    dedup (D1, ordered by last_modified desc like the API order) →
    idempotent upsert (K6, injected).
    """
    if raw_models is None:
        from ..sources.huggingface import read_top_models

        raw_models = read_top_models(spark, limit, lister)
    models = keep_first_dedup(
        standardize_models(raw_models),
        ["model_id"],
        [F.desc_nulls_last("last_modified")],
    )
    if upsert is not None:
        upsert(models)
    return models
