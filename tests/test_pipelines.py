"""End-to-end pipeline tests (SURVEY.md §3): each reference DAG runs as
one Spark lineage against fakes — P1 from the golden raw dump, P2 with a
recording warehouse load, P3 through fake listings into a sqlite upsert.
"""

from __future__ import annotations

import sqlite3

import pytest

from pyspark.sql import functions as F

from bigbookapi_etl_with_airflow_and_snowflake_spark.plans.pipelines import (
    books_pipeline,
    models_pipeline,
    warehouse_sync,
)
from bigbookapi_etl_with_airflow_and_snowflake_spark.sinks.jdbc import JdbcUpsertWriter

GOLDEN_RAW = "/root/reference/output/raw_data.json"
GOLDEN_PARQUET = "/root/reference/output/transform_data.parquet"


def test_books_pipeline_golden_end_to_end(spark, tmp_path):
    loaded = {}
    silver = books_pipeline(
        spark,
        raw_json_path=GOLDEN_RAW,
        silver_parquet_path=str(tmp_path / "silver"),
        load=lambda df: loaded.update(n=df.count()),
    )
    assert loaded["n"] == 157
    want = spark.read.parquet(GOLDEN_PARQUET)
    got = {r["id"]: r for r in silver.collect()}
    exp = {r["id"]: r for r in want.collect()}
    assert set(got) == set(exp)
    for k in got:
        assert got[k]["rating"] == exp[k]["rating"]  # bit-exact ×100 rescale
        assert got[k]["author_id"] == exp[k]["author_id"]


def test_books_pipeline_with_transport(spark, tmp_path):
    # extract stage: fake API returning wrapped single-element-list records
    def transport(offset, number):
        if offset >= 3:
            return [], {}
        recs = [
            [{
                "id": str(i), "title": f"t{i}", "image": None, "subtitle": None,
                "authors": [{"id": i, "name": f"a{i}"}], "genres": ["g"],
                "rating": {"average": "0.5"},
            }]
            for i in range(offset, min(offset + number, 3))
        ]
        return recs, {}

    from bigbookapi_etl_with_airflow_and_snowflake_spark.sources.rest import FetchPolicy

    silver = books_pipeline(
        spark,
        raw_json_path=str(tmp_path / "raw.json"),
        silver_parquet_path=str(tmp_path / "silver"),
        transport=transport,
        policy=FetchPolicy(page_size=100, inter_page_sleep=0),
    )
    rows = silver.orderBy("id").collect()
    assert [r["id"] for r in rows] == [0, 1, 2]
    assert rows[0]["rating"] == 50.0
    assert rows[0]["author_id"] == ["0"]
    assert "subtitle" not in silver.columns  # T4 drop


def test_warehouse_sync_counts_and_validates(spark, sf_dir, tmp_path):
    from bigbookapi_etl_with_airflow_and_snowflake_spark.sources.files import read_table

    loads = []
    n = warehouse_sync(
        extract=lambda: read_table(spark, sf_dir, "nation"),
        staging_parquet_path=str(tmp_path / "stage"),
        load=lambda df: loads.append(df.count()),
    )
    assert n == 25 and loads == [25]

    with pytest.raises(ValueError):
        warehouse_sync(
            extract=lambda: read_table(spark, sf_dir, "nation").filter(F.lit(False)),
            staging_parquet_path=str(tmp_path / "stage_empty"),
            load=lambda df: None,
        )


def test_models_pipeline_dedup_and_upsert(spark, tmp_path):
    fakes = [
        {"id": "org/dup", "author": "org", "pipeline_tag": "x", "tags": [],
         "lastModified": "2026-01-05 00:00:00"},
        {"id": "org/dup", "author": "org", "pipeline_tag": "older", "tags": [],
         "lastModified": "2026-01-01 00:00:00"},
        {"id": "", "author": "bad", "pipeline_tag": None, "tags": [],
         "lastModified": "2026-01-02 00:00:00"},  # T11: dropped
        {"id": "acme/ok", "author": "", "pipeline_tag": "qa", "tags": ["t"],
         "lastModified": "2026-01-03 00:00:00"},
    ]
    db = str(tmp_path / "models.db")
    writer = JdbcUpsertWriter(
        lambda path=db: sqlite3.connect(path, timeout=30),
        table="ai_models",
        key_cols=["model_id"],
        paramstyle="?",
        ensure_columns=[
            ("model_id", "VARCHAR(255)"),
            ("author", "VARCHAR(255)"),
            ("pipeline_tag", "VARCHAR(255)"),
            ("tags", "TEXT"),
            ("last_modified", "TIMESTAMP"),
        ],
    )

    def upsert(df):
        writer.write(df.withColumn("tags", F.to_json("tags")))

    out = models_pipeline(
        spark, lister=lambda n: fakes[:n], limit=4, upsert=upsert
    )
    rows = {r["model_id"]: r for r in out.collect()}
    # D1 keep-first under last_modified desc: the newer org/dup wins
    assert rows["org/dup"]["pipeline_tag"] == "x"
    assert rows["acme/ok"]["author"] is None  # T9 falsy→null
    assert "" not in rows and len(rows) == 2

    con = sqlite3.connect(db)
    assert con.execute("SELECT COUNT(*) FROM ai_models").fetchone()[0] == 2
    con.close()


# ---------------------------------------------------------------------------
# Airflow orchestration shim
# ---------------------------------------------------------------------------


class _FakeDag:
    def __init__(self, **kw):
        self.kw = kw
        self.tasks = []


class _FakeOp:
    def __init__(self, **kw):
        self.kw = kw
        self.downstream = []
        kw["dag"].tasks.append(self)

    def __rshift__(self, other):
        self.downstream.append(other.kw["task_id"])
        return other


def test_airflow_dag_specs_match_reference():
    """The scheduling metadata mirrors the reference DAGs: ids, @daily
    cadence, catchup off, task chains, and per-task timeouts
    (bigbookapi.py:48-54,77; db_to_snowflake.py:20-27,62; hf pyc:19-25)."""
    from datetime import timedelta

    from bigbookapi_etl_with_airflow_and_snowflake_spark.plans.airflow_dags import (
        DAG_SPECS,
        build_dags,
    )

    by_id = {s.dag_id: s for s in DAG_SPECS}
    assert set(by_id) == {"bigbookapi_etl", "DataDB_to_snowflake", "huggingface_model_etl"}
    assert all(s.schedule == "@daily" and not s.catchup for s in DAG_SPECS)
    assert by_id["bigbookapi_etl"].tasks[0].execution_timeout == timedelta(minutes=5)
    assert by_id["DataDB_to_snowflake"].tasks[0].execution_timeout == timedelta(minutes=3)

    calls = []
    dags = build_dags(
        _FakeDag,
        _FakeOp,
        {
            "books_pipeline": lambda: calls.append("p1"),
            "warehouse_sync": lambda: calls.append("p2"),
            "models_pipeline": lambda: calls.append("p3"),
        },
    )
    assert len(dags) == 3
    p1 = next(d for d in dags if d.kw["dag_id"] == "bigbookapi_etl")
    ids = [t.kw["task_id"] for t in p1.tasks]
    assert ids == [
        "extract_bigbookapi_data",
        "transform_bigbookapi_data",
        "load_bigbookapi_data",
    ]
    # chain wired extract >> transform >> load (reference :195)
    assert p1.tasks[0].downstream == ["transform_bigbookapi_data"]
    assert p1.tasks[1].downstream == ["load_bigbookapi_data"]
    for t in p1.tasks:
        t.kw["python_callable"]()
    assert calls == ["p1", "p1", "p1"]


def test_airflow_dags_gated_import():
    """Without airflow installed the builder must raise a clear
    ImportError (not NameError later); with airflow present it must
    build — the gate is on the import, not the environment."""
    import importlib.util

    import pytest as _pytest

    from bigbookapi_etl_with_airflow_and_snowflake_spark.plans.airflow_dags import airflow_dags

    if importlib.util.find_spec("airflow") is not None:
        assert airflow_dags({}) is not None
    else:
        with _pytest.raises(ImportError):
            airflow_dags({})
