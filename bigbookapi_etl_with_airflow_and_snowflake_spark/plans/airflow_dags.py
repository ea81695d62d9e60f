"""Airflow orchestration shim: the reference's three DAGs, re-declared
over the Spark pipelines.

The reference deploys as dockerized Airflow with three DAGs
(`dags/bigbookapi.py:47-54`, `dags/db_to_snowflake.py:20-27`, and the
pyc-recovered `huggingface_model_etl`); its task graphs pass file paths
through XCom between worker processes. Here each DAG body is a single
Spark lineage (plans/pipelines.py), so the Airflow layer shrinks to
*scheduling metadata*: dag id, schedule, catchup, per-task timeout,
retry policy — exactly what the reference encodes.

Airflow is not a runtime dependency of the engine: `build_dags` takes
the DAG/operator constructors as parameters, so production passes
`airflow.DAG` / `PythonOperator` while tests pass fakes. The spec list
(`DAG_SPECS`) is plain data and is what tests lock.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from datetime import timedelta
from typing import Any, Callable


@dataclass(frozen=True)
class TaskSpec:
    """One schedulable unit. ``fn`` receives the pipeline context dict
    (spark session + paths/sinks) — payload data flows through the Spark
    lineage, never through XCom (the reference's path-through-XCom is an
    artifact of its per-task worker processes; SURVEY.md §3)."""

    task_id: str
    fn_name: str  # attribute on plans.pipelines driven by this task
    execution_timeout: timedelta
    retries: int = 1
    retry_delay: timedelta = timedelta(seconds=2)


@dataclass(frozen=True)
class DagSpec:
    dag_id: str
    schedule: str
    catchup: bool
    tasks: tuple[TaskSpec, ...]
    # linear chains, matching the reference wiring (extract >> transform
    # >> load at dags/bigbookapi.py:195, two-task chain at
    # db_to_snowflake.py:137)
    chain: tuple[str, ...] = field(default_factory=tuple)


DAG_SPECS: tuple[DagSpec, ...] = (
    DagSpec(
        # reference dags/bigbookapi.py:48-54: @daily, catchup off,
        # 5-minute per-task execution_timeout (:77,:121,:190)
        dag_id="bigbookapi_etl",
        schedule="@daily",
        catchup=False,
        tasks=(
            TaskSpec("extract_bigbookapi_data", "books_pipeline", timedelta(minutes=5)),
            TaskSpec("transform_bigbookapi_data", "books_pipeline", timedelta(minutes=5)),
            TaskSpec("load_bigbookapi_data", "books_pipeline", timedelta(minutes=5)),
        ),
        chain=(
            "extract_bigbookapi_data",
            "transform_bigbookapi_data",
            "load_bigbookapi_data",
        ),
    ),
    DagSpec(
        # reference dags/db_to_snowflake.py:20-27: @daily, catchup off,
        # 3-minute timeouts (:62,:132)
        dag_id="DataDB_to_snowflake",
        schedule="@daily",
        catchup=False,
        tasks=(
            TaskSpec("extract_data_postgres", "warehouse_sync", timedelta(minutes=3)),
            TaskSpec("load_data_into_snowflake", "warehouse_sync", timedelta(minutes=3)),
        ),
        chain=("extract_data_postgres", "load_data_into_snowflake"),
    ),
    DagSpec(
        # reference huggingface_extract.py:19-25 (pyc): @daily chain of
        # extract → transform → load
        dag_id="huggingface_model_etl",
        schedule="@daily",
        catchup=False,
        tasks=(
            TaskSpec("extract_huggingface_models", "models_pipeline", timedelta(minutes=5)),
            TaskSpec("transform_huggingface_models", "models_pipeline", timedelta(minutes=5)),
            TaskSpec("load_huggingface_models", "models_pipeline", timedelta(minutes=5)),
        ),
        chain=(
            "extract_huggingface_models",
            "transform_huggingface_models",
            "load_huggingface_models",
        ),
    ),
)


def build_dags(
    dag_cls: Callable[..., Any],
    operator_cls: Callable[..., Any],
    callables: dict[str, Callable[..., Any]],
) -> list[Any]:
    """Materialize DAG_SPECS with the given constructors.

    ``dag_cls(dag_id=..., schedule=..., catchup=...)`` and
    ``operator_cls(task_id=..., python_callable=..., execution_timeout=...,
    retries=..., retry_delay=..., dag=...)`` mirror `airflow.DAG` /
    `PythonOperator`; tests pass lightweight fakes. ``callables`` maps
    ``fn_name`` → the callable the operator runs (production binds the
    Spark pipeline with its session/paths/sinks).

    Chains are wired with ``>>`` when the operator supports it (Airflow
    and faithful fakes), else recorded via ``set_downstream``.
    """
    dags = []
    for spec in DAG_SPECS:
        dag = dag_cls(dag_id=spec.dag_id, schedule=spec.schedule, catchup=spec.catchup)
        ops = {}
        for t in spec.tasks:
            ops[t.task_id] = operator_cls(
                task_id=t.task_id,
                python_callable=callables[t.fn_name],
                execution_timeout=t.execution_timeout,
                retries=t.retries,
                retry_delay=t.retry_delay,
                dag=dag,
            )
        for up, down in zip(spec.chain, spec.chain[1:]):
            if hasattr(ops[up], "__rshift__"):
                ops[up] >> ops[down]
            else:  # pragma: no cover - airflow-compatible fakes define >>
                ops[up].set_downstream(ops[down])
        dags.append(dag)
    return dags


def airflow_dags(callables: dict[str, Callable[..., Any]]) -> list[Any]:
    """Build real Airflow DAGs (import-gated; raises ImportError where
    airflow isn't installed — e.g. this CI container)."""
    from airflow import DAG  # noqa: PLC0415 (gated)
    from airflow.operators.python import PythonOperator  # noqa: PLC0415

    return build_dags(DAG, PythonOperator, callables)
