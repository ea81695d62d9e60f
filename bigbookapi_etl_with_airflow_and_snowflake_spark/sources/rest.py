"""Paginated REST source (S1) — the reference's BigBookAPI extractor
re-expressed for Spark (reference scripts/extract.py:11-72).

Two tiers, one policy object:

- :func:`fetch_pages` — driver-side sequential fetch, faithful to the
  reference's semantics: offset pagination (page size from policy),
  stop on empty page, stop on quota header, retry-on-connection-error
  with fixed backoff, inter-page delay. Right for quota-bounded APIs
  (the reference's quota is 50 requests/day — parallelism is pointless).
- :func:`fetch_pages_distributed` — the scale path for APIs that allow
  parallel readers: ``spark.range(n_pages)`` partitions the page space
  across executors; each partition fetches its pages through the same
  transport via ``mapInPandas`` and yields Arrow batches. A per-executor
  rate budget (pages/sec) throttles politely; the global quota must be
  pre-split (``pages_per_task``) because executors share no state.

The HTTP transport is injected as a picklable callable
``(offset, number) -> (records, headers)`` so tests run a fake and
production passes a requests-backed one; the Spark plumbing is identical.
"""

from __future__ import annotations

import time
from collections.abc import Callable, Iterator, Sequence
from dataclasses import dataclass
from typing import Any

from pyspark.sql import DataFrame, SparkSession

Transport = Callable[[int, int], tuple[list[dict], dict]]


@dataclass(frozen=True)
class FetchPolicy:
    """Reference pagination/quota policy (scripts/extract.py + DAG params
    dags/bigbookapi.py:25-34)."""

    page_size: int = 100
    max_requests: int = 50          # quota ceiling (X-API-Quota-Used == 50)
    quota_header: str = "X-API-Quota-Used"
    inter_page_sleep: float = 1.0   # politeness delay (reference: 1 s)
    retry_backoff: float = 2.0      # on connection error (reference: 2 s)
    max_retries: int = 3


def fetch_pages(
    transport: Transport,
    policy: FetchPolicy = FetchPolicy(),
    sleep: Callable[[float], None] = time.sleep,
) -> list[dict]:
    """Driver-side paginated fetch; returns the concatenated record list
    (D4 page union, order-preserving)."""
    data: list[dict] = []
    offset = 0
    for _ in range(policy.max_requests):
        records, headers = _call_with_retry(transport, offset, policy, sleep)
        if not records:
            break
        data.extend(records)
        quota = headers.get(policy.quota_header)
        if quota is not None and int(float(quota)) >= policy.max_requests:
            break
        offset += policy.page_size
        if policy.inter_page_sleep:
            sleep(policy.inter_page_sleep)
    return data


def _call_with_retry(
    transport: Transport,
    offset: int,
    policy: FetchPolicy,
    sleep: Callable[[float], None],
) -> tuple[list[dict], dict]:
    last_err: Exception | None = None
    for _ in range(policy.max_retries):
        try:
            return transport(offset, policy.page_size)
        except ConnectionError as e:  # reference retries only conn errors
            last_err = e
            sleep(policy.retry_backoff)
    raise ConnectionError(f"transport failed after {policy.max_retries} retries") from last_err


def fetch_to_dataframe(
    spark: SparkSession,
    transport: Transport,
    schema,
    policy: FetchPolicy = FetchPolicy(),
    sleep: Callable[[float], None] = time.sleep,
) -> DataFrame:
    """Driver-side fetch → typed DataFrame (no inference)."""
    return spark.createDataFrame(fetch_pages(transport, policy, sleep), schema)


def fetch_pages_distributed(
    spark: SparkSession,
    transport: Transport,
    schema,
    n_pages: int,
    policy: FetchPolicy = FetchPolicy(),
    pages_per_second: float | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """Distributed page fetch: the page-number space is a ``spark.range``
    partitioned across executors; each task fetches its pages through
    ``transport`` and emits Arrow record batches.

    ``pages_per_second`` is a *per-task* politeness budget — with P
    parallel tasks the API sees ≤ P × pages_per_second requests/sec, so
    callers size ``num_partitions`` to the API's global allowance.
    """
    import pandas as pd

    page_size = policy.page_size
    field_names = [f.name for f in schema.fields]
    min_interval = (1.0 / pages_per_second) if pages_per_second else 0.0

    def fetch_partition(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        last_call = 0.0
        for pdf in batches:
            for page_no in pdf["id"]:
                wait = min_interval - (time.monotonic() - last_call)
                if wait > 0:
                    time.sleep(wait)
                last_call = time.monotonic()
                records, _headers = transport(int(page_no) * page_size, page_size)
                if records:
                    yield pd.DataFrame.from_records(
                        [{k: r.get(k) for k in field_names} for r in records]
                    )

    pages = spark.range(n_pages)
    if num_partitions is not None:
        pages = pages.repartition(num_partitions)
    return pages.mapInPandas(fetch_partition, schema)


def union_pages(page_dfs: Sequence[DataFrame]) -> DataFrame:
    """D4 — order-preserving union of page batches."""
    import functools

    return functools.reduce(DataFrame.unionByName, page_dfs)
