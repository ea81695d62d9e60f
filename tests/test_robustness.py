"""Robustness: the books path degrades gracefully on malformed input
(the reference's JSON-decode guard, reference scripts/extract.py:45-50,
generalized — bad input yields empty/partial results, never a crashed
job)."""

from __future__ import annotations

import pytest

from bigbookapi_etl_with_airflow_and_snowflake_spark.operators.transforms import (
    read_raw_books,
    transform_books,
)


def _run(spark, tmp_path, content: str):
    p = tmp_path / "raw.json"
    p.write_text(content)
    return transform_books(read_raw_books(spark, str(p)))


def test_invalid_json_yields_empty(spark, tmp_path):
    out = _run(spark, tmp_path, "this is not json {]")
    assert out.count() == 0


def test_empty_array_yields_empty(spark, tmp_path):
    assert _run(spark, tmp_path, "[]").count() == 0


def test_empty_wrapper_rows_are_dropped(spark, tmp_path):
    # the reference's `[][0]` would raise; we drop the empty wrapper
    content = '[[], [{"id": "1", "title": "ok", "genres": ["g"], "authors": [], "rating": {"average": "0.5"}}]]'
    out = _run(spark, tmp_path, content)
    rows = out.collect()
    assert len(rows) == 1 and rows[0]["id"] == 1 and rows[0]["rating"] == 50.0


def test_partial_garbage_fields_null_not_crash(spark, tmp_path):
    # garbage id and rating null out (try_cast), row survives
    content = '[[{"id": "garbage", "title": "t", "genres": [], "authors": [{"id": 7, "name": "a"}], "rating": {"average": "oops"}}]]'
    rows = _run(spark, tmp_path, content).collect()
    assert len(rows) == 1
    assert rows[0]["id"] is None and rows[0]["rating"] is None
    assert rows[0]["author_id"] == ["7"]


def test_float_string_id_truncates(spark, tmp_path):
    # T5 parity: int(float("3.9")) == 3
    content = '[[{"id": "3.9", "title": "t", "genres": [], "authors": [], "rating": {"average": "1"}}]]'
    rows = _run(spark, tmp_path, content).collect()
    assert rows[0]["id"] == 3 and rows[0]["rating"] == 100.0
