"""Golden replay — run the Spark books transform on the reference's
committed raw dump and compare row-for-row with its committed output
(reference output/raw_data.json → output/transform_data.parquet,
SURVEY.md §5.2 check 1). Order-insensitive, null-aware, float-exact."""

from __future__ import annotations

import math
import os

import pandas as pd
import pytest

from bigbookapi_etl_with_airflow_and_snowflake_spark.operators.transforms import (
    read_raw_books,
    transform_books,
)

RAW = "/root/reference/output/raw_data.json"
GOLDEN = "/root/reference/output/transform_data.parquet"

pytestmark = pytest.mark.skipif(
    not (os.path.exists(RAW) and os.path.exists(GOLDEN)),
    reason="reference fixtures not present",
)


def _normalize(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf.copy()
    for c in ("genres", "author_id", "author_name"):
        pdf[c] = pdf[c].map(lambda v: None if v is None else list(v))
    return pdf.sort_values("id").reset_index(drop=True)


def test_golden_replay(spark):
    got = _normalize(transform_books(read_raw_books(spark, RAW)).toPandas())
    want = _normalize(pd.read_parquet(GOLDEN))

    assert list(got.columns) == list(want.columns)
    assert len(got) == len(want) == 157

    for col in want.columns:
        for i, (g, w) in enumerate(zip(got[col], want[col])):
            if col == "rating":
                assert (w is None and g is None) or math.isclose(
                    g, w, rel_tol=0, abs_tol=0
                ), f"rating row {i}: {g!r} != {w!r} (must be bit-exact)"
            elif isinstance(w, float) and math.isnan(w):
                assert g is None or (isinstance(g, float) and math.isnan(g))
            else:
                assert g == w or (g is None and w is None), (
                    f"{col} row {i}: {g!r} != {w!r}"
                )


def test_subtitle_dropped_and_schema(spark):
    df = transform_books(read_raw_books(spark, RAW))
    assert df.columns == [
        "id", "title", "image", "genres", "rating", "author_id", "author_name",
    ]
    types = dict(df.dtypes)
    assert types["id"] == "bigint"
    assert types["rating"] == "double"
    assert types["author_id"] == "array<string>"
