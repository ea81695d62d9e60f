"""Local replica of the driver's correctness gate: run every registry
query on Spark AND its DuckDB oracle at sf0.001, compare row count,
column names, and order-insensitive values (columns sorted by name,
rows sorted by all columns)."""

from __future__ import annotations

import math

import duckdb
import pandas as pd
import pytest

from bigbookapi_etl_with_airflow_and_snowflake_spark.queries import REGISTRY

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


@pytest.fixture(scope="module")
def con(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _canon(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf[sorted(pdf.columns)].copy()
    for c in pdf.columns:
        if pdf[c].dtype == object:
            pdf[c] = pdf[c].map(lambda v: tuple(v) if isinstance(v, (list, tuple)) else v)
        elif str(pdf[c].dtype).startswith("datetime64"):
            pdf[c] = pdf[c].astype("datetime64[us]")
        elif pdf[c].dtype == bool:
            pdf[c] = pdf[c].astype("boolean")
    return pdf.sort_values(list(pdf.columns), na_position="last").reset_index(drop=True)


def _values_equal(a, b) -> bool:
    if a is None and b is None:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    try:
        if pd.isna(a) and pd.isna(b):
            return True
    except (TypeError, ValueError):
        pass
    return a == b


@pytest.mark.parametrize("name", list(REGISTRY))
def test_query_matches_oracle(spark, con, sf_dir, name):
    fn, sql = REGISTRY[name]
    got = fn(spark, sf_dir).toPandas()
    if sql is None:
        assert len(got) >= 0  # rows-only check, mirrors driver's weak mode
        return
    want = con.execute(sql).fetchdf()

    assert sorted(got.columns) == sorted(want.columns), (
        f"{name}: columns {sorted(got.columns)} != {sorted(want.columns)}"
    )
    assert len(got) == len(want), f"{name}: rows {len(got)} != {len(want)}"

    # The driver's value hash is dtype-KIND-sensitive: int widths and
    # datetime units are normalized (CORRECTNESS_r02: pii_scrub passed
    # with int32-vs-int64, large_orders with datetime ns-vs-us), but
    # int-vs-float is a hash mismatch (simhash_pairs int32-vs-float64,
    # pack_sequences int64-vs-float64 — DuckDB HUGEINT lands as float64
    # in pandas). Compare pandas dtype.kind ('i'/'u' merged).
    def _kind(dt):
        return "i" if dt.kind == "u" else dt.kind

    for col in sorted(got.columns):
        gk, wk = _kind(got[col].dtype), _kind(want[col].dtype)
        assert gk == wk, (
            f"{name}.{col}: spark dtype {got[col].dtype} (kind {gk}) != "
            f"oracle dtype {want[col].dtype} (kind {wk}) — driver hash will mismatch"
        )

    g, w = _canon(got), _canon(want)
    for col in g.columns:
        gv, wv = list(g[col]), list(w[col])
        bad = [
            (i, x, y) for i, (x, y) in enumerate(zip(gv, wv)) if not _values_equal(x, y)
        ]
        assert not bad, f"{name}.{col}: first mismatches {bad[:5]}"
