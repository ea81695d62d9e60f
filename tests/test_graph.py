"""Fixed-point PageRank: determinism, mass conservation, known shapes."""

from __future__ import annotations

import pytest

from bigbookapi_etl_with_airflow_and_snowflake_spark.operators.graph import (
    pagerank_fixed,
)

SCALE = 10**15


def _ranks(spark, edges, iters, parts=4):
    df = spark.createDataFrame(edges, "src string, dst string").repartition(parts)
    return {r["node"]: r["rank_fp"] for r in pagerank_fixed(df, iters).collect()}


def test_star_hub_outranks_leaves(spark):
    # leaves all point at hub; hub points back at one leaf
    edges = [(f"l{i}", "hub") for i in range(10)] + [("hub", "l0")]
    r = _ranks(spark, edges, 5)
    assert r["hub"] > r["l0"] > r["l1"]
    assert len({r[f"l{i}"] for i in range(1, 10)}) == 1  # symmetry


def test_cycle_is_uniform(spark):
    edges = [(f"n{i}", f"n{(i + 1) % 6}") for i in range(6)]
    r = _ranks(spark, edges, 8)
    assert len(set(r.values())) == 1


def test_partition_invariance_bit_exact(spark):
    edges = [(f"a{i % 17}", f"a{(i * 7) % 17}") for i in range(60) if i % 17 != (i * 7) % 17]
    assert _ranks(spark, edges, 4, parts=1) == _ranks(spark, edges, 4, parts=13)


def test_mass_approximately_conserved(spark):
    # every node emits (bidirectional edges): floors leak < N per level
    base = [(f"n{i}", f"n{(i * 3 + 1) % 23}") for i in range(23)]
    edges = base + [(d, s) for s, d in base]
    r = _ranks(spark, edges, 6)
    total = sum(r.values())
    assert abs(total - SCALE) < SCALE * 1e-6


def test_pure_python_replay(spark):
    # independent replay of the integer recurrence
    edges = [("a", "b"), ("b", "c"), ("c", "a"), ("a", "c")]
    got = _ranks(spark, edges, 3)
    nodes = sorted({x for e in edges for x in e})
    n = len(nodes)
    r0 = SCALE // n
    jump = (15 * r0) // 100
    outdeg = {}
    for s, _ in edges:
        outdeg[s] = outdeg.get(s, 0) + 1
    r = {v: r0 for v in nodes}
    for _ in range(3):
        inflow = {v: 0 for v in nodes}
        for s, d in edges:
            inflow[d] += r[s] // outdeg[s]
        r = {v: jump + (85 * inflow[v]) // 100 for v in nodes}
    assert got == r


def test_zero_iters_is_uniform_start(spark):
    r = _ranks(spark, [("x", "y"), ("y", "x")], 0)
    assert r == {"x": SCALE // 2, "y": SCALE // 2}


def test_negative_iters_rejected(spark):
    df = spark.createDataFrame([("a", "b")], "src string, dst string")
    with pytest.raises(ValueError):
        pagerank_fixed(df, -1)
