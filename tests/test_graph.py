"""Graph operators: connected components + PageRank."""

import pytest

from dataflow_spark.core.registry import get_operator


def test_connected_components_two_islands(spark):
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (12, 11)], ["src", "dst"])
    op = get_operator("ConnectedComponentsOperator", {})
    got = {r["id"]: r["component"] for r in op.run(edges).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 12: 10}


def test_connected_components_chain(spark):
    # long chain: the shape that defeats naive min-label propagation
    n = 200
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(n)], ["src", "dst"])
    op = get_operator("ConnectedComponentsOperator", {})
    got = op.run(edges).collect()
    assert len(got) == n + 1
    assert {r["component"] for r in got} == {0}


def test_pagerank_star(spark):
    # star: hub 0 <- leaves 1..4 (directed toward hub); hub dominates
    edges = spark.createDataFrame(
        [(i, 0) for i in range(1, 5)], ["src", "dst"])
    op = get_operator("PageRankOperator", {"n_iter": 5})
    got = {r["node"]: r["pagerank"] for r in op.run(edges).collect()}
    assert len(got) == 5
    assert got[0] == max(got.values())
    assert all(got[i] == got[1] for i in range(2, 5))  # leaves tie
    # total mass <= 1 (hub is dangling: its mass is retained, not
    # redistributed, so sum stays bounded)
    assert sum(got.values()) <= 1.0 + 1e-6


def test_pagerank_uniform_on_cycle(spark):
    # directed 4-cycle: uniform distribution is the fixed point
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (3, 0)], ["src", "dst"])
    op = get_operator("PageRankOperator", {"n_iter": 8})
    got = [r["pagerank"] for r in op.run(edges).collect()]
    assert all(abs(p - 0.25) < 1e-9 for p in got)


def test_pagerank_validates_args():
    with pytest.raises(ValueError):
        get_operator("PageRankOperator", {"damping": 1.5})
    with pytest.raises(ValueError):
        get_operator("PageRankOperator", {"n_iter": -1})
