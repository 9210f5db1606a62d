"""Connected-components operator tests (operators/graph.py)."""

from __future__ import annotations

from nfl_predictions_spark.operators.graph import connected_components


def test_cc_transitive_chain_and_islands(spark):
    # chain 1-2-3-4 (labels must travel 3 hops), pair 10-11, and the
    # direction of the edge must not matter (20 <- 30 given reversed)
    edges = spark.createDataFrame(
        [(2, 1), (2, 3), (3, 4), (10, 11), (30, 20)], "src long, dst long"
    )
    got = {
        r["id"]: r["component"]
        for r in connected_components(edges, "src", "dst").collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 20: 20, 30: 20}


def test_cc_converges_on_cycle(spark):
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1)], "src long, dst long"
    )
    got = {
        r["id"]: r["component"]
        for r in connected_components(edges, "src", "dst", max_iter=10).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1}
