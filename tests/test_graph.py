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


def test_cluster_survivors_keep_longest(spark):
    """q134: every reported cluster has >= 2 members, the survivor holds
    at least the per-member average of the dropped token mass (it is the
    LONGEST member), and survivors are members of their own cluster
    (survivor >= component id, the cluster's min doc_id)."""
    from nfl_predictions_spark.operators.graph import (
        q134_cluster_dedup_survivors,
    )
    from tests.conftest import SF_SMOKE

    rows = q134_cluster_dedup_survivors(spark, SF_SMOKE).collect()
    assert rows, "expected planted near-dup clusters"
    for r in rows:
        assert r.cluster_size >= 2
        assert r.survivor >= r.component
        avg_dropped = r.dropped_tokens / (r.cluster_size - 1)
        assert r.kept_tokens >= avg_dropped


def test_bfs_levels_chain_and_unreachable(spark):
    """Hop levels on a known chain; the disconnected island never
    appears; a converging path takes the SHORTEST route."""
    from nfl_predictions_spark.operators.graph import bfs_levels

    # 1-2-3-4 chain plus shortcut 1-3, island 10-11
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (1, 3), (10, 11)], "src long, dst long"
    )
    got = {r["id"]: r["level"] for r in bfs_levels(edges, "src", "dst", 1).collect()}
    assert got == {1: 0, 2: 1, 3: 1, 4: 2}


def test_bfs_levels_respects_max_iter(spark):
    from nfl_predictions_spark.operators.graph import bfs_levels

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 8)], "src long, dst long"
    )
    got = {
        r["id"]: r["level"]
        for r in bfs_levels(edges, "src", "dst", 1, max_iter=3).collect()
    }
    assert max(got.values()) == 3 and got == {1: 0, 2: 1, 3: 2, 4: 3}


def test_kcore_every_survivor_meets_threshold(spark):
    """Every node in the returned 3-core has degree >= 3 within the
    surviving subgraph, and the result is a fixpoint (recomputing
    degrees over the survivor-restricted edges changes nothing)."""
    from collections import defaultdict

    from nfl_predictions_spark.operators.graph import _KCORE_K, q294_kcore

    rows = q294_kcore(spark, "/root/testdata/sf0.001").collect()
    core = {r.l_partkey: r.core_degree for r in rows}
    assert core, "3-core unexpectedly empty at sf0.001"
    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet").collect()
    from itertools import combinations

    orders = defaultdict(set)
    for l in li:
        orders[l.l_orderkey].add(l.l_partkey)
    mult = defaultdict(int)
    for parts in orders.values():
        for a, b in combinations(sorted(parts), 2):
            mult[(a, b)] += 1
    adj = defaultdict(set)
    for (a, b), m in mult.items():
        if m >= 2:
            adj[a].add(b)
            adj[b].add(a)
    for node, deg in core.items():
        in_core = {n for n in adj[node] if n in core}
        assert deg == len(in_core)
        assert deg >= _KCORE_K
