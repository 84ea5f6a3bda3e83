"""Connected components / duplicate clusters (operators/graph.py).

Brute-force oracle: driver-side union-find over the same edge list —
the Spark labeling must match exactly (min-id per component is unique).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from xarray_dataaccessor_spark.operators.graph import (
    connected_components,
    duplicate_clusters,
)


def _uf_components(edges: list[tuple[int, int]]) -> dict[int, int]:
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # normalize: min id in component
    return {n: find(n) for n in list(parent)}


def _spark_cc(
    spark, edges: list[tuple[int, int]], threshold: int | None = None
) -> dict[int, int]:
    """Default threshold=None forces pure star rounds; tests that cover
    the hybrid endgame pass the library default explicitly."""
    df = spark.createDataFrame(edges, "id_a bigint, id_b bigint")
    out = connected_components(df, small_edge_threshold=threshold).collect()
    return {int(r["node"]): int(r["component"]) for r in out}


def test_two_components(spark):
    edges = [(1, 2), (2, 3), (10, 11)]
    assert _spark_cc(spark, edges) == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_chain_collapses_to_min(spark):
    # adversarial diameter: a 40-node path — min-label propagation would
    # need 40 rounds; alternating stars converge in O(log^2 n)
    edges = [(i, i + 1) for i in range(40)]
    got = _spark_cc(spark, edges)
    assert got == {i: 0 for i in range(41)}


def test_self_loops_and_duplicates_ignored(spark):
    edges = [(5, 5), (1, 2), (2, 1), (1, 2)]
    got = _spark_cc(spark, edges)
    assert got == {1: 1, 2: 1}


def test_empty_edges(spark):
    df = spark.createDataFrame([], "id_a bigint, id_b bigint")
    assert connected_components(df).count() == 0


def test_random_graphs_match_union_find(spark):
    # deterministic LCG edge generator, several densities
    for seed, n_nodes, n_edges in [(7, 30, 15), (11, 50, 60), (13, 80, 40)]:
        s = seed
        edges = []
        for _ in range(n_edges):
            s = (s * 1103515245 + 12345) % (2**31)
            a = s % n_nodes
            s = (s * 1103515245 + 12345) % (2**31)
            b = s % n_nodes
            if a != b:
                edges.append((a, b))
        want = _uf_components(edges)
        # star rounds and the union-find endgame must agree with the
        # oracle AND each other
        assert _spark_cc(spark, edges) == want, (seed, n_nodes, n_edges)
        assert _spark_cc(spark, edges, threshold=1 << 21) == want, (
            seed,
            n_nodes,
            n_edges,
        )


def test_endgame_after_contraction_rounds(spark):
    # threshold below the initial symmetric edge count: the first star
    # rounds run distributed, then the contracted set drops under the
    # threshold and the union-find endgame finishes — including nodes
    # the contracted edges no longer mention (root fill-in)
    edges = [(i, i + 1) for i in range(60)] + [(100, 101)]
    want = _uf_components(edges)
    got = _spark_cc(spark, edges, threshold=40)
    assert got == want


def test_duplicate_clusters_canonical_and_sizes(spark):
    edges = [(3, 1), (1, 2), (9, 8)]
    df = spark.createDataFrame(edges, "id_a bigint, id_b bigint")
    rows = {
        int(r["doc_id"]): (
            int(r["cluster_id"]),
            int(r["cluster_size"]),
            bool(r["is_canonical"]),
        )
        for r in duplicate_clusters(df).collect()
    }
    assert rows == {
        1: (1, 3, True),
        2: (1, 3, False),
        3: (1, 3, False),
        8: (8, 2, True),
        9: (8, 2, False),
    }


def test_nonconvergence_raises(spark):
    df = spark.createDataFrame([(1, 2), (2, 3)], "id_a bigint, id_b bigint")
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(df, max_iters=0)


def test_string_ids_through_endgame(spark):
    """Non-numeric ids must work through BOTH paths: the star rounds are
    type-agnostic and the union-find endgame now derives its schema from
    the edge column type (previously hard-coded bigint)."""
    edges = [("a", "b"), ("b", "c"), ("x", "y")]
    df = spark.createDataFrame(edges, "id_a string, id_b string")
    for threshold in (None, 1 << 21):
        out = connected_components(df, small_edge_threshold=threshold).collect()
        got = {r["node"]: r["component"] for r in out}
        assert got == {"a": "a", "b": "a", "c": "a", "x": "x", "y": "x"}
