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


# ---------------------------------------------------------------------------
# PageRank + centrality canonical election
# ---------------------------------------------------------------------------
def _py_pagerank(edges, n_iters=3, d=0.85):
    """Driver-side mirror of the decimal-disciplined fixed-iteration
    PageRank (round(contrib, 9) summed exactly, ranks rounded to 6)."""
    from decimal import Decimal

    sym = set()
    for a, b in edges:
        if a != b:
            sym.add((a, b))
            sym.add((b, a))
    nodes = sorted({u for u, _ in sym})
    deg = {u: sum(1 for s, _ in sym if s == u) for u in nodes}
    n = len(nodes)
    r = {u: round(1.0 / n, 6) for u in nodes}
    for _ in range(n_iters):
        acc = {u: Decimal(0) for u in nodes}
        for u, v in sym:
            acc[v] += Decimal(repr(round(r[u] / deg[u], 9)))
        base = (1.0 - d) / n
        r = {u: round(base + d * float(acc[u]), 6) for u in nodes}
    return r


def test_pagerank_hand_computed_path_graph(spark):
    from xarray_dataaccessor_spark.operators.graph import pagerank

    edges = [(1, 2), (2, 3)]
    df = spark.createDataFrame(edges, "id_a bigint, id_b bigint")
    got = {r["node"]: r["pr"] for r in pagerank(df, n_iters=3).collect()}
    assert got == _py_pagerank(edges)
    # path centre is the most central node
    assert got[2] > got[1] == got[3]


def test_pagerank_star_centre_wins_and_mass_conserved(spark):
    from xarray_dataaccessor_spark.operators.graph import pagerank

    edges = [(0, i) for i in range(1, 6)]
    df = spark.createDataFrame(edges, "id_a bigint, id_b bigint")
    got = {r["node"]: r["pr"] for r in pagerank(df, n_iters=4).collect()}
    assert got[0] == max(got.values())
    assert abs(sum(got.values()) - 1.0) < 1e-4  # rounding-bounded drift
    assert got == _py_pagerank(edges, n_iters=4)


def test_pagerank_partition_invariance(spark):
    from xarray_dataaccessor_spark.operators.graph import pagerank

    edges = [(i, (i * 7 + 3) % 20) for i in range(40) if i != (i * 7 + 3) % 20]
    df = spark.createDataFrame(edges, "id_a bigint, id_b bigint")
    a = sorted(map(tuple, pagerank(df, n_iters=3).collect()))
    b = sorted(map(tuple, pagerank(df.repartition(11), n_iters=3).collect()))
    assert a == b


def test_pagerank_duckdb_replay(spark):
    """Fixed-iteration PageRank replays exactly in SQL (the oracle-slot
    discipline, exercised here on a nontrivial graph)."""
    import duckdb
    import pandas as pd

    from xarray_dataaccessor_spark.operators.graph import pagerank

    edges = [(i, (i * i + 1) % 15) for i in range(30)
             if i != (i * i + 1) % 15]
    df = spark.createDataFrame(edges, "id_a bigint, id_b bigint")
    got = pagerank(df, n_iters=3).toPandas().sort_values("node")
    con = duckdb.connect()
    con.register("edges", pd.DataFrame(edges, columns=["id_a", "id_b"]))
    oracle = con.execute("""
        WITH sym AS (
            SELECT id_a AS u, id_b AS v FROM edges WHERE id_a <> id_b
            UNION
            SELECT id_b, id_a FROM edges WHERE id_a <> id_b
        ),
        deg AS (SELECT u, COUNT(*) AS dg FROM sym GROUP BY u),
        nn AS (SELECT COUNT(*) AS n FROM deg),
        pr0 AS (SELECT u, round(1.0 / n, 6) AS r FROM deg CROSS JOIN nn),
        pr1 AS (SELECT s.v AS u,
                       round((CAST(1 AS DOUBLE) - 0.85) / n
                             + 0.85 * CAST(SUM(CAST(round(p.r / d.dg, 9)
                                   AS DECIMAL(28,14))) AS DOUBLE), 6) AS r
                FROM sym s JOIN pr0 p ON p.u = s.u JOIN deg d ON d.u = s.u
                CROSS JOIN nn GROUP BY s.v, n),
        pr2 AS (SELECT s.v AS u,
                       round((CAST(1 AS DOUBLE) - 0.85) / n
                             + 0.85 * CAST(SUM(CAST(round(p.r / d.dg, 9)
                                   AS DECIMAL(28,14))) AS DOUBLE), 6) AS r
                FROM sym s JOIN pr1 p ON p.u = s.u JOIN deg d ON d.u = s.u
                CROSS JOIN nn GROUP BY s.v, n),
        pr3 AS (SELECT s.v AS u,
                       round((CAST(1 AS DOUBLE) - 0.85) / n
                             + 0.85 * CAST(SUM(CAST(round(p.r / d.dg, 9)
                                   AS DECIMAL(28,14))) AS DOUBLE), 6) AS r
                FROM sym s JOIN pr2 p ON p.u = s.u JOIN deg d ON d.u = s.u
                CROSS JOIN nn GROUP BY s.v, n)
        SELECT u AS node, r AS pr FROM pr3 ORDER BY node
    """).fetchdf()
    assert list(got["node"]) == list(oracle["node"])
    assert list(got["pr"]) == list(oracle["pr"])


def test_centrality_canonicals_election(spark):
    """Star cluster: the hub wins the canonical election even when it
    does not have the smallest id; singleton-free output matches the
    component structure of duplicate_clusters."""
    from xarray_dataaccessor_spark.operators.graph import (
        centrality_canonicals,
        duplicate_clusters,
    )

    # hub 9 connected to 1,2,3; separate pair (20, 21)
    edges = [(9, 1), (9, 2), (9, 3), (20, 21)]
    df = spark.createDataFrame(edges, "id_a bigint, id_b bigint")
    got = centrality_canonicals(df, n_iters=3).collect()
    by_id = {r["doc_id"]: r for r in got}
    assert by_id[9]["is_canonical"] and not by_id[1]["is_canonical"]
    # min-id policy would have crowned 1 — the policies really differ
    dc = {r["doc_id"]: r["is_canonical"]
          for r in duplicate_clusters(df).collect()}
    assert dc[1] and not dc[9]
    # pair cluster: equal ranks -> tie to the smaller id
    assert by_id[20]["is_canonical"] and not by_id[21]["is_canonical"]
    # cluster ids / sizes agree with the min-id labeling
    assert by_id[9]["cluster_id"] == 1 and by_id[9]["cluster_size"] == 4
    assert by_id[21]["cluster_id"] == 20 and by_id[21]["cluster_size"] == 2


# ---------------------------------------------------------------------------
# Euler-tour subtree sizes (round 8)
# ---------------------------------------------------------------------------
def _sizes(spark, edges, threshold=None):
    from xarray_dataaccessor_spark.operators.graph import subtree_sizes

    df = spark.createDataFrame(edges, "node bigint, parent bigint")
    kw = {} if threshold is None else {"small_edge_threshold": threshold}
    return {r["node"]: r["subtree_size"]
            for r in subtree_sizes(df, **kw).collect()}


@pytest.mark.parametrize("threshold", [None, 0])
def test_subtree_sizes_path(spark, threshold):
    # 0 <- 1 <- 2 <- 3 (root 0); both the endgame (default threshold)
    # and the distributed Euler tour (threshold=0) paths
    got = _sizes(spark, [(1, 0), (2, 1), (3, 2)], threshold=threshold)
    assert got == {3: 1, 2: 2, 1: 3, 0: 4}


def test_subtree_sizes_star_and_binary(spark):
    got = _sizes(spark, [(1, 0), (2, 0), (3, 0), (4, 0)])
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 0: 5}
    # balanced binary tree of 7
    got = _sizes(spark, [(1, 0), (2, 0), (3, 1), (4, 1), (5, 2), (6, 2)])
    assert got == {3: 1, 4: 1, 5: 1, 6: 1, 1: 3, 2: 3, 0: 7}


def test_subtree_sizes_forest_and_random(spark):
    import random

    rng = random.Random(11)
    edges = []
    # 3 random trees over disjoint id ranges
    for base in (0, 1000, 2000):
        n = rng.randint(5, 40)
        for i in range(1, n):
            edges.append((base + i, base + rng.randrange(i)))
    got = _sizes(spark, edges)
    assert got == _sizes(spark, edges, threshold=0)  # tour == endgame
    # python mirror
    children = {}
    for c, p in edges:
        children.setdefault(p, []).append(c)
    import sys

    sys.setrecursionlimit(10000)

    def size(v):
        return 1 + sum(size(c) for c in children.get(v, ()))

    nodes = {c for c, _ in edges} | {p for _, p in edges}
    for v in nodes:
        assert got[v] == size(v), v
    # conservation: each root's size == its tree's node count
    assert got[0] + got[1000] + got[2000] == len(nodes)


def test_subtree_sizes_deep_path_converges_in_log_rounds(spark, monkeypatch):
    """300-node path: pointer doubling must converge in ~log2(600)+1
    join rounds, not O(depth)."""
    from pyspark.sql import DataFrame
    from xarray_dataaccessor_spark.operators.graph import subtree_sizes

    joins = {"n": 0}
    orig = DataFrame.join

    def counting(self, *a, **kw):
        joins["n"] += 1
        return orig(self, *a, **kw)

    monkeypatch.setattr(DataFrame, "join", counting)
    edges = [(i, i - 1) for i in range(1, 300)]
    df = spark.createDataFrame(edges, "node bigint, parent bigint")
    out = {r["node"]: r["subtree_size"]
           for r in subtree_sizes(df, small_edge_threshold=0).collect()}
    assert out[0] == 300 and out[299] == 1
    # setup joins (~4) + ceil(log2(598))=10 doubling rounds + 1
    # fixed-point + result-assembly joins (~3)
    assert joins["n"] <= 20, joins["n"]


@pytest.mark.parametrize("threshold", [None, 0])
def test_subtree_sizes_grouped_forests_never_mix(spark, threshold):
    """group_col scopes independent forests: identical node ids in two
    groups resolve independently on both the endgame and tour paths."""
    from xarray_dataaccessor_spark.operators.graph import subtree_sizes

    edges = (
        [("a", 1, 0), ("a", 2, 1), ("a", 3, 2)]        # path of 4 in a
        + [("b", 1, 0), ("b", 2, 0), ("b", 3, 0)]      # star of 4 in b
    )
    df = spark.createDataFrame(edges, "grp string, node bigint, parent bigint")
    kw = {} if threshold is None else {"small_edge_threshold": threshold}
    got = {(r["grp"], r["node"]): r["subtree_size"]
           for r in subtree_sizes(df, group_col="grp", **kw).collect()}
    assert got[("a", 0)] == 4 and got[("a", 3)] == 1 and got[("a", 1)] == 3
    assert got[("b", 0)] == 4
    assert all(got[("b", i)] == 1 for i in (1, 2, 3))
    assert len(got) == 8
