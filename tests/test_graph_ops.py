"""Unit tests for operators/graph.py: hand-computed PageRank fixpoints,
a known triangle census, and skyline brute-force equivalence.

The plans-layer twins (pagerank_copurchase, triangle_count_coparts,
recursive_ancestor_depth, skyline_orders, value_anomaly_events) are
oracle-checked by tests/test_entry_contract.py like every queries()
entry; these tests pin the operator semantics on graphs small enough
to verify by hand.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from fsc_etl_spark.operators.graph import (
    bfs_hops,
    pagerank_integer,
    skyline_2d,
    triangle_stats,
)


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src string, dst string")


def test_pagerank_two_iterations_hand_computed(spark):
    # a->b, a->c, b->c, c->a ; deg a=2, b=1, c=1, init 1e9, d=85/100.
    # iter1: a=1e9, b=575_000_000, c=1_425_000_000
    # iter2: a=1_361_250_000, b=575_000_000, c=1_063_750_000
    edges = _edges(spark, [("a", "b"), ("a", "c"), ("b", "c"), ("c", "a")])
    got = {
        r["node"]: r["rank"]
        for r in pagerank_integer(edges, iters=2).collect()
    }
    assert got == {"a": 1_361_250_000, "b": 575_000_000, "c": 1_063_750_000}


def test_pagerank_symmetric_cycle_is_fixpoint(spark):
    # In a 2-cycle every node keeps exactly init_rank: inflow == init,
    # base + 85% of init == init with these integers.
    edges = _edges(spark, [("x", "y"), ("y", "x")])
    got = {r["node"]: r["rank"] for r in pagerank_integer(edges, iters=3).collect()}
    assert got == {"x": 10**9, "y": 10**9}


def test_pagerank_dedups_duplicate_edges(spark):
    e1 = _edges(spark, [("x", "y"), ("y", "x")])
    e2 = _edges(spark, [("x", "y"), ("x", "y"), ("y", "x")])
    r1 = {r["node"]: r["rank"] for r in pagerank_integer(e1, iters=2).collect()}
    r2 = {r["node"]: r["rank"] for r in pagerank_integer(e2, iters=2).collect()}
    assert r1 == r2


def test_pagerank_dense_fast_path_matches_general(spark):
    # symmetrised graph: the no-nodes-join fast path must be identical
    edges = _edges(
        spark,
        [("a", "b"), ("b", "a"), ("b", "c"), ("c", "b"), ("a", "c"), ("c", "a"), ("c", "d"), ("d", "c")],
    )
    slow = {r["node"]: r["rank"] for r in pagerank_integer(edges, iters=3).collect()}
    fast = {
        r["node"]: r["rank"]
        for r in pagerank_integer(edges, iters=3, every_node_has_inflow=True).collect()
    }
    assert slow == fast


def test_triangle_stats_known_graph(spark):
    # Triangle 1-2-3 plus pendant 3-4; reversed duplicates and a
    # self-loop must be canonicalised away.
    edges = _edges(
        spark,
        [
            ("1", "2"),
            ("2", "3"),
            ("1", "3"),
            ("3", "4"),
            ("2", "1"),  # reverse dup
            ("4", "3"),  # reverse dup
            ("2", "2"),  # self-loop
        ],
    )
    row = triangle_stats(edges).collect()[0]
    assert (row["n_nodes"], row["n_edges"], row["n_wedges"], row["n_triangles"]) == (
        4,
        4,
        5,
        1,
    )


def test_triangle_stats_empty(spark):
    row = triangle_stats(_edges(spark, []).filter(F.lit(False))).collect()[0]
    assert (row["n_nodes"], row["n_edges"], row["n_wedges"], row["n_triangles"]) == (
        0,
        0,
        0,
        0,
    )


def test_bfs_hops_min_distance_and_bound(spark):
    # chain a->b->c->d->e plus shortcut a->c: dist(c)=1 via shortcut,
    # e is beyond max_hops=3 from a and must be absent.
    edges = _edges(
        spark, [("a", "b"), ("b", "c"), ("c", "d"), ("d", "e"), ("a", "c")]
    )
    src = spark.createDataFrame([("a",)], "node string")
    got = {r["node"]: r["dist"] for r in bfs_hops(edges, src, max_hops=3).collect()}
    assert got == {"a": 0, "b": 1, "c": 1, "d": 2, "e": 3}
    got2 = {r["node"]: r["dist"] for r in bfs_hops(edges, src, max_hops=2).collect()}
    assert got2 == {"a": 0, "b": 1, "c": 1, "d": 2}


def test_bfs_hops_disconnected_source(spark):
    # a source that never appears in the edge list is still reported
    # at distance 0 and reaches nothing.
    edges = _edges(spark, [("x", "y")])
    src = spark.createDataFrame([("z",)], "node string")
    got = {r["node"]: r["dist"] for r in bfs_hops(edges, src, max_hops=2).collect()}
    assert got == {"z": 0}


def _brute_skyline(rows):
    # keep (p, d): no other (p2, d2) with p2 <= p, d2 >= d, strict somewhere
    best = {}
    for p, d in rows:
        best[p] = max(best.get(p, d), d)
    pts = sorted(best.items())
    keep = []
    for p, d in pts:
        if not any(p2 < p and d2 >= d for p2, d2 in pts):
            keep.append((p, d))
    return sorted(keep)


@pytest.mark.parametrize("n_parts", [1, 7])
def test_skyline_matches_bruteforce_and_is_partition_invariant(spark, n_parts):
    rows = [
        (5, 10),
        (5, 12),  # same price: only max date survives per price
        (3, 12),  # dominates the two above (cheaper, same best date)
        (3, 11),
        (7, 15),
        (9, 15),  # dominated by (7, 15): pricier, same date
        (1, 1),
        (2, 1),  # dominated by (1, 1)
        (8, 14),  # dominated by (7, 15)
    ]
    df = spark.createDataFrame(rows, "price long, odate long").repartition(n_parts)
    got = sorted(
        (r["price"], r["odate"]) for r in skyline_2d(df, "price", "odate").collect()
    )
    assert got == _brute_skyline(rows) == [(1, 1), (3, 12), (7, 15)]


def test_skyline_single_row(spark):
    df = spark.createDataFrame([(4, 4)], "price long, odate long")
    assert [(r["price"], r["odate"]) for r in skyline_2d(df, "price", "odate").collect()] == [
        (4, 4)
    ]
