"""Known-graph contracts for operators/graph.py::triangle_counts."""

from __future__ import annotations

from mk_kafka_connect_spark.operators.graph import triangle_counts


def _counts(spark, edges):
    df = spark.createDataFrame(edges, "src long, dst long")
    return {
        r.node: (r.deg, r.n_triangles)
        for r in triangle_counts(df).collect()
    }


def test_k4_has_four_triangles_three_per_node(spark):
    k4 = [(a, b) for a in range(4) for b in range(4) if a < b]
    got = _counts(spark, k4)
    assert got == {i: (3, 3) for i in range(4)}


def test_diamond_counts_two_triangles(spark):
    # K4 minus edge (0,3): triangles {0,1,2} and {1,2,3}; nodes 1,2 in
    # both, nodes 0,3 in one.
    edges = [(0, 1), (0, 2), (1, 2), (1, 3), (2, 3)]
    got = _counts(spark, edges)
    assert got == {0: (2, 1), 1: (3, 2), 2: (3, 2), 3: (2, 1)}


def test_triangle_free_graph_is_all_zero(spark):
    # 4-cycle: degrees 2, no triangles.
    edges = [(0, 1), (1, 2), (2, 3), (0, 3)]
    got = _counts(spark, edges)
    assert got == {i: (2, 0) for i in range(4)}


def test_star_graph_survives_orientation(spark):
    # Star (worst case for natural orientation): hub 0, leaves 1..6.
    edges = [(0, i) for i in range(1, 7)]
    got = _counts(spark, edges)
    assert got[0] == (6, 0)
    assert all(got[i] == (1, 0) for i in range(1, 7))
