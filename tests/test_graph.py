"""Contract tests for operators/graph.py::pagerank — exact-integer
semantics pinned against a pure-Python reference on a hand-built graph,
plus partitioning invariance (the determinism the integer form buys)."""

from __future__ import annotations

from mk_kafka_connect_spark.operators.graph import SCALE, pagerank

# Undirected star: 0 at the center, leaves 1..3.
STAR = [(0, 1), (0, 2), (0, 3)]


def _reference(edges_undirected, iterations=3):
    edges = edges_undirected + [(b, a) for a, b in edges_undirected]
    nodes = sorted({a for a, _ in edges})
    out = {v: sum(1 for a, _ in edges if a == v) for v in nodes}
    n = len(nodes)
    init = SCALE // n
    base = (15 * init) // 100
    pr = {v: init for v in nodes}
    for _ in range(iterations):
        s = {v: 0 for v in nodes}
        for a, b in edges:
            s[b] += pr[a] // out[a]
        pr = {v: base + (85 * s[v]) // 100 for v in nodes}
    return pr


def test_pagerank_matches_reference(spark):
    edges = spark.createDataFrame(
        STAR + [(b, a) for a, b in STAR], "src long, dst long"
    )
    got = {r.node: r.pr for r in pagerank(edges, iterations=3).collect()}
    assert got == _reference(STAR)
    # Center of the star outranks the leaves, and mass is conserved up to
    # the bounded floor losses (each floor drops < 1 unit per operand).
    assert got[0] > got[1] == got[2] == got[3]
    assert abs(sum(got.values()) - SCALE) < 100 * len(got)


def test_pagerank_partitioning_invariant(spark):
    edges = STAR + [(b, a) for a, b in STAR]
    one = spark.createDataFrame(edges, "src long, dst long").coalesce(1)
    many = spark.createDataFrame(edges, "src long, dst long").repartition(7)
    assert {(r.node, r.pr) for r in pagerank(one).collect()} == {
        (r.node, r.pr) for r in pagerank(many).collect()
    }
