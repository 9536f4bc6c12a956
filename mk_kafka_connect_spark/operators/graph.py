"""Iterative graph algorithms over edge lists — PageRank.

The connected-components operator (dedup.py::dedup_clusters' min-label
propagation) covers reachability; PageRank is the other canonical
iterative Spark workload: repeated node-sized shuffles over an edge
relation that never grows.

Exactness contract: ranks are INTEGER-scaled (1e12 total mass) and every
step uses integer floor division, so the result is bit-identical across
engines, partitionings, and reruns — no float accumulation anywhere.
Classic float PageRank is order-dependent in the contribution sum; the
integer form trades ~1e-12 relative resolution for determinism, which is
what a hash-compared (and incident-reproducible) pipeline needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["pagerank"]

SCALE = 10**12


def pagerank(
    edges: DataFrame,
    iterations: int = 3,
    damping_num: int = 85,
    damping_den: int = 100,
) -> DataFrame:
    """Integer-scaled PageRank over a directed edge list (``src``/``dst``
    long columns; feed both directions for an undirected graph).

    pr0(v)  = SCALE // N
    pr'(v)  = ((den-num) * pr0) // den  +  (num * S(v)) // den,
    S(v)    = sum over incoming u of (pr(u) // outdeg(u))

    Every node is assumed to have outgoing edges (true for undirected
    graphs fed as both directions — no dangling-node mass correction
    needed). Cost per iteration: one edge-sized join on src + one
    node-sized aggregation on dst — the minimal shuffle structure; the
    edge relation is localCheckpointed once so iterations don't replay
    its derivation. At 100 TB the same plan holds: edges partition by
    src, ranks by node, both bounded by the graph — never the fact data
    that derived it.

    Returns (node, pr) with pr on the SCALE-integer scale.
    """
    edges = edges.select(
        F.col("src").cast("long").alias("src"), F.col("dst").cast("long").alias("dst")
    ).localCheckpoint(eager=False)
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    nodes = edges.select(F.col("src").alias("node")).distinct()
    n_nodes = nodes.agg(F.count(F.lit(1)).alias("n"))
    # 1-row broadcast: the init/base constants depend on N.
    pr = nodes.crossJoin(n_nodes).select(
        "node", F.expr(f"CAST({SCALE} AS BIGINT) DIV n").alias("pr")
    )
    base = (
        nodes.crossJoin(n_nodes)
        .select(
            "node",
            F.expr(
                f"({damping_den - damping_num} * (CAST({SCALE} AS BIGINT) DIV n))"
                f" DIV {damping_den}"
            ).alias("base"),
        )
    )
    for _ in range(iterations):
        contribs = (
            edges.join(pr, edges.src == pr.node)
            .join(deg, "src")
            .select(F.col("dst").alias("node"), F.expr("pr DIV deg").alias("contrib"))
        )
        summed = contribs.groupBy("node").agg(F.sum("contrib").alias("s"))
        pr = base.join(summed, "node", "left").select(
            "node",
            (
                F.col("base")
                + F.expr(f"({damping_num} * coalesce(s, CAST(0 AS BIGINT))) DIV {damping_den}")
            ).alias("pr"),
        )
    return pr
