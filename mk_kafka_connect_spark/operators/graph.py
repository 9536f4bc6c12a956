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

__all__ = ["pagerank", "triangle_counts"]

SCALE = 10**12


def pagerank(
    edges: DataFrame,
    iterations: int = 3,
    damping_num: int = 85,
    damping_den: int = 100,
    collapse_multiedges: bool = False,
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

    ``collapse_multiedges`` (r19, for MULTIGRAPH inputs like TextRank's
    word co-occurrence list where the same (src, dst) pair repeats once
    per co-occurrence): pre-aggregate the edge list to
    (src, dst, w=count) once, then run every iteration over the
    distinct-pair relation with each contribution scaled by w. Exactly
    equal by distributivity of integer multiplication over the
    instance sum: S(v) = Σ_instances pr(u)//deg(u)
    = Σ_distinct(u,v) w_uv · (pr(u)//deg(u)), and
    deg(u) = Σ_v w_uv. Off for simple graphs, where the extra
    aggregate buys nothing.

    Returns (node, pr) with pr on the SCALE-integer scale.
    """
    edges = edges.select(
        F.col("src").cast("long").alias("src"), F.col("dst").cast("long").alias("dst")
    )
    if collapse_multiedges:
        # One instance-sized aggregate, checkpointed; everything the
        # iterations touch from here on is distinct-pair-sized.
        edges = edges.groupBy("src", "dst").agg(F.count(F.lit(1)).alias("w"))
    edges = edges.localCheckpoint(eager=False)
    # r18 optimization note: checkpointing deg / a fused init relation /
    # per-iteration pr was MEASURED SLOWER here (min-of-runs 1.60 s →
    # 1.82 s at sf0.1): at 3 fixed iterations the re-derived subtrees
    # are node-sized aggregates over the edges checkpoint, cheaper than
    # their materialization. For deep or data-dependent fixpoints the
    # per-round checkpoint discipline (plans/graph.py BFS/LPA) remains
    # the right call.
    deg = edges.groupBy("src").agg(
        (F.sum("w") if collapse_multiedges else F.count(F.lit(1))).alias("deg")
    )
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
    # r19 cadence A/B at the TextRank site (VERDICT r18 #2): per-
    # iteration pr checkpoints measured SLOWER there too (min-of-3
    # 3.32 s vs 2.63 s at sf0.1) — with collapsed edges every
    # iteration relation is vocabulary-sized, so re-derivation beats
    # materialization exactly as it did for graph_pagerank in r18.
    # No per-iteration checkpoint on either path.
    contrib_expr = "w * (pr DIV deg)" if collapse_multiedges else "pr DIV deg"
    for _ in range(iterations):
        contribs = (
            edges.join(pr, edges.src == pr.node)
            .join(deg, "src")
            .select(F.col("dst").alias("node"), F.expr(contrib_expr).alias("contrib"))
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


def triangle_counts(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """Exact per-node triangle counts over an undirected simple graph
    given as unique pairs with ``src < dst`` — the node-iterator++
    algorithm (Schank & Wagner 2005; the standard distributed
    formulation, e.g. Suri & Vassilvitskii's MapReduce variant):

    1. orient every edge from the endpoint with smaller (degree, id) to
       the larger — each triangle now has exactly ONE wedge node whose
       two oriented out-edges form it, so nothing is double-counted and,
       critically for scale, out-degrees are bounded by O(sqrt(m)):
       wedge generation is Σ outdeg² = O(m^1.5) worst case instead of
       the Σ deg² a star graph explodes under natural orientation;
    2. wedges = oriented ⋈ oriented on the wedge node (one self equi-join);
    3. triangles = wedges ⋈ oriented on the closing pair (one equi-join);
    4. per-node counts = each triangle credits its three members (map-side
       explode + one keyed sum).

    Everything is integer arithmetic over equi-joins — no theta join, no
    iteration — and therefore replays exactly in SQL.

    Returns (node, deg, n_triangles).
    """
    a, b = F.col(src), F.col(dst)
    # Diamond discipline: the edge relation reappears under every
    # downstream branch, but its derivation ends in the SAME aggregate
    # exchange each time, so runtime exchange reuse already dedups the
    # copies — an explicit localCheckpoint was measured SLOWER here
    # (3.8 s vs 2.3 s at sf0.1: block-manager writes cost more than the
    # reuse saves). What is NOT reused is a unionAll's repeated map work
    # over the relation — so both multi-reader passes below use a single
    # explode instead of unionAll branches.
    # Both endpoints in ONE pass via explode, not a unionAll that scans
    # the edge relation twice.
    deg = (
        edges.select(F.explode(F.array(a, b)).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    da = deg.select(F.col("node").alias(src), F.col("deg").alias("_da"))
    db = deg.select(F.col("node").alias(dst), F.col("deg").alias("_db"))
    ranked = edges.join(da, src).join(db, dst)
    lt = (F.col("_da") < F.col("_db")) | (
        (F.col("_da") == F.col("_db")) & (a < b)
    )
    oriented = ranked.select(
        F.when(lt, a).otherwise(b).alias("u"),
        F.when(lt, b).otherwise(a).alias("v"),
        F.when(lt, F.col("_da")).otherwise(F.col("_db")).alias("_du"),
        F.when(lt, F.col("_db")).otherwise(F.col("_da")).alias("_dv"),
    )
    # Wedge node = u; its two out-neighbors ordered by the same (deg, id)
    # rank so each unordered out-pair appears once.
    e1 = oriented.select(
        F.col("u"), F.col("v").alias("w1"), F.col("_dv").alias("_d1")
    )
    e2 = oriented.select(
        F.col("u"), F.col("v").alias("w2"), F.col("_dv").alias("_d2")
    )
    wedges = e1.join(e2, "u").filter(
        (F.col("_d1") < F.col("_d2"))
        | ((F.col("_d1") == F.col("_d2")) & (F.col("w1") < F.col("w2")))
    )
    closing = oriented.select(
        F.col("u").alias("w1"), F.col("v").alias("w2")
    )
    tris = wedges.join(closing, ["w1", "w2"]).select("u", "w1", "w2")
    # Credit all three members in ONE pass over the triangle relation
    # (explode of a 3-array) instead of a 3-way unionAll that re-runs
    # the wedge/closing joins three times.
    members = (
        tris.select(
            F.explode(F.array(F.col("u"), F.col("w1"), F.col("w2"))).alias("node")
        )
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )
    return (
        deg.join(members, "node", "left")
        .select(
            "node",
            "deg",
            F.coalesce("n_triangles", F.lit(0)).alias("n_triangles"),
        )
    )
