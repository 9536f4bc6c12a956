"""Graph analytics over relations: PageRank on the customer–supplier
bipartite graph. Companion to the connected-components operator in the
dedup family (min-label propagation); together they cover the two
canonical iterative-graph shapes — reachability and rank diffusion.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..operators.graph import SCALE, pagerank
from .registry import query

_ITER = 3


def _sql_pagerank_oracle() -> str:
    """Unrolled 3-iteration integer PageRank, mirroring operators/graph.py
    step for step (DuckDB ``//`` and Spark ``DIV`` agree on non-negative
    operands)."""
    it = """
    pr{k} AS (
      SELECT b.node, b.base + (85 * coalesce(s.s, 0)) // 100 AS pr
      FROM base b LEFT JOIN (
        SELECT e.dst AS node, sum(p.pr // d.deg) AS s
        FROM edges e JOIN pr{j} p ON e.src = p.node JOIN deg d ON e.src = d.src
        GROUP BY e.dst
      ) s ON b.node = s.node
    )"""
    iters = ",".join(it.format(k=k, j=k - 1) for k in range(1, _ITER + 1))
    return f"""
    WITH pairs AS (
      SELECT DISTINCT o_custkey, l_suppkey
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    ), edges AS (
      SELECT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst FROM pairs
      UNION ALL
      SELECT l_suppkey * 2 + 1 AS src, o_custkey * 2 AS dst FROM pairs
    ), deg AS (
      SELECT src, count(*) AS deg FROM edges GROUP BY src
    ), n AS (
      SELECT count(*) AS n FROM deg
    ), pr0 AS (
      SELECT d.src AS node, CAST({SCALE} AS BIGINT) // n.n AS pr FROM deg d, n
    ), base AS (
      SELECT d.src AS node, (15 * (CAST({SCALE} AS BIGINT) // n.n)) // 100 AS base
      FROM deg d, n
    ),{iters}
    SELECT CASE WHEN node % 2 = 0 THEN 'customer' ELSE 'supplier' END AS node_type,
      CAST(node // 2 AS BIGINT) AS key, CAST(pr AS BIGINT) AS pr
    FROM pr{_ITER}
    """


@query(
    "graph_pagerank",
    oracle=_sql_pagerank_oracle(),
    tags=("graph", "B6", "B7", "iterative", "scale"),
)
def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the bipartite customer–supplier purchase graph
    (undirected: distinct order-line (custkey, suppkey) pairs fed as both
    edge directions), 3 iterations, damping 0.85 — 'which suppliers sit
    at the center of the purchase network'.

    Integer-scaled (1e12 mass) with floor division at every step, so the
    ranks are bit-exact and the ENTIRE iteration replays in SQL — the
    oracle unrolls the same three steps. Shuffle profile per iteration:
    one edge-sized hash join on src + one node-sized aggregation on dst;
    the edge list derives once (localCheckpoint) from the orders⋈lineitem
    distinct reduction. The 1-row node-count broadcast seeds init/base."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    pairs = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .select("o_custkey", "l_suppkey")
        .distinct()
    )
    edges = pairs.select(
        (F.col("o_custkey") * 2).alias("src"), (F.col("l_suppkey") * 2 + 1).alias("dst")
    ).unionAll(
        pairs.select(
            (F.col("l_suppkey") * 2 + 1).alias("src"), (F.col("o_custkey") * 2).alias("dst")
        )
    )
    pr = pagerank(edges, iterations=_ITER)
    return pr.select(
        F.when(F.col("node") % 2 == 0, "customer").otherwise("supplier").alias("node_type"),
        F.expr("node DIV 2").alias("key"),
        "pr",
    )
