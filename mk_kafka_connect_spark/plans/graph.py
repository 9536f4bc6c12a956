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


_COPURCHASE_MIN = 4


def _sql_triangles_oracle() -> str:
    return f"""
    WITH os AS (
      SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem),
    edges AS (
      SELECT a.l_suppkey AS s, b.l_suppkey AS t
      FROM os a JOIN os b
        ON a.l_orderkey = b.l_orderkey AND a.l_suppkey < b.l_suppkey
      GROUP BY 1, 2 HAVING count(*) >= {_COPURCHASE_MIN}),
    deg AS (
      SELECT node, CAST(count(*) AS BIGINT) AS deg
      FROM (SELECT s AS node FROM edges UNION ALL SELECT t FROM edges)
      GROUP BY node),
    oriented AS (
      SELECT CASE WHEN da.deg < db.deg OR (da.deg = db.deg AND e.s < e.t)
                  THEN e.s ELSE e.t END AS u,
             CASE WHEN da.deg < db.deg OR (da.deg = db.deg AND e.s < e.t)
                  THEN e.t ELSE e.s END AS v,
             CASE WHEN da.deg < db.deg OR (da.deg = db.deg AND e.s < e.t)
                  THEN db.deg ELSE da.deg END AS dv
      FROM edges e
        JOIN deg da ON da.node = e.s
        JOIN deg db ON db.node = e.t),
    wedges AS (
      SELECT o1.u, o1.v AS w1, o2.v AS w2
      FROM oriented o1 JOIN oriented o2 ON o1.u = o2.u
      WHERE o1.dv < o2.dv OR (o1.dv = o2.dv AND o1.v < o2.v)),
    tris AS (
      SELECT w.u, w.w1, w.w2
      FROM wedges w JOIN oriented c ON w.w1 = c.u AND w.w2 = c.v),
    members AS (
      SELECT node, CAST(count(*) AS BIGINT) AS n_triangles
      FROM (SELECT u AS node FROM tris
            UNION ALL SELECT w1 FROM tris
            UNION ALL SELECT w2 FROM tris)
      GROUP BY node)
    SELECT d.node AS suppkey, d.deg,
           coalesce(m.n_triangles, 0) AS n_triangles,
           CASE WHEN d.deg >= 2 THEN
             CAST(2 * coalesce(m.n_triangles, 0) AS DOUBLE)
               / (d.deg * (d.deg - 1))
           ELSE 0.0 END AS clustering_coeff
    FROM deg d LEFT JOIN members m ON d.node = m.node
    """


@query(
    "graph_triangles",
    oracle=_sql_triangles_oracle(),
    tags=("graph", "B6", "B7", "triangles", "scale"),
)
def graph_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-supplier triangle counts and local clustering
    coefficients over the thresholded co-purchase graph (suppliers
    adjacent when they co-supply >= 4 distinct orders — thresholding is
    how real co-occurrence graphs stay sparse). 'How clique-ish is each
    supplier's neighborhood' — the community-structure diagnostic next
    to PageRank's centrality.

    Scale shape (operators/graph.py::triangle_counts): edges derive from
    a WITHIN-ORDER pair self-join (bounded by per-order supplier count,
    never a global cross product, same device as basket_brand_affinity);
    triangle enumeration is the degree-oriented node-iterator++ — after
    orienting every edge toward the higher (degree, id) endpoint,
    out-degrees are O(sqrt(m)), so the wedge self-join is O(m^1.5)
    worst-case instead of the star-graph blowup, and each triangle is
    found exactly once. Three equi-joins + keyed sums, all integer; the
    one IEEE division (coefficient) is the output cast both engines
    share."""
    from ..operators.graph import triangle_counts

    li = load_table(spark, sf_dir, "lineitem")
    os_ = li.select("l_orderkey", "l_suppkey").distinct()
    a = os_.select(
        F.col("l_orderkey").alias("o"), F.col("l_suppkey").alias("s")
    )
    b = os_.select(
        F.col("l_orderkey").alias("o"), F.col("l_suppkey").alias("t")
    )
    edges = (
        a.join(b, "o")
        .filter(F.col("s") < F.col("t"))
        .groupBy("s", "t")
        .agg(F.count(F.lit(1)).alias("_n"))
        .filter(F.col("_n") >= _COPURCHASE_MIN)
        .select("s", "t")
    )
    out = triangle_counts(edges, "s", "t")
    return out.select(
        F.col("node").alias("suppkey"),
        "deg",
        "n_triangles",
        F.when(
            F.col("deg") >= 2,
            (2 * F.col("n_triangles")).cast("double")
            / (F.col("deg") * (F.col("deg") - 1)),
        )
        .otherwise(F.lit(0.0))
        .alias("clustering_coeff"),
    )
