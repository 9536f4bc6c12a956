"""Graph analytics over relations: PageRank on the customer–supplier
bipartite graph. Companion to the connected-components operator in the
dedup family (min-label propagation); together they cover the two
canonical iterative-graph shapes — reachability and rank diffusion.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.bounded import bounded_window
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


# ---------------------------------------------------------------------------
# graph_linkpred — link-prediction scores over the kNN-sparsified graph
# ---------------------------------------------------------------------------

_LINKPRED_TOPK = 50
_LINKPRED_KNN = 3

# DuckDB CTE chain building the kNN-sparsified co-purchase edge set —
# shared verbatim by the graph_linkpred and graph_bfs_levels oracles so
# the two cannot drift from each other (mirrors _knn_edges below).
_SQL_KNN_EDGES = f"""os AS (
      SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem),
    pairs AS (
      SELECT a.l_suppkey AS s, b.l_suppkey AS t,
        CAST(count(*) AS BIGINT) AS w
      FROM os a JOIN os b
        ON a.l_orderkey = b.l_orderkey AND a.l_suppkey < b.l_suppkey
      GROUP BY 1, 2),
    directed AS (
      SELECT s AS z, t AS n, w FROM pairs
      UNION ALL SELECT t, s, w FROM pairs),
    knn AS (
      SELECT z, n FROM (
        SELECT z, n,
          row_number() OVER (PARTITION BY z ORDER BY w DESC, n) AS rk
        FROM directed)
      WHERE rk <= {_LINKPRED_KNN}),
    edges AS (
      SELECT DISTINCT least(z, n) AS s, greatest(z, n) AS t FROM knn)"""


def _knn_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """kNN-sparsified supplier co-purchase edge set (s < t), the shared
    graph substrate of graph_linkpred and graph_bfs_levels: each
    supplier keeps its 3 strongest co-supply partners (by distinct
    co-supplied order count, deterministic tie-break), the union of the
    picks is the edge set — hub degrees stay bounded at any data scale.
    Per-node top-k is a partitioned window (never global); the result
    is localCheckpoint'ed because both consumers traverse it repeatedly."""
    li = load_table(spark, sf_dir, "lineitem")
    os_ = li.select("l_orderkey", "l_suppkey").distinct()
    a_ = os_.select(F.col("l_orderkey").alias("o"), F.col("l_suppkey").alias("s"))
    b_ = os_.select(F.col("l_orderkey").alias("o"), F.col("l_suppkey").alias("t"))
    pairs = (
        a_.join(b_, "o")
        .filter(F.col("s") < F.col("t"))
        .groupBy("s", "t")
        .agg(F.count(F.lit(1)).alias("w"))
    )
    # Both orientations in ONE pass over the pair aggregate (explode of
    # the two orientations) — the unionAll form re-ran the distinct +
    # self-join + groupBy pipeline once per branch.
    directed = pairs.select(
        F.explode(
            F.array(
                F.struct(
                    F.col("s").alias("z"), F.col("t").alias("n"), F.col("w")
                ),
                F.struct(
                    F.col("t").alias("z"), F.col("s").alias("n"), F.col("w")
                ),
            )
        ).alias("_d")
    ).select("_d.z", "_d.n", "_d.w")
    wk = W.partitionBy("z").orderBy(F.desc("w"), F.asc("n"))
    knn = (
        directed.withColumn("rk", F.row_number().over(wk))
        .filter(F.col("rk") <= _LINKPRED_KNN)
        .select("z", "n")
    )
    return (
        knn.select(
            F.least("z", "n").alias("s"), F.greatest("z", "n").alias("t")
        )
        .distinct()
        .localCheckpoint(eager=True)
    )


@query(
    "graph_linkpred",
    oracle=f"""
    WITH {_SQL_KNN_EDGES},
    adj AS (
      SELECT s AS z, t AS n FROM edges
      UNION ALL SELECT t, s FROM edges),
    deg AS (
      SELECT z AS node, CAST(count(*) AS BIGINT) AS deg FROM adj
      GROUP BY z),
    cand AS (
      SELECT x.n AS a, y.n AS b,
        CAST(count(*) AS BIGINT) AS common,
        CAST(sum(1000000 // d.deg) AS BIGINT) AS ra_micro
      FROM adj x
      JOIN adj y ON x.z = y.z AND x.n < y.n
      JOIN deg d ON d.node = x.z
      GROUP BY x.n, y.n),
    nonedge AS (
      SELECT c.* FROM cand c
      ANTI JOIN edges e ON c.a = e.s AND c.b = e.t),
    scored AS (
      SELECT ne.a, ne.b, ne.common, ne.ra_micro,
        da.deg AS deg_a, db.deg AS deg_b,
        CAST(ne.common AS DOUBLE) / (da.deg + db.deg - ne.common)
          AS jaccard
      FROM nonedge ne
      JOIN deg da ON da.node = ne.a
      JOIN deg db ON db.node = ne.b),
    ranked AS (
      SELECT *, row_number() OVER (
        ORDER BY common * 1000000000000 // (deg_a + deg_b - common) DESC,
                 common DESC, ra_micro DESC, a, b) AS rnk
      FROM scored)
    SELECT a, b, common, deg_a, deg_b, jaccard, ra_micro, rnk
    FROM ranked WHERE rnk <= {_LINKPRED_TOPK}
    """,
    tags=("graph", "B6", "B7", "link-prediction"),
)
def graph_linkpred(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Link prediction over the kNN-SPARSIFIED supplier co-purchase
    graph: each supplier keeps its 3 strongest partners (by co-supplied
    order count, deterministic tie-break), the union of those picks is
    the edge set — the standard kNN-graph sparsification that keeps
    hub degrees bounded at ANY data scale (a fixed co-count threshold
    degenerates: the same cut that leaves this fixture sparse leaves a
    100 TB fixture complete or empty). For every NON-adjacent pair at
    distance 2, the three classic neighborhood scores: common-neighbor
    count, Jaccard overlap, and the resource-allocation index
    Σ 1/deg(z) (Adamic–Adar's log-free sibling, kept exact as the
    integer Σ ⌊10⁶/deg(z)⌋), ranked to a top-50 recommendation queue.
    The prediction member of the graph family: triangles measure what
    closed, this scores what's ABOUT to close.

    Exactness: the ranking key is the exact integer
    common·10¹² ÷ (deg_a+deg_b−common) (both engines floor it — the
    Spark double-division + long cast is exact here because the true
    quotient is ≥ 1/denom ≈ 10⁻² away from any integer while the
    division error is ≤ half an ulp ≈ 10⁻⁴), tie-broken by exact
    integers; jaccard itself is ONE IEEE division.

    Scale: the kNN selection is one per-node window over the pair
    counts (top-3, no global sort); candidate enumeration is the wedge
    self-join THROUGH shared hubs — bounded by Σ deg(z)² with
    deg ≤ 2k by construction, so the fan-out is O(|V|·k²), never
    |V|² — then a hash anti-join against the edge set and two
    node-sized degree joins. Global top-k is a TakeOrdered."""
    edges = _knn_edges(spark, sf_dir)
    # One pass over the checkpointed edge list for both orientations.
    adj = edges.select(
        F.explode(
            F.array(
                F.struct(F.col("s").alias("z"), F.col("t").alias("n")),
                F.struct(F.col("t").alias("z"), F.col("s").alias("n")),
            )
        ).alias("_a")
    ).select("_a.z", "_a.n")
    deg = adj.groupBy(F.col("z").alias("node")).agg(
        F.count(F.lit(1)).alias("deg")
    )
    adj_d = adj.join(deg, adj.z == deg.node).select("z", "n", "deg")
    x = adj_d.select("z", F.col("n").alias("a"), F.col("deg").alias("dz"))
    y = adj_d.select(F.col("z").alias("z2"), F.col("n").alias("b"))
    cand = (
        x.join(y, (x.z == y.z2) & (F.col("a") < F.col("b")))
        .groupBy("a", "b")
        .agg(
            F.count(F.lit(1)).alias("common"),
            F.sum((F.lit(1000000) / F.col("dz")).cast("long")).alias(
                "ra_micro"
            ),
        )
    )
    nonedge = cand.join(
        edges,
        (cand.a == edges.s) & (cand.b == edges.t),
        "left_anti",
    )
    da = deg.select(F.col("node").alias("a"), F.col("deg").alias("deg_a"))
    db = deg.select(F.col("node").alias("b"), F.col("deg").alias("deg_b"))
    scored = nonedge.join(da, "a").join(db, "b")
    denom = F.col("deg_a") + F.col("deg_b") - F.col("common")
    key = (F.col("common") * F.lit(1000000000000) / denom).cast("long")
    order = [
        F.desc(key),
        F.desc("common"),
        F.desc("ra_micro"),
        F.asc("a"),
        F.asc("b"),
    ]
    # Global top-k via ORDER BY + LIMIT (TakeOrderedAndProject), so the
    # O(|V|·k²) candidate relation is never sorted on one partition;
    # the rank window runs over the ≤K-row bounded result only.
    ranked = (
        scored.orderBy(*order)
        .limit(_LINKPRED_TOPK)
        .withColumn("rnk", F.row_number().over(bounded_window("a", *order)))
    )
    return ranked.select(
        "a",
        "b",
        "common",
        "deg_a",
        "deg_b",
        (F.col("common").cast("double") / denom).alias("jaccard"),
        "ra_micro",
        "rnk",
    )


# ---------------------------------------------------------------------------
# graph_bfs_levels — bounded-depth BFS reach profile from a seed node
# ---------------------------------------------------------------------------

_BFS_MAX_LEVEL = 4


@query(
    "graph_bfs_levels",
    oracle=f"""
    WITH RECURSIVE {_SQL_KNN_EDGES},
    adj AS (
      SELECT s AS z, t AS n FROM edges
      UNION ALL SELECT t, s FROM edges),
    reach AS (
      SELECT (SELECT min(z) FROM adj) AS node, 0 AS level
      UNION
      SELECT a.n, r.level + 1
      FROM reach r JOIN adj a ON a.z = r.node
      WHERE r.level < {_BFS_MAX_LEVEL}),
    lv AS (SELECT node, min(level) AS level FROM reach GROUP BY node)
    SELECT CAST(level AS BIGINT) AS level,
      CAST(count(*) AS BIGINT) AS n_nodes,
      CAST(min(node) AS BIGINT) AS min_node,
      CAST(max(node) AS BIGINT) AS max_node
    FROM lv GROUP BY level
    """,
    tags=("graph", "B6", "iterative", "bfs"),
)
def graph_bfs_levels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded-depth BFS over the kNN co-purchase graph: per-hop frontier
    sizes (node count + id range) for 4 hops from the smallest supplier
    node — the reach/diameter profile that sizes any traversal before
    running it (how much of the graph is within k hops decides whether a
    propagation pass, a recall query, or a blast-radius estimate is even
    feasible). The traversal member of the graph family next to the
    fixpoint iterators (PageRank/LPA/k-core): an explicit FRONTIER loop,
    the DataFrame form of Pregel-style level-synchronous BFS.

    Semantics: level(v) = min #hops from the seed, capped at 4. The
    frontier anti-join form (visit a node the first round it appears)
    computes exactly the recursive CTE's min-level — certified against
    the same edge CTE the linkpred oracle uses.

    Scale shape: per round ONE hash join (frontier ⋈ adjacency on the
    source key) + distinct + anti-join against the visited set — all
    key-partitioned, frontier-sized state, localCheckpoint'ed each round
    to cut lineage (bounded 4 rounds, the iterative-algorithm discipline
    of operators/graph.py::pagerank). No collect: the seed is a 1-row
    aggregate cross-joined in."""
    edges = _knn_edges(spark, sf_dir)
    # One pass over the checkpointed edge list for both orientations.
    adj = edges.select(
        F.explode(
            F.array(
                F.struct(F.col("s").alias("z"), F.col("t").alias("n")),
                F.struct(F.col("t").alias("z"), F.col("s").alias("n")),
            )
        ).alias("_a")
    ).select("_a.z", "_a.n").localCheckpoint(eager=True)
    seed = adj.agg(F.min("z").alias("node")).withColumn("level", F.lit(0))
    visited = seed.localCheckpoint(eager=True)
    frontier = visited
    for lvl in range(1, _BFS_MAX_LEVEL + 1):
        nxt = (
            frontier.join(adj, frontier.node == adj.z)
            .select(F.col("n").alias("node"))
            .distinct()
            .join(visited, "node", "left_anti")
            .withColumn("level", F.lit(lvl))
            .localCheckpoint(eager=True)
        )
        visited = visited.unionByName(nxt)
        frontier = nxt
    return visited.groupBy("level").agg(
        F.count(F.lit(1)).alias("n_nodes"),
        F.min("node").alias("min_node"),
        F.max("node").alias("max_node"),
    ).select(
        F.col("level").cast("long").alias("level"),
        "n_nodes",
        "min_node",
        "max_node",
    )


# ---------------------------------------------------------------------------
# graph_assortativity — Newman degree-assortativity coefficient
# ---------------------------------------------------------------------------


def _register_assortativity() -> None:
    @query(
        "graph_assortativity",
        oracle=f"""
        WITH {_SQL_KNN_EDGES},
        deg AS (
          SELECT node, CAST(count(*) AS BIGINT) AS deg
          FROM (SELECT s AS node FROM edges UNION ALL SELECT t FROM edges)
          GROUP BY node),
        half AS (
          SELECT ds.deg - 1 AS x, dt.deg - 1 AS y
          FROM edges e
            JOIN deg ds ON ds.node = e.s
            JOIN deg dt ON dt.node = e.t),
        stubs AS (
          SELECT x, y FROM half UNION ALL SELECT y, x FROM half),
        s AS (
          SELECT CAST(count(*) AS BIGINT) AS m,
            CAST(sum(x) AS BIGINT) AS sx,
            CAST(sum(x * x) AS BIGINT) AS sxx,
            CAST(sum(x * y) AS BIGINT) AS sxy
          FROM stubs)
        SELECT
          (SELECT CAST(count(*) AS BIGINT) FROM deg) AS n_nodes,
          CAST(m // 2 AS BIGINT) AS n_edges,
          (CAST(m AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sx)
            / (CAST(m AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
            AS assortativity
        FROM s
        """,
        tags=("graph", "B15", "stats"),
    )
    def graph_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Newman degree-assortativity coefficient (Newman 2002) of the
        kNN-sparsified supplier co-purchase graph (the shared substrate
        of graph_linkpred / graph_bfs_levels — the raw co-purchase
        graph is degree-regular on this fixture, so the correlation is
        only defined on the sparsified one): the Pearson correlation
        of remaining degrees (deg - 1) across edge endpoints, each
        edge contributing both orientations — positive r = hubs link
        to hubs (social shape), negative r = hub-and-spoke
        (technological shape). The one-number summary a pipeline reads
        to pick a skew-mitigation strategy before the heavier
        triangle/k-core passes.

        By stub symmetry sum(x) = sum(y) and sum(x^2) = sum(y^2), so
        r = (M*Sxy - Sx^2) / (M*Sxx - Sx^2) over int64 moment sums of
        exact integer degrees — NO quantization anywhere, one final
        shared IEEE division. Scale shape: degree table joins back to
        edges by node key (shuffle hash joins), moments are one plain
        aggregate; no global window, no sort, no collect."""
        edges = _knn_edges(spark, sf_dir)
        # One pass over the checkpointed edge list for both endpoints;
        # deg feeds three consumers (both half-joins + n_nodes), so the
        # node-sized table is materialized once.
        deg = (
            edges.select(
                F.explode(F.array(F.col("s"), F.col("t"))).alias("node")
            )
            .groupBy("node")
            .agg(F.count(F.lit(1)).cast("long").alias("deg"))
            .localCheckpoint(eager=False)
        )
        half = (
            edges.join(deg.withColumnRenamed("node", "s"), "s")
            .withColumnRenamed("deg", "ds")
            .join(
                deg.withColumnRenamed("node", "t").withColumnRenamed(
                    "deg", "dt"
                ),
                "t",
            )
            .select(
                (F.col("ds") - 1).alias("x"), (F.col("dt") - 1).alias("y")
            )
        )
        # The stub moments fold over `half` ONCE: stubs = half ∪ swapped
        # means m = 2·|half|, Sx = Σx+Σy, Sxx = Σx²+Σy², Sxy = 2·Σxy —
        # exact integer identities, so the unionAll (which re-ran the
        # degree joins per branch) is unnecessary.
        s = half.agg(
            (F.count(F.lit(1)) * 2).cast("long").alias("m"),
            (F.sum("x") + F.sum("y")).cast("long").alias("sx"),
            (
                F.sum(F.col("x") * F.col("x"))
                + F.sum(F.col("y") * F.col("y"))
            )
            .cast("long")
            .alias("sxx"),
            (F.sum(F.col("x") * F.col("y")) * 2).cast("long").alias("sxy"),
        )
        n_nodes = deg.agg(F.count(F.lit(1)).cast("long").alias("n_nodes"))
        md = F.col("m").cast("double")
        sxd = F.col("sx").cast("double")
        return s.crossJoin(F.broadcast(n_nodes)).select(
            "n_nodes",
            (F.col("m") / 2).cast("long").alias("n_edges"),
            (
                (md * F.col("sxy").cast("double") - sxd * sxd)
                / (md * F.col("sxx").cast("double") - sxd * sxd)
            ).alias("assortativity"),
        )


_register_assortativity()
