"""Round-19 optimization equivalence contracts.

Each test pins the exact-arithmetic claim behind an r19 plan
restructure, independent of the parquet fixtures, so the optimization
cannot drift from the semantics it must preserve.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F


def test_kmeans_structmin_assign_equals_rank1_window(spark):
    # dedup_semantic_kmeans r19: per-row min(struct(d, j)) over a
    # broadcast centroid array must reproduce the r18 form's
    # row_number() OVER (PARTITION BY vec_id ORDER BY d, j) = 1 row —
    # including the d-tie -> smaller-j break.
    emb = spark.createDataFrame(
        [
            (1, [0, 0]),
            (2, [5, 5]),
            (3, [10, 10]),  # equidistant to both centroids: tie -> j=0
            (4, [20, 20]),
        ],
        "vec_id long, q array<long>",
    )
    cents = spark.createDataFrame(
        [(0, [0, 0]), (1, [20, 20])], "j long, c array<long>"
    )

    # r18 window form
    dist = emb.crossJoin(F.broadcast(cents)).select(
        "vec_id",
        "j",
        F.aggregate(
            F.zip_with("q", "c", lambda x, y: (x - y) * (x - y)),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ).alias("d"),
    )
    w = Window.partitionBy("vec_id").orderBy("d", "j")
    old = {
        (r.vec_id, r.j)
        for r in dist.withColumn("rn", F.row_number().over(w))
        .filter("rn = 1")
        .collect()
    }

    # r19 struct-min form
    cs_row = cents.agg(
        F.sort_array(F.collect_list(F.struct("j", "c"))).alias("cs")
    )
    best = F.array_min(
        F.transform(
            "cs",
            lambda s: F.struct(
                F.aggregate(
                    F.zip_with("q", s["c"], lambda x, y: (x - y) * (x - y)),
                    F.lit(0).cast("long"),
                    lambda acc, x: acc + x,
                ).alias("d"),
                s["j"].alias("j"),
            ),
        )
    )
    new = {
        (r.vec_id, r.j)
        for r in emb.crossJoin(F.broadcast(cs_row))
        .select("vec_id", best["j"].alias("j"))
        .collect()
    }
    assert old == new
    assert (3, 0) in new  # the tie actually broke toward smaller j


def test_kmeans_seed_sortedcollect_equals_rank_window(spark):
    # Seed ranks: array position in sort_array(collect_list(struct(h,
    # vec_id, q))) must equal row_number() OVER (ORDER BY h, vec_id)-1.
    rows = [(5, "b", [1]), (1, "b", [2]), (3, "a", [3]), (2, "c", [4])]
    seeds = spark.createDataFrame(
        rows, "vec_id long, h string, q array<long>"
    )
    w = Window.orderBy("h", "vec_id")
    old = {
        (r.j, tuple(r.c))
        for r in seeds.select(
            (F.row_number().over(w) - 1).cast("long").alias("j"),
            F.col("q").alias("c"),
        ).collect()
    }
    new_rows = (
        seeds.agg(
            F.sort_array(
                F.collect_list(F.struct("h", "vec_id", "q"))
            ).alias("s8")
        )
        .select(
            F.explode(
                F.transform(
                    "s8",
                    lambda s, i: F.struct(
                        i.cast("long").alias("j"), s["q"].alias("c")
                    ),
                )
            ).alias("e")
        )
        .select("e.j", "e.c")
        .collect()
    )
    new = {(r.j, tuple(r.c)) for r in new_rows}
    assert old == new


def test_pagerank_collapse_multiedges_exactly_equal(spark):
    # docs_textrank_keywords r19: PageRank over the instance-level
    # multigraph must equal PageRank over the (src, dst, w=count)
    # collapse — S(v) = Σ_instances pr(u)//deg(u)
    # = Σ_pairs w·(pr(u)//deg(u)) and deg(u) = Σ w, all integer.
    from mk_kafka_connect_spark.operators.graph import pagerank

    # a multigraph with skewed multiplicities, fed both directions
    raw = [(1, 2)] * 5 + [(2, 3)] * 2 + [(1, 3)] * 1 + [(3, 4)] * 7
    both = raw + [(b, a) for a, b in raw]
    edges = spark.createDataFrame(both, "src long, dst long")
    plain = {
        (r.node, r.pr) for r in pagerank(edges, iterations=3).collect()
    }
    collapsed = {
        (r.node, r.pr)
        for r in pagerank(
            edges, iterations=3, collapse_multiedges=True
        ).collect()
    }
    assert plain == collapsed
