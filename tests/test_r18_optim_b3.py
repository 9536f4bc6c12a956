"""Focused contracts for the round-18 batch-3 restructures that changed
a query's computation SHAPE (not just its materialization points): the
matryoshka one-pass segment-dot decomposition and the per-child-table
FK-audit fusion must reproduce the straightforward per-budget / per-edge
formulations exactly."""

from __future__ import annotations

from pyspark.sql import functions as F

from mk_kafka_connect_spark.catalog import load_table
from mk_kafka_connect_spark.plans.registry import QUERIES

SF = "/root/testdata/sf0.001"


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_matryoshka_matches_per_budget_reference(spark):
    """The segment-sum prefix dots (dot over dims 1..16 = dot over 1..8
    + dot over 9..16, exact int64) and the exploded single window must
    yield the same recall table as computing each budget's ranking
    independently from scratch in plain Python."""
    from mk_kafka_connect_spark.operators.similarity import quantize
    from mk_kafka_connect_spark.plans.curation import _MRL_DIMS, _MRL_K, _MRL_NQ

    # Quantize through the engine's own expression (HALF_UP — Python's
    # round() is banker's and would diverge on exact .5 ties); the
    # reference below then independently replays the per-budget ranking
    # the one-pass segment-dot restructure must reproduce.
    emb = {
        r.vec_id: list(r.q)
        for r in load_table(spark, SF, "embeddings")
        .select("vec_id", quantize(F.col("embedding")).alias("q"))
        .collect()
    }
    tops: dict[int, set[tuple[int, int]]] = {}
    for d in _MRL_DIMS:
        pairs = set()
        for qid in [v for v in emb if v < _MRL_NQ]:
            scored = sorted(
                (
                    (-sum(a * b for a, b in zip(emb[qid][:d], emb[c][:d])), c)
                    for c in emb
                    if c != qid
                ),
            )[:_MRL_K]
            pairs.update((qid, c) for _, c in scored)
        tops[d] = pairs
    full = max(_MRL_DIMS)
    expected = sorted(
        (d, len(tops[d] & tops[full]), len(tops[d] & tops[full]) / (_MRL_NQ * _MRL_K))
        for d in _MRL_DIMS
    )
    got = _rows(QUERIES["emb_matryoshka_recall"].fn(spark, SF))
    assert got == expected


def test_referential_orphans_fused_matches_per_edge(spark):
    """The fused one-scan-per-child-table audit must emit exactly the
    rows the original one-scan-per-EDGE formulation produced."""
    from mk_kafka_connect_spark.plans.curation import _FK_EDGES

    expected = []
    for ct, ck, pt, pk in _FK_EDGES:
        child = load_table(spark, SF, ct).select(F.col(ck).alias("_ck"))
        parent = (
            load_table(spark, SF, pt).select(F.col(pk).alias("_pk")).distinct()
        )
        j = child.join(parent, F.col("_ck") == F.col("_pk"), "left")
        row = j.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.when(F.col("_pk").isNull(), 1).otherwise(0)).alias("o"),
        ).collect()[0]
        expected.append(
            (f"{ct}.{ck}->{pt}.{pk}", row.n, row.o, row.o == 0)
        )
    got = _rows(QUERIES["dq_referential_orphans"].fn(spark, SF))
    assert got == sorted(expected)
