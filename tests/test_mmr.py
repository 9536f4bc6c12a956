"""Contract tests for MMR diversified re-ranking (operators/similarity.py
::mmr_rerank): first-pick semantics, the diversity trade-off actually
engaging, and deterministic id-asc tie-breaks — the semantics the
recursive-CTE oracle of `sim_mmr_rerank` replays."""

from __future__ import annotations

import numpy as np

from mk_kafka_connect_spark.operators.similarity import mmr_rerank

SCHEMA = "vec_id long, embedding array<double>"


def _reference_greedy(qv, cands, k, pool, lam_num, lam_den):
    """Literal re-implementation of the documented formula over quantized
    ints: pick argmax lam*rel - (1-lam)*max-sim-to-picked, id-asc ties."""
    q = np.round(np.array(qv) * 10000).astype(np.int64)
    ids = sorted(cands)
    V = {i: np.round(np.array(cands[i]) * 10000).astype(np.int64) for i in ids}
    rel = {i: int(q @ V[i]) for i in ids}
    shortlist = sorted(ids, key=lambda i: (-rel[i], i))[:pool]
    picked = []
    for _ in range(min(k, len(shortlist))):
        best = None
        for i in shortlist:
            if i in picked:
                continue
            if picked:
                score = lam_num * rel[i] - (lam_den - lam_num) * max(
                    int(V[i] @ V[j]) for j in picked
                )
            else:
                score = lam_den * rel[i]
            key = (-score, i)
            if best is None or key < best:
                best = key
                best_i = i
        picked.append(best_i)
    return picked


def _run(spark, query_vec, cands, **kw):
    rows = [(qid, list(v)) for qid, v in cands.items()]
    corpus = spark.createDataFrame(rows, SCHEMA)
    queries = spark.createDataFrame([(1000, list(query_vec))], SCHEMA)
    out = (
        mmr_rerank(corpus, queries, **kw)
        .orderBy("rank")
        .select("neighbor_id")
        .collect()
    )
    return [r.neighbor_id for r in out]


def test_mmr_diverges_from_pure_relevance(spark):
    # a and b are near-duplicates with the top two relevances; c is less
    # relevant but orthogonal. Pure top-3: [a, b, c]. MMR at lambda=0.7
    # must demote the near-duplicate b below the diverse c.
    # (scores in units of 1e8 after x10000 quantization, q=[1,1]:
    #  rel a=2.0, b=1.9, c=1.8; after picking a:
    #  score(b) = 7*1.9 - 3*sim(b,a)=3.8 -> 1.9;
    #  score(c) = 7*1.8 - 3*0 -> 12.6 => c wins rank 2.)
    cands = {
        1: [2.0, 0.0],  # a: highest rel
        2: [1.9, 0.0],  # b: near-dup of a, second-highest rel
        3: [0.0, 1.8],  # c: diverse, slightly lower rel
    }
    got = _run(spark, [1.0, 1.0], cands, k=3, pool=10, lam_num=7, lam_den=10)
    expect = _reference_greedy([1.0, 1.0], cands, 3, 10, 7, 10)
    assert got == expect
    assert got[0] == 1, "first pick must be the pure-relevance argmax"
    assert got[1] == 3, "diversity term must demote the near-duplicate"
    assert got == [1, 3, 2]


def test_mmr_tie_breaks_on_lower_id(spark):
    # Identical vectors => identical scores at every step: order must be
    # exactly id-ascending, bit-deterministically.
    cands = {i: [5.0, 5.0] for i in (7, 3, 9, 5)}
    got = _run(spark, [1.0, 1.0], cands, k=4, pool=10, lam_num=7, lam_den=10)
    assert got == [3, 5, 7, 9]


def test_mmr_matches_reference_on_random_pool(spark):
    rng = np.random.default_rng(42)
    cands = {i: [float(x) for x in rng.normal(size=4)] for i in range(25)}
    qv = [float(x) for x in rng.normal(size=4)]
    got = _run(spark, qv, cands, k=5, pool=20, lam_num=7, lam_den=10)
    expect = _reference_greedy(qv, cands, 5, 20, 7, 10)
    assert got == expect
