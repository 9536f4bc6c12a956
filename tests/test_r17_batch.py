"""Semantic contracts for the round-17 evaluation-family additions —
properties the oracle comparison alone can't express: metric range and
definitional invariants recomputed independently in plain Python/DuckDB
(nDCG/MRR from a brute-force numpy ranking, kappa from a hand-counted
contingency table, hard-negative label/bucket membership)."""

from __future__ import annotations

import duckdb
import numpy as np

from mk_kafka_connect_spark.plans import QUERIES

SF = "/root/testdata/sf0.001"


def _run(spark, name, sf=SF):
    return QUERIES[name].fn(spark, sf)


def _emb():
    return duckdb.sql(
        f"SELECT vec_id, embedding, label FROM '{SF}/embeddings.parquet' "
        "ORDER BY vec_id"
    ).fetchall()


def test_ndcg_mrr_match_numpy_recomputation(spark):
    # Full independent replay: quantized-int cosine ranking in numpy,
    # textbook DCG/IDCG with the same integer-scaled gains, MRR from the
    # first same-label rank. Bit-for-bit against the Spark relation.
    rows = {r["query_id"]: r for r in _run(spark, "sim_eval_ndcg_mrr").collect()}
    data = _emb()
    ids = np.array([r[0] for r in data])
    V = np.array([[round(x * 10000) for x in r[1]] for r in data], dtype=np.int64)
    labels = np.array([r[2] for r in data])
    norms = np.sqrt((V * V).sum(axis=1).astype(np.float64))
    gains = {i: int(np.floor(1000000 / np.log2(i + 1) + 0.5)) for i in range(1, 11)}
    for qpos in np.where(ids < 100)[0]:
        cos = (V @ V[qpos]).astype(np.float64) / (norms * norms[qpos])
        order = sorted(
            [(i, cos[i]) for i in range(len(ids)) if i != qpos],
            key=lambda t: (-t[1], ids[t[0]]),
        )[:10]
        rel = [1 if labels[i] == labels[qpos] else 0 for i, _ in order]
        dcg = sum(r * gains[k + 1] for k, r in enumerate(rel))
        n_relevant = int((labels == labels[qpos]).sum()) - 1
        idcg = sum(gains[i] for i in range(1, min(n_relevant, 10) + 1))
        mrr = 0.0 if 1 not in rel else 1.0 / (rel.index(1) + 1)
        ndcg = 0.0 if idcg == 0 else dcg / idcg
        row = rows[int(ids[qpos])]
        assert row["n_rel_at_10"] == sum(rel)
        assert row["mrr"] == mrr
        assert row["ndcg_at_10"] == ndcg
        assert 0.0 <= row["ndcg_at_10"] <= 1.0
        assert 0.0 <= row["mrr"] <= 1.0


def test_kappa_matches_hand_counted_contingency(spark):
    docs = duckdb.sql(
        f"SELECT lang, n_chars, len(string_split(text, ' ')) AS nw "
        f"FROM '{SF}/documents.parquet'"
    ).fetchall()
    by_lang: dict[str, list[tuple[int, int]]] = {}
    for lang, n_chars, nw in docs:
        by_lang.setdefault(lang, []).append(
            (1 if n_chars >= 600 else 0, 1 if nw >= 100 else 0)
        )
    rows = {r["lang"]: r for r in _run(spark, "docs_annotator_kappa").collect()}
    assert set(rows) == set(by_lang)
    for lang, flags in by_lang.items():
        n = len(flags)
        a1 = sum(a for a, _ in flags)
        b1 = sum(b for _, b in flags)
        agree = sum(1 for a, b in flags if a == b)
        chance = a1 * b1 + (n - a1) * (n - b1)
        denom = n * n - chance
        kappa = 0.0 if denom == 0 else (n * agree - chance) / denom
        row = rows[lang]
        assert row["n_docs"] == n and row["n_agree"] == agree
        assert row["po"] == agree / n
        assert row["kappa"] == kappa
        assert -1.0 <= row["kappa"] <= 1.0


def test_distinct_ngrams_bounds_and_bigram_count_identity(spark):
    # distinct ratios live in (0, 1]; within a source, bigram count =
    # token count - doc count (each doc contributes len-1 bigrams).
    per_doc = duckdb.sql(
        rf"""
        SELECT source, count(*) AS n_docs, sum(n_tok) AS n_tokens FROM (
          SELECT source, len(list_filter(
            string_split_regex(text, '\s+'), w -> w <> '')) AS n_tok
          FROM '{SF}/documents.parquet') GROUP BY source
        """
    ).fetchall()
    stats = {s: (int(d), int(t)) for s, d, t in per_doc}
    for r in _run(spark, "docs_distinct_ngrams").collect():
        n_docs, n_tokens = stats[r["source"]]
        assert r["n_tokens"] == n_tokens
        assert r["n_bigrams"] == n_tokens - n_docs
        assert 0.0 < r["distinct_1"] <= 1.0
        assert 0.0 < r["distinct_2"] <= 1.0
        assert r["n_distinct_tokens"] <= r["n_tokens"]
        assert r["n_distinct_bigrams"] <= r["n_bigrams"]


def test_hard_negatives_are_cross_label_bucket_mates_with_max_cosine(spark):
    # Independent replay of the mining contract in numpy: same 4-plane
    # signature, same quantized cosine — the reported hard negative must
    # BE the argmax different-label bucket-mate, and margin must be the
    # exact pos-minus-neg difference.
    data = _emb()
    ids = [r[0] for r in data]
    V = np.array([[round(x * 10000) for x in r[1]] for r in data], dtype=np.int64)
    labels = {r[0]: r[2] for r in data}
    mixed = (np.arange(4 * 64, dtype=np.int64) * 2654435761) % (1 << 32)
    W = np.where(mixed >= (1 << 31), 1, -1).astype(np.int64).reshape(4, 64)
    bits = (V @ W.T > 0).astype(np.int64)
    sigs = {ids[i]: int((bits[i] << np.arange(4)).sum()) for i in range(len(ids))}
    norms = {ids[i]: float(np.sqrt((V[i] * V[i]).sum())) for i in range(len(ids))}
    vec = {ids[i]: V[i] for i in range(len(ids))}

    def cos(x, y):
        return float(vec[x] @ vec[y]) / (norms[x] * norms[y])

    out = {r["vec_id"]: r for r in _run(spark, "sim_eval_hard_negatives").collect()}
    for i in ids:
        mates = [j for j in ids if j != i and sigs[j] == sigs[i]]
        negs = [(j, cos(i, j)) for j in mates if labels[j] != labels[i]]
        poss = [(j, cos(i, j)) for j in mates if labels[j] == labels[i]]
        if not negs:
            assert i not in out
            continue
        best_neg = min(negs, key=lambda t: (-t[1], t[0]))
        row = out[i]
        assert row["hard_neg_id"] == best_neg[0]
        assert row["hn_cosine"] == best_neg[1]
        if poss:
            best_pos = max(p for _, p in poss)
            assert row["pos_cosine"] == best_pos
            assert row["margin"] == best_pos - best_neg[1]
        else:
            assert row["pos_cosine"] is None and row["margin"] is None


def test_nb_auc_matches_python_rank_statistic(spark):
    # Independent U-statistic replay: take the held-out score table from
    # the ORACLE's scored CTE (DuckDB), compute AUC by brute-force pair
    # counting in plain Python, and demand bit-equality with the Spark
    # block-decomposed rank computation.
    from mk_kafka_connect_spark.plans.governance import _sql_nb_scored_prefix

    con = duckdb.connect()
    for t in ("documents",):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    scored = con.execute(
        _sql_nb_scored_prefix() + " SELECT y, score_q FROM scored"
    ).fetchall()
    pos = sorted(s for y, s in scored if y)
    neg = sorted(s for y, s in scored if not y)
    u2 = 0
    for p in pos:  # brute-force: 2*U = 2*#{pos>neg} + #{ties}
        for n in neg:
            if p > n:
                u2 += 2
            elif p == n:
                u2 += 1
    row = _run(spark, "docs_nb_quality_auc").collect()[0]
    assert row["n_pos"] == len(pos) and row["n_neg"] == len(neg)
    assert row["u2"] == u2
    assert row["auc"] == u2 / (2 * len(pos) * len(neg))
    assert 0.0 <= row["auc"] <= 1.0


def test_dedup_within_watermark_eviction_contract(spark, tmp_path):
    # Controlled multi-batch arrival order (maxFilesPerTrigger=1):
    # (a) an in-horizon duplicate is dropped even at a different event
    #     time; (b) a sub-watermark late duplicate is dropped by the
    #     late-data filter; (c) a re-arrival with a fresh event time
    #     AFTER its key's state expired is re-emitted (at-least-once).
    import datetime as dt
    import time
    import uuid

    from pyspark.sql import types as T

    schema = T.StructType(
        [T.StructField("ts", T.TimestampType()), T.StructField("k", T.LongType())]
    )
    src = tmp_path / "src"
    src.mkdir()
    name = f"wmdedup_{uuid.uuid4().hex[:8]}"
    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)

    def write(fname, rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(str(src / fname))

    def drained():
        return sorted((r.k, str(r.ts)) for r in spark.table(name).collect())

    def wait_for(pred, timeout=60):
        deadline = time.time() + timeout
        while time.time() < deadline:
            if pred(drained()):
                return True
            time.sleep(0.5)
        return False

    write("f1", [(t0, 1), (t0, 2)])
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src) + "/*")
    )
    out = stream.withWatermark("ts", "10 minutes").dropDuplicatesWithinWatermark(
        ["k"]
    )
    q = (
        out.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(processingTime="500 milliseconds")
        .start()
    )
    try:
        assert wait_for(lambda d: len(d) == 2), drained()
        # (a) dup of k=1 at t0+2m (inside the 10-min horizon) must be
        # dropped; k=3 at t0+60m advances the watermark to 12:50,
        # expiring k=1/k=2 state.
        write("f2", [(t0 + dt.timedelta(minutes=2), 1),
                     (t0 + dt.timedelta(minutes=60), 3)])
        assert wait_for(lambda d: len(d) == 3), drained()
        assert (1, "2024-01-01 12:02:00") not in drained()
        # (b) sub-watermark late duplicate: dropped by the late filter.
        write("f3", [(t0, 2)])
        # (c) fresh-event-time re-arrival after eviction: re-emitted.
        write("f4", [(t0 + dt.timedelta(minutes=70), 1)])
        assert wait_for(
            lambda d: (1, "2024-01-01 13:10:00") in d and len(d) == 4
        ), drained()
        assert drained().count((2, "2024-01-01 12:00:00")) == 1
    finally:
        q.stop()


def test_doremi_mixture_replayed_in_python(spark):
    # Independent replay: per-source xent from the ORACLE's shared LM
    # scored CTE (DuckDB), then the -lite EG step in plain Python —
    # bit-equal weights, sum-to-one, and hardest-domain-upweighted.
    from mk_kafka_connect_spark.plans.governance import (
        _DOREMI_SCALE,
        _LM_SCALE,
        _sql_wordlm_scored_ctes,
    )

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF}/documents.parquet')"
    )
    per = con.execute(
        _sql_wordlm_scored_ctes()
        + """
        SELECT d.source, CAST(count(*) AS BIGINT),
          CAST(sum(s.n_bigrams) AS BIGINT), CAST(sum(s.sum_q) AS BIGINT)
        FROM scored s JOIN documents d USING (doc_id) GROUP BY d.source
        """
    ).fetchall()
    xent = {s: -sq / (nb * _LM_SCALE) for s, _, nb, sq in per}
    ref = min(xent.values())
    wq = {s: round(np.exp(round(x - ref, 8)) * _DOREMI_SCALE) for s, x in xent.items()}
    tot = sum(wq.values())
    rows = {r["source"]: r for r in _run(spark, "docs_doremi_mixture").collect()}
    assert set(rows) == set(xent)
    for s, r in rows.items():
        assert r["xent"] == xent[s]
        assert r["excess_xent"] == round(xent[s] - ref, 8)
        assert r["mix_weight"] == wq[s] / tot
    assert abs(sum(r["mix_weight"] for r in rows.values()) - 1.0) < 1e-12
    hardest = max(xent, key=lambda s: xent[s])
    assert rows[hardest]["mix_weight"] == max(r["mix_weight"] for r in rows.values())
