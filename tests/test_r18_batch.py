"""Semantic contracts for the round-18 pipeline-audit additions —
properties the oracle comparison alone can't express: impact accounting
reconciled against an independently recomputed cluster membership, PII
prevalence against the arithmetic ground load that was planted,
threshold-sweep monotonicity and cell-sum identities, and SQ8
distortion against a numpy replay of the quantizer."""

from __future__ import annotations

import math

import duckdb
import numpy as np

from mk_kafka_connect_spark.plans import QUERIES
from mk_kafka_connect_spark.plans.governance import _nb_scored


def _round_away(x: float) -> int:
    # Spark F.round / DuckDB round: half away from zero (NOT numpy's
    # half-even).
    return int(math.floor(x + 0.5)) if x >= 0 else int(math.ceil(x - 0.5))

SF = "/root/testdata/sf0.001"


def _run(spark, name, sf=SF):
    return QUERIES[name].fn(spark, sf)


def test_dedup_impact_reconciles_with_cluster_relation(spark):
    # The report's removal counts must be exactly the non-canonical
    # cluster members, attributed to the right sources, with token sums
    # recomputed independently from the raw corpus.
    docs = {
        r[0]: (r[1], len(r[2].split(" ")))
        for r in duckdb.sql(
            f"SELECT doc_id, source, text FROM '{SF}/documents.parquet'"
        ).fetchall()
    }
    clusters = {
        r["id"]: (r["cluster_id"], r["is_canonical"])
        for r in _run(spark, "dedup_clusters").collect()
    }
    report = {r["source"]: r for r in _run(spark, "docs_dedup_impact_report").collect()}
    # Every source appears, with exact corpus totals.
    by_src: dict[str, list[int]] = {}
    for src, ntok in docs.values():
        by_src.setdefault(src, []).append(ntok)
    assert set(report) == set(by_src)
    for src, toks in by_src.items():
        assert report[src]["n_docs"] == len(toks)
        assert report[src]["n_tokens"] == sum(toks)
    # Removals: recompute from the cluster relation.
    removed = {
        src: [0, 0, 0] for src in by_src
    }  # docs_removed, tokens_removed, cross_source
    for doc_id, (cluster_id, canonical) in clusters.items():
        if canonical:
            continue
        src, ntok = docs[doc_id]
        keeper_src = docs[cluster_id][0]
        removed[src][0] += 1
        removed[src][1] += ntok
        removed[src][2] += int(keeper_src != src)
    assert any(v[0] for v in removed.values()), "fixture should contain near-dups"
    for src, (n_rm, tok_rm, cross) in removed.items():
        row = report[src]
        assert row["docs_removed"] == n_rm
        assert row["tokens_removed"] == tok_rm
        assert row["docs_removed_cross_source"] == cross
        expect_pct = 0.0 if row["n_tokens"] == 0 else tok_rm / row["n_tokens"]
        assert row["pct_tokens_removed"] == expect_pct


def test_pii_prevalence_matches_planted_ground_load(spark):
    # The plant is arithmetic: doc_id%3 emails, doc_id%2 phones, an IP
    # on every doc_id%5==0. Detection must recover exactly that load
    # per source — any extra hit means the regexes fired on corpus text
    # (the fixture is PII-free by construction), any missing hit means
    # the detector lost a planted contact.
    docs = duckdb.sql(
        f"SELECT doc_id, source FROM '{SF}/documents.parquet'"
    ).fetchall()
    expect: dict[str, list[int]] = {}
    for doc_id, src in docs:
        e = expect.setdefault(src, [0, 0, 0, 0])
        e[0] += 1
        e[1] += doc_id % 3
        e[2] += doc_id % 2
        e[3] += int(doc_id % 5 == 0)
    rows = {r["source"]: r for r in _run(spark, "docs_pii_prevalence").collect()}
    assert set(rows) == set(expect)
    for src, (n_docs, n_email, n_phone, n_ip) in expect.items():
        row = rows[src]
        assert row["n_docs"] == n_docs
        assert row["n_email"] == n_email
        assert row["n_phone"] == n_phone
        assert row["n_ip"] == n_ip
        total = n_email + n_phone + n_ip
        expect_rate = (
            0.0 if row["n_tokens"] == 0 else 10000 * total / row["n_tokens"]
        )
        assert row["pii_per_10k_tokens"] == expect_rate


def test_threshold_sweep_identities_and_monotonicity(spark):
    rows = sorted(
        _run(spark, "docs_nb_threshold_sweep").collect(),
        key=lambda r: r["thr_q"],
    )
    assert len(rows) == 7
    scored = {
        r["doc_id"]: (r["y"], r["score_q"])
        for r in _nb_scored(spark, SF).collect()
    }
    n_pos = sum(1 for y, _ in scored.values() if y)
    n_neg = len(scored) - n_pos
    prev_tp = None
    for r in rows:
        # Cell sums partition the held-out set at every threshold.
        assert r["tp"] + r["fn"] == n_pos
        assert r["fp"] + r["tn"] == n_neg
        # Hand-recount the cells at this threshold.
        tp = sum(1 for y, s in scored.values() if y and s > r["thr_q"])
        fp = sum(1 for y, s in scored.values() if not y and s > r["thr_q"])
        assert (r["tp"], r["fp"]) == (tp, fp)
        # P/R/F1 are the guarded textbook ratios.
        assert r["precision_"] == (0.0 if tp + fp == 0 else tp / (tp + fp))
        assert r["recall_"] == (0.0 if n_pos == 0 else tp / n_pos)
        denom = 2 * tp + fp + r["fn"]
        assert r["f1"] == (0.0 if denom == 0 else 2 * tp / denom)
        # Raising the threshold can only shrink the predicted-positive set.
        if prev_tp is not None:
            assert r["tp"] <= prev_tp
        prev_tp = r["tp"]


def test_quantization_error_matches_numpy_replay(spark):
    # Full independent replay of quantize -> SQ8 -> distortion in numpy,
    # bit-for-bit: same integer residuals, same single-division rounding.
    data = duckdb.sql(
        f"SELECT label, embedding FROM '{SF}/embeddings.parquet' ORDER BY label"
    ).fetchall()
    per_label: dict[int, list[tuple[int, int]]] = {}
    for label, emb in data:
        v = np.array([round(x * 10000) for x in emb], dtype=np.int64)
        m = max(int(np.abs(v).max()), 1)
        q8 = np.sign(v) * ((np.abs(v) * 127) // m)
        n2v = int((v * v).sum())
        n2q = int((q8 * q8).sum())
        dot = int((v * q8).sum())
        err = 127 * v - q8 * m
        sse = int((err * err).sum())
        if n2v == 0 or n2q == 0:
            cos_q = 0
        else:
            cos_q = _round_away(
                dot / (np.sqrt(float(n2v)) * np.sqrt(float(n2q))) * 1e9
            )
        relmse_q = 0 if n2v == 0 else _round_away(sse / (16129.0 * n2v) * 1e9)
        per_label.setdefault(int(label), []).append((cos_q, relmse_q))
    rows = {r["label"]: r for r in _run(spark, "emb_quantization_error").collect()}
    assert set(rows) == set(per_label)
    for label, vals in per_label.items():
        row = rows[label]
        n = len(vals)
        assert row["n_vecs"] == n
        assert row["mean_cos_sq8"] == sum(c for c, _ in vals) / (n * 10**9)
        assert row["mean_rel_mse_sq8"] == sum(m for _, m in vals) / (n * 10**9)
        # SQ8 keeps almost all the geometry: the distortion numbers the
        # report exists to surface should be near the no-loss end.
        assert row["mean_cos_sq8"] > 0.99
        assert 0.0 <= row["mean_rel_mse_sq8"] < 0.05
