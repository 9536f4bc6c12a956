"""Semantic tests for the r7 training-pipeline additions: chunking,
sequence packing, per-group quality gating, label centroids. (Cross-engine
value parity is covered by the oracle-parity suites; these pin the
operator SEMANTICS — overlap reconstruction, pack-budget invariants,
per-group keep fraction, centroid math.)"""

from __future__ import annotations

import math

import numpy as np
import pyspark.sql.functions as F
import pytest

from mk_kafka_connect_spark.catalog import load_table
from mk_kafka_connect_spark.operators.pipeline import (
    chunk_documents,
    pack_sequences,
    top_fraction_by_group,
)
from mk_kafka_connect_spark.operators.similarity import (
    label_centroids,
    nearest_centroid_assign,
)

SF_SMOKE = "/root/testdata/sf0.001"


def test_chunks_reconstruct_original_text(spark):
    texts = ["a" * 950, "xyz", "", "b" * 400, "c" * 401]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    out = chunk_documents(df, "text", "doc_id", chunk_size=500, stride=400)
    rows = out.orderBy("doc_id", "chunk_idx").collect()
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for i, t in enumerate(texts):
        chunks = by_doc[i]
        assert len(chunks) == max(1, math.ceil(max(len(t), 1) / 400))
        # Non-final chunks contribute their stride; the final chunk lands
        # whole — stitching them back must reproduce the document.
        rebuilt = "".join(c["chunk_text"][:400] for c in chunks[:-1])
        rebuilt += chunks[-1]["chunk_text"]
        assert rebuilt == t, f"doc {i} not reconstructible from chunks"
        # Overlap: each chunk re-reads the previous chunk's tail.
        for prev, cur in zip(chunks, chunks[1:]):
            assert cur["chunk_start"] == prev["chunk_start"] + 400
            if len(prev["chunk_text"]) == 500:
                assert prev["chunk_text"][400:] == cur["chunk_text"][:100]


def test_chunk_empty_doc_yields_one_empty_chunk(spark):
    df = spark.createDataFrame([(1, "")], "doc_id long, text string")
    rows = chunk_documents(df, "text", "doc_id").collect()
    assert len(rows) == 1
    assert rows[0]["chunk_text"] == "" and rows[0]["chunk_len"] == 0


def test_pack_sequences_budget_invariants(spark):
    budget, n_streams = 1000, 8
    d = load_table(spark, SF_SMOKE, "documents")
    rows = pack_sequences(d, "doc_id", "text", budget=budget, n_streams=n_streams).collect()
    assert len(rows) == d.count()  # every doc packed exactly once
    per_stream: dict[int, dict[int, int]] = {}
    for r in rows:
        assert 0 <= r["stream"] < n_streams
        per_stream.setdefault(r["stream"], {}).setdefault(r["pack_id"], 0)
        per_stream[r["stream"]][r["pack_id"]] += r["n_tokens"]
    for stream, packs in per_stream.items():
        ids = sorted(packs)
        # Pack ids are dense from 0 (a pack opens only when the budget
        # boundary is crossed).
        assert ids == list(range(len(ids))), f"stream {stream}: sparse pack ids"
        # Every non-final pack is full: the cumulative tokens through pack
        # p reach past the (p+1)*budget boundary (the straddling doc opens
        # the next pack).
        cum = 0
        for p in ids[:-1]:
            cum += packs[p]
            assert cum >= (p + 1) * budget, f"stream {stream} pack {p} underfull"


def test_top_fraction_keeps_expected_share_per_group(spark):
    d = load_table(spark, SF_SMOKE, "documents").withColumn(
        "score", F.length("text").cast("double")
    )
    totals = {r["lang"]: r["n"] for r in d.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    kept = top_fraction_by_group(d, "score", "lang", "doc_id", keep_frac=0.75)
    kept_counts = {
        r["lang"]: r["n"] for r in kept.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    for lang, n in totals.items():
        k = kept_counts.get(lang, 0)
        # cume_dist >= 0.25 keeps between 75% and 75%+1 row of each group.
        assert 0.75 * n <= k <= 0.75 * n + 1, f"{lang}: kept {k} of {n}"


def test_weighted_sample_rate_tracks_weights(spark):
    """Keep probability is w/max(w): the realized keep count should track
    sum(w)/max(w) (binomial, so allow a generous band), heavier rows must
    be kept at a higher rate than lighter ones, a weight equal to the max
    is kept with certainty, and the decision is deterministic."""
    from mk_kafka_connect_spark.operators.pipeline import weighted_hash_sample

    d = load_table(spark, "/root/testdata/sf0.01", "documents")
    rows = d.select("doc_id", "n_chars").collect()
    w = {r["doc_id"]: r["n_chars"] for r in rows}
    mx = max(w.values())
    expected = sum(w.values()) / mx
    kept1 = {r["doc_id"] for r in weighted_hash_sample(d, "doc_id", "n_chars").collect()}
    kept2 = {r["doc_id"] for r in weighted_hash_sample(d, "doc_id", "n_chars").collect()}
    assert kept1 == kept2  # deterministic
    n = len(kept1)
    sd = math.sqrt(expected)
    assert expected - 4 * sd <= n <= expected + 4 * sd, (n, expected)
    for doc_id, weight in w.items():
        if weight == mx:
            assert doc_id in kept1  # p = 1 exactly
    heavy = [d_ for d_, ww in w.items() if ww >= mx * 0.8]
    light = [d_ for d_, ww in w.items() if ww <= mx * 0.2]
    if heavy and light:
        hr = sum(d_ in kept1 for d_ in heavy) / len(heavy)
        lr = sum(d_ in kept1 for d_ in light) / len(light)
        assert hr > lr, (hr, lr)


def test_label_centroids_match_numpy(spark):
    e = load_table(spark, SF_SMOKE, "embeddings")
    got = {
        (r["label"], r["dim"]): (r["n"], r["sum_val"], r["mean_val"])
        for r in label_centroids(e, "embedding", "label").collect()
    }
    by_label: dict[int, list] = {}
    for r in e.select("label", "embedding").collect():
        by_label.setdefault(r["label"], []).append(np.array(r["embedding"], dtype=np.float64))
    for label, vecs in by_label.items():
        m = np.stack(vecs)
        for dim in range(m.shape[1]):
            n, sum_val, mean_val = got[(label, dim)]
            assert n == len(vecs)
            assert sum_val == pytest.approx(float(m[:, dim].sum()), abs=1e-6)
            assert mean_val == pytest.approx(float(m[:, dim].mean()), abs=1e-9)
            assert mean_val == sum_val / n


def test_nearest_centroid_matches_numpy_reference(spark):
    e = load_table(spark, SF_SMOKE, "embeddings")
    got = {
        r["vec_id"]: (r["true_label"], r["pred_label"], r["cosine"])
        for r in nearest_centroid_assign(e, "embedding", "label", "vec_id").collect()
    }
    rows = e.select("vec_id", "label", "embedding").collect()
    q = {r["vec_id"]: np.round(np.array(r["embedding"], dtype=np.float64) * 10000) for r in rows}
    labels = {r["vec_id"]: r["label"] for r in rows}
    by_label: dict[int, list] = {}
    for vid, vec in q.items():
        by_label.setdefault(labels[vid], []).append(vec)
    cents = {}
    for lab, vecs in by_label.items():
        s = np.stack(vecs).sum(axis=0)
        n = len(vecs)
        cents[lab] = np.where(s >= 0, (2 * s + n) // (2 * n), -((2 * -s + n) // (2 * n)))
    for vid, vec in q.items():
        best = None
        # Ascending label order + strict > keeps ties on the lower label,
        # matching the operator's (cosine desc, label asc) contract.
        for lab in sorted(cents):
            c = cents[lab]
            cos = float(vec @ c) / (np.sqrt(float(vec @ vec)) * np.sqrt(float(c @ c)))
            if best is None or cos > best[1]:
                best = (lab, cos)
        t_lab, p_lab, cosine = got[vid]
        assert t_lab == labels[vid]
        assert p_lab == best[0], f"vec {vid}: {p_lab} vs numpy {best[0]}"
        assert cosine == pytest.approx(best[1], abs=1e-12)


def test_embedding_clusters_invariants(spark):
    from mk_kafka_connect_spark.plans.registry import QUERIES

    rows = QUERIES["dedup_embedding_clusters"].fn(spark, SF_SMOKE).collect()
    ids = [r["id"] for r in rows]
    assert len(ids) == len(set(ids))  # each clustered vector appears once
    by_cluster: dict[int, list] = {}
    for r in rows:
        assert r["cluster_id"] <= r["id"]  # canonical = min id of component
        assert r["is_canonical"] == (r["id"] == r["cluster_id"])
        by_cluster.setdefault(r["cluster_id"], []).append(r)
    for cid, members in by_cluster.items():
        assert sum(m["is_canonical"] for m in members) == 1, f"cluster {cid}"
        assert min(m["id"] for m in members) == cid


def test_gapfill_hourly_series_contiguous_and_consistent(spark):
    import datetime as dt

    from mk_kafka_connect_spark.plans.registry import QUERIES

    rows = QUERIES["events_gapfill_hourly"].fn(spark, SF_SMOKE).collect()
    ev = load_table(spark, SF_SMOKE, "events")
    total_events = ev.count()
    assert sum(r["n"] for r in rows) == total_events  # zeros add nothing
    by_user: dict[int, list] = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append(r)
    n_users = ev.select("user_id").distinct().count()
    assert len(by_user) == n_users  # every active user has a series
    for uid, series in by_user.items():
        hrs = sorted(r["hr"] for r in series)
        span = int((hrs[-1] - hrs[0]).total_seconds() // 3600) + 1
        assert len(hrs) == span, f"user {uid}: series has gaps"
        assert all(
            b - a == dt.timedelta(hours=1) for a, b in zip(hrs, hrs[1:])
        ), f"user {uid}: non-hourly step"
        # Endpoints are real activity, not padding.
        first = min(r["hr"] for r in series if r["n"] > 0)
        last = max(r["hr"] for r in series if r["n"] > 0)
        assert first == hrs[0] and last == hrs[-1]


def test_trailing_zscore_matches_python_reference(spark):
    from mk_kafka_connect_spark.operators.timeseries import (
        gapfill_hourly,
        trailing_zscore_hourly,
    )

    ev = load_table(spark, SF_SMOKE, "events")
    out = trailing_zscore_hourly(gapfill_hourly(ev, "user_id", "ts"), "user_id")
    rows = out.collect()
    by_user: dict[int, list] = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append(r)
    checked_flags = 0
    for uid, series in list(by_user.items())[:20]:
        series.sort(key=lambda r: r["hr"])
        ns = [r["n"] for r in series]
        for i, r in enumerate(series):
            hist = ns[max(0, i - 24) : i]
            w, s, q = len(hist), sum(hist), sum(x * x for x in hist)
            assert r["w_hist"] == w
            den = w * q - s * s
            if w >= 12 and den > 0:
                num = w * ns[i] - s
                assert r["zsq"] == pytest.approx(num * num / den, abs=1e-12)
                expect = num * num >= 9 * den and num > 0
                assert r["is_anomaly"] == expect
                checked_flags += r["is_anomaly"]
            else:
                assert r["zsq"] is None and r["is_anomaly"] is False
    assert checked_flags >= 0  # sanity: loop executed


def test_covariance_gram_matches_numpy_and_partitioning_invariant(spark):
    """The merged Gram statistics must equal a single-machine numpy
    reference bit-for-bit (exact integer sums), and must be IDENTICAL
    under different partitionings -- the mergeable-matrix-state property
    the operator exists to demonstrate."""
    from mk_kafka_connect_spark.operators.similarity import covariance_gram, quantize

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    q = emb.select(quantize(F.col("embedding")).alias("qv")).collect()
    A = np.array([r["qv"] for r in q], dtype=np.int64)
    n = len(A)
    G = A.T @ A
    s = A.sum(axis=0)

    def as_map(rows):
        return {
            (r["dim_i"], r["dim_j"]): (r["n"], r["sum_i"], r["sum_j"], r["sum_ij"], r["cov"])
            for r in rows
        }

    out1 = as_map(covariance_gram(emb.repartition(1), "embedding").collect())
    out13 = as_map(covariance_gram(emb.repartition(13), "embedding").collect())
    assert out1 == out13  # partitioning invariance, including the double
    assert len(out1) == 64 * 65 // 2
    for (i, j), (cnt, si, sj, sij, cov) in out1.items():
        assert cnt == n and si == s[i] and sj == s[j] and sij == G[i, j]
        expect = sij / n - (si / n) * (sj / n)
        assert cov == expect
