"""Focused contracts for the round-18 optimization internals: the
pre-quantized (shared-corpus) operator path must produce byte-identical
results to the quantize-inside path it replaced, and the shared-pass
multi-quantile descent must reproduce the single-quantile descent's
values bit-for-bit."""

from __future__ import annotations

from pyspark.sql import functions as F

from mk_kafka_connect_spark.catalog import load_table
from mk_kafka_connect_spark.operators import similarity as S
from mk_kafka_connect_spark.operators.sketch import (
    exact_quantile_distributed,
    exact_quantiles_distributed,
)

SF = "/root/testdata/sf0.001"


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def _embq(spark):
    emb = load_table(spark, SF, "embeddings")
    return emb.select(
        "vec_id", S.quantize(F.col("embedding")).alias("embedding")
    )


def test_bruteforce_quantized_path_identical(spark):
    emb = load_table(spark, SF, "embeddings")
    raw = S.cosine_topk_bruteforce(
        emb, emb.filter(F.col("vec_id") < 20), k=5
    )
    q = _embq(spark)
    pre = S.cosine_topk_bruteforce(
        q, q.filter(F.col("vec_id") < 20), k=5, quantized=True
    )
    assert _rows(raw) == _rows(pre)


def test_ivf_pipeline_quantized_path_identical(spark):
    emb = load_table(spark, SF, "embeddings")
    q = _embq(spark)
    cents_raw = S.train_ivf_centroids(emb, num_cells=4, iters=1)
    cents_pre = S.train_ivf_centroids(q, num_cells=4, iters=1, quantized=True)
    assert (cents_raw == cents_pre).all()
    raw = S.cosine_topk_ivf(
        emb, emb.filter(F.col("vec_id") < 20), cents_raw, k=5, nprobe=2
    )
    pre = S.cosine_topk_ivf(
        q, q.filter(F.col("vec_id") < 20), cents_pre, k=5, nprobe=2,
        quantized=True,
    )
    assert _rows(raw) == _rows(pre)


def test_lsh_quantized_path_identical(spark):
    emb = load_table(spark, SF, "embeddings")
    q = _embq(spark)
    raw = S.embedding_near_dup_lsh(
        emb, threshold=0.3, num_planes=8, hamming_radius=2
    )
    pre = S.embedding_near_dup_lsh(
        q, threshold=0.3, num_planes=8, hamming_radius=2, quantized=True
    )
    assert _rows(raw) == _rows(pre)


def test_multi_quantile_descent_matches_single(spark):
    li = load_table(spark, SF, "lineitem")
    qs = {"p10": 0.1, "p50": 0.5, "p90": 0.9, "p99": 0.99}
    multi = exact_quantiles_distributed(li, "l_extendedprice", qs)
    for name, qv in qs.items():
        single = exact_quantile_distributed(li, "l_extendedprice", q=qv)
        assert multi[name] == single, (name, multi[name], single)
