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
  the corpus; each query ENUMERATES its hamming-radius-r ball into explicit
  probe bucket ids and candidates come from a hash equi-join
  probe_sig == corpus_sig (never a nested-loop bit_count scan).
  Candidate count ≈ |C| · (Σ_{i≤r} C(16,i)) / 2^16 per query.
* LSH near-dup pairs — the same signatures self-joined at hamming ≤ 2
  (bucket-then-verify); the exact all-pairs variant remains as the
  bounded ground-truth oracle.

Both paths share the scoring expression, so LSH results are a strict
subset of brute-force results (recall measured in tests).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

__all__ = [
    "quantize",
    "cosine_expr",
    "cosine_topk_bruteforce",
    "cosine_topk_sq8",
    "hyperplane_signatures",
    "hamming_ball_masks",
    "cosine_topk_lsh",
    "train_ivf_centroids",
    "cosine_topk_ivf",
    "train_pq_codebooks",
    "cosine_topk_pq",
    "cosine_topk_ivf_pq",
    "embedding_near_dup_pairs",
    "embedding_near_dup_lsh",
    "label_centroids",
    "nearest_centroid_assign",
]

QUANT = 10_000


def quantize(col, scale: int = QUANT):
    """array<float> → array<long> with q[i] = round(e[i]*scale)."""
    return F.transform(col, lambda x: F.round(x * scale).cast("long"))


def _qvec(vec_col: str, quantized: bool):
    """The quantized-vector expression for an input column: the column
    itself when the caller pre-quantized (the r18 shared-corpus shape —
    one scan + quantize pass, localCheckpoint'ed in the query body, fed
    to trainer and index alike), else ``quantize``d here. The produced
    longs are identical either way, so results are bit-equal."""
    return F.col(vec_col) if quantized else quantize(F.col(vec_col))


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


def _pair_cosine_udf():
    """Arrow-vectorized pair cosine over two quantized array<long> columns.

    Bit-identical to ``cosine_expr``/the DuckDB oracle: int64 dot and
    norms are exact, the float64 sqrt/divide are single IEEE ops in the
    same order. ~50× the throughput of the interpreted HOF fold on the
    per-pair hot path (the arrays are already materialized next to each
    other, so this is pure numpy row-wise work).

    Degenerate pairs — a NULL vector or a zero-norm vector — score SQL
    NULL, matching the DuckDB oracle (NULL propagation; division by
    zero is NULL there). The naive kernel instead CRASHED on NULL rows
    (ragged ndarray) and emitted IEEE NaN on zero norms, which Spark's
    descending sort ranks FIRST while NULL ranks last — a latent top-k
    inversion if a degenerate vector ever enters a fixture (ADVICE
    r17). NaN in the returned float64 Series crosses Arrow as null."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def _cos(a: pd.Series, b: pd.Series) -> pd.Series:
        if a.empty:
            return pd.Series([], dtype="float64")
        valid = (a.notna() & b.notna()).to_numpy()
        out = np.full(len(a), np.nan)
        if valid.any():
            A = np.array(a[valid].tolist(), dtype=np.int64)
            B = np.array(b[valid].tolist(), dtype=np.int64)
            dot = (A * B).sum(axis=1).astype(np.float64)
            na = np.sqrt((A * A).sum(axis=1).astype(np.float64))
            nb = np.sqrt((B * B).sum(axis=1).astype(np.float64))
            denom = na * nb
            res = np.full(len(A), np.nan)
            np.divide(dot, denom, out=res, where=denom != 0.0)
            out[valid] = res
        return pd.Series(out)

    return _cos


def cosine_topk_bruteforce(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    quantized: bool = False,
) -> DataFrame:
    """Per-query exact top-k by cosine (desc, id asc tie-break).

    Returns (query_id, neighbor_id, cosine, rank). Queries are expected to
    be few (broadcast side); the corpus streams through unchanged.

    Pair scoring is the Arrow-vectorized int-cosine kernel (round 17;
    formerly the interpreted ``cosine_expr`` HOF fold, which dominated
    every brute-force-tier headliner — the kernel is bit-identical by
    the same argument as everywhere else it scores pairs: exact int64
    dot/norms, one IEEE sqrt-mul-divide in the same order)."""
    q = queries.select(
        F.col(id_col).alias("query_id"), _qvec(vec_col, quantized).alias("qv")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), _qvec(vec_col, quantized).alias("cv")
    )
    cos = _pair_cosine_udf()
    scored = (
        F.broadcast(q)
        .crossJoin(c)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            cos(F.col("qv"), F.col("cv")).alias("cosine"),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def _intdiv_pos(a, b):
    """Exact integer a div b for a ≥ 0, b > 0, without leaving codegen:
    (a − a mod b) / b — the numerator is an exact multiple of b, so the
    double division is exact and truncation semantics cannot diverge
    between engines (negative-operand `//`/`div` rounding differs across
    dialects; callers apply this to absolute values and reattach the
    sign)."""
    return ((a - a % b) / b).cast("long")


def _sq8_cols(df: DataFrame, vec_col: str):
    """Add int8-range scalar quantization of a quantized array<long>
    column: per-vector scale m = max(|x|) (floored at 1), q8[i] =
    sign(x)·(|x|·127 div m) ∈ [−127, 127]. Pure HOF arithmetic —
    codegen'd, exact, bit-identical to the DuckDB mirror."""
    m = F.greatest(
        F.array_max(F.transform(F.col(vec_col), F.abs)), F.lit(1).cast("long")
    )
    t = df.withColumn("_m", m)
    q8 = F.transform(
        F.col(vec_col),
        lambda x: F.when(x >= 0, _intdiv_pos(x * 127, F.col("_m"))).otherwise(
            -_intdiv_pos((-x) * 127, F.col("_m"))
        ),
    )
    return t.withColumn("_q8", q8).drop("_m")


def _sq8_pack_udf():
    """Arrow kernel fusing quantize→SQ8→byte-pack: the int8 codes land in
    a BINARY column (dims bytes per vector — 64 B at dims=64) instead of
    an array<long> (8·dims B plus offsets), so the compressed index that
    ships through broadcasts/shuffles is actually ~1/8 the bytes of the
    full-precision vectors — the bandwidth claim made physical, not just
    notional. Identical integer math to ``_sq8_cols`` (numpy ``//`` on
    non-negative ints == the HOF's exact div), pinned by a pytest."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("binary")
    def _pack(qv: pd.Series) -> pd.Series:
        if qv.empty:
            return pd.Series([], dtype=object)
        A = np.array(qv.tolist(), dtype=np.int64)
        m = np.maximum(np.abs(A).max(axis=1), 1)[:, None]
        q8 = (np.sign(A) * ((np.abs(A) * 127) // m)).astype(np.int8)
        return pd.Series([row.tobytes() for row in q8])

    return _pack


def _pair_cosine_i8_udf():
    """Pair cosine over two binary-packed int8 code columns. Same exact
    int64 dot / IEEE divide as ``_pair_cosine_udf`` (int8 products are
    lifted to int64 before summing), just decoded from the 1-byte-per-dim
    representation."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def _cos(a: pd.Series, b: pd.Series) -> pd.Series:
        if a.empty:
            return pd.Series([], dtype="float64")
        A = np.frombuffer(b"".join(a), dtype=np.int8).reshape(len(a), -1).astype(np.int64)
        B = np.frombuffer(b"".join(b), dtype=np.int8).reshape(len(b), -1).astype(np.int64)
        dot = (A * B).sum(axis=1).astype(np.float64)
        na = np.sqrt((A * A).sum(axis=1).astype(np.float64))
        nb = np.sqrt((B * B).sum(axis=1).astype(np.float64))
        return pd.Series(dot / (na * nb))

    return _cos


def cosine_topk_sq8(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    rerank: int = 30,
    quantized: bool = False,
) -> DataFrame:
    """Approximate top-k via an SQ8 FLAT index (FAISS-style): the corpus
    is scanned in the COMPRESSED domain — per-vector int8 scalar
    quantization, so the scan moves ~1/8 the bytes of the full-precision
    brute force — then only the top-``rerank`` candidates per query are
    re-scored with the exact full-precision cosine and the final top-k
    is taken from those.

    This is the memory-bandwidth tier of the ANN family: still |Q|·|C|
    comparisons (IVF/LSH are the pruning tiers), but each comparison
    touches 64 int8-range values instead of 64 full ints, and the
    full-precision vectors are only fetched for |Q|·rerank rows via an
    id equi-join. Deterministic end-to-end: integer q8 math is exact,
    the approx score's tie-break is the neighbor id, so the candidate
    set — and hence the exact-rescored result — is reproducible."""
    q_full = queries.select(
        F.col(id_col).alias("query_id"), _qvec(vec_col, quantized).alias("qv")
    )
    c_full = corpus.select(
        F.col(id_col).alias("neighbor_id"), _qvec(vec_col, quantized).alias("cv")
    )
    pack = _sq8_pack_udf()
    qc = q_full.select("query_id", pack("qv").alias("q8q"))
    cc = c_full.select("neighbor_id", pack("cv").alias("q8c"))
    # Arrow pair kernel, not the interpreted HOF fold: the compressed scan
    # IS the hot |Q|·|C| path, and the numpy matmul computes the identical
    # exact-int dot / IEEE divide (~50× the fold's throughput — measured
    # 3.4 s → ~1 s at sf0.1; the HOF fold made SQ8 as slow as brute force).
    # Codes are binary-packed int8 (64 B/vector), so the scan moves ~1/8
    # the bytes of the full-precision arrays for real, not just in name.
    cos8 = _pair_cosine_i8_udf()
    wc = W.partitionBy("query_id").orderBy(F.desc("approx"), F.asc("neighbor_id"))
    cand = (
        F.broadcast(qc)
        .crossJoin(cc)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.coalesce(cos8(F.col("q8q"), F.col("q8c")), F.lit(-2.0)).alias("approx"),
        )
        .withColumn("_crnk", F.row_number().over(wc))
        .filter(F.col("_crnk") <= rerank)
        .select("query_id", "neighbor_id")
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        cand.join(F.broadcast(q_full), "query_id")
        .join(c_full, "neighbor_id")
        .select(
            "query_id",
            "neighbor_id",
            # Deliberately the native fold, not the Arrow kernel: the
            # rescore set is rerank-sized (|Q| x rerank), too small to
            # amortize another Python stage (measured +0.5-1.5 s in
            # round 17; the kernel wins only on large pair volumes).
            cosine_expr(F.col("qv"), F.col("cv")).alias("cosine"),
        )
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def _hyperplane_sig_udf(num_planes: int, dims: int):
    """Arrow-vectorized signature kernel: one integer matmul of the
    quantized batch against the constant ±1 weight matrix, then sign-bits
    packed into a long. Bit-identical to the SQL/DuckDB formulation of
    the same mix (plans/llm.py::_sql_hsig) — int64 math is exact.

    (A generated native ±element-sum expression was tried and rejected:
    512+ term expression trees fall out of whole-stage codegen and run
    interpreted, several times slower than this Arrow matmul.)"""
    from pyspark.sql.functions import pandas_udf

    mixed = (np.arange(num_planes * dims, dtype=np.int64) * 2654435761) % (1 << 32)
    weights = np.where(mixed >= (1 << 31), 1, -1).astype(np.int64).reshape(
        num_planes, dims
    )
    shifts = np.arange(num_planes, dtype=np.int64)

    @pandas_udf("long")
    def _sig(qv: pd.Series) -> pd.Series:
        if qv.empty:
            return pd.Series([], dtype="int64")
        m = np.array(qv.tolist(), dtype=np.int64)
        bits = (m @ weights.T > 0).astype(np.int64)
        return pd.Series((bits << shifts).sum(axis=1))

    return _sig


def hyperplane_signatures(
    df: DataFrame,
    id_col: str,
    raw_vec_col: str,
    num_planes: int = 16,
    dims: int = 64,
    quantized: bool = False,
) -> DataFrame:
    """(id, sig) — deterministic random-hyperplane signature (int,
    num_planes bits) per row: bit p = (Σ_i w_pi · q_i) > 0 over the
    quantized vector. A single narrow Arrow stage projecting ONLY the id
    and the packed signature (vectors never travel with signatures, so
    downstream probe/bucket joins move two longs per row)."""
    sig = _hyperplane_sig_udf(num_planes, dims)
    # coalesce(-1) makes the signature provably non-null: without it the
    # optimizer infers isnotnull(sig) at every downstream join and — since
    # Python UDF outputs get no common-subexpression reuse — evaluates the
    # whole Arrow stage TWICE (once for the inferred filter, once for the
    # projection). -1 cannot collide with a real signature (sigs ≥ 0).
    return df.select(
        F.col(id_col),
        F.coalesce(
            sig(_qvec(raw_vec_col, quantized)), F.lit(-1).cast("long")
        ).alias("sig"),
    )


def hamming_ball_masks(num_planes: int, radius: int) -> list[int]:
    """All ``num_planes``-bit masks with popcount ≤ radius, ascending.
    ball(16, 2) = 137, ball(16, 4) = 2,517, ball(16, 7) = 26,333."""
    from itertools import combinations

    masks = []
    for r in range(radius + 1):
        for bits in combinations(range(num_planes), r):
            m = 0
            for b in bits:
                m |= 1 << b
            masks.append(m)
    masks.sort()
    return masks


def _expand_ball(df: DataFrame, sig_col: str, masks: list[int]) -> DataFrame:
    """One output row per (input row, ball mask) with ``probe_sig`` =
    sig XOR mask.

    The mask list becomes a constant array exploded in place — a narrow
    generate, NO join — so the expansion adds zero shuffles and the
    physical plan keeps every actual join an equi-join. Small balls are a
    CreateArray of literals (constant-folded once; avoided for big balls
    because building N literal Columns costs N py4j round-trips ≈
    0.5 ms each). Large balls ride a from_json'd string literal — built in
    one call, re-parsed per *expanded-side* row (~5 ms per 26k masks),
    which only the small query side ever pays."""
    import json as _json

    if len(masks) <= 1024:
        arr = F.array(*[F.lit(m).cast("long") for m in masks])
    else:
        arr = F.from_json(F.lit(_json.dumps(masks)), "array<long>")
    return df.select(
        *df.columns, F.explode(arr).alias("_mask")
    ).select(
        *df.columns,
        F.col(sig_col).bitwiseXOR(F.col("_mask")).alias("probe_sig"),
    )


def cosine_topk_lsh(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    num_planes: int = 16,
    hamming_radius: int = 4,
    dims: int = 64,
    quantized: bool = False,
) -> DataFrame:
    """Approximate top-k: probe only corpus buckets whose hyperplane
    signature is within ``hamming_radius`` of the query's.

    Each query's hamming ball is ENUMERATED into explicit probe bucket ids
    (query_sig XOR mask for every mask with popcount ≤ r), and candidates
    come from a broadcast hash EQUI-join probe_sig == corpus_sig — no
    nested-loop scan of the corpus. Per query the probe table is
    ball(num_planes, r) rows of two longs; candidates ≈
    |C|·ball(16,r)/2^16 (≈|C|/26 at r=4). The corpus side only ever flows
    through hash-join lookups, so the shape survives a 100× corpus.

    ``dims`` is the embedding dimensionality (a schema fact callers know;
    taking it as a parameter keeps plan construction action-free)."""
    # Phase 1 — candidates from signatures only. Vectors stay OUT of this
    # phase entirely (ids + sigs are two longs per row) so the probe
    # expansion and bucket join never touch a dims-long array; the
    # signature itself is a codegen'd native projection (no Python stage,
    # no shuffle).
    qsig = hyperplane_signatures(
        queries.select(F.col(id_col).alias("query_id"), F.col(vec_col)),
        "query_id",
        vec_col,
        num_planes,
        dims,
        quantized=quantized,
    ).select("query_id", F.col("sig").alias("qsig"))
    csig = hyperplane_signatures(
        corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col)),
        "neighbor_id",
        vec_col,
        num_planes,
        dims,
        quantized=quantized,
    ).select("neighbor_id", F.col("sig").alias("csig"))
    masks = hamming_ball_masks(num_planes, hamming_radius)
    probes = _expand_ball(qsig, "qsig", masks).select("query_id", "probe_sig")
    # Equi-join probes ⋈ corpus signatures. No broadcast hint: at corpus
    # scale the |Q|·ball probe table is the small side and AQE broadcasts
    # it; at bench scale the corpus is smaller and Catalyst picks that —
    # either way a hash equi-join, never a nested loop.
    cand = (
        probes.join(csig, F.col("probe_sig") == F.col("csig"))
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id")
    )
    # Phase 2 — exact rescoring: join the vectors back by id and score
    # with the vectorized pair cosine.
    qv = queries.select(
        F.col(id_col).alias("query_id"), _qvec(vec_col, quantized).alias("qv")
    )
    cv = corpus.select(
        F.col(id_col).alias("neighbor_id"), _qvec(vec_col, quantized).alias("cv")
    )
    cos = _pair_cosine_udf()
    scored = (
        cand.join(F.broadcast(qv), "query_id")
        .join(cv, "neighbor_id")
        .select("query_id", "neighbor_id", cos(F.col("qv"), F.col("cv")).alias("cosine"))
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def embedding_near_dup_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.3,
    id_cap: int | None = None,
    quantized: bool = False,
) -> DataFrame:
    """All pairs with cosine ≥ threshold (exact, quantized). O(n²·d) —
    bounded here by ``id_cap``; the scale path is LSH-bucket-then-verify
    (same signatures as cosine_topk_lsh restricted to hamming ≤ 2)."""
    base = df if id_cap is None else df.filter(F.col(id_col) < id_cap)
    v = base.select(F.col(id_col).alias("id"), _qvec(vec_col, quantized).alias("v"))
    a = v.select(F.col("id").alias("id_a"), F.col("v").alias("va"))
    b = v.select(F.col("id").alias("id_b"), F.col("v").alias("vb"))
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.coalesce(
                _pair_cosine_udf()(F.col("va"), F.col("vb")), F.lit(-2.0)
            ).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )


def embedding_near_dup_lsh(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.3,
    num_planes: int = 16,
    hamming_radius: int = 2,
    dims: int = 64,
    quantized: bool = False,
) -> DataFrame:
    """Near-dup pairs at scale: bucket-then-verify with hyperplane LSH.

    Contract (deterministic, SQL-expressible — this is NOT a best-effort
    recall sampler): return exactly the pairs (id_a < id_b) with
    hamming(sig_a, sig_b) ≤ hamming_radius AND exact quantized cosine ≥
    threshold. The candidate set comes from enumerating each row's hamming
    ball (ball(16,2) = 137 masks) into (id, probe_sig) rows and a shuffled
    EQUI-join probe_sig == sig_b — no all-pairs product anywhere, so the
    plan is |C|·137 probe rows + hash joins, linear-ish in |C| for a fixed
    bucket load. The exact all-pairs variant (embedding_near_dup_pairs)
    stays as the bounded ground-truth oracle.

    Vectors are joined back by id AFTER candidate generation (probe rows
    carry two longs, never the dims-long array)."""
    v = df.select(F.col(id_col).alias("id"), _qvec(vec_col, quantized).alias("v"))
    sigs = hyperplane_signatures(
        df.select(F.col(id_col).alias("id"), F.col(vec_col)),
        "id",
        vec_col,
        num_planes,
        dims,
        quantized=quantized,
    )
    masks = hamming_ball_masks(num_planes, hamming_radius)
    probes = _expand_ball(
        sigs.select(F.col("id").alias("id_a"), "sig"), "sig", masks
    ).select("id_a", "probe_sig")
    cand = (
        probes.join(
            sigs.select(F.col("id").alias("id_b"), F.col("sig").alias("sig_b")),
            F.col("probe_sig") == F.col("sig_b"),
        )
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
    )
    va = v.select(F.col("id").alias("id_a"), F.col("v").alias("va"))
    vb = v.select(F.col("id").alias("id_b"), F.col("v").alias("vb"))
    cos = _pair_cosine_udf()
    return (
        cand.join(va, "id_a")
        .join(vb, "id_b")
        .select("id_a", "id_b", cos(F.col("va"), F.col("vb")).alias("cosine"))
        .filter(F.col("cosine") >= threshold)
    )


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN — the coarse-quantizer scale path.
# ---------------------------------------------------------------------------


def train_ivf_centroids(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_cells: int = 8,
    iters: int = 2,
    sample_mod: int = 1,
    quantized: bool = False,
) -> np.ndarray:
    """Deterministic IVF training: seed centroids are the ``num_cells``
    corpus vectors with the smallest Knuth-mix hash of their id
    (``(id * 2654435761) mod 2^32`` — a reproducible pseudo-random
    sample; the same integer mix the hyperplane-LSH weights use, so the
    DuckDB oracle can replay seed selection exactly), optionally refined
    with ``iters`` Lloyd iterations.

    Everything is integer math on quantized vectors: the Lloyd update is
    round(sum(q)/n) per dimension, where the int64 sums are exact and
    order-independent — so the trained centroids are bit-identical across
    cluster sizes, partitionings, and reruns. ``sample_mod`` > 1 trains on
    the deterministic hash-sample ``mix(id) % sample_mod == 0`` (at
    100 TB you train the quantizer on a sample, never the full corpus).

    Returns a (num_cells × dims) int64 numpy matrix. Collecting it is
    model-parameter extraction — K·dims longs, a few KB regardless of
    corpus size — not a data materialization.
    """
    base = corpus.select(
        F.col(id_col).alias("id"), _qvec(vec_col, quantized).alias("qv")
    ).withColumn(
        "_h", F.pmod(F.col("id").cast("long") * F.lit(2654435761), F.lit(4294967296))
    )
    if sample_mod > 1:
        base = base.filter(F.pmod(F.col("_h"), F.lit(sample_mod)) == 0)
    seeds = base.orderBy("_h", "id").limit(num_cells).select("qv").collect()
    cents = np.array([r.qv for r in seeds], dtype=np.int64)

    for _ in range(iters):
        assign = assign_ivf_cells(base, cents, vec_col="qv", quantized=True)
        # Exact integer per-dimension sums: explode to (cell, pos, val),
        # aggregate, rebuild. 64× row expansion of the TRAINING SAMPLE
        # only; two shuffles per iteration, both keyed small.
        sums = (
            assign.select("cell", F.posexplode("qv").alias("pos", "val"))
            .groupBy("cell", "pos")
            .agg(F.sum("val").alias("s"), F.count(F.lit(1)).alias("n"))
            .collect()
        )
        new = cents.copy()
        acc: dict[int, dict[int, tuple[int, int]]] = {}
        for r in sums:
            acc.setdefault(r.cell, {})[r.pos] = (r.s, r.n)
        for cell, dims_map in acc.items():
            for pos, (s, n) in dims_map.items():
                # round-half-up on exact integers: deterministic
                new[cell, pos] = (2 * s + n) // (2 * n) if s >= 0 else -((2 * (-s) + n) // (2 * n))
        cents = new
    return cents


def assign_ivf_cells(
    df: DataFrame,
    centroids: np.ndarray,
    id_col: str = "id",
    vec_col: str = "embedding",
    quantized: bool = False,
    nprobe: int = 1,
) -> DataFrame:
    """Attach the (top-``nprobe``) nearest-centroid cell ids to every row.

    One Arrow-vectorized pass: each batch does a single (batch × dims) ·
    (dims × K) integer matmul against the broadcast centroid matrix — no
    K-way row expansion, no shuffle. Ties break toward the lower cell id
    (np.argsort is stable), so assignment is deterministic."""
    from pyspark.sql.functions import pandas_udf

    C = centroids.astype(np.float64)
    Cn = np.sqrt((C * C).sum(axis=1))
    Cn[Cn == 0] = 1.0
    n_cells = C.shape[0]
    take = min(nprobe, n_cells)

    @pandas_udf("array<int>")
    def _cells(qv: pd.Series) -> pd.Series:
        if qv.empty:
            return pd.Series([], dtype="object")
        A = np.array(qv.tolist(), dtype=np.float64)
        An = np.sqrt((A * A).sum(axis=1))
        An[An == 0] = 1.0
        cos = (A @ C.T) / (An[:, None] * Cn[None, :])
        # stable argsort on -cos: nearest first, ties toward lower cell id
        order = np.argsort(-cos, axis=1, kind="stable")[:, :take]
        return pd.Series(list(order.astype(np.int32)))

    qv = F.col(vec_col) if quantized else quantize(F.col(vec_col))
    out = df.withColumn("_cells", _cells(qv))
    if nprobe == 1:
        return out.withColumn("cell", F.element_at("_cells", 1)).drop("_cells")
    return out


def cosine_topk_ivf(
    corpus: DataFrame,
    queries: DataFrame,
    centroids: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    nprobe: int = 4,
    quantized: bool = False,
) -> DataFrame:
    """IVF approximate top-k: assign the corpus to inverted lists once,
    probe each query's ``nprobe`` nearest cells, rescore exactly.

    Scale shape: the corpus flows through ONE vectorized assignment pass
    (broadcast K×dims centroid matrix, no expansion) and then only ever
    participates in hash equi-joins on ``cell`` — candidates per query ≈
    |C|·nprobe/K, never a corpus scan per query and never a cross
    product. The same IVF partitioning is reusable across query batches
    (write the celled corpus once, bucket by cell). Candidate rescoring
    is the exact quantized cosine, so results are a deterministic subset
    of brute force — recall measured in tests, like the LSH path."""
    celled = assign_ivf_cells(
        corpus.select(
            F.col(id_col).alias("neighbor_id"), _qvec(vec_col, quantized).alias("cv")
        ),
        centroids,
        vec_col="cv",
        quantized=True,
        nprobe=1,
    )
    probes = (
        assign_ivf_cells(
            queries.select(
                F.col(id_col).alias("query_id"), _qvec(vec_col, quantized).alias("qv")
            ),
            centroids,
            vec_col="qv",
            quantized=True,
            nprobe=nprobe,
        )
        .select("query_id", "qv", F.explode("_cells").alias("cell"))
    )
    cos = _pair_cosine_udf()
    scored = (
        F.broadcast(probes)
        .join(celled, "cell")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            cos(F.col("qv"), F.col("cv")).alias("cosine"),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def cosine_topk_ivf_sq8(
    corpus: DataFrame,
    queries: DataFrame,
    centroids: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    nprobe: int = 4,
    rerank: int = 30,
    quantized: bool = False,
) -> DataFrame:
    """IVF + SQ8 composite top-k — the two ANN tiers stacked the way a
    100 TB deployment stacks them (FAISS ``IVFx,SQ8``): the IVF coarse
    quantizer prunes WHICH vectors each query compares against
    (candidates ≈ |C|·nprobe/K per query, hash equi-join on cell, never
    a corpus scan per query), and SQ8 shrinks EACH comparison — the
    shortlist is scored in the int8 compressed domain (~1/8 the bytes),
    cut to ``rerank`` per query, and only those fetch full-precision
    vectors for the exact rescore.

    Contrast the standalone tiers: ``cosine_topk_ivf`` rescores every
    cell candidate at full precision (bandwidth-heavy shortlist), and
    ``cosine_topk_sq8`` compress-scans the WHOLE corpus (|Q|·|C|
    comparisons). Here the |Q|·|C| term is gone and the full-precision
    fetch is |Q|·rerank id-joined rows — both axes pruned.

    Deterministic end-to-end (hash-seeded integer centroids, exact int8
    quantization, id tie-breaks on both cuts), so the whole funnel is
    SQL-replayable and hash-checked like its siblings."""
    c_full = corpus.select(
        F.col(id_col).alias("neighbor_id"), _qvec(vec_col, quantized).alias("cv")
    )
    celled = assign_ivf_cells(c_full, centroids, vec_col="cv", quantized=True, nprobe=1)
    # The inverted lists carry ONLY (id, cell, int8 code) — binary-packed
    # to dims bytes per vector, so the hot index structure that flows
    # through the cell join is ~1/8 the full-precision bytes; full vectors
    # stay in the base table and are touched per (query, rerank) pair at
    # the end.
    pack = _sq8_pack_udf()
    celled8 = celled.select("neighbor_id", "cell", pack("cv").alias("q8c"))
    q_full = queries.select(
        F.col(id_col).alias("query_id"), _qvec(vec_col, quantized).alias("qv")
    )
    probes = assign_ivf_cells(
        q_full, centroids, vec_col="qv", quantized=True, nprobe=nprobe
    )
    probes8 = probes.select(
        "query_id", pack("qv").alias("q8q"), F.explode("_cells").alias("cell")
    )
    cos8 = _pair_cosine_i8_udf()
    wc = W.partitionBy("query_id").orderBy(F.desc("approx"), F.asc("neighbor_id"))
    cand = (
        F.broadcast(probes8)
        .join(celled8, "cell")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        # coalesce keeps the UDF column non-null-typed so the window sort
        # doesn't re-evaluate it (same trick as cosine_topk_sq8).
        .select(
            "query_id",
            "neighbor_id",
            F.coalesce(cos8(F.col("q8q"), F.col("q8c")), F.lit(-2.0)).alias("approx"),
        )
        .withColumn("_crnk", F.row_number().over(wc))
        .filter(F.col("_crnk") <= rerank)
        .select("query_id", "neighbor_id")
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        cand.join(F.broadcast(q_full), "query_id")
        .join(c_full, "neighbor_id")
        .select(
            "query_id",
            "neighbor_id",
            # Deliberately the native fold, not the Arrow kernel: the
            # rescore set is rerank-sized (|Q| x rerank), too small to
            # amortize another Python stage (measured +0.5-1.5 s in
            # round 17; the kernel wins only on large pair volumes).
            cosine_expr(F.col("qv"), F.col("cv")).alias("cosine"),
        )
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def covariance_gram(
    emb: DataFrame, vec_col: str, dims: int = 64
) -> DataFrame:
    """Exact integer covariance statistics over an embedding column: for
    every dimension pair i ≤ j, the count plus Σqᵢ, Σqⱼ, Σqᵢqⱼ on the
    quantized vectors, and cov(i,j) = E[qᵢqⱼ] − E[qᵢ]E[qⱼ] as a double
    with a fixed evaluation order — the accumulation behind PCA,
    whitening, and embedding-drift monitoring.

    Scale shape — the mergeable-MATRIX-state pattern: each partition
    computes its own dims×dims integer Gram block with ONE vectorized
    AᵀA matmul (Arrow ``mapInPandas``, no row expansion, no shuffle of
    the vectors), emits dims(dims+1)/2 summary rows, and the merge is a
    plain integer sum per (i, j) — exactly how the HLL/Misra–Gries
    sketches merge, but for a dense numeric accumulator. The corpus
    never shuffles; only |partitions| × 2080 summary rows do. Exact
    int64 everywhere (q ≤ ~10⁴, so Σqᵢqⱼ stays < 2⁶³ up to ~10¹⁴ rows;
    past that, shard the sum or lift to decimal)."""
    qdf = emb.select(quantize(F.col(vec_col)).alias("_qv"))
    iu = np.triu_indices(dims)

    def gram(batches):
        tot = np.zeros((dims, dims), dtype=np.int64)
        sums = np.zeros(dims, dtype=np.int64)
        n = 0
        for pdf in batches:
            if not len(pdf):
                continue
            A = np.array(pdf["_qv"].tolist(), dtype=np.int64)
            tot += A.T @ A
            sums += A.sum(axis=0)
            n += len(A)
        if n == 0:
            return
        yield pd.DataFrame(
            {
                "dim_i": iu[0].astype(np.int32),
                "dim_j": iu[1].astype(np.int32),
                "n": np.int64(n),
                "sum_i": sums[iu[0]],
                "sum_j": sums[iu[1]],
                "sum_ij": tot[iu],
            }
        )

    partials = qdf.mapInPandas(
        gram, schema="dim_i int, dim_j int, n long, sum_i long, sum_j long, sum_ij long"
    )
    merged = partials.groupBy("dim_i", "dim_j").agg(
        F.sum("n").alias("n"),
        F.sum("sum_i").alias("sum_i"),
        F.sum("sum_j").alias("sum_j"),
        F.sum("sum_ij").alias("sum_ij"),
    )
    # Fixed evaluation order so the double is bit-identical cross-engine:
    # sum_ij/n − (sum_i/n)·(sum_j/n), each divide on the exact int64.
    return merged.select(
        "dim_i",
        "dim_j",
        "n",
        "sum_i",
        "sum_j",
        "sum_ij",
        (
            F.col("sum_ij").cast("double") / F.col("n")
            - (F.col("sum_i").cast("double") / F.col("n"))
            * (F.col("sum_j").cast("double") / F.col("n"))
        ).alias("cov"),
    )


def label_centroids(emb: DataFrame, vec_col: str, label_col: str) -> DataFrame:
    """Per-label centroid statistics in exploded (label, dim) form: count,
    exact component sum, and mean — the class-prototype computation behind
    nearest-centroid classification, IVF coarse training, and embedding
    drift monitoring.

    Float addition is not associative, so a naive double sum is
    nondeterministic under Spark's partial aggregation; components are
    summed as DECIMAL(28,9) (exact, associative, mergeable map-side) and
    only cast to double at the end — bit-identical on every engine and
    every partitioning. Scale shape: posexplode → one hash aggregation on
    (label, dim); output is |labels| × dims rows regardless of input."""
    return (
        emb.select(label_col, F.posexplode(vec_col).alias("dim", "_v"))
        .groupBy(label_col, F.col("dim").cast("long").alias("dim"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("_v").cast("double").cast("decimal(28,9)")).alias("_s"),
        )
        .select(
            label_col,
            "dim",
            "n",
            F.col("_s").cast("double").alias("sum_val"),
            (F.col("_s").cast("double") / F.col("n")).alias("mean_val"),
        )
    )


def nearest_centroid_assign(
    emb: DataFrame, vec_col: str, label_col: str, id_col: str
) -> DataFrame:
    """Nearest-centroid classification: quantized per-label centroids
    (integer round-half-up of the exact component sums — the same
    integer Lloyd update `train_ivf_centroids` uses, so centroids are
    bit-identical on any partitioning), then every vector scored against
    every centroid by exact-int cosine and assigned the best (ties break
    toward the lower label).

    Plan shape: the centroid relation is K rows (K = |labels|),
    broadcast-cross-joined against the probes (a deliberate K-row-build
    BroadcastNestedLoopJoin, allowlisted in test_plan_smells.py — bounded
    by K, not data volume), then a map-side-combinable max_by(struct)
    picks the winner — no window sort. At very large K the expansion
    would switch to the Arrow matmul path (`assign_ivf_cells`) with
    centroids broadcast as collected model parameters; at
    classification-scale K (tens of classes) the in-plan join keeps the
    whole thing declarative."""
    q = emb.select(
        id_col,
        F.col(label_col).alias("true_label"),
        quantize(F.col(vec_col)).alias("qv"),
    )
    # Exact integer centroid: s/n rounded half away from zero, computed
    # as (2|s| + n) DIV 2n on int64 — no float division anywhere.
    comp = (
        q.select("true_label", F.posexplode("qv").alias("dim", "val"))
        .groupBy(F.col("true_label").alias("cand_label"), F.col("dim"))
        .agg(F.sum("val").alias("s"), F.count(F.lit(1)).alias("n"))
        .withColumn(
            "c",
            F.when(
                F.col("s") >= 0, F.expr("(2 * s + n) DIV (2 * n)")
            ).otherwise(-F.expr("(2 * -s + n) DIV (2 * n)")),
        )
    )
    cents = comp.groupBy("cand_label").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("dim", "c"))), lambda x: x["c"]
        ).alias("cqv")
    )
    scored = (
        q.crossJoin(F.broadcast(cents))
        .select(
            id_col,
            "true_label",
            "cand_label",
            # Native fold on purpose: K-centroid scoring is K pairs/row
            # (tens), below the Arrow-stage amortization point.
            cosine_expr(F.col("qv"), F.col("cqv")).alias("cos"),
        )
    )
    best = (
        scored.groupBy(id_col, "true_label")
        .agg(
            F.max(
                F.struct(
                    F.col("cos").alias("c"),
                    (-F.col("cand_label")).cast("long").alias("nl"),
                )
            ).alias("m")
        )
        .select(
            id_col,
            "true_label",
            (-F.col("m.nl")).cast("int").alias("pred_label"),
            F.col("m.c").alias("cosine"),
        )
    )
    return best


def train_pq_codebooks(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_sub: int = 4,
    codes_per_sub: int = 16,
    iters: int = 1,
    quantized: bool = False,
) -> np.ndarray:
    """Deterministic product-quantization training (FAISS ``PQ4x4``
    shape): the vector splits into ``num_sub`` contiguous subspaces and
    each gets its own ``codes_per_sub``-entry codebook. Seeds are the
    subvectors of the SAME Knuth-mix hash-ordered rows the IVF trainer
    uses (one K-row collect serves all subspaces), refined with
    ``iters`` Lloyd steps under integer squared-L2 assignment (ties to
    the lower code — np.argmin is first-occurrence) and the IVF
    trainer's exact round-half-away centroid update — so the codebooks
    are bit-identical across partitionings and SQL-replayable.

    Returns (num_sub × codes_per_sub × dsub) int64. Like the IVF
    centroids this is model-parameter extraction: K·dims longs total,
    KBs regardless of corpus size."""
    base = corpus.select(
        F.col(id_col).alias("id"), _qvec(vec_col, quantized).alias("qv")
    ).withColumn(
        "_h", F.pmod(F.col("id").cast("long") * F.lit(2654435761), F.lit(4294967296))
    )
    seeds = base.orderBy("_h", "id").limit(codes_per_sub).select("qv").collect()
    S0 = np.array([r.qv for r in seeds], dtype=np.int64)  # (K, dims)
    dims = S0.shape[1]
    dsub = dims // num_sub
    books = np.stack(
        [S0[:, m * dsub : (m + 1) * dsub] for m in range(num_sub)]
    )  # (M, K, dsub)

    for _ in range(iters):
        coded = _pq_assign(base, books, vec_col="qv")
        # (M, code, pos) integer sums over the training rows: the explode
        # is dims x |rows| — the same expansion the IVF trainer uses —
        # and the collect is M*K*dsub summary rows (model-sized).
        sums = (
            coded.select(
                F.posexplode("_codes").alias("m", "code"), "qv"
            )
            .select(
                "m",
                "code",
                F.posexplode(
                    F.expr(f"slice(qv, m * {dsub} + 1, {dsub})")
                ).alias("pos", "val"),
            )
            .groupBy("m", "code", "pos")
            .agg(F.sum("val").alias("s"), F.count(F.lit(1)).alias("n"))
            .collect()
        )
        new = books.copy()
        for r in sums:
            s, n = r.s, r.n
            new[r.m, r.code, r.pos] = (
                (2 * s + n) // (2 * n) if s >= 0 else -((2 * (-s) + n) // (2 * n))
            )
        books = new
    return books


def _pq_assign(df: DataFrame, books: np.ndarray, vec_col: str) -> DataFrame:
    """Attach ``_codes`` (array<int>, one code per subspace): per batch,
    one integer |x-c|^2 evaluation against each broadcast sub-codebook
    via matmul identity |x|^2 - 2x.c + |c|^2 — exact int64, stable
    argmin ties to the lower code."""
    from pyspark.sql.functions import pandas_udf

    B = books.astype(np.int64)
    M, K, dsub = B.shape

    @pandas_udf("array<int>")
    def _codes(qv: pd.Series) -> pd.Series:
        if qv.empty:
            return pd.Series([], dtype="object")
        A = np.array(qv.tolist(), dtype=np.int64)
        out = np.empty((len(A), M), dtype=np.int32)
        for m in range(M):
            X = A[:, m * dsub : (m + 1) * dsub]
            C = B[m]
            d = (
                (X * X).sum(axis=1)[:, None]
                - 2 * (X @ C.T)
                + (C * C).sum(axis=1)[None, :]
            )
            out[:, m] = np.argmin(d, axis=1)
        return pd.Series(list(out))

    return df.withColumn("_codes", _codes(F.col(vec_col)))


def _pq_pack_udf():
    """array<int> codes -> BINARY (one uint8 per subspace): the PQ index
    physically ships num_sub BYTES per vector — with 4 subspaces that is
    64 B (SQ8) -> 4 B, a further 16x on top of SQ8's 8x."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("binary")
    def _pack(codes: pd.Series) -> pd.Series:
        if codes.empty:
            return pd.Series([], dtype=object)
        A = np.array(codes.tolist(), dtype=np.uint8)
        return pd.Series([row.tobytes() for row in A])

    return _pack


def _pq_adc_udf(books: np.ndarray):
    """Asymmetric distance computation: cosine of the full-precision
    query against the CODE RECONSTRUCTION, evaluated by codebook gather
    (never materializing the reconstructed vectors): dot = sum_m
    LUT[m][code_m] with LUT[m] = q_sub_m . codebook_m, |recon|^2 =
    sum_m |centroid|^2 gathered the same way. Exact int64 sums, one
    sqrt/divide — bit-identical to DuckDB scoring the concatenated
    reconstruction with the shared cosine fragment."""
    from pyspark.sql.functions import pandas_udf

    B = books.astype(np.int64)
    M, K, dsub = B.shape
    cn2 = (B * B).sum(axis=2)  # (M, K) exact |centroid|^2

    @pandas_udf("double")
    def _adc(qv: pd.Series, codes: pd.Series) -> pd.Series:
        if qv.empty:
            return pd.Series([], dtype="float64")
        Q = np.array(qv.tolist(), dtype=np.int64)
        C = np.frombuffer(b"".join(codes), dtype=np.uint8).reshape(len(codes), M)
        dot = np.zeros(len(Q), dtype=np.int64)
        r2 = np.zeros(len(Q), dtype=np.int64)
        for m in range(M):
            lut = Q[:, m * dsub : (m + 1) * dsub] @ B[m].T  # (rows, K)
            idx = C[:, m].astype(np.int64)
            dot += lut[np.arange(len(Q)), idx]
            r2 += cn2[m][idx]
        nq = np.sqrt((Q * Q).sum(axis=1).astype(np.float64))
        return pd.Series(dot.astype(np.float64) / (nq * np.sqrt(r2.astype(np.float64))))

    return _adc


def cosine_topk_pq(
    corpus: DataFrame,
    queries: DataFrame,
    books: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    rerank: int = 30,
    quantized: bool = False,
) -> DataFrame:
    """Approximate top-k via a PRODUCT-QUANTIZED flat index (FAISS
    ``PQ``): the corpus scan reads ``num_sub`` BYTES per vector (4 B
    here — 16x smaller than SQ8's 64 B, ~128x smaller than the
    full-precision ints), scores by codebook gather (ADC), cuts to the
    top-``rerank`` per query, and re-scores those exactly. Completes
    the ANN family's compression axis: LSH/IVF prune WHICH vectors are
    compared, SQ8 shrinks each comparison 8x, PQ shrinks it to
    codebook lookups. Deterministic end-to-end (integer training,
    stable-argmin encoding, id tie-breaks), so the full pipeline —
    training included — replays in SQL for the driver's value hash."""
    q_full = queries.select(
        F.col(id_col).alias("query_id"), _qvec(vec_col, quantized).alias("qv")
    )
    c_full = corpus.select(
        F.col(id_col).alias("neighbor_id"), _qvec(vec_col, quantized).alias("cv")
    )
    pack = _pq_pack_udf()
    cc = (
        _pq_assign(c_full, books, vec_col="cv")
        .select("neighbor_id", pack("_codes").alias("pqc"))
    )
    adc = _pq_adc_udf(books)
    wc = W.partitionBy("query_id").orderBy(F.desc("approx"), F.asc("neighbor_id"))
    cand = (
        F.broadcast(q_full)
        .crossJoin(cc)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.coalesce(adc(F.col("qv"), F.col("pqc")), F.lit(-2.0)).alias("approx"),
        )
        .withColumn("_crnk", F.row_number().over(wc))
        .filter(F.col("_crnk") <= rerank)
        .select("query_id", "neighbor_id")
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        cand.join(F.broadcast(q_full), "query_id")
        .join(c_full, "neighbor_id")
        .select(
            "query_id",
            "neighbor_id",
            # Deliberately the native fold, not the Arrow kernel: the
            # rescore set is rerank-sized (|Q| x rerank), too small to
            # amortize another Python stage (measured +0.5-1.5 s in
            # round 17; the kernel wins only on large pair volumes).
            cosine_expr(F.col("qv"), F.col("cv")).alias("cosine"),
        )
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def cosine_topk_ivf_pq(
    corpus: DataFrame,
    queries: DataFrame,
    centroids: np.ndarray,
    books: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    nprobe: int = 4,
    rerank: int = 60,
    quantized: bool = False,
) -> DataFrame:
    """The production-default ANN index (FAISS ``IVFx,PQy``): the IVF
    coarse quantizer prunes WHICH vectors each query compares against
    (inverted-list hash equi-join on ``cell``), and the shortlist is
    scored against 16-byte PQ codes by codebook gather before the exact
    rescore of the top-``rerank``. Relative to IVF+SQ8 the per-candidate
    bytes drop another 4x; relative to flat PQ the candidate count drops
    by ~nprobe/num_cells. Same determinism guarantees as both parents —
    the full pipeline (both trainings included) replays in SQL."""
    c_full = corpus.select(
        F.col(id_col).alias("neighbor_id"), _qvec(vec_col, quantized).alias("cv")
    )
    q_full = queries.select(
        F.col(id_col).alias("query_id"), _qvec(vec_col, quantized).alias("qv")
    )
    pack = _pq_pack_udf()
    celled = assign_ivf_cells(c_full, centroids, vec_col="cv", quantized=True, nprobe=1)
    cc = _pq_assign(celled, books, vec_col="cv").select(
        "neighbor_id", "cell", pack("_codes").alias("pqc")
    )
    probes = (
        assign_ivf_cells(q_full, centroids, vec_col="qv", quantized=True, nprobe=nprobe)
        .select("query_id", "qv", F.explode("_cells").alias("cell"))
    )
    adc = _pq_adc_udf(books)
    wc = W.partitionBy("query_id").orderBy(F.desc("approx"), F.asc("neighbor_id"))
    cand = (
        F.broadcast(probes)
        .join(cc, "cell")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.coalesce(adc(F.col("qv"), F.col("pqc")), F.lit(-2.0)).alias("approx"),
        )
        .withColumn("_crnk", F.row_number().over(wc))
        .filter(F.col("_crnk") <= rerank)
        .select("query_id", "neighbor_id")
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        cand.join(F.broadcast(q_full), "query_id")
        .join(c_full, "neighbor_id")
        .select(
            "query_id",
            "neighbor_id",
            # Deliberately the native fold, not the Arrow kernel: the
            # rescore set is rerank-sized (|Q| x rerank), too small to
            # amortize another Python stage (measured +0.5-1.5 s in
            # round 17; the kernel wins only on large pair volumes).
            cosine_expr(F.col("qv"), F.col("cv")).alias("cosine"),
        )
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def mmr_rerank(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    pool: int = 20,
    lam_num: int = 7,
    lam_den: int = 10,
    quantized: bool = False,
) -> DataFrame:
    """Maximal-Marginal-Relevance diversified top-k (Carbonell & Goldstein
    1998): greedily pick k results from a pool-sized relevance shortlist,
    each step maximizing lam*rel(q,c) - (1-lam)*max_{s in selected}
    sim(c,s) — the retrieval re-rank that stops near-duplicate passages
    from filling the context window.

    All scores are INTEGER inner products of the quantized vectors (the
    MIPS formulation — cosine-equivalent when embeddings are normalized
    upstream) and lambda is the rational lam_num/lam_den, so every greedy
    comparison is exact int64 arithmetic with an id-asc tie-break:
    bit-deterministic, and the whole greedy unrolls into the SQL oracle.

    Scale shape: candidate generation is the broadcast-queries relevance
    scan + a per-query top-pool window (swap in the IVF/LSH tiers when
    the corpus outgrows a full scan — the re-rank only needs SOME
    pool-sized shortlist); the greedy itself runs per query group in ONE
    Arrow batch over pool<=20 rows (pool^2 dots in one numpy matmul) —
    sequential by nature, but over model-sized state, never corpus rows."""
    q = queries.select(
        F.col(id_col).alias("query_id"), _qvec(vec_col, quantized).alias("qv")
    )
    c = corpus.select(
        F.col(id_col).alias("cand_id"), _qvec(vec_col, quantized).alias("cv")
    )
    scored = (
        F.broadcast(q)
        .crossJoin(c)
        .filter(F.col("query_id") != F.col("cand_id"))
        .select(
            "query_id", "cand_id", _dot(F.col("qv"), F.col("cv")).alias("rel"), "cv"
        )
    )
    w = W.partitionBy("query_id").orderBy(F.desc("rel"), F.asc("cand_id"))
    cand = (
        scored.withColumn("_rnk", F.row_number().over(w))
        .filter(F.col("_rnk") <= pool)
        .drop("_rnk")
    )

    def _greedy(pdf: pd.DataFrame) -> pd.DataFrame:
        ids = pdf["cand_id"].to_numpy()
        rel = pdf["rel"].to_numpy(dtype=np.int64)
        V = np.array(pdf["cv"].tolist(), dtype=np.int64)
        S = V @ V.T  # pairwise integer sims, pool x pool
        n = len(ids)
        picked: list[int] = []
        for rank in range(1, min(k, n) + 1):
            best = None
            for i in range(n):
                if i in picked:
                    continue
                if picked:
                    score = lam_num * int(rel[i]) - (lam_den - lam_num) * int(
                        max(S[i, j] for j in picked)
                    )
                else:
                    score = lam_den * int(rel[i])
                key = (-score, int(ids[i]))
                if best is None or key < best[0]:
                    best = (key, i, rank)
            picked.append(best[1])
        return pd.DataFrame(
            {
                "query_id": pdf["query_id"].iloc[0],
                "neighbor_id": [int(ids[i]) for i in picked],
                "rank": list(range(1, len(picked) + 1)),
            }
        )

    return cand.groupBy("query_id").applyInPandas(
        _greedy, "query_id long, neighbor_id long, rank int"
    )
