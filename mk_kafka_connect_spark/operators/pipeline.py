"""Training-data pipeline composition operators (SURVEY.md §2.B B15):
deterministic train/val/test splitting and benchmark decontamination.

These are the glue stages between the quality/dedup/similarity operators:
every assignment is a pure function of content hashes (md5-based, mirrored
exactly in DuckDB SQL), so splits and contamination flags are reproducible
across engines, cluster sizes, and reruns — the property a 100 TB corpus
rebuild cannot live without. No RNG, no state files.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import md5_mod
from .dedup import shingle_hashes

__all__ = ["hash_split", "decontaminate", "stratified_hash_sample"]


def hash_split(
    df: DataFrame,
    id_col: str,
    splits: tuple[tuple[str, int], ...] = (("train", 8), ("val", 1), ("test", 1)),
) -> DataFrame:
    """Deterministic split assignment: bucket = md5_mod(id) % Σweights,
    mapped to named ranges (train gets [0,8), val [8,9), test [9,10) at
    the 8/1/1 default).

    Pure map-side projection — no shuffle, no sampling state; a document
    lands in the same split on every engine and every rerun, and adding
    data never reassigns existing rows."""
    total = sum(w for _, w in splits)
    bucket = md5_mod(F.col(id_col).cast("string")) % total
    expr = None
    lo = 0
    for name, w in splits:
        cond = (bucket >= lo) & (bucket < lo + w)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
        lo += w
    return df.withColumn("split", expr)


def decontaminate(
    train: DataFrame,
    benchmark: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 3,
    min_overlap: int = 2,
) -> DataFrame:
    """Benchmark decontamination: flag training documents sharing at least
    ``min_overlap`` distinct word-``n``-gram shingles with ANY benchmark
    document.

    Scale shape: the benchmark's distinct shingle hashes are a small
    relation (benchmarks are thousands of docs, not billions) — the join
    against the exploded training shingles broadcasts it, so the
    training corpus streams through one map-side hash lookup plus one
    aggregation keyed on ``id_col``. Returns (id, n_overlap,
    contaminated) for every training row."""
    t = shingle_hashes(train.select(id_col, text_col), text_col, n).select(
        id_col, F.explode("sh").alias("h")
    )
    b = (
        shingle_hashes(benchmark.select(text_col), text_col, n)
        .select(F.explode("sh").alias("h"))
        .distinct()
    )
    overlap = (
        t.join(F.broadcast(b), "h")
        .groupBy(id_col)
        .agg(F.countDistinct("h").alias("n_overlap"))
    )
    return (
        train.select(id_col)
        .join(overlap, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("n_overlap"), F.lit(0).cast("long")).alias("n_overlap"),
        )
        .withColumn("contaminated", F.col("n_overlap") >= min_overlap)
    )


def stratified_hash_sample(
    df: DataFrame,
    id_col: str,
    stratum_col: str,
    rates_pct: dict[str, int],
    default_pct: int = 0,
) -> DataFrame:
    """Per-stratum deterministic sampling: keep a row iff
    ``md5(stratum ':' id) % 100 < rate_pct(stratum)`` — the
    lang-/source-balancing stage of corpus construction (e.g. upsample
    low-resource languages, downsample boilerplate-heavy sources).

    Same contract as :func:`hash_split`: pure map-side, no RNG state,
    membership is a function of (stratum, id) alone — stable across
    engines, reruns, and corpus growth. Salting the hash with the stratum
    decorrelates it from any other hash-derived assignment (a row's
    sample fate is independent of its train/val/test split)."""
    bucket = (
        md5_mod(
            F.concat_ws(":", F.col(stratum_col).cast("string"), F.col(id_col).cast("string"))
        )
        % 100
    )
    rate = F.lit(default_pct)
    for k, v in sorted(rates_pct.items()):
        rate = F.when(F.col(stratum_col) == k, F.lit(v)).otherwise(rate)
    return df.filter(bucket < rate)
