"""Frequent-items (heavy-hitters) sketching: per-partition Misra–Gries
summaries merged into a global estimate with a provable error bound — the
100 TB idiom for "top keys by frequency" when the key cardinality is too
large to exact-count: each partition keeps at most ``capacity`` counters
(constant memory regardless of partition size), only the tiny summaries
shuffle, and the merge is a plain sum per key.

Guarantees (standard Misra–Gries, per partition p with n_p rows and d_p
total decrement rounds ≤ (n_p − Σ counters_p) / (capacity + 1)):

- est_p(key) ≤ true_p(key) ≤ est_p(key) + d_p   (est_p = 0 if absent)
- summing over partitions: est(key) ≤ true(key) ≤ est(key) + Σ_p d_p
- any key with true(key) > Σ_p d_p has est(key) > 0 (cannot be missed)

The sketch CONTENT depends on row order within partitions, so estimates
are not cross-engine-reproducible; queries built on this emit the exact
count plus the bound predicates as booleans (the agg_approx_* pattern),
and the eviction math itself is pinned by a crafted-skew pytest.
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def partition_summaries(
    df: DataFrame, key_col: str, capacity: int = 64
) -> DataFrame:
    """Misra–Gries summary rows per partition: (pid, key, est, err) with
    one err value per partition (repeated on its rows; ``first(err)``
    grouped by pid recovers it). Arrow-batched ``mapInPandas``; the
    counter dict is bounded by ``capacity`` regardless of input size."""
    pid_df = df.select(
        F.col(key_col).cast("string").alias("_k"),
        F.spark_partition_id().alias("_pid"),
    )

    def sketch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict[str, int] = {}
        n = 0
        pid = None
        for pdf in batches:
            if len(pdf):
                pid = int(pdf["_pid"].iloc[0])
            for k in pdf["_k"]:
                n += 1
                if k in counters:
                    counters[k] += 1
                elif len(counters) < capacity:
                    counters[k] = 1
                else:
                    dead = []
                    for kk in counters:
                        counters[kk] -= 1
                        if counters[kk] == 0:
                            dead.append(kk)
                    for kk in dead:
                        del counters[kk]
        if pid is None:
            return
        # Total decrement rounds: each round removes capacity+1 from the
        # residual mass (capacity counters + the unadmitted arrival).
        err = (n - sum(counters.values())) // (capacity + 1)
        yield pd.DataFrame(
            {
                "pid": pid,
                "key": list(counters),
                "est": list(counters.values()),
                "err": err,
            }
        )

    return pid_df.mapInPandas(sketch, schema="pid int, key string, est long, err long")


def heavy_hitters_checked(
    df: DataFrame, key_col: str, capacity: int = 64, min_share_ppm: int = 50000
) -> DataFrame:
    """Keys above ``min_share_ppm`` of the total, with exact counts and
    the two sketch-guarantee predicates as booleans: the merged estimate
    brackets the exact count (est ≤ exact ≤ est + Σ err), and the key is
    present in the merged sketch whenever the guarantee says it cannot be
    missed. Deterministic output (exact counts + TRUE booleans) even
    though the sketch internals vary with partitioning — the
    agg_approx_* oracle pattern."""
    summaries = partition_summaries(df, key_col, capacity)
    merged = summaries.groupBy("key").agg(F.sum("est").alias("est"))
    total_err = (
        summaries.groupBy("pid")
        .agg(F.first("err").alias("err"))
        .agg(F.sum("err").alias("total_err"))
    )
    exact = df.groupBy(F.col(key_col).cast("string").alias("key")).agg(
        F.count(F.lit(1)).alias("exact_count")
    )
    total = df.agg(F.count(F.lit(1)).alias("n_total"))
    return (
        exact.join(merged, "key", "left")
        .crossJoin(F.broadcast(total))
        .crossJoin(F.broadcast(total_err))
        .filter(
            F.col("exact_count") * 1000000 > F.col("n_total") * min_share_ppm
        )
        .select(
            "key",
            "exact_count",
            # Exact integer floor of the ppm share (both operands
            # positive, so DIV matches DuckDB's // exactly).
            F.expr("(exact_count * 1000000) DIV n_total").alias("share_ppm_floor"),
            (
                (F.coalesce(F.col("est"), F.lit(0)) <= F.col("exact_count"))
                & (
                    F.col("exact_count")
                    <= F.coalesce(F.col("est"), F.lit(0)) + F.col("total_err")
                )
            ).alias("within_bounds"),
            (
                (F.col("exact_count") <= F.col("total_err"))
                | (F.coalesce(F.col("est"), F.lit(0)) > 0)
            ).alias("present_when_guaranteed"),
        )
    )


def exact_quantile_distributed(
    df, col: str, q: float = 0.5, buckets: int = 2048, max_refine: int = 6
):
    """EXACT quantile by distributed selection — the 100 TB alternative
    to Spark's ``percentile()``, whose sort-based aggregate buffers every
    value of a group in one task's memory. Here no task ever holds more
    than a count:

    repeat: one aggregation pass histograms the current [lo, hi) value
    range into ``buckets`` equi-width counts (map-side partials, a
    ``buckets``-row result), the bucket containing the target rank is
    located driver-side, and the range narrows to it — rank-k selection
    by radix descent. Stops when the bucket holds one distinct value or
    ``max_refine`` passes, then one final pass takes the min value at or
    above the target rank inside the narrowed range. Deterministic:
    counts are exact, bucket boundaries are pure arithmetic on the
    initial min/max, and the answer is an actual data value
    (``quantile_disc`` semantics, rank = ceil(q·n)).

    Returns the value as a Python float (model-parameter extraction —
    each pass collects ``buckets`` longs, never rows)."""
    from pyspark.sql import functions as F

    n, lo, hi = df.agg(
        F.count(col), F.min(col).cast("double"), F.max(col).cast("double")
    ).collect()[0]
    if n == 0:
        return None
    target = max(1, math.ceil(q * n))  # 1-based rank of the quantile value
    rank_before = 0  # values strictly below current [lo, hi)
    for _ in range(max_refine):
        if lo == hi:
            break
        width = (hi - lo) / buckets
        bucket = F.least(
            F.lit(buckets - 1),
            F.floor((F.col(col).cast("double") - F.lit(lo)) / F.lit(width)).cast("int"),
        )
        hist = {
            r["b"]: r["c"]
            for r in df.where(
                (F.col(col) >= lo) & (F.col(col) <= hi)
            )
            .groupBy(bucket.alias("b"))
            .agg(F.count(F.lit(1)).alias("c"))
            .collect()
        }
        run = rank_before
        located = 0
        for b in range(buckets):
            c = hist.get(b, 0)
            if run + c >= target:
                new_lo = lo + b * width
                new_hi = hi if b == buckets - 1 else lo + (b + 1) * width
                rank_before, lo, hi, located = run, new_lo, new_hi, c
                break
            run += c
        else:  # pragma: no cover - target <= n guarantees a bucket
            break
        # Early stop: once the located bucket holds few enough values,
        # the final ordered selection is already cheap — more histogram
        # passes would only trade one small job for another.
        if located <= 4096:
            break
    # Final pass: k-th smallest within the narrowed range = max of the
    # k smallest — ORDER BY + LIMIT compiles to TakeOrderedAndProject
    # (per-partition top-k heaps + driver merge of k values), so the
    # selection never plans a window or a global sort; k is bounded by
    # the located bucket's count (≤4096 after descent), the same bound
    # the early-stop already relies on.
    remaining = (
        df.where((F.col(col) >= lo) & (F.col(col) <= hi))
        .select(F.col(col).cast("double").alias("_v"))
    )
    k = target - rank_before
    row = remaining.orderBy("_v").limit(k).agg(F.max("_v").alias("_v")).collect()
    return row[0]["_v"] if row and row[0]["_v"] is not None else None


def exact_quantiles_distributed(
    df,
    col: str,
    qs: dict[str, float],
    buckets: int = 2048,
    max_refine: int = 6,
) -> dict[str, float | None]:
    """Several exact quantiles of one column, sharing the passes that do
    not depend on q (r18: ``agg_quantiles_distributed`` ran 4 separate
    descents = 4 count/min/max passes + 4 identical full-range
    histograms over the same column).

    The count/min/max pass and the FIRST histogram pass are functions of
    the column alone, so they run ONCE here; each quantile then locates
    its target bucket in the shared histogram and continues the
    per-quantile radix descent exactly as :func:`exact_quantile_distributed`
    does from its second refinement on (same bucket arithmetic, same
    ≤4096 early stop, same final TakeOrdered selection) — so each
    returned value is bit-identical to the single-quantile function's.
    Subsequent per-quantile passes filter to the narrowed value range,
    which parquet min/max row-group stats prune at the scan."""
    n, lo0, hi0 = df.agg(
        F.count(col), F.min(col).cast("double"), F.max(col).cast("double")
    ).collect()[0]
    if n == 0:
        return {name: None for name in qs}

    def _hist(lo: float, hi: float) -> dict[int, int]:
        width = (hi - lo) / buckets
        bucket = F.least(
            F.lit(buckets - 1),
            F.floor(
                (F.col(col).cast("double") - F.lit(lo)) / F.lit(width)
            ).cast("int"),
        )
        return {
            r["b"]: r["c"]
            for r in df.where((F.col(col) >= lo) & (F.col(col) <= hi))
            .groupBy(bucket.alias("b"))
            .agg(F.count(F.lit(1)).alias("c"))
            .collect()
        }

    hist0 = _hist(lo0, hi0) if lo0 != hi0 else None

    out: dict[str, float | None] = {}
    for name, q in qs.items():
        target = max(1, math.ceil(q * n))
        rank_before, lo, hi = 0, lo0, hi0
        hist = hist0
        for pass_no in range(max_refine):
            if lo == hi:
                break
            if hist is None:  # passes after the shared first one
                hist = _hist(lo, hi)
            width = (hi - lo) / buckets
            run = rank_before
            located = 0
            for b in range(buckets):
                c = hist.get(b, 0)
                if run + c >= target:
                    new_lo = lo + b * width
                    new_hi = hi if b == buckets - 1 else lo + (b + 1) * width
                    rank_before, lo, hi, located = run, new_lo, new_hi, c
                    break
                run += c
            else:  # pragma: no cover - target <= n guarantees a bucket
                break
            hist = None
            if located <= 4096:
                break
        remaining = df.where((F.col(col) >= lo) & (F.col(col) <= hi)).select(
            F.col(col).cast("double").alias("_v")
        )
        k = target - rank_before
        row = (
            remaining.orderBy("_v").limit(k).agg(F.max("_v").alias("_v")).collect()
        )
        out[name] = row[0]["_v"] if row and row[0]["_v"] is not None else None
    return out
