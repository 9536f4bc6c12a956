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
