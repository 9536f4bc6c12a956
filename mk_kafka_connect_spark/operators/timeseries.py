"""Time-series operators over keyed event streams (SURVEY.md §2.B B7/B9):
gap-filled resampling and trailing-window anomaly scoring.

The reference's data model is keyed CDC streams with event-time
(``mod_datetime``); these are the standard downstream shapes — densify to
a fixed grid (hypertable-rollup style), then score each bucket against
its own trailing history. Everything is exact integer arithmetic inside
the windows: counts, sums and sums-of-squares are int64 (associative,
partial-aggregable, bit-identical on any partitioning); the only float op
is one final division — so the DuckDB oracle hash-matches like any exact
operator, which a float stddev (engine-specific summation order) never
could.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["gapfill_hourly", "trailing_zscore_hourly"]


def gapfill_hourly(df: DataFrame, key_col: str, ts_col: str) -> DataFrame:
    """Per-key hourly series with explicit zero rows for inactive hours
    (absence-of-row and zero-activity are different facts). Two keyed
    aggregations + one left join; the grid explode amplifies only each
    key's own span, never |keys| × global hours."""
    hr = F.date_trunc("hour", F.col(ts_col))
    bounds = df.groupBy(key_col).agg(F.min(hr).alias("lo"), F.max(hr).alias("hi"))
    grid = bounds.select(
        key_col,
        F.explode(F.expr("sequence(lo, hi, interval 1 hour)")).alias("hr"),
    )
    counts = df.groupBy(key_col, hr.alias("hr")).agg(F.count(F.lit(1)).alias("_n"))
    return grid.join(counts, [key_col, "hr"], "left").select(
        key_col, "hr", F.coalesce(F.col("_n"), F.lit(0).cast("long")).alias("n")
    )


def trailing_zscore_hourly(
    series: DataFrame,
    key_col: str,
    min_history: int = 12,
    window_hours: int = 24,
    z_threshold: int = 3,
) -> DataFrame:
    """Anomaly flag per bucket vs its own trailing ``window_hours``
    history, in EXACT integer arithmetic.

    With trailing count w, sum s, sum-of-squares q over the previous
    ``window_hours`` buckets: z² = (w·n − s)² / (w·q − s²), so the flag
    ``z ≥ z_threshold ∧ n > mean`` is the pure-integer predicate
    ``(w·n − s)² ≥ z²·(w·q − s²) ∧ w·n > s`` — no float variance anywhere,
    hence bit-identical across engines and partitionings. Buckets with
    fewer than ``min_history`` trailing hours or zero variance are
    unscored (NULL z², flag false). The window is partitioned by key —
    partition-local sort, no global ordering."""
    w = (
        Window.partitionBy(key_col)
        .orderBy("hr")
        .rowsBetween(-window_hours, -1)
    )
    t = (
        series.withColumn("_w", F.count(F.lit(1)).over(w))
        .withColumn("_s", F.coalesce(F.sum("n").over(w), F.lit(0).cast("long")))
        .withColumn(
            "_q",
            F.coalesce(F.sum(F.col("n") * F.col("n")).over(w), F.lit(0).cast("long")),
        )
    )
    num = F.col("_w") * F.col("n") - F.col("_s")
    den = F.col("_w") * F.col("_q") - F.col("_s") * F.col("_s")
    scorable = (F.col("_w") >= min_history) & (den > 0)
    return t.select(
        key_col,
        "hr",
        "n",
        F.col("_w").alias("w_hist"),
        F.when(scorable, (num * num).cast("double") / den.cast("double")).alias(
            "zsq"
        ),
        F.when(
            scorable, (num * num >= z_threshold * z_threshold * den) & (num > 0)
        )
        .otherwise(F.lit(False))
        .alias("is_anomaly"),
    )
