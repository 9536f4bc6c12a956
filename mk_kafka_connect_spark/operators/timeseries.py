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

from ..functions.exact import dec2

__all__ = [
    "gapfill_hourly",
    "gapfill_locf_hourly",
    "rollup_multiresolution",
    "time_weighted_avg",
    "trailing_zscore_hourly",
]


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


def gapfill_locf_hourly(df: DataFrame, key_col: str, ts_col: str, val_col: str) -> DataFrame:
    """Gap-filled hourly series with last-observation-carried-forward
    totals: counts densify to explicit zeros, but the value total of an
    empty hour carries the last observed hour's total forward (the other
    standard resampling fill — sensor/balance-style series where the last
    reading stays true until replaced). Sums are exact DECIMAL(18,2)
    (associative, partial-aggregable) and only cast to double on output;
    the LOCF window is per-key rows-framed — partition-local sort, no
    global ordering. The grid starts at each key's first event hour, so
    the carried value is never NULL."""
    hr = F.date_trunc("hour", F.col(ts_col))
    bounds = df.groupBy(key_col).agg(F.min(hr).alias("lo"), F.max(hr).alias("hi"))
    grid = bounds.select(
        key_col,
        F.explode(F.expr("sequence(lo, hi, interval 1 hour)")).alias("hr"),
    )
    per_hr = df.groupBy(key_col, hr.alias("hr")).agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum(dec2(val_col)).alias("_total"),
    )
    w = (
        Window.partitionBy(key_col)
        .orderBy("hr")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        grid.join(per_hr, [key_col, "hr"], "left")
        .select(
            key_col,
            "hr",
            F.coalesce(F.col("_n"), F.lit(0).cast("long")).alias("n"),
            F.col("_total").cast("double").alias("hour_total"),
            F.last("_total", ignorenulls=True)
            .over(w)
            .cast("double")
            .alias("locf_total"),
        )
    )


def rollup_multiresolution(df: DataFrame, ts_col: str, val_col: str) -> DataFrame:
    """Multi-resolution time rollup (hypertable continuous-aggregate
    cascade): hourly buckets aggregated once from the raw events, then
    DAILY buckets aggregated FROM THE HOURLY AGGREGATES — never a second
    pass over the raw table. Counts and DECIMAL sums are associative, so
    the cascade is exact; Catalyst sees the hourly subtree twice (union
    branch + daily input) and reuses the exchange rather than rescanning.
    Output is the union of both resolutions with a ``resolution`` tag."""
    hourly = df.groupBy(F.date_trunc("hour", F.col(ts_col)).alias("bucket")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(dec2(val_col)).alias("_total"),
    )
    daily = hourly.groupBy(F.date_trunc("day", F.col("bucket")).alias("bucket")).agg(
        F.sum("n").alias("n"),
        F.sum("_total").alias("_total"),
    )
    tag = lambda d, r: d.select(  # noqa: E731
        F.lit(r).alias("resolution"),
        "bucket",
        "n",
        F.col("_total").cast("double").alias("total_value"),
    )
    return tag(hourly, "hour").unionAll(tag(daily, "day"))


def time_weighted_avg(
    df: DataFrame, key_col: str, ts_col: str, val_col: str, id_col: str
) -> DataFrame:
    """Per-key time-weighted average under LOCF interpolation (the
    TimescaleDB ``time_weight('LOCF', ...)`` shape): each observation's
    value holds from its timestamp until the next one, so
    twa = Σ valueᵢ·(tᵢ₊₁−tᵢ) / (t_last − t_first). Irregular sampling is
    why the plain mean lies — a sensor that reports 100 once then 0 every
    second is ~0, not 50.

    Everything up to the final division is exact integers: values become
    cents (×100 of the DECIMAL(18,2) cast), durations are epoch-µs longs
    from a ``lead`` over the per-key (ts, id) total order, and each
    cents·µs product (< 2^63 for plausible spans) is summed as
    DECIMAL(38,0). One keyed window + one keyed aggregation — partition-
    local sort, partial-aggregable sums, no global ordering. Keys with a
    single observation (zero span) get NULL twa.
    """
    cents = (dec2(val_col) * 100).cast("long")
    us = F.unix_micros(F.col(ts_col))
    w = Window.partitionBy(key_col).orderBy("_us", "_id")
    t = df.select(
        key_col,
        cents.alias("_cents"),
        us.alias("_us"),
        F.col(id_col).alias("_id"),
    ).withColumn("_delta", F.lead("_us").over(w) - F.col("_us"))
    agg = t.groupBy(key_col).agg(
        F.count(F.lit(1)).alias("n_obs"),
        F.coalesce(F.sum("_delta"), F.lit(0).cast("long")).alias("span_us"),
        F.sum((F.col("_cents") * F.col("_delta")).cast("decimal(38,0)")).alias("_num"),
    )
    return agg.select(
        key_col,
        "n_obs",
        "span_us",
        F.when(
            F.col("span_us") > 0,
            F.col("_num").cast("double") / (F.col("span_us") * 100).cast("double"),
        ).alias("twa_value"),
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
