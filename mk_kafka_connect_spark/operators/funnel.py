"""Ordered-stage funnel analysis over an event stream (SURVEY.md §2.B B7/B9
composite): per user, the earliest time each stage was reached AFTER the
previous stage — the conversion query behind every product-analytics
dashboard.

Each stage is one filtered aggregation keyed on the user column; every
shuffle is on the same key, so the stage chain re-uses one partitioning
and the per-stage state is one row per user. No window over the full
event history, no self-join explosion — at 100 TB the cost is
stages × (filtered scan + keyed agg), each agg map-side combined.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["funnel", "cohort_retention"]


def funnel(
    events: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    stages: list[str],
) -> DataFrame:
    """Returns one row per user who reached stage 1, with ``t_<stage>``
    columns (null once the funnel is abandoned) and ``funnel_depth`` =
    number of stages reached in order. Stage k counts only events at or
    after the user's stage-(k-1) time — strictly ordered conversion.

    Single-pass formulation: each stage time is a conditional min WINDOW
    over the same user partitioning (stage k's condition references stage
    k-1's column), so the whole funnel is ONE scan and ONE shuffle with
    chained Window operators — the aggregate-and-rejoin form re-scanned
    the event table per stage and re-computed every prior stage inside
    each join (7 scans for 3 stages in the plan audit)."""
    from pyspark.sql import Window

    if not stages:
        raise ValueError("funnel requires at least one stage")
    w = Window.partitionBy(user_col)
    df = events.select(user_col, ts_col, type_col)
    prev: str | None = None
    for stage in stages:
        cond = F.col(type_col) == stage
        if prev is not None:
            cond = cond & (F.col(ts_col) >= F.col(prev))
        df = df.withColumn(f"t_{stage}", F.min(F.when(cond, F.col(ts_col))).over(w))
        prev = f"t_{stage}"
    t_cols = [f"t_{s}" for s in stages]
    out = (
        df.filter(F.col(t_cols[0]).isNotNull())
        .select(user_col, *t_cols)
        .distinct()
    )
    depth = F.lit(0)
    for i, stage in enumerate(stages):
        depth = F.when(F.col(f"t_{stage}").isNotNull(), i + 1).otherwise(depth)
    # depth counts consecutive reached stages: t_k is null unless t_{k-1}
    # was reached, so the last non-null t_ column IS the depth.
    return out.withColumn("funnel_depth", depth)


def cohort_retention(
    events: DataFrame,
    user_col: str,
    ts_col: str,
    cohort_filter,
) -> DataFrame:
    """Weekly cohort retention: users grouped by the week of their first
    ``cohort_filter`` event (e.g. signup), counted as retained in every
    later week they show ANY activity. Returns (cohort_week, week_offset,
    n_users).

    Scale shape: one aggregation to build the per-user cohort (keyed on
    user), one distinct over (user, week) — both partial-aggregable —
    and a broadcast-friendly join back on the user key; the output is
    |cohorts| × |weeks|, tiny at any input scale."""
    cohorts = (
        events.filter(cohort_filter)
        .groupBy(user_col)
        .agg(F.date_trunc("week", F.min(ts_col)).alias("cohort_week"))
    )
    activity = events.select(
        user_col, F.date_trunc("week", F.col(ts_col)).alias("act_week")
    ).distinct()
    return (
        activity.join(cohorts, user_col)
        .filter(F.col("act_week") >= F.col("cohort_week"))
        .withColumn(
            "week_offset",
            (F.datediff("act_week", "cohort_week") / 7).cast("long"),
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.count(F.lit(1)).alias("n_users"))
        .orderBy("cohort_week", "week_offset")
    )
