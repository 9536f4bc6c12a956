"""As-of join: for each left row, the latest right row with
``right_ts <= left_ts`` within the same key group — plus the ``forward``
and ``nearest`` directions of pandas ``merge_asof``.

Spark has no native ASOF JOIN (DuckDB does; the oracle uses it). A naive
implementation is a range theta-join → O(n·m) nested loop per key. This one
is the scalable formulation:

  1. union the two inputs with a side tag,
  2. single shuffle: hash-partition by key, sort by (ts, side) within
     partitions (right rows sort before left rows at equal ts so ``<=``
     ties resolve to the co-timestamped right row),
  3. forward-fill the right-side payload with ``last(..., ignorenulls=True)``
     over an unbounded-preceding row frame,
  4. keep left rows.

``direction="forward"`` mirrors the frame (earliest right at-or-after,
``first(...) over (currentRow, unboundedFollowing)`` with left rows
sorting before co-timestamped right rows); ``direction="nearest"``
evaluates both fills over the SAME single exchange (two Window nodes,
one shuffle) and picks the smaller absolute gap, ties to the backward
match — pandas ``merge_asof`` tie semantics.

Cost: one shuffle of n+m rows on the join key — the same price as an
equi-join, independent of time-range density. At 100 TB this is the only
formulation that survives: per-key data volume bounds memory (window
operates on a sorted run, spilling as needed), and skewed keys can be
salted the same way as any other shuffle key.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

__all__ = ["asof_join"]


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    right_payload: Sequence[str] | None = None,
    how: str = "inner",
    direction: str = "backward",
    tolerance_s: float | None = None,
) -> DataFrame:
    """Join each left row to the most recent right row at or before its
    timestamp (``direction="backward"``), the earliest at or after
    (``"forward"``), or whichever is closer (``"nearest"``, ties to the
    backward match — pandas ``merge_asof`` semantics), matching on
    equality of ``on`` keys.

    ``right_payload``: right columns to carry (default: all non-key,
    non-ts). ``how``: 'inner' drops left rows with no match in the
    chosen direction; 'left' keeps them with null payload.
    ``tolerance_s``: pandas merge_asof ``tolerance`` — a match further
    than this many seconds from the left timestamp is discarded (the
    row then drops under 'inner' / nulls under 'left'). Applied as a
    row-local post-predicate on the filled match, so it adds zero
    shuffles."""
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"asof_join: unsupported direction={direction!r}")
    on = list(on)
    if right_payload is None:
        right_payload = [c for c in right.columns if c not in set(on) | {right_ts}]
    right_payload = list(right_payload)

    l_tag = left.select(
        *[F.col(c) for c in on],
        F.col(left_ts).alias("_asof_ts"),
        F.lit(1).alias("_asof_side"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_asof_left"),
        F.lit(None).cast(
            right.select(F.struct(*[F.col(c) for c in [right_ts, *right_payload]]).alias("s"))
            .schema["s"].dataType.simpleString()
        ).alias("_asof_right"),
    )
    r_tag = right.select(
        *[F.col(c) for c in on],
        F.col(right_ts).alias("_asof_ts"),
        F.lit(0).alias("_asof_side"),
        F.lit(None).cast(
            left.select(F.struct(*[F.col(c) for c in left.columns]).alias("s"))
            .schema["s"].dataType.simpleString()
        ).alias("_asof_left"),
        F.struct(*[F.col(c) for c in [right_ts, *right_payload]]).alias("_asof_right"),
    )

    unioned = l_tag.unionByName(r_tag)
    # Timestamp-to-scalar key for gap arithmetic (nearest + tolerance).
    # The two sides may disagree on timestamp vs timestamp_ntz (the
    # fixture's orders are naive); session tz is UTC, so casting both
    # through TIMESTAMP yields the same exact-microsecond key.
    _ts_dt = left.schema[left_ts].dataType.simpleString()
    _as_key = (
        (lambda c: F.unix_micros(c.cast("timestamp")))
        if _ts_dt.startswith("timestamp")
        else (lambda c: c.cast("double"))
    )
    _key_scale = 1_000_000 if _ts_dt.startswith("timestamp") else 1
    # Backward: right(side 0) sorts before left(1) at equal ts, so the
    # <=-tie right row is inside the preceding frame. Forward mirrors it:
    # left must sort before the co-timestamped right row, so the >=-tie
    # right row is inside the following frame.
    wb = (
        W.partitionBy(*on)
        .orderBy("_asof_ts", "_asof_side")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    wf = (
        W.partitionBy(*on)
        .orderBy("_asof_ts", F.desc("_asof_side"))
        .rowsBetween(W.currentRow, W.unboundedFollowing)
    )
    if direction == "backward":
        filled = unioned.withColumn(
            "_asof_match", F.last("_asof_right", ignorenulls=True).over(wb)
        )
    elif direction == "forward":
        filled = unioned.withColumn(
            "_asof_match", F.first("_asof_right", ignorenulls=True).over(wf)
        )
    else:  # nearest: both fills share the one key exchange (two Window
        # nodes over the same partitioning, each with its own in-partition
        # sort), then pick the smaller absolute gap; ties -> backward.
        as_key = _as_key
        both = unioned.withColumn(
            "_asof_b", F.last("_asof_right", ignorenulls=True).over(wb)
        ).withColumn("_asof_f", F.first("_asof_right", ignorenulls=True).over(wf))
        gap_b = as_key(F.col("_asof_ts")) - as_key(F.col(f"_asof_b.{right_ts}"))
        gap_f = as_key(F.col(f"_asof_f.{right_ts}")) - as_key(F.col("_asof_ts"))
        filled = both.withColumn(
            "_asof_match",
            F.when(F.col("_asof_f").isNull(), F.col("_asof_b"))
            .when(F.col("_asof_b").isNull(), F.col("_asof_f"))
            .when(gap_b <= gap_f, F.col("_asof_b"))
            .otherwise(F.col("_asof_f")),
        )
    if tolerance_s is not None:
        gap = F.abs(
            _as_key(F.col("_asof_ts")) - _as_key(F.col(f"_asof_match.{right_ts}"))
        )
        filled = filled.withColumn(
            "_asof_match",
            F.when(gap <= F.lit(tolerance_s * _key_scale), F.col("_asof_match")),
        )
    out = filled.filter(F.col("_asof_side") == 1).select(
        *[F.col(f"_asof_left.{c}").alias(c) for c in left.columns],
        *[F.col(f"_asof_match.{c}").alias(c) for c in [right_ts, *right_payload]],
    )
    if how == "inner":
        out = out.filter(F.col(right_ts).isNotNull())
    elif how != "left":
        raise ValueError(f"asof_join: unsupported how={how!r}")
    return out
