"""Binned range (interval) join — the keyless time-range join Spark has
no native fast path for (SURVEY.md §2.B B6 "non-equi (range/theta)").

``point.ts ∈ [interval.start, interval.end)`` with NO equi key planss as a
BroadcastNestedLoopJoin in vanilla Spark: every point row is checked
against every interval — O(|P|·|I|), the classic scale-killer. The
standard fix (used by every interval-join engine, e.g. Flink's interval
join and the GenomicsDB/Databricks range-join hint) is BINNING:

* each interval explodes into one row per fixed-width time bin it
  overlaps (duplication factor ≈ interval_len / bin_width + 1);
* each point computes its single bin;
* candidates come from a hash EQUI-join on the bin id, and the exact
  range predicate filters post-match.

Each qualifying (point, interval) pair is produced exactly once — the
point lives in exactly one bin, so no dedup pass is needed. Choose
``bin_seconds`` near the median interval length: too small multiplies
the interval side, too large multiplies candidates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["binned_range_join"]


def binned_range_join(
    points: DataFrame,
    ts_col: str,
    intervals: DataFrame,
    start_col: str,
    end_col: str,
    bin_seconds: int = 3600,
) -> DataFrame:
    """Inner join of ``points`` to every interval with
    ``start <= ts < end`` via bin equi-join; returns all columns of both
    inputs. The plan is scan → explode (interval side only) → ONE hash
    shuffle on the bin id → post-filter, and survives a 100× blow-up of
    either side (candidates are bounded per bin, never |P|·|I|)."""
    us = bin_seconds * 1_000_000  # microsecond bin math: exact for Spark
    p = points.withColumn("_bin", F.floor(F.unix_micros(F.col(ts_col)) / us))
    i = intervals.withColumn(
        "_bin",
        F.explode(
            F.sequence(
                F.floor(F.unix_micros(F.col(start_col)) / us),
                # half-open [start, end): bin of the last contained microsecond
                F.floor((F.unix_micros(F.col(end_col)) - 1) / us),
            )
        ),
    )
    return (
        p.join(i, "_bin")
        .filter((F.col(ts_col) >= F.col(start_col)) & (F.col(ts_col) < F.col(end_col)))
        .drop("_bin")
    )
