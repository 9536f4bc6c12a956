"""Skew-mitigation operators: salted aggregation and salted join.

AQE's skew-join splitting (enabled in session.py) handles most skew at
runtime; these explicit forms cover the cases AQE can't — skewed
AGGREGATION keys, and joins where one key dominates so heavily that even
split partitions overwhelm a task. This is the "salting for skew" row of
the 100 TB design checklist (SURVEY.md §4 / north star).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["salted_count", "salted_agg_sum", "salted_broadcast_join"]


def _salt(n: int, cols: Sequence[str] | None = None) -> Column:
    # Deterministic-PER-ROW salt: hash of the row's columns mod n. A
    # content hash spreads a single hot key's rows across buckets AND
    # reproduces exactly on task retry / AQE re-split — unlike rand()
    # (retry re-salts differently) or monotonically_increasing_id()
    # (partition-prefixed, so a re-split changes every row's salt).
    if cols:
        return F.pmod(F.hash(*[F.col(c) for c in cols]), F.lit(n)).cast("int")
    return F.pmod(F.hash(F.monotonically_increasing_id()), F.lit(n)).cast("int")


def salted_count(df: DataFrame, key_cols: Sequence[str], salt_buckets: int = 16) -> DataFrame:
    """Two-phase count for skewed keys: count per (key, salt), then sum per
    key. Phase 1 spreads a hot key over ``salt_buckets`` reducers; phase 2
    shuffles only ``keys × buckets`` pre-aggregated rows."""
    key_cols = list(key_cols)
    phase1 = (
        df.withColumn("_salt", _salt(salt_buckets, df.columns))
        .groupBy(*key_cols, "_salt")
        .agg(F.count(F.lit(1)).alias("_partial"))
    )
    return phase1.groupBy(*key_cols).agg(F.sum("_partial").alias("n"))


def salted_agg_sum(
    df: DataFrame, key_cols: Sequence[str], sum_col: Column, alias: str, salt_buckets: int = 16
) -> DataFrame:
    """Two-phase sum with an arbitrary (decimal-exact) sum expression."""
    key_cols = list(key_cols)
    phase1 = (
        df.withColumn("_salt", _salt(salt_buckets, df.columns))
        .groupBy(*key_cols, "_salt")
        .agg(F.sum(sum_col).alias("_partial"))
    )
    return phase1.groupBy(*key_cols).agg(F.sum("_partial").alias(alias))


def salted_broadcast_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    salt_buckets: int = 16,
) -> DataFrame:
    """Skew-proof join: salt the big side, EXPLODE the small side across
    all salt values, join on (key, salt). The small side must be
    broadcast-sized × salt_buckets. Every salted partition gets the hot
    key's dimension row without any single reducer owning the hot key."""
    big_s = big.withColumn("_salt", _salt(salt_buckets, big.columns))
    small_s = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    ).withColumn("_salt", F.col("_salt").cast("int"))
    out = big_s.join(F.broadcast(small_s), [key, "_salt"])
    return out.drop("_salt")
