"""One-pass table profiling: per-column row/null/distinct counts and
min/max — the data-quality sweep every pipeline runs before trusting a
new 100 TB input.

ONE aggregation job produces every column's stats (a single scan, one
1-row shuffle), then the wide row is melted to one output row per column.
Numeric min/max stay numeric (stored doubles/longs compare bit-exactly
cross-engine); string/timestamp min/max are stringified. Distinct counts
are exact here (`count_distinct`); at extreme cardinality swap in
``approx_count_distinct`` — the melt shape is unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import NumericType

__all__ = ["profile_table"]


def profile_table(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """Returns (col_name, n_rows, n_nonnull, n_distinct, min_num,
    max_num, min_str, max_str) — numeric columns fill the ``_num`` pair,
    string/timestamp columns the ``_str`` pair."""
    fields = {f.name: f.dataType for f in df.schema.fields}
    cols = columns or list(fields)
    aggs = [F.count(F.lit(1)).alias("__rows")]
    for c in cols:
        aggs += [
            F.count(F.col(c)).alias(f"{c}__nonnull"),
            F.countDistinct(F.col(c)).alias(f"{c}__distinct"),
        ]
        if isinstance(fields[c], NumericType):
            aggs += [
                F.min(F.col(c)).cast("double").alias(f"{c}__min_num"),
                F.max(F.col(c)).cast("double").alias(f"{c}__max_num"),
            ]
        else:  # strings, timestamps (incl. NTZ), dates, booleans — stringify
            aggs += [
                F.min(F.col(c)).cast("string").alias(f"{c}__min_str"),
                F.max(F.col(c)).cast("string").alias(f"{c}__max_str"),
            ]
    wide = df.agg(*aggs)

    rows = []
    for c in cols:
        is_num = isinstance(fields[c], NumericType)
        rows.append(
            F.struct(
                F.lit(c).alias("col_name"),
                F.col("__rows").alias("n_rows"),
                F.col(f"{c}__nonnull").alias("n_nonnull"),
                F.col(f"{c}__distinct").alias("n_distinct"),
                (F.col(f"{c}__min_num") if is_num else F.lit(None).cast("double")).alias("min_num"),
                (F.col(f"{c}__max_num") if is_num else F.lit(None).cast("double")).alias("max_num"),
                (F.lit(None).cast("string") if is_num else F.col(f"{c}__min_str")).alias("min_str"),
                (F.lit(None).cast("string") if is_num else F.col(f"{c}__max_str")).alias("max_str"),
            )
        )
    return wide.select(F.explode(F.array(*rows)).alias("p")).select("p.*")
