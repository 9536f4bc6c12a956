"""Data-layout operators: Z-order (Morton) clustering for
multi-dimensional scan pruning.

Parquet row-group min/max statistics prune a scan only when the file
layout correlates with the filter columns. Sorting by one column makes
its stats tight and every other column's useless; interleaving the bits
of several columns (the Z-order curve — Delta's ``OPTIMIZE ZORDER BY``,
Iceberg's sort-order rewrite) keeps each column's value range inside a
row group roughly ``2^-k`` of the domain, so point/box predicates on ANY
of the participating columns skip most row groups. At 100 TB this is
the difference between scanning a terabyte and scanning a few row
groups; the effect is measured (not asserted abstractly) in
``tests/test_r7_batch2.py`` by comparing overlapping-row-group fractions
against a naturally-ordered write of the same data.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["zvalue_column", "zorder_write"]

_BITS = 16


def zvalue_column(df: DataFrame, cols: list[str]) -> Column:
    """Morton code over ``cols`` (numeric): each column is min/max
    scaled to ``_BITS`` bits using one tiny aggregate (broadcast as a
    1-row literal map via crossJoin at the call site would shuffle
    nothing, but a plain window-free expression needs the bounds
    inline — so this returns an expression builder given the bounds).

    Exactness does not matter here — the z-value is a LAYOUT key, never
    data — but determinism does, and integer scaling is deterministic.
    """
    bounds = df.agg(
        *[F.min(c).cast("double").alias(f"_lo_{c}") for c in cols],
        *[F.max(c).cast("double").alias(f"_hi_{c}") for c in cols],
    ).collect()[0]

    def scaled(c: str) -> Column:
        lo, hi = bounds[f"_lo_{c}"], bounds[f"_hi_{c}"]
        span = (hi - lo) or 1.0
        v = (F.col(c).cast("double") - F.lit(lo)) / F.lit(span)
        return F.least(
            F.lit((1 << _BITS) - 1),
            F.greatest(F.lit(0), F.floor(v * ((1 << _BITS) - 1)).cast("long")),
        )

    z = F.lit(0).cast("long")
    for bit in range(_BITS):
        for i, c in enumerate(cols):
            z = z + F.shiftleft(
                F.shiftright(scaled(c), bit).bitwiseAND(1),
                bit * len(cols) + i,
            )
    return z


def zorder_write(
    df: DataFrame, path: str, cols: list[str], n_files: int = 8
) -> None:
    """Write ``df`` Z-ordered on ``cols``: range-partition by the Morton
    code (so files tile the curve) and sort within partitions (so row
    groups inside each file tile it too). One range shuffle — the same
    cost class as any global sort — paid once at write time, amortized
    over every future pruned scan."""
    z = zvalue_column(df, cols)
    (
        df.withColumn("_z", z)
        .repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )
