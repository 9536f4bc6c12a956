"""Cross-engine exact arithmetic helpers.

The driver's correctness gate hash-compares Spark output against DuckDB.
Plain double aggregation is order-dependent (different partial-aggregation
orders → different last bits), so every float-producing aggregate in the
declared query surface routes through these helpers:

* sums are computed over DECIMAL-cast inputs (exact, order-independent),
  rounded to a fixed scale, and cast back to DOUBLE (exact conversion while
  the quantum count stays < 2^53);
* averages divide the exact decimal sum (as an exactly-converted double)
  by the exact count — one IEEE division, bit-identical in both engines.

This is not just an oracle trick: decimal aggregation of money columns is
the correct 100 TB semantics anyway (the reference leaves money as JSON
doubles; SURVEY.md §1.2 declares DecimalType as the engine improvement).
Order-independence also makes results stable across cluster sizes and AQE
re-plans.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["dec2", "one_minus", "one_plus", "dsum", "davg", "SQL_DSUM", "SQL_DAVG"]

_DEC = "decimal(18,2)"


def dec2(col: str | Column) -> Column:
    """Cast a clean 2-decimal double column to DECIMAL(18,2) (exact)."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(_DEC)


def one_minus(col: str | Column) -> Column:
    """``1 - x`` in exact decimal (for discount factors)."""
    return F.lit(1).cast("decimal(3,2)") - dec2(col)


def one_plus(col: str | Column) -> Column:
    """``1 + x`` in exact decimal (for tax factors)."""
    return F.lit(1).cast("decimal(3,2)") + dec2(col)


def dsum(expr: Column, scale: int = 2) -> Column:
    """Order-independent sum: exact decimal sum → round(scale) → double."""
    return F.round(F.sum(expr), scale).cast("double")


def davg(col: str | Column) -> Column:
    """Order-independent average of a 2-decimal column, full double
    precision: exact decimal sum (exactly double-representable) divided by
    the exact count."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(dec2(c)).cast("double") / F.count(c)


# SQL templates for the DuckDB oracle side — same arithmetic, same names.
def SQL_DSUM(expr: str, scale: int = 2) -> str:
    return f"CAST(round(sum({expr}), {scale}) AS DOUBLE)"


def SQL_DAVG(col: str) -> str:
    return f"CAST(sum(CAST({col} AS DECIMAL(18,2))) AS DOUBLE) / count({col})"
