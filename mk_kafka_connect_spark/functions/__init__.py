"""Scalar/aggregate function helpers (exact cross-engine arithmetic etc.)."""

from .exact import SQL_DAVG, SQL_DSUM, davg, dec2, dsum, one_minus, one_plus

__all__ = ["davg", "dec2", "dsum", "one_minus", "one_plus", "SQL_DAVG", "SQL_DSUM"]
