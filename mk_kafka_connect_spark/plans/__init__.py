"""Declared query plans. Importing this package populates the registry."""

from . import advanced, llm, relational, scalar, streaming, tpch, udf  # noqa: F401
from .registry import (
    CERTIFICATION_FRONT,
    QUERIES,
    certification_order,
    oracle_queries,
    query,
    spark_queries,
)

__all__ = [
    "QUERIES",
    "query",
    "spark_queries",
    "oracle_queries",
    "CERTIFICATION_FRONT",
    "certification_order",
]
