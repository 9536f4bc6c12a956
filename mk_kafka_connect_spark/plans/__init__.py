"""Declared query plans. Importing this package populates the registry."""

from . import advanced, llm, relational, scalar, streaming, udf  # noqa: F401
from .registry import QUERIES, oracle_queries, query, spark_queries

__all__ = ["QUERIES", "query", "spark_queries", "oracle_queries"]
