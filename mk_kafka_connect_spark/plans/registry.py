"""Query registry: the engine's declared, oracle-checkable surface.

Every operator from SURVEY.md §2 lands here as a named query: a DataFrame
builder (the engine path) plus, where SQL-expressible, the equivalent
DuckDB SQL (the oracle path). The driver executes both at sf=0.01 and
compares row-count + schema + order-insensitive value hash — so builders
MUST alias every computed column to the same name the oracle uses, and
float-producing expressions use the exact-arithmetic helpers in
``mk_kafka_connect_spark.functions`` so both engines produce bit-identical
values.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

__all__ = ["QuerySpec", "QUERIES", "query", "spark_queries", "oracle_queries"]

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL over the pre-registered views, or None
    tags: tuple[str, ...] = field(default_factory=tuple)
    doc: str = ""


QUERIES: dict[str, QuerySpec] = {}


def query(name: str, oracle: str | None = None, tags: tuple[str, ...] = ()):
    """Register a (DataFrame builder, oracle SQL) pair under ``name``."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        QUERIES[name] = QuerySpec(name=name, fn=fn, oracle=oracle, tags=tags, doc=fn.__doc__ or "")
        return fn

    return deco


def spark_queries() -> dict[str, QueryFn]:
    return {name: spec.fn for name, spec in QUERIES.items()}


def oracle_queries() -> dict[str, str]:
    return {name: spec.oracle for name, spec in QUERIES.items() if spec.oracle is not None}
