"""Record-transform registry — the Spark-first generalization of the
reference's single-message-transform (SMT) chain.

The reference applies configured ``Transformation``s per record between
``poll()`` and the converter (``mk-string-cast-smt/.../StringCast.java:52-85``;
chaining config ``transforms=...`` in ``mk-string-cast-smt/README.md:33-37``).
Here a transform is a named ``DataFrame → DataFrame`` function; a chain is a
config list applied in order. Every transform is built from built-in column
expressions, so the whole chain stays inside whole-stage codegen — per-record
Java dispatch becomes vectorized columnar execution.

``string_cast`` replicates the reference SMT exactly
(``StringCast.java:62-84`` + golden cases ``StringCastTest.java:30-187``):

* int/long/double  → decimal string (``30`` → ``"30"``)
* boolean          → ``true``/``false``
* string           → JSON-quoted (``John Doe`` → ``"\"John Doe\""``)
* array/struct/map → compact JSON
* null field value → stays null (``StringCastTest.java:130-153``)
* missing field    → silently skipped (``StringCastTest.java:59-81``)
"""

from __future__ import annotations

from collections.abc import Callable, Sequence
from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["TRANSFORMS", "register_transform", "string_cast", "apply_chain", "json_stringify"]

Transform = Callable[[DataFrame], DataFrame]

TRANSFORMS: dict[str, Callable[..., Transform]] = {}


def register_transform(name: str):
    def deco(factory: Callable[..., Transform]):
        TRANSFORMS[name] = factory
        return factory

    return deco


def json_stringify(col: Column, dtype: T.DataType) -> Column:
    """JSON-serialize one column value, preserving nulls.

    For complex types, ``to_json`` is the direct analogue of the SMT's
    Jackson ``writeValueAsString``. Spark's ``to_json`` does not accept
    scalars, so scalars are wrapped in a single-element array and the
    brackets stripped — this yields exactly Jackson's scalar encoding
    (numbers bare, strings quoted+escaped, booleans ``true``/``false``).
    """
    if isinstance(dtype, (T.StructType, T.ArrayType, T.MapType)):
        return F.to_json(col)
    wrapped = F.to_json(F.array(col))
    stripped = wrapped.substr(F.lit(2), F.length(wrapped) - 2)
    return F.when(col.isNotNull(), stripped)


@register_transform("string_cast")
def string_cast(fields: Sequence[str]) -> Transform:
    """Exact SMT semantics: cast each configured, *present* field to its
    JSON string form in place; null values stay null; missing fields are
    skipped without error (StringCast.java:72-84)."""

    def apply(df: DataFrame) -> DataFrame:
        schema = {f.name: f.dataType for f in df.schema.fields}
        out = df
        for name in fields:
            if name not in schema:  # missing field: skip (StringCastTest.java:59-81)
                continue
            out = out.withColumn(name, json_stringify(F.col(name), schema[name]))
        return out

    return apply


@register_transform("rename")
def rename(mapping: dict[str, str]) -> Transform:
    def apply(df: DataFrame) -> DataFrame:
        for old, new in mapping.items():
            if old in df.columns:
                df = df.withColumnRenamed(old, new)
        return df

    return apply


@register_transform("drop_fields")
def drop_fields(fields: Sequence[str]) -> Transform:
    def apply(df: DataFrame) -> DataFrame:
        return df.drop(*[f for f in fields if f in df.columns])

    return apply


@register_transform("filter_expr")
def filter_expr(predicate: str) -> Transform:
    def apply(df: DataFrame) -> DataFrame:
        return df.filter(predicate)

    return apply


def apply_chain(df: DataFrame, chain: Sequence[dict[str, Any]]) -> DataFrame:
    """Apply a config-driven transform chain in order, mirroring Kafka
    Connect's ``transforms=a,b,c`` composition. Each entry:
    ``{"name": <registered transform>, ...kwargs}``."""
    for entry in chain:
        entry = dict(entry)
        name = entry.pop("name")
        factory = TRANSFORMS[name]
        df = factory(**entry)(df)
    return df
