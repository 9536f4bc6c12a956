"""Golden tests for the string_cast transform — the seven reference SMT
cases from ``mk-string-cast-smt/.../StringCastTest.java:30-187`` ported to
DataFrame form, plus transform-chain composition."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import types as T

from mk_kafka_connect_spark.transforms import apply_chain, string_cast


def _one(spark, schema, row):
    return spark.createDataFrame([row], schema=schema)


SCHEMA = T.StructType(
    [
        T.StructField("name", T.StringType()),
        T.StructField("age", T.LongType()),
        T.StructField("score", T.DoubleType()),
        T.StructField("active", T.BooleanType()),
        T.StructField("tags", T.ArrayType(T.LongType())),
        T.StructField("attrs", T.MapType(T.StringType(), T.StringType())),
    ]
)


def test_primitive_casts(spark):
    """int → "30", double → "9.5", boolean → "true"
    (StringCastTest.java:30-57)."""
    df = _one(spark, SCHEMA, ("John Doe", 30, 9.5, True, None, None))
    out = string_cast(["age", "score", "active"])(df).first()
    assert out.age == "30"
    assert out.score == "9.5"
    assert out.active == "true"
    assert out.name == "John Doe"  # unconfigured field untouched


def test_missing_field_skipped(spark):
    """Configured-but-absent field silently skipped
    (StringCastTest.java:59-81)."""
    df = _one(spark, SCHEMA, ("Jane", 25, None, None, None, None))
    out_df = string_cast(["age", "nonexistent_field"])(df)
    assert out_df.columns == df.columns
    out = out_df.first()
    assert out.age == "25"


def test_null_field_value_stays_null(spark):
    """Null field value passes through as null, not "null"
    (StringCastTest.java:130-153)."""
    df = _one(spark, SCHEMA, ("X", None, None, None, None, None))
    out = string_cast(["age", "score"])(df).first()
    assert out.age is None
    assert out.score is None


def test_complex_types(spark):
    """list → "[1,2,3]", map → '{"key1":"value1"}'
    (StringCastTest.java:100-128)."""
    df = _one(spark, SCHEMA, ("X", None, None, None, [1, 2, 3], {"key1": "value1"}))
    out = string_cast(["tags", "attrs"])(df).first()
    assert out.tags == "[1,2,3]"
    assert out.attrs == '{"key1":"value1"}'


def test_string_gets_json_quoted(spark):
    """Already-string value gets JSON-quoted: John Doe → "\"John Doe\""
    (StringCastTest.java:155-176) — the edge a naive cast("string") misses."""
    df = _one(spark, SCHEMA, ('John "JD" Doe', None, None, None, None, None))
    out = string_cast(["name"])(df).first()
    assert out.name == '"John \\"JD\\" Doe"'


def test_nested_list_of_maps(spark):
    """Nested structures serialize recursively (StringCastTest.java:101-128)."""
    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField(
                "nested", T.ArrayType(T.MapType(T.StringType(), T.LongType()))
            ),
        ]
    )
    df = _one(spark, schema, (1, [{"a": 1}, {"b": 2}]))
    out = string_cast(["nested"])(df).first()
    assert out.nested == '[{"a":1},{"b":2}]'


def test_chain_composition(spark):
    """Config-driven chain applies in order (SMT-README:33-37 chaining)."""
    df = _one(spark, SCHEMA, ("John", 30, 1.5, True, None, None))
    out_df = apply_chain(
        df,
        [
            {"name": "string_cast", "fields": ["age"]},
            {"name": "rename", "mapping": {"age": "age_str"}},
            {"name": "drop_fields", "fields": ["attrs", "tags"]},
            {"name": "filter_expr", "predicate": "age_str = '30'"},
        ],
    )
    assert "age_str" in out_df.columns and "attrs" not in out_df.columns
    assert out_df.count() == 1


def test_unknown_transform_raises(spark):
    df = _one(spark, SCHEMA, ("J", 1, None, None, None, None))
    with pytest.raises(KeyError):
        apply_chain(df, [{"name": "no_such_transform"}])
