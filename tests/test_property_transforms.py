"""Property-based test: string_cast must agree with Python's json.dumps
(compact separators) — the same contract as the reference SMT's Jackson
``writeValueAsString`` — for arbitrary values, not just the golden cases."""

from __future__ import annotations

import json

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import types as T

from mk_kafka_connect_spark.transforms import string_cast

# Printable text without surrogates; ints within long range.
_text = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",), max_codepoint=0x2FFF),
    max_size=40,
)
_longs = st.integers(min_value=-(2**62), max_value=2**62)


@st.composite
def _row(draw):
    return (
        draw(st.one_of(st.none(), _text)),
        draw(st.one_of(st.none(), _longs)),
        draw(st.one_of(st.none(), st.booleans())),
        draw(st.one_of(st.none(), st.lists(_longs, max_size=5))),
        draw(
            st.one_of(
                st.none(),
                st.dictionaries(
                    st.text(alphabet="abcdefgh", min_size=1, max_size=6),
                    _text,
                    max_size=4,
                ),
            )
        ),
    )


SCHEMA = T.StructType(
    [
        T.StructField("s", T.StringType()),
        T.StructField("i", T.LongType()),
        T.StructField("b", T.BooleanType()),
        T.StructField("arr", T.ArrayType(T.LongType())),
        T.StructField("m", T.MapType(T.StringType(), T.StringType())),
    ]
)


def _expected(v):
    if v is None:
        return None
    return json.dumps(v, separators=(",", ":"), ensure_ascii=False)


@given(st.lists(_row(), min_size=1, max_size=8))
@settings(
    max_examples=12,  # each example is a Spark job; keep the budget sane
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
def test_string_cast_matches_json_dumps(spark, rows):
    df = spark.createDataFrame(rows, schema=SCHEMA)
    out = string_cast(["s", "i", "b", "arr", "m"])(df).collect()
    for (s, i, b, arr, m), got in zip(rows, out):
        if s is None:
            assert got.s is None
        else:
            # Unicode-escape hex case differs (Spark/Jackson upper, Python lower);
            # the contract is valid JSON round-tripping to the same string.
            assert got.s.startswith('"') and json.loads(got.s) == s
        assert got.i == _expected(i)
        assert got.b == _expected(b)
        assert got.arr == _expected(arr)
        if m is None:
            assert got.m is None
        else:
            # Map key order is engine-defined: compare parsed.
            assert json.loads(got.m) == m
