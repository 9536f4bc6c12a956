"""Differential tests: every registered query with an oracle must match
DuckDB exactly at sf0.01 — the same comparison the driver's t2 gate runs."""

from __future__ import annotations

import pytest

from mk_kafka_connect_spark.plans import QUERIES

from .conftest import assert_matches_oracle

_WITH_ORACLE = sorted(n for n, s in QUERIES.items() if s.oracle is not None)
_NO_ORACLE = sorted(n for n, s in QUERIES.items() if s.oracle is None)


@pytest.mark.parametrize("name", _WITH_ORACLE)
def test_query_matches_oracle(spark, duck, sf_dir, name):
    spec = QUERIES[name]
    df = spec.fn(spark, sf_dir)
    assert_matches_oracle(df, duck, spec.oracle, name=name)


@pytest.mark.parametrize("name", _NO_ORACLE)
def test_query_runs(spark, sf_dir, name):
    """Queries without a SQL-expressible oracle still must run and return a
    stable schema (driver's weaker rows-only check)."""
    spec = QUERIES[name]
    df = spec.fn(spark, sf_dir)
    assert df.columns
    assert df.count() >= 0


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_output_is_scalar_only(spark, name):
    """The driver canonicalizes results with a pandas sort; array/map/struct
    output cells are unhashable there and crash the harness (the
    agg_approx_quantiles err in CORRECTNESS_r01). Every query — including
    rows-only ones — must emit scalar columns only."""
    from pyspark.sql.types import ArrayType, MapType, StructType

    spec = QUERIES[name]
    df = spec.fn(spark, "/root/testdata/sf0.001")
    bad = [
        f.name
        for f in df.schema.fields
        if isinstance(f.dataType, (ArrayType, MapType, StructType))
    ]
    assert not bad, f"{name}: non-scalar output columns {bad}"
