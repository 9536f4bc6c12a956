"""Shared fixtures: one SparkSession per test session, a DuckDB connection
with the testdata views registered, and an exact Spark-vs-DuckDB result
comparator mirroring the driver's t2 gate (row count + schema + order-
insensitive values; values compared EXACTLY, because the driver hashes)."""

from __future__ import annotations

import datetime as _dt
import math
import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mk_kafka_connect_spark import catalog  # noqa: E402
from mk_kafka_connect_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.01")
SF_SMOKE = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="mk_kafka_connect_spark-tests", extra_conf={
        "spark.driver.memory": "8g",
        "spark.sql.shuffle.partitions": "8",
    })
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR


@pytest.fixture(scope="session")
def duck():
    con = duckdb.connect()
    for name in catalog.TABLES:
        path = os.path.join(SF_DIR, f"{name}.parquet")
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{path}')")
    yield con
    con.close()


def _norm(v):
    """Normalize a cell for cross-engine comparison."""
    if v is None:
        return None
    if isinstance(v, bool):
        return ("b", v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # Tag the type: the driver hashes, so 1 (int) vs 1.0 (float) must
        # NOT compare equal here even though Python says they do.
        return ("f", repr(v))
    if isinstance(v, int):
        return ("i", v)
    if isinstance(v, _dt.datetime):
        return v.replace(tzinfo=None).isoformat(sep=" ", timespec="microseconds")
    if isinstance(v, _dt.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_norm(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, _norm(x)) for k, x in v.items()))
    return v


def rows_key(rows, colnames):
    """Order-insensitive canonical form: sort columns by name, then rows."""
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    out = [tuple(_norm(r[i]) for i in order) for r in rows]
    out.sort(key=lambda t: tuple((x is None, str(type(x)), str(x)) for x in t))
    return out


def assert_matches_oracle(spark_df, duck_con, oracle_sql, name=""):
    spark_rows = [tuple(r) for r in spark_df.collect()]
    spark_cols = spark_df.columns
    rel = duck_con.execute(oracle_sql)
    duck_cols = [d[0] for d in rel.description]
    duck_rows = rel.fetchall()

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{name}: column mismatch spark={sorted(spark_cols)} duck={sorted(duck_cols)}"
    )
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: row count spark={len(spark_rows)} duck={len(duck_rows)}"
    )
    sk = rows_key(spark_rows, spark_cols)
    dk = rows_key(duck_rows, duck_cols)
    if sk != dk:
        diffs = [(a, b) for a, b in zip(sk, dk) if a != b][:5]
        raise AssertionError(f"{name}: value mismatch; first diffs: {diffs}")
