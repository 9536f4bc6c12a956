"""Shared fixtures: one SparkSession per test session, a DuckDB connection
with the testdata views registered, and an exact Spark-vs-DuckDB result
comparator mirroring the driver's t2 gate (row count + schema + order-
insensitive values; values compared EXACTLY, because the driver hashes)."""

from __future__ import annotations

import datetime as _dt
import math
import os
import sys
from decimal import Decimal as _Decimal

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


def _norm(v, col=""):
    """Normalize a pandas cell for cross-engine comparison.

    Mirrors the DRIVER's canonicalization path: both engines are converted
    to pandas first (Spark .toPandas(), DuckDB .df()), so DuckDB HUGEINT
    and DECIMAL arrive as float64 while Spark bigint stays int64 — the tags
    below keep ("i", 1) != ("f", 1.0) exactly as the driver's hash does.
    Array/map/struct cells raise: they crash the driver's pandas sort.
    """
    import numpy as _np
    import pandas as _pd

    if isinstance(v, (list, tuple, dict, _np.ndarray)):
        raise AssertionError(
            f"{col}: array/map/struct output cell {type(v).__name__} — the "
            "driver's pandas canonicalizer cannot sort these; serialize the "
            "column (to_json / array_join / element_at) instead"
        )
    if v is None or v is _pd.NaT:
        return "NULL"
    if isinstance(v, (bool, _np.bool_)):
        return ("b", bool(v))
    if isinstance(v, _np.integer):
        return ("i", int(v))
    if isinstance(v, int):
        return ("i", v)
    if isinstance(v, (float, _np.floating)):
        f = float(v)
        if math.isnan(f):
            return "NULL"
        return ("f", repr(f))
    if isinstance(v, _Decimal):
        # DuckDB .df() renders DECIMAL as float64; a Spark Decimal output
        # column would hash-mismatch in the driver. Tag it incompatibly so
        # the local test forces an explicit cast to double/int.
        return ("dec", str(v))
    if isinstance(v, _dt.datetime):  # covers pd.Timestamp
        return ("t", v.replace(tzinfo=None).isoformat(sep=" ", timespec="microseconds"))
    if isinstance(v, _dt.date):
        # Spark DateType -> datetime.date object; DuckDB DATE -> Timestamp
        # midnight. These hash DIFFERENTLY in the driver, so keep the tag
        # distinct from "t" to force an explicit cast decision.
        return ("date", v.isoformat())
    if isinstance(v, (bytes, bytearray)):
        return ("bytes", bytes(v).hex())
    return v


def rows_key(pdf):
    """Order-insensitive canonical form from a pandas DataFrame: sort
    columns by name, normalize every cell, then sort rows."""
    cols = sorted(pdf.columns)
    out = []
    for row in pdf[cols].itertuples(index=False, name=None):
        out.append(tuple(_norm(v, col=c) for v, c in zip(row, cols)))
    out.sort(key=lambda t: tuple((x is None, str(type(x)), str(x)) for x in t))
    return out


def assert_matches_oracle(spark_df, duck_con, oracle_sql, name=""):
    spark_pdf = spark_df.toPandas()
    duck_pdf = duck_con.execute(oracle_sql).df()
    spark_cols = list(spark_pdf.columns)
    duck_cols = list(duck_pdf.columns)

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{name}: column mismatch spark={sorted(spark_cols)} duck={sorted(duck_cols)}"
    )
    assert len(spark_pdf) == len(duck_pdf), (
        f"{name}: row count spark={len(spark_pdf)} duck={len(duck_pdf)}"
    )
    sk = rows_key(spark_pdf)
    dk = rows_key(duck_pdf)
    if sk != dk:
        diffs = [(a, b) for a, b in zip(sk, dk) if a != b][:5]
        raise AssertionError(f"{name}: value mismatch; first diffs: {diffs}")
