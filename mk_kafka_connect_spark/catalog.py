"""Table catalog: load the test star schema and register temp views.

The reference's "catalog" is its entity list (customer / invoice / payment /
subscription, ``ChargeOverSourceConnectorConfig.java:79-83``); here the
catalog is the driver-provided TPC-H-ish star schema plus the LLM-pipeline
tables (``/root/repo/TESTDATA.md``).

At 100 TB these would be partitioned/bucketed external tables; the loader
keeps the access path identical (named DataFrames + SQL views) so query
code never touches paths directly.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, TimestampNTZType, TimestampType

__all__ = ["TABLES", "load_table", "load_tables", "register_views", "default_sf_dir"]

TABLES: tuple[str, ...] = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def default_sf_dir() -> str:
    return os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Columnar parquet scan — Catalyst prunes columns and pushes filters
    into the scan (check ``PushedFilters``/``ReadSchema`` in .explain).

    ``events.ts`` has changed physical type across fixture revisions
    (TIMESTAMP(NANOS), then plain ``timestamp[us]``), so the loader adapts
    to the dtype Spark actually reads instead of assuming one; every
    variant normalizes to a session-UTC TimestampType so downstream plans
    and the DuckDB oracle (naive µs timestamps) see identical instants.
    """
    # Defensive: the caller's session may not have been built by
    # session.get_spark (e.g. the round driver's own session). Timestamp
    # semantics MUST be UTC for oracle parity (SURVEY.md §7 risk register),
    # and both confs are runtime-settable.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        # Harmless unless the file really is TIMESTAMP(NANOS); without it
        # the vectorized reader rejects nanos outright.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        ts_type = df.schema["ts"].dataType
        if isinstance(ts_type, LongType):
            # TIMESTAMP(NANOS) read as a nanos-epoch long. Integer division
            # keeps full precision (ns epoch ~1.7e18 exceeds double's 2^53
            # mantissa — a float division here would corrupt ts).
            return df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
        if isinstance(ts_type, TimestampNTZType):
            # Naive µs timestamps (isAdjustedToUTC=false). Session tz is
            # UTC, so this cast relabels the same instant.
            return df.withColumn("ts", F.col("ts").cast("timestamp"))
        if isinstance(ts_type, TimestampType):
            return df
        raise TypeError(
            f"events.ts has unexpected type {ts_type}; fixture format changed "
            "again — extend catalog.load_table's type adaptation."
        )
    return spark.read.parquet(path)


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register every table as a temp view so the SQL surface and the
    DataFrame surface see the same catalog."""
    dfs = load_tables(spark, sf_dir)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs
