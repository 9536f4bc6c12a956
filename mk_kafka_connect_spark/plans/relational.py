"""Relational query surface (SURVEY.md §2.B B4-B12): scans, filters,
projections, joins, aggregations, windows, set ops, sort/limit.

Each query is a (DataFrame builder, DuckDB oracle SQL) pair registered in
``plans.registry``. Builders are pure declarative DataFrame code — Catalyst
handles pushdown/pruning/join selection; at 100 TB the same plans hold
because every aggregate is partial-aggregable, every join key is the
natural shuffle key, and small dimensions broadcast (64 MB threshold set in
``session.py``).

Lineage from the reference: the half-open datetime range filter mirrors the
CDC batch window (``ChargeOverApiClient.java:96-108``), projection/expand
mirror the ``fields=``/``expand=`` pushdown (``...ConnectorConfig.java:269-289``),
keyed latest-wins dedup mirrors the record keys built in
``ChargeOverSourceTask.java:394-449``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.exact import SQL_DAVG, SQL_DSUM, davg, dec2, dsum, one_minus, one_plus
from .registry import query

# ---------------------------------------------------------------------------
# Aggregation (B7): TPC-H Q1 — the flagship scan→filter→agg→sort pipeline.
# ---------------------------------------------------------------------------

_Q1_CUTOFF = "1998-09-02 00:00:00"


@query(
    "q1_pricing_summary",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
      {SQL_DSUM("CAST(l_quantity AS DECIMAL(18,2))")} AS sum_qty,
      {SQL_DSUM("CAST(l_extendedprice AS DECIMAL(18,2))")} AS sum_base_price,
      {SQL_DSUM("CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(18,2)))")} AS sum_disc_price,
      {SQL_DSUM("CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(18,2))) * (CAST(1 AS DECIMAL(3,2)) + CAST(l_tax AS DECIMAL(18,2)))")} AS sum_charge,
      {SQL_DAVG("l_quantity")} AS avg_qty,
      {SQL_DAVG("l_extendedprice")} AS avg_price,
      {SQL_DAVG("l_discount")} AS avg_disc,
      count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '{_Q1_CUTOFF}'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
    tags=("agg", "B7"),
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1: full-scan aggregate with exact decimal money math.

    Scale notes: group-by on 2 low-cardinality keys → partial (map-side)
    aggregation collapses each scan partition to ≤ |groups| rows before the
    shuffle; the shuffle moves O(groups × partitions) rows regardless of
    input size. Filter and the 7-column projection push into the parquet
    scan.
    """
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = dec2("l_extendedprice") * one_minus("l_discount")
    return (
        li.filter(F.col("l_shipdate") <= F.lit(_Q1_CUTOFF).cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum(dec2("l_quantity")).alias("sum_qty"),
            dsum(dec2("l_extendedprice")).alias("sum_base_price"),
            dsum(disc_price).alias("sum_disc_price"),
            dsum(disc_price * one_plus("l_tax")).alias("sum_charge"),
            davg("l_quantity").alias("avg_qty"),
            davg("l_extendedprice").alias("avg_price"),
            davg("l_discount").alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


# ---------------------------------------------------------------------------
# Filters (B4): the reference's half-open CDC window + predicate algebra.
# ---------------------------------------------------------------------------


@query(
    "filter_range_halfopen",
    oracle="""
    SELECT event_id, ts, user_id, event_type, value
    FROM events
    WHERE ts >= TIMESTAMP '2024-01-10 00:00:00' AND ts < TIMESTAMP '2024-01-20 00:00:00'
    """,
    tags=("filter", "B4", "A2"),
)
def filter_range_halfopen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Half-open datetime interval — the reference's CDC batch window
    (``field:GTE:start,field:LT:end``, ChargeOverApiClient.java:96-108).
    Pushed into the parquet scan (min/max row-group pruning); at 100 TB the
    sink partitions CDC output by date so this prunes whole partitions."""
    ev = load_table(spark, sf_dir, "events")
    return ev.filter(
        (F.col("ts") >= F.lit("2024-01-10 00:00:00").cast("timestamp"))
        & (F.col("ts") < F.lit("2024-01-20 00:00:00").cast("timestamp"))
    ).select("event_id", "ts", "user_id", "event_type", "value")


@query(
    "filter_predicates",
    oracle="""
    SELECT o_orderkey, o_orderstatus, o_orderpriority, o_totalprice
    FROM orders
    WHERE o_orderstatus IN ('O', 'F')
      AND o_orderpriority LIKE '%URGENT%'
      AND o_custkey IS NOT NULL
      AND (o_totalprice > 100000.0 OR o_totalprice < 1000.0)
      AND NOT o_orderkey % 10 = 3
    """,
    tags=("filter", "B4"),
)
def filter_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN / LIKE / null-test / boolean algebra, all codegen'd JVM-side and
    pushed to the scan where the source supports it (null-drop mirrors the
    id-missing row drop at ChargeOverSourceTask.java:396-401)."""
    o = load_table(spark, sf_dir, "orders")
    return o.filter(
        F.col("o_orderstatus").isin("O", "F")
        & F.col("o_orderpriority").like("%URGENT%")
        & F.col("o_custkey").isNotNull()
        & ((F.col("o_totalprice") > 100000.0) | (F.col("o_totalprice") < 1000.0))
        & ~(F.col("o_orderkey") % 10 == 3)
    ).select("o_orderkey", "o_orderstatus", "o_orderpriority", "o_totalprice")


# ---------------------------------------------------------------------------
# Projection (B5): select / rename / computed / drop (fields= pushdown, A5/A8).
# ---------------------------------------------------------------------------


@query(
    "projection_computed",
    oracle="""
    SELECT c_custkey AS customer_id,
           upper(c_name) AS name_upper,
           c_acctbal,
           CAST(round(CAST(c_acctbal AS DECIMAL(18,2)) * CAST(1.1 AS DECIMAL(3,1)), 2) AS DOUBLE) AS acctbal_bumped,
           c_mktsegment IS NOT NULL AND c_acctbal > 0 AS is_active
    FROM customer
    """,
    tags=("projection", "B5", "A5", "A8"),
)
def projection_computed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column projection + rename + computed columns (the engine-side
    equivalent of the reference's ``fields=`` pruning and ``_entity_type``
    metadata enrichment). Catalyst prunes the scan to exactly the columns
    used — ReadSchema in .explain shows 4 of 5 columns."""
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        F.col("c_custkey").alias("customer_id"),
        F.upper("c_name").alias("name_upper"),
        F.col("c_acctbal"),
        F.round(dec2("c_acctbal") * F.lit(1.1).cast("decimal(3,1)"), 2)
        .cast("double")
        .alias("acctbal_bumped"),
        (F.col("c_mktsegment").isNotNull() & (F.col("c_acctbal") > 0)).alias("is_active"),
    )


# ---------------------------------------------------------------------------
# Joins (B6): the expand= denormalizing join and the full join-type matrix.
# ---------------------------------------------------------------------------


@query(
    "q3_shipping_priority",
    oracle=f"""
    SELECT l_orderkey,
      {SQL_DSUM("CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(18,2)))")} AS revenue,
      o_orderdate, o_orderpriority
    FROM customer JOIN orders ON c_custkey = o_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      AND l_shipdate > TIMESTAMP '1996-01-01 00:00:00'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, o_orderdate, l_orderkey
    LIMIT 10
    """,
    tags=("join", "agg", "B6", "B7"),
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3-style 3-way join + agg + top-10.

    Scale notes: customer (dimension, filtered) broadcasts — no shuffle of
    orders for join #1; orders⋈lineitem is the one real shuffle, on the
    natural key l_orderkey. Filters reach both scans before the join. The
    ORDER BY ... LIMIT 10 runs as TakeOrderedAndProject (per-partition
    top-k, no global sort)."""
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1996-01-01 00:00:00").cast("timestamp")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(dsum(dec2("l_extendedprice") * one_minus("l_discount")).alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), "o_orderdate", "l_orderkey")
        .limit(10)
    )
