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
from .materialize import materialize_result
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


@query(
    "join_left_nulls",
    oracle="""
    SELECT c_custkey, c_name, o_orderkey, o_totalprice
    FROM customer LEFT JOIN (SELECT * FROM orders WHERE o_totalprice > 400000.0) big
      ON c_custkey = o_custkey
    """,
    tags=("join", "B6"),
)
def join_left_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join preserving unmatched customers (null order side)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000.0)
    return c.join(o, c.c_custkey == o.o_custkey, "left").select(
        "c_custkey", "c_name", "o_orderkey", "o_totalprice"
    )


@query(
    "join_right",
    oracle="""
    SELECT c_custkey, c_name, o_orderkey, o_totalprice
    FROM (SELECT * FROM orders WHERE o_totalprice > 400000.0) big
      RIGHT JOIN customer ON c_custkey = o_custkey
    """,
    tags=("join", "B6"),
)
def join_right(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right outer join (same result set as join_left_nulls, exercising the
    right-outer physical path)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000.0)
    return o.join(c, c.c_custkey == o.o_custkey, "right").select(
        "c_custkey", "c_name", "o_orderkey", "o_totalprice"
    )


@query(
    "join_full_outer",
    oracle="""
    SELECT hc.nk AS nk_cust, hc.n_cust, hs.nk AS nk_supp, hs.n_supp
    FROM (SELECT c_nationkey AS nk, count(*) AS n_cust FROM customer
          WHERE c_acctbal > 4000.0 GROUP BY c_nationkey) hc
    FULL JOIN (SELECT s_nationkey AS nk, count(*) AS n_supp FROM supplier
          WHERE s_acctbal > 0.0 GROUP BY s_nationkey) hs
      ON hc.nk = hs.nk
    """,
    tags=("join", "B6"),
)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join with nulls possible on either side."""
    c = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 4000.0)
        .groupBy(F.col("c_nationkey").alias("nk"))
        .agg(F.count(F.lit(1)).alias("n_cust"))
    )
    s = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") > 0.0)
        .groupBy(F.col("s_nationkey").alias("nk"))
        .agg(F.count(F.lit(1)).alias("n_supp"))
    )
    return c.join(s, c.nk == s.nk, "full").select(
        c.nk.alias("nk_cust"), "n_cust", s.nk.alias("nk_supp"), "n_supp"
    )


@query(
    "join_semi",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    SEMI JOIN (SELECT * FROM orders WHERE o_orderpriority = '1-URGENT') u
      ON c_custkey = o_custkey
    """,
    tags=("join", "B6"),
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join (EXISTS): customers with at least one urgent order.
    Semi joins only shuffle the distinct keys of the right side — at scale,
    prefer them over join+distinct."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select("c_custkey", "c_name")


@query(
    "join_anti",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    ANTI JOIN (SELECT * FROM orders WHERE o_totalprice > 300000.0) big
      ON c_custkey = o_custkey
    """,
    tags=("join", "B6"),
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join (NOT EXISTS): customers with no large orders — the
    gap-detection idiom for CDC completeness checks."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 300000.0)
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_name")


@query(
    "join_cross",
    oracle="SELECT r_name, s_suppkey FROM region CROSS JOIN supplier",
    tags=("join", "B6"),
)
def join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cartesian product (both sides tiny — broadcast nested loop)."""
    r = load_table(spark, sf_dir, "region")
    s = load_table(spark, sf_dir, "supplier")
    return r.crossJoin(s).select("r_name", "s_suppkey")


@query(
    "join_theta_range",
    oracle="""
    SELECT s_suppkey, c_custkey, s_acctbal, c_acctbal
    FROM supplier JOIN customer
      ON s_nationkey = c_nationkey AND c_acctbal > s_acctbal
    """,
    tags=("join", "B6"),
)
def join_theta_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixed equi + theta join: the equi key (nationkey) hashes; the range
    predicate is applied post-match, so this is NOT a nested loop — it
    shuffles on the equi key like any hash join."""
    s = load_table(spark, sf_dir, "supplier")
    c = load_table(spark, sf_dir, "customer")
    return s.join(
        c, (s.s_nationkey == c.c_nationkey) & (c.c_acctbal > s.s_acctbal)
    ).select("s_suppkey", "c_custkey", "s_acctbal", "c_acctbal")


@query(
    "join_range_binned",
    oracle="""
    WITH win AS (
      SELECT DISTINCT date_trunc('day', ts) + INTERVAL 6 HOUR AS w_start,
                      date_trunc('day', ts) + INTERVAL 18 HOUR AS w_end
      FROM events)
    SELECT e.event_id, w.w_start
    FROM events e JOIN win w ON e.ts >= w.w_start AND e.ts < w.w_end
    """,
    tags=("join", "B6", "range"),
)
def join_range_binned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KEYLESS interval join (point ∈ [start, end)) via the binned range
    join — vanilla Spark plans this as a BroadcastNestedLoopJoin
    (O(|P|·|I|), re-scanning every point per interval); the binned
    operator turns it into explode + ONE hash equi-join on the bin id +
    exact post-filter (tests/test_plans_physical.py pins the shape).
    Intervals here: each event day's 06:00–18:00 window; oracle is the
    plain theta join, which DuckDB can afford at fixture scale."""
    from ..operators.rangejoin import binned_range_join

    ev = load_table(spark, sf_dir, "events")
    win = (
        ev.select(F.date_trunc("day", F.col("ts")).alias("d"))
        .distinct()
        .select(
            (F.col("d") + F.expr("INTERVAL 6 HOURS")).alias("w_start"),
            (F.col("d") + F.expr("INTERVAL 18 HOURS")).alias("w_end"),
        )
    )
    return binned_range_join(
        ev.select("event_id", "ts"), "ts", win, "w_start", "w_end", bin_seconds=6 * 3600
    ).select("event_id", "w_start")


@query(
    "join_asof",
    oracle="""
    SELECT e.event_id, e.user_id, e.ts, o.o_orderkey, o.o_orderdate
    FROM (SELECT * FROM events WHERE event_type = 'purchase') e
    ASOF JOIN (
        SELECT o_custkey, o_orderdate, max(o_orderkey) AS o_orderkey
        FROM orders GROUP BY o_custkey, o_orderdate
    ) o ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
    """,
    tags=("join", "B6", "asof"),
)
def join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (latest order at-or-before each purchase event, per key)
    via the union+window operator in ``operators/asof.py`` — one shuffle on
    the key, no range explosion. Right side deduped to one row per
    (key, ts) so tie-breaks are deterministic. Oracle: DuckDB native ASOF."""
    from ..operators.asof import asof_join

    e = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .select("event_id", "user_id", "ts")
    )
    o = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey", "o_orderdate")
        .agg(F.max("o_orderkey").alias("o_orderkey"))
        .withColumnRenamed("o_custkey", "user_id")
    )
    return asof_join(
        e, o, on=["user_id"], left_ts="ts", right_ts="o_orderdate",
        right_payload=["o_orderkey"], how="inner",
    ).select("event_id", "user_id", "ts", "o_orderkey", "o_orderdate")


@query(
    "join_asof_forward",
    oracle="""
    SELECT v.event_id, v.user_id, v.ts, p.purchase_id, p.purchase_ts
    FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'view') v
    ASOF JOIN (
        SELECT user_id, ts AS purchase_ts, max(event_id) AS purchase_id
        FROM events WHERE event_type = 'purchase' GROUP BY user_id, ts
    ) p ON v.user_id = p.user_id AND v.ts <= p.purchase_ts
    """,
    tags=("join", "B6", "asof"),
)
def join_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FORWARD as-of join: each view matched to the user's EARLIEST
    purchase at-or-after it — next-conversion attribution, the forward
    direction of pandas merge_asof. Same one-shuffle union+window
    operator with the frame mirrored (first-over-following, left rows
    sorting before co-timestamped right rows so >=-ties match). Oracle:
    DuckDB native ASOF with the inequality reversed."""
    from ..operators.asof import asof_join

    ev = load_table(spark, sf_dir, "events")
    v = ev.filter(F.col("event_type") == "view").select("event_id", "user_id", "ts")
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", F.col("ts").alias("purchase_ts"))
        .agg(F.max("event_id").alias("purchase_id"))
    )
    return asof_join(
        v, p, on=["user_id"], left_ts="ts", right_ts="purchase_ts",
        right_payload=["purchase_id"], how="inner", direction="forward",
    ).select("event_id", "user_id", "ts", "purchase_id", "purchase_ts")


@query(
    "join_asof_tolerance",
    # Tolerance on a backward ASOF is a post-predicate on the matched
    # gap: DuckDB finds the latest at-or-before match, then the WHERE
    # drops pairs further apart than the 1-hour budget — identical to
    # pandas merge_asof(tolerance=...) inner semantics.
    oracle="""
    SELECT * FROM (
      SELECT p.event_id, p.user_id, p.ts, v.view_id, v.view_ts
      FROM (SELECT event_id, user_id, ts FROM events
            WHERE event_type = 'purchase') p
      ASOF JOIN (
          SELECT user_id, ts AS view_ts, max(event_id) AS view_id
          FROM events WHERE event_type = 'view' GROUP BY user_id, ts
      ) v ON p.user_id = v.user_id AND p.ts >= v.view_ts)
    WHERE date_diff('microsecond', view_ts, ts) <= CAST(3600 AS BIGINT) * 1000000
    """,
    tags=("join", "B6", "asof", "tolerance"),
)
def join_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join with a TOLERANCE budget (pandas merge_asof
    ``tolerance``): each purchase matched to the user's latest view
    at-or-before it, but only if that view happened within the last
    hour — stale matches are dropped, the semantics attribution
    pipelines actually want ('credit the view only if it plausibly led
    here'). Same one-shuffle union+window operator; the tolerance is a
    row-local predicate on the filled match
    (``operators/asof.py::asof_join(tolerance_s=...)``) — zero extra
    shuffles, zero extra scans."""
    from ..operators.asof import asof_join

    ev = load_table(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id", F.col("ts").alias("view_ts"))
        .agg(F.max("event_id").alias("view_id"))
    )
    return asof_join(
        p, v, on=["user_id"], left_ts="ts", right_ts="view_ts",
        right_payload=["view_id"], how="inner", tolerance_s=3600,
    ).select("event_id", "user_id", "ts", "view_id", "view_ts")


@query(
    "join_asof_nearest",
    # No native NEAREST in DuckDB: take the per-event max(<=) and min(>=)
    # candidate timestamps via grouped theta joins (oracle tier), pick the
    # smaller exact-microsecond gap with ties to backward, then fetch the
    # payload at the chosen (key, ts) — deterministic because the right
    # side is deduped to one row per (key, ts).
    oracle="""
    WITH e AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
    o AS (SELECT o_custkey AS user_id, o_orderdate, max(o_orderkey) AS o_orderkey
          FROM orders GROUP BY 1, 2),
    b AS (SELECT e.event_id, max(o.o_orderdate) AS ts_b
          FROM e JOIN o USING (user_id) WHERE o.o_orderdate <= e.ts GROUP BY 1),
    f AS (SELECT e.event_id, min(o.o_orderdate) AS ts_f
          FROM e JOIN o USING (user_id) WHERE o.o_orderdate >= e.ts GROUP BY 1),
    pick AS (
      SELECT e.event_id, e.user_id, e.ts,
        CASE
          WHEN f.ts_f IS NULL THEN b.ts_b
          WHEN b.ts_b IS NULL THEN f.ts_f
          WHEN date_diff('microsecond', b.ts_b, e.ts)
               <= date_diff('microsecond', e.ts, f.ts_f) THEN b.ts_b
          ELSE f.ts_f END AS m_ts
      FROM e LEFT JOIN b USING (event_id) LEFT JOIN f USING (event_id))
    SELECT p.event_id, p.user_id, p.ts, o.o_orderkey, o.o_orderdate
    FROM pick p JOIN o ON p.user_id = o.user_id AND p.m_ts = o.o_orderdate
    """,
    tags=("join", "B6", "asof"),
)
def join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEAREST as-of join (closest order in either direction, exact-
    microsecond gaps, ties to the backward match — pandas merge_asof
    nearest semantics). Both directional fills evaluate over ONE key
    exchange (two Window nodes on the same partitioning), so nearest
    costs the same single shuffle as backward/forward — never the
    two-join union a naive formulation would pay."""
    from ..operators.asof import asof_join

    e = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .select("event_id", "user_id", "ts")
    )
    o = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey", "o_orderdate")
        .agg(F.max("o_orderkey").alias("o_orderkey"))
        .withColumnRenamed("o_custkey", "user_id")
    )
    return asof_join(
        e, o, on=["user_id"], left_ts="ts", right_ts="o_orderdate",
        right_payload=["o_orderkey"], how="inner", direction="nearest",
    ).select("event_id", "user_id", "ts", "o_orderkey", "o_orderdate")


@query(
    "expand_customer_flat",
    oracle="""
    SELECT o_orderkey, o_orderdate, o_totalprice, c_custkey, c_name, c_mktsegment, n_name
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    """,
    tags=("join", "B6", "A6"),
)
def expand_customer_flat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's ``expand=customer`` relation expansion
    (ChargeOverSourceConnectorConfig.java:273-289) as an engine-side
    denormalizing join. Both dimensions broadcast — zero shuffle of the
    fact table at any scale."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .select(
            "o_orderkey", "o_orderdate", "o_totalprice",
            "c_custkey", "c_name", "c_mktsegment", "n_name",
        )
    )


@query(
    "expand_items_nested",
    oracle="""
    SELECT o_orderkey,
           to_json(list_sort(list({'ln': l_linenumber, 'pk': l_partkey, 'qty': CAST(l_quantity AS INT)}))) AS items_json,
           count(*) AS n_items
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey % 100 = 0
    GROUP BY o_orderkey
    """,
    tags=("join", "B6", "A6", "nested"),
)
def expand_items_nested(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``expand=invoice_items``-style 1-N denormalization: child rows
    nested into the parent as a sorted JSON array (collect_list + struct).
    Sorting makes the aggregation order-independent — required both for the
    oracle hash and for deterministic output under AQE."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 100 == 0)
    li = load_table(spark, sf_dir, "lineitem")
    item = F.struct(
        F.col("l_linenumber").alias("ln"),
        F.col("l_partkey").alias("pk"),
        F.col("l_quantity").cast("int").alias("qty"),
    )
    return (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("o_orderkey")
        .agg(
            F.to_json(F.array_sort(F.collect_list(item))).alias("items_json"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


# ---------------------------------------------------------------------------
# Aggregations (B7): stats, count_distinct, rollup / cube / grouping sets.
# ---------------------------------------------------------------------------


@query(
    "agg_stats",
    oracle=f"""
    SELECT o_orderpriority,
      count(*) AS n_orders,
      count(DISTINCT o_custkey) AS n_customers,
      min(o_totalprice) AS min_price,
      max(o_totalprice) AS max_price,
      {SQL_DSUM("CAST(o_totalprice AS DECIMAL(18,2))")} AS sum_price,
      {SQL_DAVG("o_totalprice")} AS avg_price,
      CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,2)) * CAST(o_totalprice AS DECIMAL(18,2))), 0) AS DOUBLE) AS sum_price_sq
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    tags=("agg", "B7"),
)
def agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-aggregate scan: count / exact count_distinct / min / max /
    exact decimal sum + avg / sum-of-squares (the variance building block,
    kept exact so stddev derived from it is bit-stable cross-engine).

    Scale: count_distinct is the one expensive agg here (two-phase shuffle
    on (group, custkey)); everything else partial-aggregates map-side."""
    o = load_table(spark, sf_dir, "orders")
    p = dec2("o_totalprice")
    return (
        o.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.countDistinct("o_custkey").alias("n_customers"),
            F.min("o_totalprice").alias("min_price"),
            F.max("o_totalprice").alias("max_price"),
            dsum(p).alias("sum_price"),
            davg("o_totalprice").alias("avg_price"),
            F.round(F.sum(p * p), 0).cast("double").alias("sum_price_sq"),
        )
        .orderBy("o_orderpriority")
    )


@query(
    "agg_approx_distinct",
    # HLL sketch values are engine-specific, so the raw estimate can never
    # hash-match an oracle. Instead the query emits the EXACT count plus
    # the bounds predicate |approx-exact| <= 3*rsd*exact as a boolean; the
    # oracle computes the exact count and asserts the predicate TRUE — the
    # driver's value hash now verifies both (VERDICT r6 item 8).
    oracle="""
    SELECT l_returnflag,
           count(DISTINCT l_partkey) AS exact_parts,
           TRUE AS approx_within_tol
    FROM lineitem GROUP BY l_returnflag
    """,
    tags=("agg", "B7", "approx"),
)
def agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HyperLogLog++) — the 100 TB path for
    distinct counting: constant memory per group vs count_distinct's
    expanded shuffle. Output carries the exact count and a 3-sigma
    bounds check on the sketch (rsd=0.02 → 6% band) so the driver
    verifies the estimate without hashing engine-specific sketch values;
    the unit test additionally bounds the error tighter."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.approx_count_distinct("l_partkey", rsd=0.02).alias("_approx"),
            F.countDistinct("l_partkey").alias("exact_parts"),
        )
        .select(
            "l_returnflag",
            "exact_parts",
            (
                F.abs(F.col("_approx") - F.col("exact_parts"))
                <= 3 * 0.02 * F.col("exact_parts")
            ).alias("approx_within_tol"),
        )
    )


@query(
    "agg_rollup",
    oracle="""
    SELECT n_name, c_mktsegment, count(*) AS n_cust,
           grouping(n_name) AS g_nation, grouping(c_mktsegment) AS g_segment
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    GROUP BY ROLLUP(n_name, c_mktsegment)
    """,
    tags=("agg", "B7", "rollup"),
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical subtotals via ROLLUP with grouping indicators."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .rollup("n_name", "c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_cust"),
            F.grouping("n_name").cast("long").alias("g_nation"),
            F.grouping("c_mktsegment").cast("long").alias("g_segment"),
        )
    )


@query(
    "agg_cube",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {SQL_DSUM("CAST(l_quantity AS DECIMAL(18,2))")} AS sum_qty,
           count(*) AS n,
           grouping(l_returnflag) AS g_rf, grouping(l_linestatus) AS g_ls
    FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
    """,
    tags=("agg", "B7", "cube"),
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All 2^k grouping combinations via CUBE."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        dsum(dec2("l_quantity")).alias("sum_qty"),
        F.count(F.lit(1)).alias("n"),
        F.grouping("l_returnflag").cast("long").alias("g_rf"),
        F.grouping("l_linestatus").cast("long").alias("g_ls"),
    )


@query(
    "agg_grouping_sets",
    oracle=f"""
    SELECT o_orderstatus, o_orderpriority,
           count(*) AS n, {SQL_DSUM("CAST(o_totalprice AS DECIMAL(18,2))")} AS sum_price
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    """,
    tags=("agg", "B7", "grouping-sets"),
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (per-status, per-priority, grand total)."""
    o = load_table(spark, sf_dir, "orders")
    o.createOrReplaceTempView("_gs_orders")
    return spark.sql(f"""
        SELECT o_orderstatus, o_orderpriority,
               count(*) AS n,
               {SQL_DSUM("CAST(o_totalprice AS DECIMAL(18,2))")} AS sum_price
        FROM _gs_orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    """)


# ---------------------------------------------------------------------------
# Dedup (B8) + windows (B9) + top-k / sort / limit / offset (B10).
# ---------------------------------------------------------------------------


@query(
    "dedup_latest_wins",
    oracle="""
    SELECT user_id, event_id, ts, event_type, value FROM (
      SELECT *, row_number() OVER (
        PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
      FROM events) t
    WHERE rn = 1
    """,
    tags=("dedup", "B8", "A7"),
)
def dedup_latest_wins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest-wins compaction per key — the downstream consumer of the
    reference's record keys (ChargeOverSourceTask.java:394-449): keep the
    newest record per entity id. Deterministic tie-break on event_id.
    Single shuffle on the key; at scale this is the standard CDC-topic
    compaction job."""
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_id", "ts", "event_type", "value")
    )


@query(
    "distinct_pairs",
    oracle="SELECT DISTINCT user_id, event_type FROM events",
    tags=("dedup", "B8"),
)
def distinct_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct on a column subset (hash-aggregate dedup)."""
    return load_table(spark, sf_dir, "events").select("user_id", "event_type").distinct()


@query(
    "window_rank_funcs",
    oracle="""
    SELECT event_id, user_id, ts, value,
      row_number() OVER w AS rn,
      rank()       OVER w AS rnk,
      dense_rank() OVER w AS drnk,
      ntile(4)     OVER w AS quartile,
      lag(value)   OVER w AS prev_value,
      lead(value)  OVER w AS next_value,
      first_value(event_id) OVER w AS first_event
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
    tags=("window", "B9"),
)
def window_rank_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking + offset window functions over a deterministic total order."""
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "event_id", "user_id", "ts", "value",
        F.row_number().over(w).alias("rn"),
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.ntile(4).over(w).alias("quartile"),
        F.lag("value").over(w).alias("prev_value"),
        F.lead("value").over(w).alias("next_value"),
        F.first("event_id").over(w).alias("first_event"),
    )


@query(
    "window_running_agg",
    oracle="""
    SELECT event_id, user_id, ts,
      CAST(sum(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) AS running_sum,
      count(*) OVER w AS running_n,
      min(value) OVER w AS running_min,
      max(value) OVER w AS running_max
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
    tags=("window", "B9"),
)
def window_running_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative aggregates over a rows frame (exact decimal running sum)."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return ev.select(
        "event_id", "user_id", "ts",
        F.sum(dec2("value")).over(w).cast("double").alias("running_sum"),
        F.count(F.lit(1)).over(w).alias("running_n"),
        F.min("value").over(w).alias("running_min"),
        F.max("value").over(w).alias("running_max"),
    )


@query(
    "window_range_frame",
    oracle="""
    SELECT event_id, user_id,
      CAST(sum(CAST(value AS DECIMAL(18,2))) OVER (
        PARTITION BY user_id ORDER BY event_id
        RANGE BETWEEN 50 PRECEDING AND CURRENT ROW) AS DOUBLE) AS near_sum
    FROM events
    """,
    tags=("window", "B9"),
)
def window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame over a numeric ordering key (value-based neighborhood)."""
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("event_id").rangeBetween(-50, 0)
    return ev.select(
        "event_id", "user_id",
        F.sum(dec2("value")).over(w).cast("double").alias("near_sum"),
    )


@query(
    "sessionize_events",
    oracle="""
    WITH flagged AS (
      SELECT user_id, event_id, ts,
        CASE WHEN lag(ts) OVER w IS NULL
               OR date_diff('second', lag(ts) OVER w, ts) > 1800
             THEN 1 ELSE 0 END AS new_session
      FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), numbered AS (
      SELECT user_id, event_id, ts,
        CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS UNBOUNDED PRECEDING) AS BIGINT)
          AS session_id
      FROM flagged
    )
    SELECT user_id, session_id, count(*) AS n_events,
           min(ts) AS session_start, max(ts) AS session_end
    FROM numbered GROUP BY user_id, session_id
    """,
    tags=("window", "B9", "sessionization"),
)
def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization: lag-gap flag + running sum → session ids (30-min
    inactivity gap), then per-session aggregates. Two window passes over
    one shuffle partition-by user_id; no self-join."""
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    gap_s = F.col("ts").cast("long") - F.lag(F.col("ts")).over(w).cast("long")
    flagged = ev.withColumn(
        "new_session",
        F.when(gap_s.isNull() | (gap_s > 1800), 1).otherwise(0),
    )
    numbered = flagged.withColumn(
        "session_id",
        F.sum("new_session").over(w.rowsBetween(W.unboundedPreceding, W.currentRow)),
    )
    return numbered.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
    )


@query(
    "topk_per_group",
    oracle="""
    SELECT o_orderpriority, o_orderkey, o_totalprice FROM (
      SELECT *, row_number() OVER (
        PARTITION BY o_orderpriority
        ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders) t
    WHERE rn <= 5
    """,
    tags=("window", "B10"),
)
def topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 orders per priority (window + filter — the distributed top-k
    idiom; no global sort)."""
    o = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_orderpriority").orderBy(F.desc("o_totalprice"), "o_orderkey")
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .select("o_orderpriority", "o_orderkey", "o_totalprice")
    )


@query(
    "sort_limit_offset",
    oracle="""
    SELECT o_orderkey, o_totalprice FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 20 OFFSET 10
    """,
    tags=("sort", "B10", "A3", "A4"),
)
def sort_limit_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global sort + limit/offset — the engine-side equivalent of the
    reference's ordered pagination (``order=field:ASC`` + ``limit/offset``,
    ChargeOverApiClient.java:86-116). Deterministic via unique tie-break."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.orderBy(F.desc("o_totalprice"), "o_orderkey")
        .offset(10)
        .limit(20)
        .select("o_orderkey", "o_totalprice")
    )


# ---------------------------------------------------------------------------
# Set operations (B11).
# ---------------------------------------------------------------------------


@query(
    "set_union_all",
    oracle="""
    SELECT 'click' AS src, user_id, value FROM events WHERE event_type = 'click'
    UNION ALL
    SELECT 'purchase' AS src, user_id, value FROM events WHERE event_type = 'purchase'
    """,
    tags=("setop", "B11"),
)
def set_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiset union with a source tag — the multi-entity stream merge
    (one topic per entity unioned into one analytics relation)."""
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.lit("click").alias("src"), "user_id", "value"
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.lit("purchase").alias("src"), "user_id", "value"
    )
    return clicks.unionByName(purchases)


@query(
    "set_intersect",
    oracle="""
    SELECT user_id FROM events WHERE event_type = 'click'
    INTERSECT
    SELECT user_id FROM events WHERE event_type = 'purchase'
    """,
    tags=("setop", "B11"),
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set intersection (users who both clicked and purchased)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.filter(F.col("event_type") == "click").select("user_id")
        .intersect(ev.filter(F.col("event_type") == "purchase").select("user_id"))
    )


@query(
    "set_except",
    oracle="""
    SELECT user_id FROM events WHERE event_type = 'click'
    EXCEPT
    SELECT user_id FROM events WHERE event_type = 'error'
    """,
    tags=("setop", "B11"),
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set difference (clickers who never errored)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.filter(F.col("event_type") == "click").select("user_id")
        .subtract(ev.filter(F.col("event_type") == "error").select("user_id"))
    )


@query(
    "set_except_all",
    oracle="""
    SELECT event_type FROM events WHERE user_id < 50
    EXCEPT ALL
    SELECT event_type FROM events WHERE user_id >= 100
    """,
    tags=("setop", "B11"),
)
def set_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiset difference (bag semantics — per-occurrence subtraction)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.filter(F.col("user_id") < 50).select("event_type")
        .exceptAll(ev.filter(F.col("user_id") >= 100).select("event_type"))
    )


@query(
    "pivot_event_counts",
    oracle="""
    SELECT user_id,
      count(*) FILTER (WHERE event_type = 'click')    AS click,
      count(*) FILTER (WHERE event_type = 'error')    AS error,
      count(*) FILTER (WHERE event_type = 'purchase') AS purchase,
      count(*) FILTER (WHERE event_type = 'signup')   AS signup,
      count(*) FILTER (WHERE event_type = 'view')     AS view
    FROM events GROUP BY user_id
    """,
    tags=("agg", "B7", "pivot"),
)
def pivot_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (long → wide) with an explicit value list. Pinning the pivot
    values keeps the schema static — mandatory at scale (no extra pass to
    discover values) and for streaming."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id")
        .pivot("event_type", ["click", "error", "purchase", "signup", "view"])
        .count()
        .na.fill(0, ["click", "error", "purchase", "signup", "view"])
    )


@query(
    "unpivot_order_stats",
    oracle="""
    WITH s AS (
      SELECT o_orderstatus,
             CAST(count(*) AS DOUBLE) AS n_orders,
             CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS total,
             max(o_totalprice) AS max_price
      FROM orders GROUP BY o_orderstatus)
    SELECT o_orderstatus, 'n_orders' AS metric, n_orders AS value FROM s
    UNION ALL SELECT o_orderstatus, 'total', total FROM s
    UNION ALL SELECT o_orderstatus, 'max_price', max_price FROM s
    """,
    tags=("B11", "unpivot"),
)
def unpivot_order_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (wide → long) via DataFrame.unpivot/melt."""
    o = load_table(spark, sf_dir, "orders")
    wide = o.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).cast("double").alias("n_orders"),
        dsum(dec2("o_totalprice")).alias("total"),
        F.max("o_totalprice").alias("max_price"),
    )
    return wide.unpivot(
        "o_orderstatus", ["n_orders", "total", "max_price"], "metric", "value"
    )


def _profile_col_sql(col: str, kind: str) -> str:
    if kind == "num":
        mm = (f"CAST(min({col}) AS DOUBLE) AS min_num, "
              f"CAST(max({col}) AS DOUBLE) AS max_num, "
              "CAST(NULL AS VARCHAR) AS min_str, CAST(NULL AS VARCHAR) AS max_str")
    else:
        mm = ("CAST(NULL AS DOUBLE) AS min_num, CAST(NULL AS DOUBLE) AS max_num, "
              f"CAST(min({col}) AS VARCHAR) AS min_str, "
              f"CAST(max({col}) AS VARCHAR) AS max_str")
    return (
        f"SELECT '{col}' AS col_name, count(*) AS n_rows, "
        f"count({col}) AS n_nonnull, count(DISTINCT {col}) AS n_distinct, {mm} "
        f"FROM orders"
    )


@query(
    "profile_orders",
    oracle=" UNION ALL ".join(
        _profile_col_sql(c, k)
        for c, k in [
            ("o_orderkey", "num"), ("o_custkey", "num"),
            ("o_orderstatus", "str"), ("o_totalprice", "num"),
            ("o_orderdate", "str"), ("o_orderpriority", "str"),
        ]
    ),
    tags=("profile", "B7", "quality"),
)
def profile_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-pass table profile of `orders`: per-column null/distinct
    counts and min/max from a SINGLE scan + one 1-row aggregation (the
    melt to one-row-per-column is free). The pre-flight data-quality
    sweep for any new input at scale; distinct counts would switch to
    approx_count_distinct beyond ~1e9 cardinality."""
    from ..operators.profile import profile_table

    return profile_table(load_table(spark, sf_dir, "orders"))


@query(
    "funnel_view_click_purchase",
    oracle="""
    WITH v AS (SELECT user_id, min(ts) AS t_view FROM events
               WHERE event_type = 'view' GROUP BY user_id),
    c AS (SELECT e.user_id, min(e.ts) AS t_click
          FROM events e JOIN v ON e.user_id = v.user_id
          WHERE e.event_type = 'click' AND e.ts >= v.t_view
          GROUP BY e.user_id),
    p AS (SELECT e.user_id, min(e.ts) AS t_purchase
          FROM events e JOIN c ON e.user_id = c.user_id
          WHERE e.event_type = 'purchase' AND e.ts >= c.t_click
          GROUP BY e.user_id)
    SELECT v.user_id, v.t_view, c.t_click, p.t_purchase,
      CASE WHEN p.t_purchase IS NOT NULL THEN 3
           WHEN c.t_click IS NOT NULL THEN 2 ELSE 1 END AS funnel_depth
    FROM v LEFT JOIN c ON v.user_id = c.user_id
           LEFT JOIN p ON v.user_id = p.user_id
    """,
    tags=("funnel", "B7", "B9", "composite"),
)
def funnel_view_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel (view → click → purchase) per user: the
    earliest time each stage was reached AFTER the previous stage, plus
    the depth reached. Every stage is a filtered keyed aggregation on
    user_id — the same shuffle key throughout, one row of state per user,
    no full-history window and no self-join explosion."""
    from ..operators.funnel import funnel

    ev = load_table(spark, sf_dir, "events")
    return funnel(ev, "user_id", "ts", "event_type", ["view", "click", "purchase"])


@query(
    "cohort_retention_weekly",
    oracle="""
    WITH cohorts AS (
      -- CAST to TIMESTAMP: DuckDB date_trunc yields DATE while Spark's
      -- yields TIMESTAMP; pin both engines to the same type so the
      -- driver's value hash agrees regardless of its date coercion.
      SELECT user_id, CAST(date_trunc('week', min(ts)) AS TIMESTAMP) AS cohort_week
      FROM events WHERE event_type = 'signup' GROUP BY user_id),
    activity AS (
      SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS TIMESTAMP) AS act_week
      FROM events)
    SELECT cohort_week,
      CAST(date_diff('day', cohort_week, act_week) // 7 AS BIGINT) AS week_offset,
      count(*) AS n_users
    FROM activity JOIN cohorts USING (user_id)
    WHERE act_week >= cohort_week
    GROUP BY cohort_week, week_offset
    ORDER BY cohort_week, week_offset
    """,
    tags=("cohort", "B7", "composite"),
)
def cohort_retention_weekly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention: users bucketed by signup week, counted in
    every later week they show any activity. Two partial-aggregable
    aggregations + one user-keyed join; output is |cohorts| x |weeks|
    regardless of input scale."""
    from ..operators.funnel import cohort_retention

    ev = load_table(spark, sf_dir, "events")
    return cohort_retention(ev, "user_id", "ts", F.col("event_type") == "signup")


@query(
    "events_gapfill_hourly",
    oracle="""
    WITH bounds AS (
      SELECT user_id,
        CAST(time_bucket(INTERVAL '1 hour', min(ts)) AS TIMESTAMP) AS lo,
        CAST(time_bucket(INTERVAL '1 hour', max(ts)) AS TIMESTAMP) AS hi
      FROM events GROUP BY user_id),
    grid AS (
      SELECT user_id, unnest(generate_series(lo, hi, INTERVAL '1 hour')) AS hr
      FROM bounds),
    c AS (
      SELECT user_id,
        CAST(time_bucket(INTERVAL '1 hour', ts) AS TIMESTAMP) AS hr,
        count(*) AS n
      FROM events GROUP BY user_id, hr)
    SELECT g.user_id, g.hr, coalesce(c.n, CAST(0 AS BIGINT)) AS n
    FROM grid g LEFT JOIN c ON g.user_id = c.user_id AND g.hr = c.hr
    """,
    tags=("timeseries", "B7", "B9", "gapfill"),
)
def events_gapfill_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly gap-filled per-user activity series (hypertable-rollup
    style resampling): every hour between a user's first and last event
    gets a row, missing hours as explicit zeros — the densification step
    every downstream time-series model (forecasting, anomaly scoring)
    needs, since absence-of-row and zero-activity are different facts.

    Scale shape: two aggregations and one left join, all keyed on
    user_id / (user_id, hr) — partial-aggregable, no global sort; the
    grid explode amplifies only each user's own span (bounded by the
    retention window), never |users| x |global hours|."""
    from ..operators.timeseries import gapfill_hourly

    ev = load_table(spark, sf_dir, "events")
    return gapfill_hourly(ev, "user_id", "ts")


_GAPFILL_SQL = """
    bounds AS (
      SELECT user_id,
        CAST(time_bucket(INTERVAL '1 hour', min(ts)) AS TIMESTAMP) AS lo,
        CAST(time_bucket(INTERVAL '1 hour', max(ts)) AS TIMESTAMP) AS hi
      FROM events GROUP BY user_id),
    grid AS (
      SELECT user_id, unnest(generate_series(lo, hi, INTERVAL '1 hour')) AS hr
      FROM bounds),
    c AS (
      SELECT user_id,
        CAST(time_bucket(INTERVAL '1 hour', ts) AS TIMESTAMP) AS hr,
        count(*) AS n
      FROM events GROUP BY user_id, hr),
    series AS (
      SELECT g.user_id, g.hr, coalesce(c.n, CAST(0 AS BIGINT)) AS n
      FROM grid g LEFT JOIN c ON g.user_id = c.user_id AND g.hr = c.hr)
"""


@query(
    "events_anomaly_zscore",
    oracle=f"""
    WITH {_GAPFILL_SQL.strip()},
    t AS (
      SELECT user_id, hr, n,
        count(*) OVER w AS w_hist,
        coalesce(sum(n) OVER w, 0) AS s,
        coalesce(sum(n * n) OVER w, 0) AS q
      FROM series
      WINDOW w AS (PARTITION BY user_id ORDER BY hr
                   ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING))
    SELECT user_id, hr, n, w_hist,
      CASE WHEN w_hist >= 12 AND (w_hist * q - s * s) > 0
        THEN CAST((w_hist * n - s) * (w_hist * n - s) AS DOUBLE)
               / CAST(w_hist * q - s * s AS DOUBLE) END AS zsq,
      CASE WHEN w_hist >= 12 AND (w_hist * q - s * s) > 0
        THEN (w_hist * n - s) * (w_hist * n - s) >= 9 * (w_hist * q - s * s)
             AND (w_hist * n - s) > 0
        ELSE FALSE END AS is_anomaly
    FROM t
    """,
    tags=("timeseries", "B7", "B9", "anomaly"),
)
def events_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user activity anomalies: each gap-filled hourly bucket scored
    against its own trailing 24 h via an EXACT-integer z²
    ((w·n−s)²/(w·q−s²)) — no float variance, so the flag is
    bit-deterministic on any partitioning and hash-checkable in DuckDB.
    Flags buckets ≥ 3σ above their trailing mean with ≥ 12 h of history.
    Scale shape: gapfill's keyed join + one per-user window — no global
    sort anywhere."""
    from ..operators.timeseries import gapfill_hourly, trailing_zscore_hourly

    ev = load_table(spark, sf_dir, "events")
    return trailing_zscore_hourly(gapfill_hourly(ev, "user_id", "ts"), "user_id")


@query(
    "events_gapfill_locf",
    oracle="""
    WITH bounds AS (
      SELECT user_id,
        CAST(time_bucket(INTERVAL '1 hour', min(ts)) AS TIMESTAMP) AS lo,
        CAST(time_bucket(INTERVAL '1 hour', max(ts)) AS TIMESTAMP) AS hi
      FROM events GROUP BY user_id),
    grid AS (
      SELECT user_id, unnest(generate_series(lo, hi, INTERVAL '1 hour')) AS hr
      FROM bounds),
    c AS (
      SELECT user_id,
        CAST(time_bucket(INTERVAL '1 hour', ts) AS TIMESTAMP) AS hr,
        count(*) AS n, sum(CAST(value AS DECIMAL(18,2))) AS total
      FROM events GROUP BY user_id, hr),
    series AS (
      SELECT g.user_id, g.hr, coalesce(c.n, CAST(0 AS BIGINT)) AS n, c.total
      FROM grid g LEFT JOIN c ON g.user_id = c.user_id AND g.hr = c.hr)
    SELECT user_id, hr, n, CAST(total AS DOUBLE) AS hour_total,
      CAST(last_value(total IGNORE NULLS) OVER (
             PARTITION BY user_id ORDER BY hr
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
        AS locf_total
    FROM series
    """,
    tags=("timeseries", "B7", "B9", "gapfill", "locf"),
)
def events_gapfill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-observation-carried-forward resampling: per-user hourly grid
    where an inactive hour keeps the previous hour's value total (the
    sensor/balance fill, vs gapfill's explicit zeros — absence means
    'unchanged', not 'nothing'). Hour totals are exact DECIMAL(18,2)
    sums cast to double only on output, so both engines hash-match.
    Scale shape: two keyed aggregations, one keyed left join, one
    per-user rows window — partial-aggregable, no global sort."""
    from ..operators.timeseries import gapfill_locf_hourly

    ev = load_table(spark, sf_dir, "events")
    return gapfill_locf_hourly(ev, "user_id", "ts", "value")


@query(
    "events_rollup_multires",
    oracle="""
    WITH hourly AS (
      SELECT CAST(time_bucket(INTERVAL '1 hour', ts) AS TIMESTAMP) AS bucket,
             count(*) AS n, sum(CAST(value AS DECIMAL(18,2))) AS total
      FROM events GROUP BY bucket)
    SELECT 'hour' AS resolution, bucket, n, CAST(total AS DOUBLE) AS total_value
    FROM hourly
    UNION ALL
    SELECT 'day' AS resolution,
           CAST(time_bucket(INTERVAL '1 day', bucket) AS TIMESTAMP) AS bucket,
           CAST(sum(n) AS BIGINT) AS n, CAST(sum(total) AS DOUBLE) AS total_value
    FROM hourly GROUP BY 2
    """,
    tags=("timeseries", "B7", "rollup", "cascade"),
)
def events_rollup_multires(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-resolution rollup cascade (continuous-aggregate style): the
    daily tier is aggregated FROM the hourly tier, not from the raw
    table — at 100 TB the raw scan happens once and each coarser
    resolution costs only |finer tier| rows. Counts and DECIMAL sums are
    associative so the cascade is exact; Catalyst reuses the hourly
    exchange across the union branches instead of rescanning."""
    from ..operators.timeseries import rollup_multiresolution

    ev = load_table(spark, sf_dir, "events")
    return rollup_multiresolution(ev, "ts", "value")


@query(
    "events_time_weighted_avg",
    oracle="""
    WITH t AS (
      SELECT user_id,
        CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents,
        lead(epoch_us(ts)) OVER (PARTITION BY user_id
                                 ORDER BY epoch_us(ts), event_id)
          - epoch_us(ts) AS delta
      FROM events)
    SELECT user_id,
      count(*) AS n_obs,
      CAST(coalesce(sum(delta), 0) AS BIGINT) AS span_us,
      CASE WHEN coalesce(sum(delta), 0) > 0
        THEN CAST(sum(cents * delta) AS DOUBLE)
             / CAST(sum(delta) * 100 AS DOUBLE) END AS twa_value
    FROM t GROUP BY user_id
    """,
    tags=("timeseries", "B7", "B9", "twa"),
)
def events_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user time-weighted average of `value` under LOCF interpolation
    (TimescaleDB's `time_weight('LOCF', ...)`): each observation holds
    until the next one, so irregular sampling can't bias the mean the
    way a row-average does. Exact to the last bit: cents x epoch-us
    integer products summed as DECIMAL(38,0), one final IEEE division —
    identical on any partitioning and in DuckDB. Scale shape: one
    per-user window (partition-local sort) + one keyed aggregation with
    map-side partials; nothing global."""
    from ..operators.timeseries import time_weighted_avg

    ev = load_table(spark, sf_dir, "events")
    return time_weighted_avg(ev, "user_id", "ts", "value", "event_id")


@query(
    "events_markov_transitions",
    oracle="""
    WITH t AS (
      SELECT event_type AS from_type,
        lead(event_type) OVER (PARTITION BY user_id
                               ORDER BY epoch_us(ts), event_id) AS to_type
      FROM events),
    pairs AS (
      SELECT CAST(from_type AS VARCHAR) AS from_type,
             CAST(to_type AS VARCHAR) AS to_type, count(*) AS n
      FROM t WHERE to_type IS NOT NULL
      GROUP BY from_type, to_type)
    SELECT from_type, to_type, n,
      CAST(n AS DOUBLE)
        / CAST(sum(n) OVER (PARTITION BY from_type) AS DOUBLE) AS p
    FROM pairs
    """,
    tags=("window", "agg", "B7", "B9", "markov"),
)
def events_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    sequences: P(next event type | current) — the session-flow summary
    behind next-action prediction, funnel discovery, and bot detection
    (uniform rows betray scripted traffic). One per-user lead window
    (partition-local sort on the per-user total order), one keyed count,
    then the per-from normalization runs over the |types|^2-row result —
    the probability division is one float op over exact longs, so the
    hash is engine-stable. Scale shape: the only row-sized exchanges are
    keyed on user_id; everything after the pair count is tiny."""
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy(F.unix_micros("ts"), "event_id")
    pairs = (
        ev.select(
            F.col("event_type").alias("from_type"),
            F.lead("event_type").over(w).alias("to_type"),
        )
        .where(F.col("to_type").isNotNull())
        .groupBy("from_type", "to_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    wt = W.partitionBy("from_type")
    return pairs.select(
        "from_type",
        "to_type",
        "n",
        (F.col("n").cast("double") / F.sum("n").over(wt).cast("double")).alias("p"),
    )


@query(
    "events_session_paths",
    oracle="""
    WITH flagged AS (
      SELECT user_id, event_id, ts, event_type,
        CASE WHEN lag(ts) OVER w IS NULL
               OR date_diff('second', lag(ts) OVER w, ts) > 1800
             THEN 1 ELSE 0 END AS new_session
      FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), numbered AS (
      SELECT user_id, event_id, ts, event_type,
        CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS UNBOUNDED PRECEDING) AS BIGINT)
          AS session_id
      FROM flagged
    ), r AS (
      SELECT user_id, session_id, event_type,
        row_number() OVER (PARTITION BY user_id, session_id
                           ORDER BY ts, event_id) AS rn
      FROM numbered
    ), paths AS (
      SELECT user_id, session_id,
        string_agg(event_type, '>' ORDER BY rn) AS path
      FROM r WHERE rn <= 8 GROUP BY user_id, session_id)
    SELECT path, count(*) AS n_sessions,
           count(DISTINCT user_id) AS n_users
    FROM paths GROUP BY path
    ORDER BY n_sessions DESC, path
    LIMIT 20
    """,
    tags=("window", "B9", "sessionization", "paths"),
)
def events_session_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 session FLOW paths: 30-min-gap sessions rendered as ordered
    event-type strings (first 8 events — the standard truncation that
    keeps path cardinality bounded), counted across the corpus. The
    full-sequence complement of `events_markov_transitions`' one-step
    matrix — 'view>click>purchase' as a first-class value is what flow
    visualizations and funnel discovery consume.

    Scale shape: BOTH windows (session numbering on user_id, in-session
    rank on (user_id, session_id)) are satisfied by the single user_id
    hash exchange — HashPartitioning(user_id) clusters the composite key
    too, so Catalyst inserts no second row-sized shuffle (pinned in the
    plan suite). The ordered path is built by one grouped aggregate
    (array_sort over (rn, type) structs — no per-session second window),
    the path histogram aggregates |paths| rows, and the top-20 is a
    TakeOrdered merge, never a global sort."""
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    gap_s = F.col("ts").cast("long") - F.lag(F.col("ts")).over(w).cast("long")
    numbered = ev.withColumn(
        "new_session", F.when(gap_s.isNull() | (gap_s > 1800), 1).otherwise(0)
    ).withColumn(
        "session_id",
        F.sum("new_session").over(w.rowsBetween(W.unboundedPreceding, W.currentRow)),
    )
    w2 = W.partitionBy("user_id", "session_id").orderBy("ts", "event_id")
    paths = (
        numbered.withColumn("rn", F.row_number().over(w2))
        .where(F.col("rn") <= 8)
        .groupBy("user_id", "session_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("rn", "event_type"))),
                    lambda x: x["event_type"],
                ),
                ">",
            ).alias("path")
        )
    )
    return (
        paths.groupBy("path")
        .agg(
            F.count(F.lit(1)).alias("n_sessions"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .orderBy(F.desc("n_sessions"), "path")
        .limit(20)
    )


@query(
    "funnel_conversion_latency",
    oracle="""
    WITH v AS (SELECT user_id, min(ts) AS t_view FROM events
               WHERE event_type = 'view' GROUP BY user_id),
    c AS (SELECT e.user_id, min(e.ts) AS t_click
          FROM events e JOIN v ON e.user_id = v.user_id
          WHERE e.event_type = 'click' AND e.ts >= v.t_view
          GROUP BY e.user_id),
    p AS (SELECT e.user_id, min(e.ts) AS t_purchase
          FROM events e JOIN c ON e.user_id = c.user_id
          WHERE e.event_type = 'purchase' AND e.ts >= c.t_click
          GROUP BY e.user_id),
    f AS (SELECT v.user_id, v.t_view, c.t_click, p.t_purchase
          FROM v LEFT JOIN c ON v.user_id = c.user_id
                 LEFT JOIN p ON v.user_id = p.user_id)
    SELECT 'view' AS stage_from, 'click' AS stage_to,
      count(t_click) AS n_converted,
      CAST(sum(epoch_us(t_click) - epoch_us(t_view)) AS DOUBLE)
        / count(t_click) AS avg_us,
      min(epoch_us(t_click) - epoch_us(t_view)) AS min_us,
      max(epoch_us(t_click) - epoch_us(t_view)) AS max_us
    FROM f WHERE t_click IS NOT NULL
    UNION ALL
    SELECT 'click', 'purchase', count(t_purchase),
      CAST(sum(epoch_us(t_purchase) - epoch_us(t_click)) AS DOUBLE)
        / count(t_purchase),
      min(epoch_us(t_purchase) - epoch_us(t_click)),
      max(epoch_us(t_purchase) - epoch_us(t_click))
    FROM f WHERE t_purchase IS NOT NULL
    UNION ALL
    SELECT 'view', 'purchase', count(t_purchase),
      CAST(sum(epoch_us(t_purchase) - epoch_us(t_view)) AS DOUBLE)
        / count(t_purchase),
      min(epoch_us(t_purchase) - epoch_us(t_view)),
      max(epoch_us(t_purchase) - epoch_us(t_view))
    FROM f WHERE t_purchase IS NOT NULL
    """,
    tags=("funnel", "B7", "B9", "composite", "latency"),
)
def funnel_conversion_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-to-convert per funnel stage pair: among users who reached
    both stages (in order — the funnel operator's ordered-min semantics),
    the count plus exact min/max/avg gap in epoch-microseconds. The
    numbers a growth team actually tunes against ('how long from click
    to purchase?'), computed from the same one-row-per-user funnel state
    as `funnel_view_click_purchase` — no new row-sized work, three tiny
    aggregations over |users| rows (Catalyst reuses the funnel subtree
    across the union branches). avg is one IEEE division of an exact
    µs-long sum by an exact count — engine-stable."""
    from ..operators.funnel import funnel

    ev = load_table(spark, sf_dir, "events")
    f = funnel(ev, "user_id", "ts", "event_type", ["view", "click", "purchase"])

    def leg(a: str, b: str, fa: str, fb: str) -> DataFrame:
        gap = F.unix_micros(F.col(fb)) - F.unix_micros(F.col(fa))
        return f.where(F.col(fb).isNotNull()).agg(
            F.lit(a).alias("stage_from"),
            F.lit(b).alias("stage_to"),
            F.count(F.col(fb)).alias("n_converted"),
            (F.sum(gap).cast("double") / F.count(F.col(fb))).alias("avg_us"),
            F.min(gap).alias("min_us"),
            F.max(gap).alias("max_us"),
        )

    return (
        leg("view", "click", "t_view", "t_click")
        .unionAll(leg("click", "purchase", "t_click", "t_purchase"))
        .unionAll(leg("view", "purchase", "t_view", "t_purchase"))
    )


@query(
    "events_attribution_models",
    oracle="""
    WITH u AS (
      SELECT user_id, ts, event_id, value,
        CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS is_p,
        CASE WHEN event_type IN ('view', 'click') THEN event_type END AS touch
      FROM events
      WHERE event_type IN ('purchase', 'view', 'click')),
    j AS (
      SELECT user_id, ts, event_id, value, is_p,
        last_value(touch IGNORE NULLS) OVER w AS lt,
        first_value(touch IGNORE NULLS) OVER w AS ft
      FROM u
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, is_p, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
    p AS (SELECT * FROM j WHERE is_p = 1)
    SELECT 'last_touch' AS model, coalesce(lt, 'none') AS touch_type,
      count(*) AS n_purchases,
      CAST(round(sum(CAST(value AS DECIMAL(18,2))), 2) AS DOUBLE) AS revenue
    FROM p GROUP BY 2
    UNION ALL
    SELECT 'first_touch', coalesce(ft, 'none'), count(*),
      CAST(round(sum(CAST(value AS DECIMAL(18,2))), 2) AS DOUBLE)
    FROM p GROUP BY 2
    """,
    tags=("window", "B9", "attribution", "funnel"),
)
def events_attribution_models(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LAST-touch vs FIRST-touch attribution compared in one pass: every
    purchase credits (a) the most recent prior view/click and (b) the
    user's earliest-ever prior touch, then revenue rolls up per (model,
    touch type) — the ad-tech question of which channel 'owns' a
    conversion, whose answer changes with the model. Both attributions
    come from the SAME single user-keyed window pass (the as-of union
    trick: running last(touch) and first(touch) with IGNORE NULLS over
    one sorted exchange — no per-purchase range join, no second
    shuffle); the final rollup is a handful of rows. Touchless
    purchases land in 'none' so the models reconcile to the same
    purchase total."""
    ev = load_table(spark, sf_dir, "events").where(
        F.col("event_type").isin("purchase", "view", "click")
    )
    u = ev.select(
        "user_id",
        "ts",
        "event_id",
        "value",
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("is_p"),
        F.when(
            F.col("event_type").isin("view", "click"), F.col("event_type")
        ).alias("touch"),
    )
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "is_p", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    # The purchase-attributed relation feeds BOTH model rollups (the
    # union below); materialize it once — purchases only, so the
    # checkpoint is small — instead of re-running the scan + window per
    # branch.
    p = (
        u.withColumn("lt", F.last("touch", ignorenulls=True).over(w))
        .withColumn("ft", F.first("touch", ignorenulls=True).over(w))
        .where(F.col("is_p") == 1)
        .localCheckpoint(eager=False)
    )

    def roll(model: str, col: str) -> DataFrame:
        return p.groupBy(F.coalesce(F.col(col), F.lit("none")).alias("touch_type")).agg(
            F.count(F.lit(1)).alias("n_purchases"),
            dsum(dec2("value")).alias("revenue"),
        ).select(F.lit(model).alias("model"), "touch_type", "n_purchases", "revenue")

    return roll("last_touch", "lt").unionAll(roll("first_touch", "ft"))


@query(
    "join_null_safe",
    oracle="""
    WITH c AS (
      SELECT CASE WHEN c_custkey % 7 = 0 THEN NULL ELSE c_nationkey END
        AS nkey
      FROM customer),
    s AS (
      SELECT CASE WHEN s_suppkey % 5 = 0 THEN NULL ELSE s_nationkey END
        AS nkey
      FROM supplier)
    SELECT c.nkey, CAST(count(*) AS BIGINT) AS n_pairs
    FROM c JOIN s ON c.nkey IS NOT DISTINCT FROM s.nkey
    GROUP BY c.nkey
    """,
    tags=("join", "B6", "null-safe"),
)
def join_null_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equi-join (``<=>`` / SQL ``IS NOT DISTINCT FROM``) —
    the join semantics ordinary equality can NEVER produce: NULL keys
    match each other instead of silently dropping out, which is what a
    data-integration pipeline needs when "key unknown" is itself a
    legitimate bucket (e.g. records awaiting enrichment matched to each
    other). Keys are deterministically nulled on both sides (every 7th
    customer, every 5th supplier) so the NULL bucket demonstrably joins.

    Scale note (and why this is a deliberate-choice operator, not a
    default): ``eqNullSafe`` hashes NULL as one ordinary key value, so a
    null-heavy corpus turns the NULL bucket into THE skew key — at
    volume, route it through the salting device (operators/skew.py) or
    split the NULL bucket into a separate union branch. The docstring
    is the warning; this fixture's NULL bucket is |c|/7 × |s|/5.

    Plan: one hash shuffle per side on the nullable key, plain
    SortMergeJoin/ShuffledHashJoin — eqNullSafe stays inside
    whole-stage codegen."""
    c = load_table(spark, sf_dir, "customer").select(
        F.when(F.col("c_custkey") % 7 == 0, None)
        .otherwise(F.col("c_nationkey"))
        .alias("nkey")
    )
    s = load_table(spark, sf_dir, "supplier").select(
        F.when(F.col("s_suppkey") % 5 == 0, None)
        .otherwise(F.col("s_nationkey"))
        .alias("nkey_s")
    )
    return (
        c.join(s, c.nkey.eqNullSafe(s.nkey_s))
        .groupBy("nkey")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )


@query(
    "set_union_by_name",
    oracle="""
    SELECT c_custkey AS entity_key, c_nationkey AS nationkey,
      c_acctbal AS acctbal, NULL AS priority, 'customer' AS src
    FROM customer
    UNION ALL
    SELECT o_orderkey, NULL, NULL, o_orderpriority, 'order'
    FROM orders WHERE o_totalprice > 400000.0
    """,
    tags=("setop", "B11", "schema-drift"),
)
def set_union_by_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-drift-tolerant union (``unionByName`` with
    ``allowMissingColumns=True``) — the in-memory sibling of the
    ``scan_schema_evolution`` merged scan and the multi-entity merge a
    heterogeneous landing zone actually needs: two relations whose
    column SETS differ (customers carry nation/acctbal, large orders
    carry priority) align BY NAME, each side's missing columns
    surfacing as NULL — positional ``UNION ALL`` would silently pair
    wrong columns or refuse. One narrow projection per side, no
    shuffle.

    Exactness: passthrough columns only; no computed floats."""
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("entity_key"),
        F.col("c_nationkey").alias("nationkey"),
        F.col("c_acctbal").alias("acctbal"),
        F.lit("customer").alias("src"),
    )
    o = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 400000.0)
        .select(
            F.col("o_orderkey").alias("entity_key"),
            F.col("o_orderpriority").alias("priority"),
            F.lit("order").alias("src"),
        )
    )
    return c.unionByName(o, allowMissingColumns=True).select(
        "entity_key", "nationkey", "acctbal", "priority", "src"
    )


# ---------------------------------------------------------------------------
# join_geo_gridblock — radius-bounded spatial nearest join via grid blocking
# ---------------------------------------------------------------------------

_GEO_R = 15_000  # match radius in integer milli-degrees (15°)


def _geo_coord_sql(key: str, tag: str, span: int) -> str:
    from ..functions.hashing import SQL_MD5_MOD

    inner = "concat('" + tag + ":', CAST(" + key + " AS VARCHAR))"
    return f"(({SQL_MD5_MOD(inner)}) % {span})"


def _geo_oracle() -> str:
    clat = _geo_coord_sql("c_custkey", "glat", 180_001)
    clon = _geo_coord_sql("c_custkey", "glon", 360_001)
    slat = _geo_coord_sql("s_suppkey", "slat", 180_001)
    slon = _geo_coord_sql("s_suppkey", "slon", 360_001)
    return f"""
    WITH cust AS (
      SELECT c_custkey, {clat} AS lat, {clon} AS lon FROM customer),
    depot AS (
      SELECT s_suppkey, {slat} AS lat, {slon} AS lon FROM supplier),
    depot_cells AS (
      SELECT d.s_suppkey, d.lat, d.lon,
        (d.lat // {_GEO_R}) + dx.o AS cell_x,
        (d.lon // {_GEO_R}) + dy.o AS cell_y
      FROM depot d,
        (VALUES (-1), (0), (1)) dx(o),
        (VALUES (-1), (0), (1)) dy(o)),
    cand AS (
      SELECT c.c_custkey, d.s_suppkey,
        (c.lat - d.lat) * (c.lat - d.lat)
        + (c.lon - d.lon) * (c.lon - d.lon) AS d2
      FROM cust c JOIN depot_cells d
        ON c.lat // {_GEO_R} = d.cell_x AND c.lon // {_GEO_R} = d.cell_y),
    hits AS (
      SELECT c_custkey, s_suppkey, d2,
        row_number() OVER (PARTITION BY c_custkey
                           ORDER BY d2, s_suppkey) AS rn
      FROM cand WHERE d2 <= {_GEO_R * _GEO_R})
    SELECT s_suppkey,
      CAST(count(*) AS BIGINT) AS n_assigned,
      CAST(min(d2) AS BIGINT) AS min_d2,
      CAST(max(d2) AS BIGINT) AS max_d2,
      CAST(sum(d2) AS BIGINT) AS sum_d2
    FROM hits WHERE rn = 1
    GROUP BY s_suppkey
    """


@query(
    "join_geo_gridblock",
    oracle=_geo_oracle(),
    tags=("join", "B6", "geospatial", "grid-blocking"),
)
def join_geo_gridblock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Radius-bounded spatial NEAREST join via grid blocking — the
    geospatial member of the join family: every customer point is
    assigned to its nearest depot (supplier) within radius R, without
    EVER forming the points × depots cross product. Same pigeonhole
    idea as the MinHash band join (``operators/dedup.py``): quantize
    space into R-sized grid cells, replicate each depot into its 3×3
    cell neighborhood (a bounded, dim-sized explode), equi-join points
    to depots on the cell id — any depot within R of a point is
    GUARANTEED to share one of those 9 cells — then verify with the
    exact distance and keep the argmin per point (row_number over
    (d2, suppkey), deterministic tie-break). Coordinates are
    synthesized deterministically from the keys (md5 fold → integer
    milli-degrees; the fixture has no geo columns) and the metric is
    exact integer squared-euclidean on the milli-degree plane — swap
    in haversine for production geodesics; the blocking argument is
    metric-agnostic as long as the cell size bounds the match radius.

    Scale shape: one scan per side, a 9× depot-sized broadcast, one
    cell-keyed equi-join (points never shuffle), a point-partitioned
    window for the argmin, one depot-sized aggregate. At 100 TB of
    points this is scan-bound; the classic failure mode (BNLJ distance
    join) is structurally absent — the plan-smell suite would reject
    it. Points outside R of every depot drop out of the left-semi
    candidate set (geofence semantics); coverage is pinned by the
    contract test.

    Lineage: radius/kNN spatial joins are the standard PostGIS /
    Apache Sedona surface; the grid-block formulation is the
    Spark-native equi-join reduction of it."""
    from ..functions.hashing import md5_mod

    def coord(key: str, tag: str, span: int):
        return (
            md5_mod(F.concat(F.lit(f"{tag}:"), F.col(key).cast("string")))
            % span
        ).cast("long")

    pts = load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        coord("c_custkey", "glat", 180_001).alias("plat"),
        coord("c_custkey", "glon", 360_001).alias("plon"),
    )
    depot = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey",
        coord("s_suppkey", "slat", 180_001).alias("dlat"),
        coord("s_suppkey", "slon", 360_001).alias("dlon"),
    )
    offsets = F.array(F.lit(-1), F.lit(0), F.lit(1))
    depot_cells = (
        depot.withColumn("dx", F.explode(offsets))
        .withColumn("dy", F.explode(offsets))
        .select(
            "s_suppkey",
            "dlat",
            "dlon",
            (F.expr(f"dlat DIV {_GEO_R}") + F.col("dx")).alias("cell_x"),
            (F.expr(f"dlon DIV {_GEO_R}") + F.col("dy")).alias("cell_y"),
        )
    )
    keyed = pts.select(
        "c_custkey",
        "plat",
        "plon",
        F.expr(f"plat DIV {_GEO_R}").alias("cell_x"),
        F.expr(f"plon DIV {_GEO_R}").alias("cell_y"),
    )
    d2 = (F.col("plat") - F.col("dlat")) * (
        F.col("plat") - F.col("dlat")
    ) + (F.col("plon") - F.col("dlon")) * (F.col("plon") - F.col("dlon"))
    cand = (
        keyed.join(F.broadcast(depot_cells), ["cell_x", "cell_y"])
        .select("c_custkey", "s_suppkey", d2.alias("d2"))
        .filter(F.col("d2") <= _GEO_R * _GEO_R)
    )
    rn = F.row_number().over(
        W.partitionBy("c_custkey").orderBy("d2", "s_suppkey")
    )
    assigned = cand.withColumn("rn", rn).filter(F.col("rn") == 1)
    return assigned.groupBy("s_suppkey").agg(
        F.count(F.lit(1)).alias("n_assigned"),
        F.min("d2").cast("long").alias("min_d2"),
        F.max("d2").cast("long").alias("max_d2"),
        F.sum("d2").cast("long").alias("sum_d2"),
    )


# ---------------------------------------------------------------------------
# join_strategy_hints — the physical join-strategy hint surface
# ---------------------------------------------------------------------------

_HINT_ROLLUP = """
    SELECT '{tag}' AS strategy, c_mktsegment,
      CAST(count(*) AS BIGINT) AS n,
      CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,2))), 2) AS DOUBLE)
        AS total
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY 2
"""


@query(
    "join_strategy_hints",
    oracle=" UNION ALL ".join(
        _HINT_ROLLUP.format(tag=t)
        for t in ("broadcast", "merge", "shuffle_hash")
    ),
    tags=("join", "B6", "hints", "physical-strategy"),
)
def join_strategy_hints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-strategy HINTS — the explicit physical-plan steering surface
    (``/*+ BROADCAST ⟋ MERGE ⟋ SHUFFLE_HASH */``, Spark 3.0+): the SAME
    orders⋈customer rollup executed under all three strategies, tagged
    and unioned. Value equality across the three legs (and against the
    oracle) pins the semantic contract that a hint may change ONLY the
    physical algorithm, never the result; the contract test pins the
    mechanism — each leg's executed plan must actually contain its
    BroadcastHashJoin / SortMergeJoin / ShuffledHashJoin node. This is
    the manual override for the cases Catalyst misestimates (a filtered
    dim whose post-filter size the optimizer cannot see, the classic
    100 TB case for forcing BROADCAST; conversely MERGE to protect
    memory when the 'small' side is not).

    Scale shape: three shuffles of the same aggregate by design — this
    is a certification query for the hint plumbing, not a production
    pattern (production picks ONE strategy)."""
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_totalprice"
    )

    def leg(tag: str, hint: str) -> DataFrame:
        j = o.join(c.hint(hint), o.o_custkey == F.col("c_custkey"))
        return (
            j.groupBy("c_mktsegment")
            .agg(
                F.count(F.lit(1)).alias("n"),
                dsum(dec2("o_totalprice")).alias("total"),
            )
            .select(
                F.lit(tag).alias("strategy"),
                "c_mktsegment",
                "n",
                "total",
            )
        )

    return (
        leg("broadcast", "broadcast")
        .unionAll(leg("merge", "merge"))
        .unionAll(leg("shuffle_hash", "shuffle_hash"))
    )


# ---------------------------------------------------------------------------
# join_aqe_skew_split — AQE's runtime skew-join mitigation, certified
# ---------------------------------------------------------------------------

_AQE_SKEW_CONFS = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16KB",
    "spark.sql.autoBroadcastJoinThreshold": "-1",
}

_AQE_SKEW_MAPPERS = 32


@query(
    "join_aqe_skew_split",
    oracle="""
    WITH fact AS (
      SELECT CASE WHEN l_orderkey % 5 != 0 THEN 1
                  ELSE 1 + l_orderkey % 100 END AS k,
             l_extendedprice
      FROM lineitem)
    SELECT s.s_nationkey,
      CAST(count(*) AS BIGINT) AS n,
      CAST(round(sum(CAST(f.l_extendedprice AS DECIMAL(18,2))), 2)
           AS DOUBLE) AS revenue
    FROM fact f JOIN supplier s ON f.k = s.s_suppkey
    GROUP BY 1
    """,
    tags=("join", "B6", "aqe", "skew"),
)
def join_aqe_skew_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AQE's RUNTIME skew-join mitigation, certified end-to-end — the
    automatic counterpart of the manual salting operator
    (``join_skew_salted``): a deliberately skewed fact (~80% of rows on
    one hot supplier key) sort-merge-joins the supplier dim with the
    skew thresholds lowered so the fixture triggers the real mechanism;
    AQE observes the oversized shuffle partition at runtime and SPLITS
    it across tasks (``SortMergeJoin(skew=true)`` + ``AQEShuffleRead
    ... skewed`` in the executed plan, pinned by the contract test),
    duplicating the matching dim rows per split — no code change, no
    salt column, same results. Broadcast is disabled for the query so
    the join genuinely shuffles (broadcast IS the better fix when the
    dim fits; this certifies the path for when it does not).

    The non-obvious operational constraint this query documents: skew
    splits happen at MAPPER-BLOCK granularity — a hot reduce partition
    fed by a single map task cannot be split at all, so the fact is
    repartitioned to 32 map tasks first (on a real cluster the map side
    is naturally wide; tiny-input staging jobs are where this bites).
    Confs are set around a materialized execution and restored.

    Scale shape: one fact scan + spread repartition, one dim scan, one
    shuffle whose hot partition AQE re-plans into balanced splits. At
    100 TB this is the difference between a 2-hour straggler task and
    an even stage — with zero query rewrites."""
    old = {k: spark.conf.get(k, None) for k in _AQE_SKEW_CONFS}
    for k, v in _AQE_SKEW_CONFS.items():
        spark.conf.set(k, v)
    try:
        fact = (
            load_table(spark, sf_dir, "lineitem")
            .repartition(_AQE_SKEW_MAPPERS)
            .select(
                F.when(F.col("l_orderkey") % 5 != 0, F.lit(1))
                .otherwise(1 + F.col("l_orderkey") % 100)
                .alias("k"),
                "l_extendedprice",
            )
        )
        dim = load_table(spark, sf_dir, "supplier").select(
            "s_suppkey", "s_nationkey"
        )
        out = (
            fact.join(dim.hint("merge"), fact.k == dim.s_suppkey)
            .groupBy("s_nationkey")
            .agg(
                F.count(F.lit(1)).alias("n"),
                dsum(dec2("l_extendedprice")).alias("revenue"),
            )
        )
        return materialize_result(spark, out)
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


# ---------------------------------------------------------------------------
# sql_pivot_unpivot_clause — the native SQL PIVOT / UNPIVOT clauses
# ---------------------------------------------------------------------------


@query(
    "sql_pivot_unpivot_clause",
    oracle="""
    SELECT user_id % 50 AS user_bucket, event_type,
      CAST(count(*) AS BIGINT) AS n
    FROM events
    WHERE event_type IN ('click', 'view', 'purchase')
    GROUP BY 1, 2
    """,
    tags=("relational", "B12", "sql-surface", "pivot"),
)
def sql_pivot_unpivot_clause(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The native SQL ``PIVOT`` / ``UNPIVOT`` clauses — the SQL:2016
    syntax siblings of the DataFrame ``pivot()``/``unpivot()`` already
    certified (``pivot_event_counts``, ``unpivot_order_stats``): the
    long event table PIVOTs to a wide per-bucket matrix with an explicit
    IN list (explicit always — an implicit pivot scans the data once
    just to discover columns), then UNPIVOTs straight back with
    ``INCLUDE NULLS`` excluded, and the round trip must equal the plain
    group-count — proving the two clauses are exact inverses on this
    data (zero-count cells become NULL wide cells and are dropped on the
    way back, restoring the original sparse long form).

    Scale shape: one scan, one group-sized shuffle for the pivot
    aggregate; the unpivot is a width-bounded map-side expand."""
    load_table(spark, sf_dir, "events").createOrReplaceTempView(
        "pv_events"
    )
    return spark.sql("""
      SELECT user_bucket, event_type, n FROM (
        SELECT * FROM (
          SELECT user_id % 50 AS user_bucket, event_type FROM pv_events
        )
        PIVOT (
          CAST(count(*) AS BIGINT)
          FOR event_type IN ('click', 'view', 'purchase')
        )
      )
      UNPIVOT (
        n FOR event_type IN (click, view, purchase)
      )
    """)
