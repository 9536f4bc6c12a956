"""TPC-H-style query battery (q4–q22, adapted to the fixture schema).

These are the engine's own relational-coverage queries (SURVEY.md §2.B
B4–B7), not a reference-operator port: the reference (mk-kafka-connect)
is a Kafka Connect source with no query engine, so this battery exists to
prove the declared SQL surface on the classic decision-support shapes —
semi/anti joins from EXISTS/NOT EXISTS, correlated scalar subqueries,
HAVING over grouped facts, conditional aggregation ratios, left-join
count distributions, and scalar-subquery max selection.

Fixture adaptations (documented in COVERAGE.md): the synthetic tables
have no l_commitdate / l_receiptdate / l_shipmode / p_container /
c_phone / o_comment / partsupp. Queries that need them are re-expressed
over available columns with the SAME plan shape: "late" means
``l_shipdate > o_orderdate + INTERVAL 90 DAY``; Q12 groups by
l_linestatus instead of l_shipmode; Q13's comment filter becomes an
order-priority filter; Q22's phone country code becomes c_nationkey.

All money aggregation routes through the exact-decimal helpers
(functions/exact.py) so the DuckDB oracle hash-matches bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.exact import SQL_DSUM, dec2, dsum, one_minus
from .registry import query

_DISC_PRICE_SQL = (
    "CAST(l_extendedprice AS DECIMAL(18,2)) * "
    "(CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(18,2)))"
)


def _disc_price() -> F.Column:
    return dec2("l_extendedprice") * one_minus("l_discount")


def _ts(lit: str) -> F.Column:
    return F.lit(lit).cast("timestamp")


@query(
    "q4_order_priority",
    oracle="""
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey
                    AND l_shipdate > o_orderdate + INTERVAL 90 DAY)
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    tags=("join", "agg", "subquery", "B6", "B7"),
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4: order-priority counts over orders with a late lineitem
    ("late" = shipped >90 days after the order date; the fixture has no
    commit/receipt dates).

    Scale shape: the EXISTS becomes one LEFT SEMI join on the natural key
    l_orderkey — one shuffle, no duplication of order rows regardless of
    how many lineitems match. The date filter prunes the orders scan
    before the join."""
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _ts("1996-01-01 00:00:00"))
        & (F.col("o_orderdate") < _ts("1997-01-01 00:00:00"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    late = li.l_shipdate > o.o_orderdate + F.expr("INTERVAL 90 DAY")
    return (
        o.join(li, (li.l_orderkey == o.o_orderkey) & late, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


@query(
    "q6_forecast_revenue",
    oracle=f"""
    SELECT {SQL_DSUM("CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2))")} AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24.0
    """,
    tags=("agg", "B4", "B7"),
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: pure scan-filter-aggregate revenue forecast.

    Scale shape: zero joins, zero wide shuffles — every predicate pushes
    into the parquet scan (PushedFilters), partial sums combine map-side,
    and a single row crosses the network. The canonical 100 TB fast path."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1996-01-01 00:00:00"))
        & (F.col("l_shipdate") < _ts("1997-01-01 00:00:00"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24.0)
    )
    return li.agg(dsum(dec2("l_extendedprice") * dec2("l_discount")).alias("revenue"))


@query(
    "q10_returned_items",
    oracle=f"""
    SELECT c_custkey, c_name, {SQL_DSUM(_DISC_PRICE_SQL)} AS revenue,
           c_acctbal, n_name
    FROM customer JOIN orders ON c_custkey = o_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      JOIN nation ON c_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1996-04-01 00:00:00'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
    tags=("join", "agg", "B6", "B7"),
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10: top-20 customers by lost (returned) revenue in a quarter.

    Scale shape: lineitem⋈orders is the one fact-fact shuffle (both
    pre-filtered at the scan); customer and nation broadcast; the top-20
    runs as TakeOrderedAndProject, never a global sort."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _ts("1996-01-01 00:00:00"))
        & (F.col("o_orderdate") < _ts("1996-04-01 00:00:00"))
    )
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(dsum(_disc_price()).alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


@query(
    "q12_shipmode_priority",
    oracle="""
    SELECT l_linestatus,
      count(*) FILTER (WHERE o_orderpriority IN ('1-URGENT','2-HIGH')) AS high_line_count,
      count(*) FILTER (WHERE o_orderpriority NOT IN ('1-URGENT','2-HIGH')) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate > o_orderdate + INTERVAL 90 DAY
      AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY l_linestatus
    ORDER BY l_linestatus
    """,
    tags=("join", "agg", "B6", "B7"),
)
def q12_shipmode_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 (adapted: l_linestatus stands in for the absent
    l_shipmode; lateness from shipdate vs orderdate): priority mix of
    late-shipped lines per line status.

    Scale shape: one shuffle (the orderkey join); the non-equi lateness
    predicate evaluates post-join inside codegen; conditional counts are
    two FILTER aggregates in one pass."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1996-01-01 00:00:00"))
        & (F.col("l_shipdate") < _ts("1997-01-01 00:00:00"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAY"))
        .groupBy("l_linestatus")
        .agg(
            F.count(F.when(high, 1)).alias("high_line_count"),
            F.count(F.when(~high, 1)).alias("low_line_count"),
        )
        .orderBy("l_linestatus")
    )


@query(
    "q13_customer_distribution",
    oracle="""
    SELECT c_count, count(*) AS custdist
    FROM (SELECT c_custkey, count(o_orderkey) AS c_count
          FROM customer LEFT JOIN orders
            ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
          GROUP BY c_custkey) c_orders
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
    tags=("join", "agg", "B6", "B7"),
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 (adapted: the o_comment NOT LIKE filter becomes an
    order-priority filter — same left-join-with-predicate shape): how many
    customers placed N qualifying orders, including N=0.

    Scale shape: the join predicate rides ON the left join (filtering
    orders without dropping order-less customers); count(o_orderkey)
    counts matches only. Two aggregations, the second over ~50 distinct
    counts — trivially small."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    per_cust = (
        c.join(
            o,
            (c.c_custkey == o.o_custkey) & (o.o_orderpriority != "1-URGENT"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


@query(
    "q14_promo_effect",
    oracle=f"""
    SELECT (100.0 * CAST(sum(CASE WHEN p_type = 'PROMO' THEN {_DISC_PRICE_SQL}
                                  ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE))
           / CAST(sum({_DISC_PRICE_SQL}) AS DOUBLE) AS promo_revenue
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1996-09-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1996-10-01 00:00:00'
    """,
    tags=("join", "agg", "B6", "B7"),
)
def q14_promo_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 (p_type = 'PROMO' exact match — the fixture's types are
    single words, not 3-part strings): promo share of one month's revenue.

    Scale shape: part broadcasts; the month filter prunes lineitem at the
    scan; the ratio is two exact decimal sums in one aggregate pass, cast
    to double only for the final division (bit-identical cross-engine —
    same pattern as q8_market_share)."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1996-09-01 00:00:00"))
        & (F.col("l_shipdate") < _ts("1996-10-01 00:00:00"))
    )
    p = load_table(spark, sf_dir, "part")
    vol = _disc_price()
    promo = F.when(F.col("p_type") == "PROMO", vol).otherwise(
        F.lit(0).cast("decimal(18,2)")
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .agg(
            (
                (F.lit(100.0) * F.sum(promo).cast("double"))
                / F.sum(vol).cast("double")
            ).alias("promo_revenue")
        )
    )


@query(
    "q15_top_supplier",
    oracle=f"""
    WITH revenue AS (
      SELECT l_suppkey, {SQL_DSUM(_DISC_PRICE_SQL)} AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
      GROUP BY l_suppkey)
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN revenue ON s_suppkey = l_suppkey
    WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
    ORDER BY s_suppkey
    """,
    tags=("join", "agg", "subquery", "B6", "B7"),
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: supplier(s) with the maximum quarterly revenue.

    Scale shape: one aggregation over lineitem (shuffle on l_suppkey, a
    ~#suppliers-sized result), then the max is a WINDOW over that tiny
    aggregate — NOT a scalar-subquery join, which would re-compute the
    whole lineitem aggregation for the max (the plan audit showed two
    full scans). One pass over the fact table total; the empty window
    partition is safe because the aggregate is #suppliers rows. The max
    compares exactly because total_revenue is the exact-decimal rounded
    double on both sides."""
    from pyspark.sql.window import Window

    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1996-01-01 00:00:00"))
        & (F.col("l_shipdate") < _ts("1996-04-01 00:00:00"))
    )
    s = load_table(spark, sf_dir, "supplier")
    rev = li.groupBy("l_suppkey").agg(dsum(_disc_price()).alias("total_revenue"))
    return (
        rev.withColumn(
            "_max_rev", F.max("total_revenue").over(Window.partitionBy())
        )
        .filter(F.col("total_revenue") == F.col("_max_rev"))
        .join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


@query(
    "q17_small_qty_revenue",
    oracle="""
    SELECT CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))), 2) AS DOUBLE) / 7.0
           AS avg_yearly
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand = 'Brand#13'
      AND l_quantity < 0.2 * (SELECT avg(l2.l_quantity) FROM lineitem l2
                              WHERE l2.l_partkey = p_partkey)
    """,
    tags=("join", "agg", "subquery", "B6", "B7"),
)
def q17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 (brand filter only — no p_container in the fixture):
    revenue from small-quantity orders of one brand's parts, vs each
    part's own average order quantity.

    Scale shape: declared as SQL so Catalyst de-correlates the scalar
    subquery into an aggregate + join on l_partkey (check the plan: no
    per-row subquery execution). The per-part average is exact because
    quantities are integer-valued doubles. Single-row output."""
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("_tpch_lineitem")
    load_table(spark, sf_dir, "part").createOrReplaceTempView("_tpch_part")
    return spark.sql(
        """
        SELECT CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))), 2) AS DOUBLE) / 7.0
               AS avg_yearly
        FROM _tpch_lineitem JOIN _tpch_part ON p_partkey = l_partkey
        WHERE p_brand = 'Brand#13'
          AND l_quantity < 0.2 * (SELECT avg(l2.l_quantity) FROM _tpch_lineitem l2
                                  WHERE l2.l_partkey = p_partkey)
        """
    )


@query(
    "q18_large_volume_customer",
    oracle="""
    SELECT c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice, sum_qty
    FROM customer JOIN orders ON c_custkey = o_custkey
      JOIN (SELECT l_orderkey, sum(l_quantity) AS sum_qty FROM lineitem
            GROUP BY l_orderkey HAVING sum(l_quantity) > 250.0) big
        ON o_orderkey = big.l_orderkey
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 100
    """,
    tags=("join", "agg", "having", "B6", "B7"),
)
def q18_large_volume_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18: customers behind the largest-volume orders (order
    quantity total > 250).

    Scale shape: aggregate lineitem FIRST (shuffle on l_orderkey, HAVING
    prunes to the big tail), then join the small survivor set to orders on
    the same key and broadcast customer. The IN-subquery formulation would
    compute the identical plan; this states the aggregate-then-join
    directly. Top-100 via TakeOrderedAndProject."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("sum_qty"))
        .filter(F.col("sum_qty") > 250.0)
    )
    return (
        o.join(big, o.o_orderkey == big.l_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .select("c_custkey", "c_name", "o_orderkey", "o_orderdate", "o_totalprice", "sum_qty")
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(100)
    )


@query(
    "q19_discount_revenue",
    oracle=f"""
    SELECT {SQL_DSUM(_DISC_PRICE_SQL)} AS revenue
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#5' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#14' AND p_size BETWEEN 1 AND 25
           AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 35
           AND l_quantity BETWEEN 20 AND 30)
    """,
    tags=("join", "agg", "B4", "B6", "B7"),
)
def q19_discount_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 (brand+size stand in for the absent p_container): revenue
    over three OR'd brand/size/quantity bands.

    Scale shape: part broadcasts; the disjunctive predicate evaluates
    post-join in codegen (each disjunct mixes columns from both sides so
    it cannot push below the join, but the broadcast keeps it one
    stage). Single-row output."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    qty = F.col("l_quantity")
    size = F.col("p_size")
    brand = F.col("p_brand")
    bands = (
        ((brand == "Brand#5") & size.between(1, 15) & qty.between(1, 11))
        | ((brand == "Brand#14") & size.between(1, 25) & qty.between(10, 20))
        | ((brand == "Brand#23") & size.between(1, 35) & qty.between(20, 30))
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .filter(bands)
        .agg(dsum(_disc_price()).alias("revenue"))
    )


@query(
    "q21_suppliers_kept_waiting",
    oracle="""
    WITH lo AS (
      SELECT l_orderkey, l_suppkey,
             (l_shipdate > o_orderdate + INTERVAL 90 DAY) AS late
      FROM lineitem JOIN orders ON o_orderkey = l_orderkey
      WHERE o_orderstatus = 'F'),
    stats AS (
      SELECT l_orderkey, count(DISTINCT l_suppkey) AS n_supp,
             count(DISTINCT CASE WHEN late THEN l_suppkey END) AS n_late_supp
      FROM lo GROUP BY l_orderkey)
    SELECT s_name, count(*) AS numwait
    FROM lo JOIN stats USING (l_orderkey)
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN nation ON s_nationkey = n_nationkey
    WHERE late AND n_supp >= 2 AND n_late_supp = 1
      AND n_name IN ('NATION_1','NATION_2','NATION_3','NATION_4','NATION_5')
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    """,
    tags=("join", "agg", "subquery", "B6", "B7"),
)
def q21_suppliers_kept_waiting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 ("late" from shipdate vs orderdate): suppliers who were
    the SOLE late supplier on finished multi-supplier orders.

    Scale shape: Q21's EXISTS/NOT-EXISTS pair over lineitem is
    re-expressed as per-order WINDOW aggregates (distinct suppliers,
    distinct LATE suppliers) over the l_orderkey partition — ONE shuffle
    and one pass over lineitem⋈orders, where both the classic triple
    self-join and an aggregate-then-rejoin would scan and shuffle the
    fact join twice (the plan audit showed exactly that). Set sizes are
    bounded by suppliers-per-order (~7), so collect_set stays tiny.
    supplier/nation broadcast."""
    from pyspark.sql.window import Window

    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    lo = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .select(
            "l_orderkey",
            "l_suppkey",
            (
                F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAY")
            ).alias("late"),
        )
    )
    w = Window.partitionBy("l_orderkey")
    return (
        lo.withColumn("n_supp", F.size(F.collect_set("l_suppkey").over(w)))
        .withColumn(
            "n_late_supp",
            F.size(
                F.collect_set(F.when(F.col("late"), F.col("l_suppkey"))).over(w)
            ),
        )
        .filter(F.col("late") & (F.col("n_supp") >= 2) & (F.col("n_late_supp") == 1))
        .join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .filter(
            F.col("n_name").isin(
                "NATION_1", "NATION_2", "NATION_3", "NATION_4", "NATION_5"
            )
        )
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
    )


@query(
    "q22_global_sales_opportunity",
    oracle="""
    SELECT c_nationkey AS cntrycode, count(*) AS numcust,
      CAST(round(sum(CAST(c_acctbal AS DECIMAL(18,2))), 2) AS DOUBLE) AS totacctbal
    FROM customer
    WHERE c_nationkey < 13
      AND c_acctbal > (SELECT CAST(sum(CAST(c2.c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
                              / count(*)
                       FROM customer c2
                       WHERE c2.c_acctbal > 0.0 AND c2.c_nationkey < 13)
      AND NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_orderdate >= TIMESTAMP '1999-01-01 00:00:00')
    GROUP BY c_nationkey
    ORDER BY cntrycode
    """,
    tags=("join", "agg", "subquery", "B6", "B7"),
)
def q22_global_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 (c_nationkey stands in for the absent phone country code;
    "no orders" is scoped to since-1999 because every fixture customer has
    some order): wealthy dormant customers per country.

    Scale shape: the uncorrelated average is a 1-row broadcast (exact
    decimal sum / exact count — the one IEEE division matches DuckDB);
    NOT EXISTS is a LEFT ANTI join against date-pruned orders on
    o_custkey. No correlated per-row work anywhere."""
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_nationkey") < 13)
    recent = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= _ts("1999-01-01 00:00:00")
    )
    thr = (
        c.filter(F.col("c_acctbal") > 0.0)
        .agg(
            (F.sum(dec2("c_acctbal")).cast("double") / F.count(F.lit(1))).alias(
                "_avg_bal"
            )
        )
    )
    return (
        c.join(F.broadcast(thr))
        .filter(F.col("c_acctbal") > F.col("_avg_bal"))
        .join(recent, c.c_custkey == recent.o_custkey, "left_anti")
        .groupBy(F.col("c_nationkey").alias("cntrycode"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            dsum(dec2("c_acctbal")).alias("totacctbal"),
        )
        .orderBy("cntrycode")
    )
