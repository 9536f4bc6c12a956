"""Advanced relational coverage: multi-join chains, subqueries (EXISTS /
IN / scalar), HAVING, conditional aggregation, exact percentiles, CDC
merge-upsert, skew-salted aggregation — rounding out SURVEY.md §2.B
B6/B7 and the CDC consumer path (A7's keys feeding SCD-1 apply).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.bounded import bounded_window
from ..functions.exact import SQL_DSUM, dec2, dsum, one_minus
from .materialize import materialize_result
from .registry import query


@query(
    "q5_local_supplier_volume",
    oracle=f"""
    SELECT n_name,
      {SQL_DSUM("CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(18,2)))")} AS revenue
    FROM customer
      JOIN orders ON c_custkey = o_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      JOIN nation ON c_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY n_name
    ORDER BY revenue DESC, n_name
    """,
    tags=("join", "agg", "B6", "B7"),
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5: 6-table join chain with a cross-table equality
    (customer.nation = supplier.nation). All dimensions broadcast; the
    only shuffles are the fact-fact join on l_orderkey and the final
    small aggregation."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(
            F.broadcast(s),
            (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(dsum(dec2("l_extendedprice") * one_minus("l_discount")).alias("revenue"))
        .orderBy(F.desc("revenue"), "n_name")
    )


@query(
    "subquery_exists",
    oracle="""
    SELECT p_partkey, p_name FROM part
    WHERE EXISTS (SELECT 1 FROM lineitem
                  WHERE l_partkey = p_partkey AND l_quantity >= 49)
    """,
    tags=("subquery", "B6"),
)
def subquery_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS — Catalyst rewrites it to the same left-semi join
    the explicit form produces; declared via SQL to exercise the subquery
    front door."""
    load_table(spark, sf_dir, "part").createOrReplaceTempView("_adv_part")
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("_adv_lineitem")
    return spark.sql(
        """
        SELECT p_partkey, p_name FROM _adv_part
        WHERE EXISTS (SELECT 1 FROM _adv_lineitem
                      WHERE l_partkey = p_partkey AND l_quantity >= 49)
        """
    )


@query(
    "subquery_in_scalar",
    oracle="""
    SELECT o_orderkey, o_totalprice FROM orders
    WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal > 9000.0)
      AND o_totalprice > (SELECT avg(o_totalprice) FROM orders)
    """,
    tags=("subquery", "B4"),
)
def subquery_in_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN subquery (→ semi join) + uncorrelated scalar subquery (→
    broadcast scalar). avg() compares identically cross-engine here
    because it only gates a > predicate on clean 2-decimal data."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("_adv_orders")
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("_adv_customer")
    return spark.sql(
        """
        SELECT o_orderkey, o_totalprice FROM _adv_orders
        WHERE o_custkey IN (SELECT c_custkey FROM _adv_customer WHERE c_acctbal > 9000.0)
          AND o_totalprice > (SELECT avg(o_totalprice) FROM _adv_orders)
        """
    )


@query(
    "agg_having_filter",
    oracle=f"""
    SELECT o_custkey, count(*) AS n_orders,
      {SQL_DSUM("CAST(o_totalprice AS DECIMAL(18,2))")} AS total_spend,
      count(*) FILTER (WHERE o_orderpriority = '1-URGENT') AS n_urgent
    FROM orders
    GROUP BY o_custkey
    HAVING count(*) >= 15
    """,
    tags=("agg", "B7", "having"),
)
def agg_having_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HAVING + conditional (FILTER) aggregation."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum(dec2("o_totalprice")).alias("total_spend"),
            F.count(F.when(F.col("o_orderpriority") == "1-URGENT", 1)).alias(
                "n_urgent"
            ),
        )
        .filter(F.col("n_orders") >= 15)
    )


@query(
    "agg_case_when_buckets",
    oracle="""
    SELECT
      CASE WHEN o_totalprice >= 300000 THEN 'high'
           WHEN o_totalprice >= 100000 THEN 'mid' ELSE 'low' END AS bucket,
      o_orderstatus,
      count(*) AS n,
      CAST(min(o_orderdate) AS TIMESTAMP) AS first_order,
      CAST(max(o_orderdate) AS TIMESTAMP) AS last_order
    FROM orders GROUP BY 1, 2
    """,
    tags=("agg", "B7"),
)
def agg_case_when_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE-WHEN derived grouping key + min/max over timestamps."""
    o = load_table(spark, sf_dir, "orders")
    bucket = (
        F.when(F.col("o_totalprice") >= 300000, "high")
        .when(F.col("o_totalprice") >= 100000, "mid")
        .otherwise("low")
    )
    return (
        o.groupBy(bucket.alias("bucket"), F.col("o_orderstatus"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("o_orderdate").alias("first_order"),
            F.max("o_orderdate").alias("last_order"),
        )
    )


@query(
    "agg_percentiles",
    oracle="""
    SELECT l_returnflag,
      quantile_cont(l_quantity, 0.5) AS p50_qty,
      quantile_cont(l_quantity, 0.9) AS p90_qty,
      quantile_disc(l_extendedprice, 0.5) AS p50_price_disc
    FROM lineitem GROUP BY l_returnflag
    """,
    tags=("agg", "B7", "percentile"),
)
def agg_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact percentiles: continuous (interpolated — Spark ``percentile``
    ≡ DuckDB ``quantile_cont``) and discrete. The 100 TB path is
    ``approx_percentile`` (t-digest, engine-specific, tested rows-only
    elsewhere); exact percentiles stay oracle-checkable."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.expr("percentile(l_quantity, 0.5)").alias("p50_qty"),
        F.expr("percentile(l_quantity, 0.9)").alias("p90_qty"),
        F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY l_extendedprice)").alias(
            "p50_price_disc"
        ),
    )


@query(
    "cdc_merge_upsert",
    oracle="""
    WITH latest AS (
      SELECT * FROM (
        SELECT user_id, event_id, value, event_type = 'error' AS is_delete,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY ts DESC, event_id DESC) AS rn
        FROM events WHERE ts >= TIMESTAMP '2024-01-20 00:00:00') t
      WHERE rn = 1),
    snapshot AS (
      SELECT user_id, min(event_id) AS event_id, CAST(0.0 AS DOUBLE) AS value
      FROM events WHERE ts < TIMESTAMP '2024-01-20 00:00:00' GROUP BY user_id)
    SELECT s.user_id, s.event_id, s.value FROM snapshot s
    WHERE NOT EXISTS (SELECT 1 FROM latest l WHERE l.user_id = s.user_id)
    UNION ALL
    SELECT user_id, event_id, value FROM latest WHERE NOT is_delete
    """,
    tags=("cdc", "B8", "merge"),
)
def cdc_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC MERGE apply (SCD-1): a change batch (events after 1-20, with
    'error' rows as deletes) applied to a snapshot (state before 1-20) —
    upsert latest-per-key, drop deletes, keep untouched rows. The operator
    the reference's keyed CDC topics exist to feed."""
    from ..operators.cdc import merge_upsert

    ev = load_table(spark, sf_dir, "events")
    cutoff = F.lit("2024-01-20 00:00:00").cast("timestamp")
    snapshot = (
        ev.filter(F.col("ts") < cutoff)
        .groupBy("user_id")
        .agg(F.min("event_id").alias("event_id"), F.lit(0.0).alias("value"))
    )
    changes = ev.filter(F.col("ts") >= cutoff).select(
        "user_id",
        "event_id",
        "value",
        (F.col("event_type") == "error").alias("is_delete"),
        "ts",
    )
    merged = merge_upsert(
        snapshot, changes.withColumn("_ord", F.struct("ts", "event_id")),
        ["user_id"], "_ord", delete_col="is_delete",
    )
    return merged.select("user_id", "event_id", "value")


@query(
    "cdc_scd2_history",
    oracle="""
    SELECT user_id, event_id, value, ts AS valid_from,
      lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to,
      lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL AS is_current
    FROM events WHERE event_type = 'purchase'
    """,
    tags=("cdc", "B8", "B9", "scd2"),
)
def cdc_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD-2 versioned history from the purchase change stream: each
    change becomes a [valid_from, valid_to) version row, valid_to = next
    change per key (null = current). One window pass, one shuffle on the
    key — the versioned-apply counterpart of cdc_merge_upsert (SCD-1)."""
    from ..operators.cdc import scd2_history

    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    )
    return scd2_history(
        ev.select("user_id", "event_id", "value", "ts"),
        ["user_id"],
        "ts",
        tiebreak_col="event_id",
    ).select("user_id", "event_id", "value", "valid_from", "valid_to", "is_current")


@query(
    "skew_salted_agg",
    oracle=f"""
    SELECT event_type, count(*) AS n,
      {SQL_DSUM("CAST(value AS DECIMAL(18,2))")} AS total
    FROM events GROUP BY event_type
    """,
    tags=("skew", "B7", "scale"),
)
def skew_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase salted aggregation over a LOW-cardinality (worst-skew)
    key: counts/sums per (key, salt) then per key. Same answer as the
    direct group-by — decimal sums make the two-phase reassociation
    exact — with the hot key spread over 16 reducers in phase 1."""
    from ..operators.skew import salted_agg_sum, salted_count

    ev = load_table(spark, sf_dir, "events")
    counts = salted_count(ev, ["event_type"], salt_buckets=16)
    sums = salted_agg_sum(
        ev, ["event_type"], dec2("value"), "total_dec", salt_buckets=16
    )
    return counts.join(sums, "event_type").select(
        "event_type", "n", F.round(F.col("total_dec"), 2).cast("double").alias("total")
    )


@query(
    "join_skew_salted",
    # Same answer as the plain equi-join; the salt is a physical detail.
    oracle="""
    SELECT e.event_id, e.user_id, e.event_type, c.c_mktsegment
    FROM events e JOIN customer c ON e.user_id = c.c_custkey
    WHERE e.user_id < 50
    """,
    tags=("skew", "B6", "scale", "join"),
)
def join_skew_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-proof fact⋈dim join: the fact side is salted into 16
    sub-keys and the dimension is EXPLODED across all salt values before
    the broadcast join on (key, salt) — a hot key's rows land on 16
    reducers/tasks instead of one, which is what keeps the straggler
    task from owning the whole join at 100 TB (AQE's skew-join split is
    the automatic form; this is the explicit, always-on form for keys
    you KNOW are hot, e.g. the null/default user). Deterministic answer
    identical to the plain join — the salt never reaches the output."""
    from ..operators.skew import salted_broadcast_join

    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("user_id") < 50)
        .select("event_id", F.col("user_id").alias("c_custkey"), "event_type")
    )
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    return salted_broadcast_join(ev, c, "c_custkey", salt_buckets=16).select(
        "event_id",
        F.col("c_custkey").alias("user_id"),
        "event_type",
        "c_mktsegment",
    )


@query(
    "subquery_correlated_scalar",
    oracle="""
    SELECT o.o_orderkey, o.o_totalprice FROM orders o
    WHERE o.o_totalprice > 1.5 * (
      SELECT CAST(sum(CAST(i.o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
             / count(*)
      FROM orders i WHERE i.o_custkey = o.o_custkey)
    """,
    tags=("subquery", "B4", "B7"),
)
def subquery_correlated_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery (per-customer average) — Catalyst
    de-correlates it into an aggregate + join; the exact-decimal average
    keeps the comparison threshold bit-identical cross-engine."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("_adv2_orders")
    return spark.sql(
        """
        SELECT o.o_orderkey, o.o_totalprice FROM _adv2_orders o
        WHERE o.o_totalprice > 1.5 * (
          SELECT CAST(sum(CAST(i.o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                 / count(*)
          FROM _adv2_orders i WHERE i.o_custkey = o.o_custkey)
        """
    )


@query(
    "agg_approx_quantiles",
    # GK/t-digest sketch estimates are engine-specific, so the raw estimate
    # can never hash-match an oracle. The query instead emits EXACT discrete
    # percentiles (smallest value with cume_dist >= p — pure data values, no
    # float interpolation, so bit-identical across engines) plus boolean
    # bounds predicates on the sketch; the oracle computes the same exact
    # percentiles and asserts the predicates TRUE (VERDICT r6 item 8).
    oracle="""
    WITH cd AS (
      SELECT l_returnflag, l_extendedprice,
             cume_dist() OVER (PARTITION BY l_returnflag
                               ORDER BY l_extendedprice) AS cd
      FROM lineitem)
    SELECT l_returnflag,
           min(CASE WHEN cd >= 0.5 THEN l_extendedprice END) AS exact_p50,
           min(CASE WHEN cd >= 0.95 THEN l_extendedprice END) AS exact_p95,
           TRUE AS p50_within_tol,
           TRUE AS p95_within_tol
    FROM cd GROUP BY l_returnflag
    """,
    tags=("agg", "B7", "approx"),
)
def agg_approx_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_percentile — the 100 TB quantile path (bounded-memory sketch,
    single pass, mergeable across partitions). The exact anchors are
    DISCRETE percentiles (min value whose cume_dist reaches p): actual data
    values, not interpolations, so both engines agree bit-for-bit; the
    sketch estimate is driver-verified through a 1% relative-error band
    (accuracy=10000 → worst-case rank error 1/10000, far tighter than 1%
    of value at this distribution). The unit test bounds error tighter."""
    li = load_table(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_returnflag").orderBy("l_extendedprice")
    exact = (
        li.withColumn("_cd", F.cume_dist().over(w))
        .groupBy("l_returnflag")
        .agg(
            F.min(F.when(F.col("_cd") >= 0.5, F.col("l_extendedprice"))).alias(
                "exact_p50"
            ),
            F.min(F.when(F.col("_cd") >= 0.95, F.col("l_extendedprice"))).alias(
                "exact_p95"
            ),
        )
    )
    sketched = li.groupBy("l_returnflag").agg(
        F.expr("approx_percentile(l_extendedprice, array(0.5, 0.95), 10000)").alias(
            "_sig"
        )
    )
    return (
        exact.join(sketched, "l_returnflag")
        .select(
            "l_returnflag",
            "exact_p50",
            "exact_p95",
            (
                F.abs(F.element_at("_sig", 1) - F.col("exact_p50"))
                <= 0.01 * F.col("exact_p50")
            ).alias("p50_within_tol"),
            (
                F.abs(F.element_at("_sig", 2) - F.col("exact_p95"))
                <= 0.01 * F.col("exact_p95")
            ).alias("p95_within_tol"),
        )
    )


@query(
    "agg_hll_sketch_merge",
    # Sketch bytes are engine-specific; like agg_approx_distinct the row
    # carries the EXACT count plus a bounds predicate on the merged-sketch
    # estimate, so the driver's value hash verifies both.
    oracle="""
    SELECT n_name,
           count(DISTINCT o_custkey) AS exact_custs,
           TRUE AS merged_within_tol
    FROM orders
      JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
    GROUP BY n_name
    """,
    tags=("agg", "B7", "approx", "sketch"),
)
def agg_hll_sketch_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable HLL sketches (Apache Datasketches, Spark 3.5+): distinct
    customers per nation built as PER-SHARD sketches (`hll_sketch_agg`
    over o_orderkey%4 shards) and combined with `hll_union_agg` — the
    100 TB distributed-count-distinct idiom where each partition/day/
    region sketches independently and only KB-sized sketch bytes move in
    the merge shuffle, never the raw keys. This is strictly stronger
    evidence than `agg_approx_distinct`'s single-pass HLL++: it proves
    the REASSOCIATION property (union of shard sketches ≈ sketch of
    union) that incremental pipelines rely on. The emitted row carries
    the exact count and a 3-sigma bounds check on the merged estimate
    (lgConfigK=12 → rse ≈ 1.04/√4096 ≈ 1.6%, 3σ ≈ 4.9%)."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    base = o.join(
        c, o.o_custkey == c.c_custkey
    ).join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
    shard_sketches = base.groupBy(
        "n_name", (F.col("o_orderkey") % 4).alias("_shard")
    ).agg(F.hll_sketch_agg("o_custkey", 12).alias("_sk"))
    merged = shard_sketches.groupBy("n_name").agg(
        F.hll_sketch_estimate(F.hll_union_agg("_sk")).alias("_est")
    )
    exact = base.groupBy("n_name").agg(
        F.countDistinct("o_custkey").alias("exact_custs")
    )
    return exact.join(merged, "n_name").select(
        "n_name",
        "exact_custs",
        (
            F.abs(F.col("_est") - F.col("exact_custs"))
            <= 3 * 0.0163 * F.col("exact_custs")
        ).alias("merged_within_tol"),
    )


@query(
    "agg_heavy_hitters",
    # Sketch contents depend on within-partition row order, so (like the
    # other sketch queries) the row carries the EXACT count/share plus
    # the two Misra-Gries guarantee predicates as booleans.
    oracle="""
    WITH t AS (SELECT count(*) AS n_total FROM events)
    SELECT CAST(event_type AS VARCHAR) AS key,
           count(*) AS exact_count,
           (count(*) * 1000000) // (SELECT n_total FROM t) AS share_ppm_floor,
           TRUE AS within_bounds,
           TRUE AS present_when_guaranteed
    FROM events
    GROUP BY event_type
    HAVING count(*) * 1000000 > (SELECT n_total FROM t) * 50000
    """,
    tags=("agg", "B7", "approx", "sketch", "heavy-hitters"),
)
def agg_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequent-items via per-partition Misra-Gries summaries merged
    globally (operators/sketch.py) — the bounded-memory path for "top
    keys by frequency" at 100 TB: each partition keeps ≤64 counters no
    matter how many rows it sees, only those KB-sized summaries shuffle,
    and the merge is a plain per-key sum with a provable error bound
    (est ≤ exact ≤ est + Σ_p d_p; keys above the bound cannot be
    missed). Emitted rows: exact counts for the ≥5%-share keys plus the
    guarantee predicates as driver-verifiable booleans; the eviction
    math is additionally pinned by a crafted-skew pytest where the
    sketch actually saturates."""
    from ..operators.sketch import heavy_hitters_checked

    ev = load_table(spark, sf_dir, "events")
    return heavy_hitters_checked(ev, "event_type", capacity=64, min_share_ppm=50000)


@query(
    "agg_bitmap_distinct",
    oracle="""
    SELECT CAST(event_type AS VARCHAR) AS event_type,
           count(DISTINCT user_id) AS distinct_users
    FROM events GROUP BY event_type
    UNION ALL
    SELECT 'ALL' AS event_type, count(DISTINCT user_id) AS distinct_users
    FROM events
    """,
    tags=("agg", "B7", "bitmap", "distinct"),
)
def agg_bitmap_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT mergeable count-distinct via bitmap aggregation (Spark 3.5+
    ``bitmap_construct_agg``/``bitmap_or_agg`` — the ClickHouse/Doris
    roaring-bitmap idiom): each (event_type, id-bucket) group folds its
    user ids into a fixed 4 KB bitmap, per-type counts are sums of
    disjoint-bucket popcounts, and the ALL row is rebuilt by OR-merging
    the per-type bitmaps — proving the same reassociation property as
    `agg_hll_sketch_merge` but with zero error. This is the exact
    alternative to HLL when the key domain is dense integers: partial
    states are bounded bitmaps instead of raw keys, so a 100 TB
    count-distinct shuffles KBs per group, pre-aggregates map-side, and
    composes across shards/days by bitwise OR. Unlike COUNT(DISTINCT),
    whose Expand-based plan must shuffle every key, the bitmap state is
    also reusable: the ALL tier here costs one more tiny aggregation
    over the per-type states, never a second scan."""
    ev = load_table(spark, sf_dir, "events")
    buckets = ev.groupBy(
        "event_type", F.bitmap_bucket_number("user_id").alias("_bucket")
    ).agg(F.bitmap_construct_agg(F.bitmap_bit_position("user_id")).alias("_bm"))
    per_type = buckets.groupBy("event_type").agg(
        F.sum(F.bitmap_count("_bm")).alias("distinct_users")
    )
    overall = (
        buckets.groupBy("_bucket")
        .agg(F.bitmap_or_agg("_bm").alias("_bm"))
        .agg(F.sum(F.bitmap_count("_bm")).alias("distinct_users"))
        .select(F.lit("ALL").alias("event_type"), "distinct_users")
    )
    return per_type.unionAll(overall)


@query(
    "join_bloom_prefilter",
    oracle="""
    SELECT CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS order_month,
           count(*) AS n_items,
           CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
             (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(18,2)))), 2)
             AS DOUBLE) AS revenue
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE o_orderpriority = '1-URGENT'
    GROUP BY order_month
    """,
    tags=("join", "B6", "bloom", "semi-reduction"),
)
def join_bloom_prefilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter semi-join reduction (operators/bloom.py): lineitem
    joined to the urgent ~20% of orders, with the fact side pruned
    map-side against a broadcast Bloom bitmap of the surviving order
    keys BEFORE the join shuffle. At 100 TB this is the decisive join
    optimization when the dim's key set is too large to broadcast as
    rows but its membership fits in MBs of bits: non-joinable fact rows
    die during the scan, so the shuffle moves ~20% of the table instead
    of all of it. No false negatives (Bloom guarantee) and false
    positives die in the real join, so the result is exactly the plain
    join — which is precisely what the oracle runs. Catalyst's native
    runtime bloom filter (spark.sql.optimizer.runtime.bloomFilter.*) is
    the automatic form; this operator is the explicit, tunable one, and
    tests/test_bloom.py pins the fp-rate and zero-false-negative
    contracts."""
    from ..operators.bloom import bloom_prefilter_join

    li = load_table(spark, sf_dir, "lineitem").withColumnRenamed(
        "l_orderkey", "o_orderkey"
    )
    o = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderpriority") == "1-URGENT"
    )
    joined = bloom_prefilter_join(li, o.select("o_orderkey", "o_orderdate"), "o_orderkey")
    return joined.groupBy(
        F.date_trunc("month", "o_orderdate").alias("order_month")
    ).agg(
        F.count(F.lit(1)).alias("n_items"),
        dsum(dec2("l_extendedprice") * one_minus("l_discount")).alias("revenue"),
    )


_DISC_PRICE_SQL = (
    "CAST(l_extendedprice AS DECIMAL(18,2)) * "
    "(CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(18,2)))"
)


@query(
    "q7_volume_shipping",
    oracle=f"""
    SELECT supp_nation, cust_nation, l_year,
      {SQL_DSUM("volume")} AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        CAST(year(l_shipdate) AS BIGINT) AS l_year,
        {_DISC_PRICE_SQL} AS volume
      FROM supplier
        JOIN lineitem ON s_suppkey = l_suppkey
        JOIN orders ON o_orderkey = l_orderkey
        JOIN customer ON c_custkey = o_custkey
        JOIN nation n1 ON s_nationkey = n1.n_nationkey
        JOIN nation n2 ON c_nationkey = n2.n_nationkey
      WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
          OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00') shipping
    GROUP BY supp_nation, cust_nation, l_year
    ORDER BY supp_nation, cust_nation, l_year
    """,
    tags=("join", "agg", "B6", "B7"),
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7: bidirectional nation-pair trade volume by ship year.

    Scale shape: the two fact tables join on l_orderkey (the one big
    shuffle); both nation joins broadcast, and the nation-pair predicate
    prunes the fact rows BEFORE the fact-fact join via the broadcast
    semi-reduction on supplier/customer keys."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    n1 = n.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = n.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(pair)
        .withColumn("l_year", F.year("l_shipdate").cast("long"))
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(dsum(dec2("l_extendedprice") * one_minus("l_discount")).alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@query(
    "q8_market_share",
    oracle=f"""
    SELECT o_year,
      CAST(sum(CASE WHEN supp_nation = 'NATION_2' THEN volume
                    ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
        / CAST(sum(volume) AS DOUBLE) AS mkt_share
    FROM (
      SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
        {_DISC_PRICE_SQL} AS volume,
        n2.n_name AS supp_nation
      FROM lineitem
        JOIN orders ON o_orderkey = l_orderkey
        JOIN customer ON c_custkey = o_custkey
        JOIN nation n1 ON c_nationkey = n1.n_nationkey
        JOIN region ON n1.n_regionkey = r_regionkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation n2 ON s_nationkey = n2.n_nationkey
      WHERE r_name = 'ASIA') all_sales
    GROUP BY o_year
    ORDER BY o_year
    """,
    tags=("join", "agg", "B6", "B7"),
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 (adapted — no partsupp table in the fixture): one
    nation's share of supplier revenue into a region, per order year.
    Conditional decimal aggregation over a 7-table join; the share is a
    ratio of two exact decimal sums (cast to double only at the end, so
    both engines produce the identical IEEE quotient)."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n1 = n.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_region")
    )
    n2 = n.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("supp_nation")
    )
    vol = dec2("l_extendedprice") * one_minus("l_discount")
    nation_vol = F.when(F.col("supp_nation") == "NATION_2", vol).otherwise(
        F.lit(0).cast("decimal(18,2)")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("n1_key"))
        .join(F.broadcast(r), F.col("n1_region") == F.col("r_regionkey"))
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("n2_key"))
        .withColumn("o_year", F.year("o_orderdate").cast("long"))
        .groupBy("o_year")
        .agg(
            (
                F.sum(nation_vol).cast("double") / F.sum(vol).cast("double")
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


@query(
    "q9_product_type_profit",
    oracle=f"""
    SELECT nation, o_year, {SQL_DSUM("volume")} AS sum_profit
    FROM (
      SELECT n_name AS nation,
        CAST(year(o_orderdate) AS BIGINT) AS o_year,
        {_DISC_PRICE_SQL} AS volume
      FROM lineitem
        JOIN part ON p_partkey = l_partkey
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        JOIN orders ON o_orderkey = l_orderkey
      WHERE p_name LIKE '%widget%') profit
    GROUP BY nation, o_year
    ORDER BY nation, o_year DESC
    """,
    tags=("join", "agg", "B6", "B7"),
)
def q9_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 (adapted — profit without the partsupp supplycost term):
    revenue on a part-name pattern, by supplier nation and order year.
    The LIKE filter pushes into the part scan and semi-reduces lineitem
    through the broadcast join before the fact-fact shuffle."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%widget%"))
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    o = load_table(spark, sf_dir, "orders")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(o, li.l_orderkey == o.o_orderkey)
        .withColumn("o_year", F.year("o_orderdate").cast("long"))
        .withColumn("nation", F.col("n_name"))
        .groupBy("nation", "o_year")
        .agg(dsum(dec2("l_extendedprice") * one_minus("l_discount")).alias("sum_profit"))
        .orderBy("nation", F.desc("o_year"))
    )


@query(
    "bucketed_join_revenue",
    oracle=f"""
    SELECT o_orderpriority,
      {SQL_DSUM("CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(18,2)))")} AS revenue,
      count(*) AS n_items
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    tags=("join", "agg", "B6", "bucketing"),
)
def bucketed_join_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact-fact join over BUCKETED tables: lineitem/orders are written
    bucketBy(8, orderkey) + sortBy once (the amortized shuffle), then the
    join consumes co-located sorted buckets — the physical plan has no
    Exchange on either join side (asserted in tests/test_bucketing.py).
    Results are layout-independent, so the plain-join DuckDB oracle
    hash-checks it like any other query.

    The broadcast threshold is irrelevant here by design: the test pins
    the join to sort-merge to prove the bucket layout, but in production
    the win is the same for any equi-join/groupBy on the bucket key."""
    from ..operators.bucketing import ensure_bucketed_pair

    cache = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))), ".bucketed_cache")
    li_tbl, o_tbl = ensure_bucketed_pair(spark, sf_dir, cache, num_buckets=8)
    li, o = spark.table(li_tbl), spark.table(o_tbl)
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            dsum(dec2("l_extendedprice") * one_minus("l_discount")).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .orderBy("o_orderpriority")
    )


@query(
    "join_lateral_topk",
    oracle="""
    SELECT c.c_custkey, c.c_mktsegment, o.o_orderkey, o.o_totalprice
    FROM customer c, LATERAL (
      SELECT o_orderkey, o_totalprice FROM orders
      WHERE o_custkey = c.c_custkey
      ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) o
    """,
    tags=("join", "B6", "lateral"),
)
def join_lateral_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery with ORDER BY + LIMIT: each customer's
    two most valuable orders — the per-row dependent-join surface (SQL
    standard LATERAL, DuckDB/Postgres idiom) expressed verbatim.

    Catalyst DECORRELATES this: the physical plan is a WindowGroupLimit
    (partial on the map side, final after one orderkey-hash shuffle) that
    keeps ≤2 orders per customer BEFORE the join — never a per-customer
    re-execution of the inner query, which is what makes the lateral
    shape viable over a 100 TB orders table. Verified against DuckDB's
    native LATERAL execution."""
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("_lat_customer")
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("_lat_orders")
    return spark.sql(
        """
        SELECT c.c_custkey, c.c_mktsegment, o.o_orderkey, o.o_totalprice
        FROM _lat_customer c, LATERAL (
          SELECT o_orderkey, o_totalprice FROM _lat_orders
          WHERE o_custkey = c.c_custkey
          ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) o
        """
    )


@query(
    "orders_rfm_segments",
    oracle="""
    WITH snap AS (SELECT max(o_orderdate) AS d FROM orders),
    pc AS (
      SELECT o_custkey,
        date_diff('day', max(o_orderdate), (SELECT d FROM snap)) AS recency_days,
        count(*) AS frequency,
        sum(CAST(o_totalprice AS DECIMAL(18,2))) AS monetary
      FROM orders GROUP BY o_custkey),
    scored AS (
      SELECT *,
        CASE WHEN recency_days <= 90 THEN 3
             WHEN recency_days <= 270 THEN 2 ELSE 1 END AS r_band,
        CASE WHEN frequency >= 12 THEN 3
             WHEN frequency >= 9 THEN 2 ELSE 1 END AS f_band,
        CASE WHEN monetary >= 2800000 THEN 3
             WHEN monetary >= 2000000 THEN 2 ELSE 1 END AS m_band
      FROM pc)
    SELECT r_band, f_band, m_band,
      count(*) AS n_customers,
      CAST(sum(monetary) AS DOUBLE) / count(*) AS avg_monetary,
      min(recency_days) AS min_recency_days,
      max(recency_days) AS max_recency_days
    FROM scored GROUP BY r_band, f_band, m_band
    """,
    tags=("agg", "B7", "rfm", "segmentation"),
)
def orders_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM customer segmentation (recency / frequency / monetary — the
    standard CRM slicing): one keyed aggregation per customer, FIXED
    documented band thresholds (90/270 days, 9/12 orders, 2.0M/2.8M
    value), then segment-level counts and exact averages. Fixed bands
    instead of data-dependent quintiles is the deliberate scale choice:
    an NTILE over all customers needs a single-partition global sort
    (broken at 1B customers), while band scoring is pure map-side CASE
    on the aggregated rows — and fixed thresholds are what CRM teams
    deploy anyway, because segment definitions must stay stable across
    refreshes. The snapshot date is a one-row broadcast (scalar max);
    monetary sums are exact DECIMAL, the avg one IEEE division."""
    o = load_table(spark, sf_dir, "orders")
    snap = o.agg(F.max("o_orderdate").alias("_snap"))
    pc = (
        o.groupBy("o_custkey")
        .agg(
            F.max("o_orderdate").alias("_last"),
            F.count(F.lit(1)).alias("frequency"),
            F.sum(dec2("o_totalprice")).alias("monetary"),
        )
        .crossJoin(F.broadcast(snap))
        .withColumn("recency_days", F.datediff("_snap", "_last").cast("long"))
    )
    scored = pc.select(
        "recency_days",
        "frequency",
        "monetary",
        F.when(F.col("recency_days") <= 90, 3)
        .when(F.col("recency_days") <= 270, 2)
        .otherwise(1)
        .alias("r_band"),
        F.when(F.col("frequency") >= 12, 3)
        .when(F.col("frequency") >= 9, 2)
        .otherwise(1)
        .alias("f_band"),
        F.when(F.col("monetary") >= 2_800_000, 3)
        .when(F.col("monetary") >= 2_000_000, 2)
        .otherwise(1)
        .alias("m_band"),
    )
    return scored.groupBy("r_band", "f_band", "m_band").agg(
        F.count(F.lit(1)).alias("n_customers"),
        (F.sum("monetary").cast("double") / F.count(F.lit(1))).alias("avg_monetary"),
        F.min("recency_days").alias("min_recency_days"),
        F.max("recency_days").alias("max_recency_days"),
    )


@query(
    "events_dau_wau",
    oracle="""
    WITH days AS (
      SELECT DISTINCT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day
      FROM events),
    dau AS (
      SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
             count(DISTINCT user_id) AS dau
      FROM events GROUP BY 1)
    SELECT d.day, max(dau.dau) AS dau, count(DISTINCT e.user_id) AS wau
    FROM days d
    JOIN events e ON e.ts >= d.day - INTERVAL 6 DAY
                 AND e.ts < d.day + INTERVAL 1 DAY
    JOIN dau ON dau.day = d.day
    GROUP BY d.day
    """,
    tags=("agg", "B7", "B9", "bitmap", "distinct", "rolling"),
)
def events_dau_wau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT rolling active-user counts (DAU + trailing-7-day WAU) via
    bitmap OR-merge — the growth-metric query that is genuinely hard at
    scale: a naive per-day COUNT(DISTINCT trailing week) rescans 7x the
    data per day, while here each (day, id-bucket) pair folds its users
    into one 4 KB bitmap ONCE, each bitmap row EXPLODES to the 7 target
    days it contributes to, and the per-target-day OR-merge rebuilds the
    trailing week. The explode-contribution form (not a RANGE window)
    is load-bearing for correctness: a bucket with no events on day d
    has no row for a window frame anchored at d to see, silently
    dropping that bucket's earlier-in-week users — the contribution
    rows land on every covered day regardless. Shuffle volume is
    7x|days|x|buckets| bitmap rows — independent of event count — and
    the result is exact, not an HLL estimate. Zero-event days emit no
    row (documented; the fixture has none)."""
    ev = load_table(spark, sf_dir, "events")
    day_idx = F.datediff(
        F.date_trunc("day", "ts").cast("date"), F.lit("1970-01-01").cast("date")
    )
    daily = ev.groupBy(
        day_idx.alias("_day_idx"),
        F.bitmap_bucket_number("user_id").alias("_bucket"),
    ).agg(F.bitmap_construct_agg(F.bitmap_bit_position("user_id")).alias("_bm"))
    dau = daily.groupBy("_day_idx").agg(
        F.sum(F.bitmap_count("_bm")).alias("dau")
    )
    contrib = daily.select(
        F.explode(F.expr("sequence(_day_idx, _day_idx + 6)")).alias("_t_idx"),
        "_bucket",
        "_bm",
    )
    wau = (
        contrib.groupBy("_t_idx", "_bucket")
        .agg(F.expr("bitmap_or_agg(_bm)").alias("_wbm"))
        .groupBy("_t_idx")
        .agg(F.sum(F.bitmap_count("_wbm")).alias("wau"))
    )
    return (
        dau.join(wau, dau._day_idx == wau._t_idx)
        .select(
            F.date_add(F.lit("1970-01-01").cast("date"), F.col("_day_idx"))
            .cast("timestamp")
            .alias("day"),
            "dau",
            "wau",
        )
    )


@query(
    "dq_checks_orders",
    oracle="""
    WITH a AS (
      SELECT count(*) AS n,
        count(DISTINCT o_orderkey) AS nd,
        count(*) - count(o_orderkey) AS null_keys,
        sum(CASE WHEN o_totalprice <= 0 OR o_totalprice > 600000
                 THEN 1 ELSE 0 END) AS bad_price,
        sum(CASE WHEN o_orderdate < TIMESTAMP '1995-01-01 00:00:00'
                   OR o_orderdate >= TIMESTAMP '2002-01-01 00:00:00'
                 THEN 1 ELSE 0 END) AS bad_date,
        sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH',
                   '3-MEDIUM', '4-NOT SPECIFIED', '5-LOW')
                 THEN 1 ELSE 0 END) AS bad_priority
      FROM orders),
    ri AS (
      SELECT count(*) AS v FROM orders o
      LEFT JOIN customer c ON o.o_custkey = c.c_custkey
      WHERE c.c_custkey IS NULL)
    SELECT 'orderkey_not_null' AS rule,
           CAST(null_keys AS BIGINT) AS n_violations,
           null_keys = 0 AS passed FROM a
    UNION ALL
    SELECT 'orderkey_unique', CAST(n - nd AS BIGINT), n = nd FROM a
    UNION ALL
    SELECT 'totalprice_in_range', CAST(bad_price AS BIGINT), bad_price = 0 FROM a
    UNION ALL
    SELECT 'orderdate_in_range', CAST(bad_date AS BIGINT), bad_date = 0 FROM a
    UNION ALL
    SELECT 'priority_in_domain', CAST(bad_priority AS BIGINT), bad_priority = 0 FROM a
    UNION ALL
    SELECT 'custkey_references_customer', CAST(v AS BIGINT), v = 0 FROM ri
    """,
    tags=("agg", "B7", "quality", "dq"),
)
def dq_checks_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative data-quality gate (the Deequ/expectations shape): six
    named rules — key completeness and uniqueness, two range checks, a
    domain check, and referential integrity against customer — each
    emitting (rule, n_violations, passed). The checked-in fixture is
    clean, so every row is (_, 0, true); the VALUE of the query is the
    plan shape a 100 TB nightly gate needs: the five column rules come
    from ONE pass over orders (conditional sums in a single aggregate,
    unpivoted driver-side from a 1-row result), and the RI rule is one
    broadcast anti-join count — no per-rule rescans, no row-level
    materialization of violations. The sibling `profile_orders` measures
    (profiling); this one JUDGES against declared expectations."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    bad_price = (F.col("o_totalprice") <= 0) | (F.col("o_totalprice") > 600000)
    bad_date = (F.col("o_orderdate") < F.lit("1995-01-01 00:00:00").cast("timestamp")) | (
        F.col("o_orderdate") >= F.lit("2002-01-01 00:00:00").cast("timestamp")
    )
    domain = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
    a = o.agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("o_orderkey").alias("nd"),
        (F.count(F.lit(1)) - F.count("o_orderkey")).alias("null_keys"),
        F.sum(F.when(bad_price, 1).otherwise(0)).alias("bad_price"),
        F.sum(F.when(bad_date, 1).otherwise(0)).alias("bad_date"),
        F.sum(
            F.when(~F.col("o_orderpriority").isin(domain), 1).otherwise(0)
        ).alias("bad_priority"),
    )
    col_rules = a.select(
        F.expr(
            "stack(5, "
            "'orderkey_not_null', null_keys, "
            "'orderkey_unique', n - nd, "
            "'totalprice_in_range', bad_price, "
            "'orderdate_in_range', bad_date, "
            "'priority_in_domain', bad_priority) AS (rule, n_violations)"
        )
    )
    ri = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey, "left_anti")
        .agg(F.count(F.lit(1)).alias("n_violations"))
        .select(F.lit("custkey_references_customer").alias("rule"), "n_violations")
    )
    return col_rules.unionAll(ri).select(
        "rule", "n_violations", (F.col("n_violations") == 0).alias("passed")
    )


@query(
    "cdc_snapshot_asof",
    oracle="""
    WITH hist AS (
      SELECT user_id, event_id, value, ts AS valid_from,
        lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to
      FROM events WHERE event_type = 'purchase')
    SELECT user_id, event_id, value, valid_from
    FROM hist
    WHERE valid_from <= TIMESTAMP '2024-01-20 00:00:00'
      AND (valid_to IS NULL OR valid_to > TIMESTAMP '2024-01-20 00:00:00')
    """,
    tags=("cdc", "B8", "B9", "scd2", "time-travel"),
)
def cdc_snapshot_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time travel over the SCD-2 history: the per-key state exactly as
    of 2024-01-20 — the version row whose [valid_from, valid_to)
    interval contains the snapshot instant. This is the query the
    versioned dimension EXISTS for ('what did this customer look like
    when the order shipped?'); together with `cdc_scd2_history` (build)
    and `cdc_merge_upsert` (latest-wins) it completes the CDC apply
    family. Same single key-partitioned window as the history build,
    then a map-side interval predicate — at scale the predicate prunes
    with the history's partition layout, never a second shuffle."""
    from ..operators.cdc import scd2_history

    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    )
    t = F.lit("2024-01-20 00:00:00").cast("timestamp")
    hist = scd2_history(
        ev.select("user_id", "event_id", "value", "ts"),
        ["user_id"],
        "ts",
        tiebreak_col="event_id",
    )
    return hist.where(
        (F.col("valid_from") <= t)
        & (F.col("valid_to").isNull() | (F.col("valid_to") > t))
    ).select("user_id", "event_id", "value", "valid_from")


@query(
    "basket_brand_affinity",
    oracle="""
    WITH ob AS (
      SELECT DISTINCT l_orderkey, p_brand
      FROM lineitem JOIN part ON l_partkey = p_partkey),
    n AS (SELECT count(DISTINCT l_orderkey) AS n_orders FROM ob),
    per AS (SELECT p_brand, count(*) AS n_b FROM ob GROUP BY p_brand),
    pairs AS (
      SELECT a.p_brand AS brand_a, b.p_brand AS brand_b, count(*) AS n_ab
      FROM ob a JOIN ob b ON a.l_orderkey = b.l_orderkey
                        AND a.p_brand < b.p_brand
      GROUP BY 1, 2)
    SELECT p.brand_a, p.brand_b, p.n_ab,
      CAST((SELECT n_orders FROM n) * p.n_ab AS DOUBLE)
        / (pa.n_b * pb.n_b) AS lift
    FROM pairs p
      JOIN per pa ON pa.p_brand = p.brand_a
      JOIN per pb ON pb.p_brand = p.brand_b
    WHERE p.n_ab >= 20
    """,
    tags=("agg", "join", "B6", "B7", "basket", "affinity"),
)
def basket_brand_affinity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket association over order contents: for every brand
    pair bought in the same order at least 20 times, the co-occurrence
    count and its LIFT (n_orders·n_ab / (n_a·n_b) — >1 means the pair
    attracts, <1 repels). The association-rule primitive behind
    recommendations and assortment planning.

    Scale shape: the raw table reduces FIRST to distinct (order, brand)
    — |orders|×|brands-per-order| rows — so the pair self-join explodes
    only within an order's brand set (~k² per order for k≈4 brands, via
    the l_orderkey hash equi-join, never a global cross product); brand
    marginals are a 25-row broadcast and the lift is one IEEE division
    of exact longs. A 100 TB basket sweep is bounded by Σ k² over
    orders, the same cost class as the funnel/session operators."""
    li = load_table(spark, sf_dir, "lineitem")
    pt = load_table(spark, sf_dir, "part")
    # Materialize the distinct (order, brand) relation ONCE: it feeds
    # the order count, the brand marginals, and both sides of the pair
    # self-join — four lineitem scans + distinct shuffles in the r18
    # before-plan. The relation is |orders|·brands-per-order sized
    # (already the reduced proxy of the raw table — guide §8), so one
    # materialization replaces three re-derivations.
    ob = (
        li.join(F.broadcast(pt), li.l_partkey == pt.p_partkey)
        .select("l_orderkey", "p_brand")
        .distinct()
        .localCheckpoint(eager=False)
    )
    n_orders = ob.select(F.countDistinct("l_orderkey").alias("n_orders"))
    per = ob.groupBy("p_brand").agg(F.count(F.lit(1)).alias("n_b"))
    a, b = ob.alias("a"), ob.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.p_brand") < F.col("b.p_brand")),
        )
        .groupBy(
            F.col("a.p_brand").alias("brand_a"), F.col("b.p_brand").alias("brand_b")
        )
        .agg(F.count(F.lit(1)).alias("n_ab"))
        .where(F.col("n_ab") >= 20)
    )
    pa = per.select(F.col("p_brand").alias("brand_a"), F.col("n_b").alias("_na"))
    pb = per.select(F.col("p_brand").alias("brand_b"), F.col("n_b").alias("_nb"))
    return (
        pairs.join(F.broadcast(pa), "brand_a")
        .join(F.broadcast(pb), "brand_b")
        .crossJoin(F.broadcast(n_orders))
        .select(
            "brand_a",
            "brand_b",
            "n_ab",
            (
                (F.col("n_orders") * F.col("n_ab")).cast("double")
                / (F.col("_na") * F.col("_nb")).cast("double")
            ).alias("lift"),
        )
    )


@query(
    "agg_bitmap_audience_overlap",
    oracle="""
    WITH ut AS (SELECT DISTINCT event_type, user_id FROM events),
    pairs AS (
      SELECT a.event_type AS type_a, b.event_type AS type_b,
             count(*) AS n_intersect
      FROM ut a JOIN ut b ON a.user_id = b.user_id
                         AND a.event_type < b.event_type
      GROUP BY 1, 2),
    per AS (SELECT event_type, count(*) AS n FROM ut GROUP BY event_type)
    SELECT p.type_a, p.type_b,
           pa.n AS n_a, pb.n AS n_b,
           p.n_intersect,
           pa.n + pb.n - p.n_intersect AS n_union
    FROM pairs p
      JOIN per pa ON pa.event_type = p.type_a
      JOIN per pb ON pb.event_type = p.type_b
    """,
    tags=("agg", "B7", "bitmap", "distinct", "set-ops"),
)
def agg_bitmap_audience_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT audience overlap between every pair of event types — the
    marketing 'users who did X and also Y' matrix — computed by SET
    ALGEBRA over the same mergeable bitmap states `agg_bitmap_distinct`
    builds: per-(type, id-bucket) bitmaps are constructed ONCE, each
    pair's union count comes from OR-merging the two members' states
    per bucket, and the intersection is |A|+|B|−|A∪B| (inclusion-
    exclusion — Spark has no bitmap_and_agg, and none is needed). At
    100 TB the |types|²-pair sweep reuses the one set of bucket states:
    no per-pair rescan of raw events, and only 4 KB bitmaps move in the
    pair shuffle. Exact, unlike the theta-sketch estimate this replaces."""
    ev = load_table(spark, sf_dir, "events")
    buckets = ev.groupBy(
        "event_type", F.bitmap_bucket_number("user_id").alias("_bucket")
    ).agg(F.bitmap_construct_agg(F.bitmap_bit_position("user_id")).alias("_bm"))
    # Three consumers (per-type counts, pair contributions, the type
    # list) would each re-run the raw scan + state build — Catalyst does
    # not materialize shared subtrees. localCheckpoint pins the KB-sized
    # state table once (the dedup_clusters device), making 'states built
    # once' physically true: one events scan total.
    buckets = buckets.localCheckpoint(eager=True)
    per = buckets.groupBy("event_type").agg(
        F.sum(F.bitmap_count("_bm")).alias("n")
    )
    # Pair enumeration derived ENTIRELY from the state table — no
    # driver-side type-list collect: the |types|²/2 pair relation is a
    # self-join of the per-type summary (types-sized, broadcastable by
    # construction), and each state row reaches every pair it belongs to
    # through two broadcast equi-joins (member a, member b) union'd —
    # hash joins, not a nested-loop theta join, and the checkpointed
    # KB-sized state table streams twice instead of the raw events.
    pair_rel = (
        per.select(F.col("event_type").alias("type_a"))
        .join(
            per.select(F.col("event_type").alias("type_b")),
            F.col("type_a") < F.col("type_b"),
        )
    )
    contrib = (
        buckets.join(
            F.broadcast(pair_rel), F.col("event_type") == F.col("type_a")
        )
        .select("type_a", "type_b", "_bucket", "_bm")
        .unionByName(
            buckets.join(
                F.broadcast(pair_rel), F.col("event_type") == F.col("type_b")
            ).select("type_a", "type_b", "_bucket", "_bm")
        )
    )
    union_counts = (
        contrib.groupBy("type_a", "type_b", "_bucket")
        .agg(F.expr("bitmap_or_agg(_bm)").alias("_ubm"))
        .groupBy("type_a", "type_b")
        .agg(F.sum(F.bitmap_count("_ubm")).alias("n_union"))
    )
    pa = per.select(F.col("event_type").alias("type_a"), F.col("n").alias("n_a"))
    pb = per.select(F.col("event_type").alias("type_b"), F.col("n").alias("n_b"))
    return (
        union_counts.join(F.broadcast(pa), "type_a")
        .join(F.broadcast(pb), "type_b")
        .select(
            "type_a",
            "type_b",
            "n_a",
            "n_b",
            (F.col("n_a") + F.col("n_b") - F.col("n_union")).alias("n_intersect"),
            "n_union",
        )
    )


@query(
    "orders_cohort_ltv",
    oracle="""
    WITH f AS (
      SELECT o_custkey,
        CAST(date_trunc('month', min(o_orderdate)) AS TIMESTAMP) AS cm
      FROM orders GROUP BY o_custkey),
    j AS (
      SELECT f.cm,
        CAST((year(o.o_orderdate) * 12 + month(o.o_orderdate))
           - (year(f.cm) * 12 + month(f.cm)) AS BIGINT) AS ms,
        o.o_custkey,
        CAST(o.o_totalprice AS DECIMAL(18,2)) AS rev
      FROM orders o JOIN f ON o.o_custkey = f.o_custkey),
    m AS (
      SELECT cm AS cohort_month, ms AS months_since,
        count(DISTINCT o_custkey) AS n_customers, sum(rev) AS rev
      FROM j GROUP BY 1, 2)
    SELECT cohort_month, months_since, n_customers,
      CAST(round(rev, 2) AS DOUBLE) AS revenue,
      CAST(round(sum(rev) OVER (PARTITION BY cohort_month
                                ORDER BY months_since), 2) AS DOUBLE)
        AS cum_revenue
    FROM m
    """,
    tags=("agg", "B7", "B9", "cohort", "ltv"),
)
def orders_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort lifetime-value curves: customers grouped by
    first-purchase month, revenue tracked per months-since-acquisition
    with the cumulative LTV running sum — the finance counterpart of
    `cohort_retention_weekly` (that one counts active USERS per offset;
    this one accumulates exact DECIMAL revenue). Scale shape: one keyed
    aggregation for first-order months, one o_custkey-keyed join back,
    one (cohort, offset) aggregation with map-side partials; the
    cumulative window runs over the |cohorts|x|months| matrix, never
    raw orders. Sums stay DECIMAL through the window and cast to
    double only on output, so the running values hash identically."""
    o = load_table(spark, sf_dir, "orders")
    f = o.groupBy("o_custkey").agg(
        F.date_trunc("month", F.min("o_orderdate")).alias("_cm")
    )
    ms = (
        (F.year("o_orderdate") * 12 + F.month("o_orderdate"))
        - (F.year("_cm") * 12 + F.month("_cm"))
    ).cast("long")
    m = (
        o.join(f, "o_custkey")
        .groupBy(F.col("_cm").alias("cohort_month"), ms.alias("months_since"))
        .agg(
            F.countDistinct("o_custkey").alias("n_customers"),
            F.sum(dec2("o_totalprice")).alias("_rev"),
        )
    )
    w = Window.partitionBy("cohort_month").orderBy("months_since")
    return m.select(
        "cohort_month",
        "months_since",
        "n_customers",
        F.round(F.col("_rev"), 2).cast("double").alias("revenue"),
        F.round(F.sum("_rev").over(w), 2).cast("double").alias("cum_revenue"),
    )


@query(
    "supplier_concentration_hhi",
    oracle="""
    WITH t AS (
      SELECT s_nationkey, l_suppkey, count(*) AS n
      FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
      GROUP BY 1, 2),
    agg AS (
      SELECT s_nationkey, count(*) AS n_suppliers,
        CAST(sum(n) AS BIGINT) AS total_items,
        CAST(sum(n * n) AS BIGINT) AS s2
      FROM t GROUP BY s_nationkey)
    SELECT n_name, n_suppliers, total_items,
      CAST(s2 AS DOUBLE) / CAST(total_items * total_items AS DOUBLE) AS hhi
    FROM agg JOIN nation ON s_nationkey = n_nationkey
    """,
    tags=("agg", "B7", "concentration"),
)
def supplier_concentration_hhi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Herfindahl–Hirschman supplier-concentration index per nation —
    Σ shareᵢ² over each nation's suppliers, the antitrust/procurement
    measure of how dominated a market is (1/n = perfectly even, 1 =
    monopoly). Computed as the exact rational Σnᵢ² / N² — integer sums
    of squares with ONE final IEEE division, so no per-supplier float
    share ever exists and the hash is engine-stable. Two keyed
    aggregations with map-side partials + a 25-row dimension join;
    nothing scales with lineitem count after the first groupBy."""
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    t = (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .groupBy("s_nationkey", "l_suppkey")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    agg = t.groupBy("s_nationkey").agg(
        F.count(F.lit(1)).alias("n_suppliers"),
        F.sum("n").alias("total_items"),
        F.sum(F.col("n") * F.col("n")).alias("_s2"),
    )
    return agg.join(F.broadcast(n), agg.s_nationkey == n.n_nationkey).select(
        "n_name",
        "n_suppliers",
        "total_items",
        (
            F.col("_s2").cast("double")
            / (F.col("total_items") * F.col("total_items")).cast("double")
        ).alias("hhi"),
    )


@query(
    "orders_open_backlog",
    oracle="""
    WITH spans AS (
      SELECT o.o_orderkey,
        CAST(date_trunc('day', o.o_orderdate) AS TIMESTAMP) AS d0,
        CAST(date_trunc('day', max(l.l_shipdate)) AS TIMESTAMP)
          + INTERVAL 1 DAY AS d1
      FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
      GROUP BY o.o_orderkey, o.o_orderdate),
    deltas AS (
      SELECT d0 AS day, CAST(1 AS BIGINT) AS delta FROM spans
      UNION ALL
      SELECT d1 AS day, CAST(-1 AS BIGINT) AS delta FROM spans),
    byday AS (
      SELECT day, sum(delta) AS net FROM deltas GROUP BY day)
    SELECT day,
      CAST(sum(net) OVER (ORDER BY day
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS BIGINT) AS n_open
    FROM byday
    """,
    tags=("agg", "B7", "B9", "sweepline", "interval"),
)
def orders_open_backlog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Open-order backlog over time — how many orders are in flight on
    each day an order opens or closes — via the SWEEP-LINE pattern: each
    order's [orderdate, last shipdate] span becomes a +1/−1 delta pair,
    deltas aggregate per day, and one cumulative sum walks the calendar.
    The interval-stabbing question that a naive per-day range join makes
    quadratic (every day scans every order) collapses to one keyed
    aggregation per order, one tiny per-day aggregation, and a running
    sum over |distinct event days| rows (~thousands regardless of order
    count — an unpartitioned window is safe ONLY because the input is
    this bounded calendar, which is the pattern's whole point)."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    spans = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("o_orderkey", "o_orderdate")
        .agg(F.max("l_shipdate").alias("_last_ship"))
        .select(
            F.date_trunc("day", "o_orderdate").alias("d0"),
            (F.date_trunc("day", "_last_ship") + F.expr("INTERVAL 1 DAY")).alias("d1"),
        )
    )
    # Explode instead of unionAll: the union's two branches each
    # re-derived the orders⋈lineitem span aggregate (Spark shares no
    # subtrees across union branches); one explode emits both deltas
    # from a single derivation.
    deltas = spans.select(
        F.explode(
            F.array(
                F.struct(F.col("d0").alias("day"), F.lit(1).cast("long").alias("delta")),
                F.struct(F.col("d1").alias("day"), F.lit(-1).cast("long").alias("delta")),
            )
        ).alias("e")
    ).select("e.day", "e.delta")
    byday = deltas.groupBy("day").agg(F.sum("delta").alias("net"))
    w = bounded_window("day", "day").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return byday.select("day", F.sum("net").over(w).alias("n_open"))


@query(
    "agg_quantiles_distributed",
    oracle="""
    SELECT quantile_disc(l_extendedprice, 0.1) AS p10,
           quantile_disc(l_extendedprice, 0.5) AS p50,
           quantile_disc(l_extendedprice, 0.9) AS p90,
           quantile_disc(l_extendedprice, 0.99) AS p99
    FROM lineitem
    """,
    tags=("agg", "B7", "percentile", "scale"),
)
def agg_quantiles_distributed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT quantiles by DISTRIBUTED SELECTION (radix descent): Spark's
    own exact `percentile()` buffers every value of a group inside one
    task (agg_percentiles documents it as the small-group path), so at
    100 TB the exact answer needs this instead — per quantile, a few
    histogram aggregation passes narrow the value range by 2048x each
    (map-side partial counts, a 2048-row collect per pass — model-sized)
    until the rank-k value is pinned, then one ordered selection over
    the narrowed remnant. No task ever materializes the column. Same
    quantile_disc semantics as the oracle, exact to the last bit."""
    from ..operators.sketch import exact_quantiles_distributed

    li = load_table(spark, sf_dir, "lineitem")
    # The 4 descents share their q-independent passes (one count/min/max
    # + one full-range histogram instead of four of each — guide §1.2
    # step 1); per-quantile refinement passes are unchanged and each
    # value is bit-identical to the single-quantile descent's.
    vals = exact_quantiles_distributed(
        li,
        "l_extendedprice",
        {"p10": 0.1, "p50": 0.5, "p90": 0.9, "p99": 0.99},
    )
    return spark.createDataFrame(
        [(vals["p10"], vals["p50"], vals["p90"], vals["p99"])],
        "p10 double, p50 double, p90 double, p99 double",
    )


@query(
    "cdc_snapshot_diff",
    oracle="""
    WITH hist AS (
      SELECT user_id, event_id, value, ts AS valid_from,
        lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to
      FROM events WHERE event_type = 'purchase'),
    s1 AS (
      SELECT user_id, event_id, value FROM hist
      WHERE valid_from <= TIMESTAMP '2024-01-10 00:00:00'
        AND (valid_to IS NULL OR valid_to > TIMESTAMP '2024-01-10 00:00:00')),
    s2 AS (
      SELECT user_id, event_id, value FROM hist
      WHERE valid_from <= TIMESTAMP '2024-01-25 00:00:00'
        AND (valid_to IS NULL OR valid_to > TIMESTAMP '2024-01-25 00:00:00'))
    SELECT coalesce(s1.user_id, s2.user_id) AS user_id,
      CASE WHEN s1.user_id IS NULL THEN 'added'
           WHEN s2.user_id IS NULL THEN 'removed'
           WHEN s1.event_id <> s2.event_id OR s1.value <> s2.value THEN 'changed'
           ELSE 'unchanged' END AS change_type,
      s1.event_id AS old_event_id, s2.event_id AS new_event_id
    FROM s1 FULL JOIN s2 ON s1.user_id = s2.user_id
    """,
    tags=("cdc", "B8", "scd2", "time-travel", "diff"),
)
def cdc_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot RECONCILIATION across time travel: the per-key state as
    of Jan 10 full-outer-joined against the state as of Jan 25, each row
    labeled added / removed / changed / unchanged — the audit query that
    answers 'what happened to this dimension between the two loads' and
    catches silent CDC drops. Both snapshots come from the SAME one-
    window SCD-2 history (two interval predicates over one subtree), and
    the diff is a single user-keyed full outer join — at 100 TB this is
    one history shuffle plus one key join, never a re-read per snapshot."""
    from ..operators.cdc import scd2_history

    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    )
    hist = scd2_history(
        ev.select("user_id", "event_id", "value", "ts"),
        ["user_id"],
        "ts",
        tiebreak_col="event_id",
    ).select("user_id", "event_id", "value", "valid_from", "valid_to")

    def snap(t: str) -> DataFrame:
        ts = F.lit(t).cast("timestamp")
        return hist.where(
            (F.col("valid_from") <= ts)
            & (F.col("valid_to").isNull() | (F.col("valid_to") > ts))
        ).select("user_id", "event_id", "value")

    s1 = snap("2024-01-10 00:00:00").alias("s1")
    s2 = snap("2024-01-25 00:00:00").alias("s2")
    j = s1.join(s2, F.col("s1.user_id") == F.col("s2.user_id"), "full_outer")
    return j.select(
        F.coalesce(F.col("s1.user_id"), F.col("s2.user_id")).alias("user_id"),
        F.when(F.col("s1.user_id").isNull(), "added")
        .when(F.col("s2.user_id").isNull(), "removed")
        .when(
            (F.col("s1.event_id") != F.col("s2.event_id"))
            | (F.col("s1.value") != F.col("s2.value")),
            "changed",
        )
        .otherwise("unchanged")
        .alias("change_type"),
        F.col("s1.event_id").alias("old_event_id"),
        F.col("s2.event_id").alias("new_event_id"),
    )


@query(
    "diag_key_skew",
    oracle="""
    WITH li AS (
      SELECT l_orderkey AS k, count(*) AS n FROM lineitem GROUP BY 1),
    ev AS (
      SELECT user_id AS k, count(*) AS n FROM events GROUP BY 1),
    et AS (
      SELECT count(*) AS nk, CAST(sum(n) AS BIGINT) AS rows_total,
             max(n) AS max_rows,
             max_by(k, n * 1073741824 - k) AS heaviest_key
      FROM ev),
    lt AS (
      SELECT count(*) AS nk, CAST(sum(n) AS BIGINT) AS rows_total,
             max(n) AS max_rows,
             max_by(k, n * 1073741824 - k) AS heaviest_key
      FROM li)
    SELECT 'lineitem.l_orderkey' AS key, rows_total, nk AS n_keys, max_rows,
      heaviest_key,
      CAST(max_rows * nk AS DOUBLE) / rows_total AS skew_factor
    FROM lt
    UNION ALL
    SELECT 'events.user_id', rows_total, nk, max_rows, heaviest_key,
      CAST(max_rows * nk AS DOUBLE) / rows_total
    FROM et
    """,
    tags=("agg", "B7", "diagnostics", "skew"),
)
def diag_key_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffle-key skew diagnosis for the two natural join/agg keys:
    rows, distinct keys, the heaviest key and its row count, and the
    skew factor max/avg (= max·|keys|/rows, one IEEE division of exact
    longs). THE question to ask before any 100 TB join — a skew factor
    near 1 means hash partitioning balances; tens means the salting /
    AQE-skew-join machinery (operators/skew.py) is mandatory. Per key:
    one partial-aggregable count pass, then a |keys|-row summary with
    a deterministic max_by tie-break — diagnostics cost one aggregation,
    not a sort."""
    def profile(df: DataFrame, col: str, label: str) -> DataFrame:
        per = df.groupBy(F.col(col).alias("k")).agg(F.count(F.lit(1)).alias("n"))
        return per.agg(
            F.lit(label).alias("key"),
            F.sum("n").alias("rows_total"),
            F.count(F.lit(1)).alias("n_keys"),
            F.max("n").alias("max_rows"),
            # Composite argmax as one bigint score: max n wins, ties to
            # the smallest key (2^30 >> any key value at these scales).
            F.expr("max_by(k, n * 1073741824 - k)").alias("heaviest_key"),
        ).select(
            "key",
            "rows_total",
            "n_keys",
            "max_rows",
            "heaviest_key",
            (
                (F.col("max_rows") * F.col("n_keys")).cast("double")
                / F.col("rows_total").cast("double")
            ).alias("skew_factor"),
        )

    li = load_table(spark, sf_dir, "lineitem")
    ev = load_table(spark, sf_dir, "events")
    return profile(li, "l_orderkey", "lineitem.l_orderkey").unionAll(
        profile(ev, "user_id", "events.user_id")
    )


# ---------------------------------------------------------------------------
# agg_countmin_estimates — Count-Min sketch with value-exact estimates
# ---------------------------------------------------------------------------

_CM_W = 4096  # sketch width (buckets per hash row)
_CM_D = 3  # sketch depth (independent hash rows)
_CM_TOPK = 10  # report rows


def _register_countmin() -> None:
    from ..functions.hashing import MERSENNE_P, minhash_params

    params = minhash_params(_CM_D)

    hash_rows = ", ".join(
        f"({j}, {a}, {b})" for j, (a, b) in enumerate(params)
    )

    @query(
        "agg_countmin_estimates",
        oracle=f"""
        WITH h(j, a, b) AS (VALUES {hash_rows}),
        cm AS (
          SELECT h.j,
            ((h.a * o_custkey + h.b) % {MERSENNE_P}) % {_CM_W} AS bucket,
            count(*) AS c
          FROM orders, h GROUP BY 1, 2),
        top AS (
          SELECT o_custkey, CAST(count(*) AS BIGINT) AS exact_count
          FROM orders GROUP BY o_custkey
          ORDER BY exact_count DESC, o_custkey LIMIT {_CM_TOPK}),
        est AS (
          SELECT t.o_custkey, t.exact_count,
            CAST(min(cm.c) AS BIGINT) AS cm_estimate
          FROM top t, h
          JOIN cm ON cm.j = h.j
            AND cm.bucket = ((h.a * t.o_custkey + h.b) % {MERSENNE_P})
                            % {_CM_W}
          GROUP BY 1, 2)
        SELECT o_custkey, exact_count, cm_estimate,
          cm_estimate - exact_count AS overestimate,
          cm_estimate >= exact_count AS never_underestimates
        FROM est ORDER BY exact_count DESC, o_custkey
        """,
        tags=("agg", "B7", "approx", "sketch", "countmin"),
    )
    def agg_countmin_estimates(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Count-Min sketch (Cormode & Muthukrishnan 2005) over order
        counts per customer: a d=3 x w=4096 integer counter matrix
        (bucket_j = affine_j(key) mod w, the same deterministic
        permutation family as MinHash), point-queried for the exact
        top-10 customers with est = min_j cm[j][bucket_j(key)]. Unlike
        the HLL / Misra-Gries rows (whose sketch STATE depends on
        partition order, so they emit exact counts + guarantee
        booleans), CM counters are pure sums — order-independent and
        merge-by-addition — so the ESTIMATE ITSELF is emitted and
        hash-checked cross-engine, along with the realized overestimate
        and the one deterministic CM guarantee (never underestimates).

        Scale shape: the fit is one keyed aggregate over d*w = 12,288
        bounded buckets — each task's partial state is the whole sketch,
        KBs, regardless of input rows (THE bounded-memory frequency
        structure for 100 TB streams; shard/day sketches compose by
        element-wise +). Point queries probe a 30-row broadcast of
        (key, j, bucket) into the sketch relation by equi-join."""
        o = load_table(spark, sf_dir, "orders").select("o_custkey")

        def buckets(key_col):
            return F.array(
                *[
                    F.struct(
                        F.lit(j).alias("j"),
                        (
                            ((key_col * a + b) % MERSENNE_P) % _CM_W
                        ).alias("bucket"),
                    )
                    for j, (a, b) in enumerate(params)
                ]
            )

        cm = (
            o.select(F.explode(buckets(F.col("o_custkey"))).alias("h"))
            .groupBy("h.j", "h.bucket")
            .agg(F.count(F.lit(1)).alias("c"))
        )
        top = (
            o.groupBy("o_custkey")
            .agg(F.count(F.lit(1)).alias("exact_count"))
            .orderBy(F.desc("exact_count"), F.asc("o_custkey"))
            .limit(_CM_TOPK)
        )
        probe = top.select(
            "o_custkey",
            "exact_count",
            F.explode(buckets(F.col("o_custkey"))).alias("h"),
        ).select("o_custkey", "exact_count", "h.j", "h.bucket")
        est = (
            cm.join(F.broadcast(probe), ["j", "bucket"])
            .groupBy("o_custkey", "exact_count")
            .agg(F.min("c").alias("cm_estimate"))
        )
        return est.select(
            "o_custkey",
            "exact_count",
            "cm_estimate",
            (F.col("cm_estimate") - F.col("exact_count")).alias(
                "overestimate"
            ),
            (F.col("cm_estimate") >= F.col("exact_count")).alias(
                "never_underestimates"
            ),
        ).orderBy(F.desc("exact_count"), F.asc("o_custkey"))


_register_countmin()


# ---------------------------------------------------------------------------
# agg_kmv_set_sketch — k-minimum-values sketch: union AND intersection
# ---------------------------------------------------------------------------

_KMV_K = 64  # sketch size (64 < 150 distinct users at sf0.01 -> estimator branch exercises)
_KMV_A = "view"
_KMV_B = "click"


def _register_kmv() -> None:
    from ..functions.hashing import MERSENNE_P, SQL_MD5_MOD, md5_mod

    K, P, A, B = _KMV_K, MERSENNE_P, _KMV_A, _KMV_B

    @query(
        "agg_kmv_set_sketch",
        oracle=f"""
        WITH pairs AS (
          SELECT DISTINCT event_type,
            {SQL_MD5_MOD("CAST(user_id AS VARCHAR)")} AS h
          FROM events WHERE event_type IN ('{A}', '{B}')),
        stats AS (
          SELECT event_type, CAST(count(*) AS BIGINT) AS n
          FROM pairs GROUP BY event_type),
        sk AS (
          SELECT event_type, h FROM (
            SELECT event_type, h,
              row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn
            FROM pairs) WHERE rn <= {K}),
        u AS (
          SELECT h FROM (SELECT DISTINCT h FROM sk)
          ORDER BY h LIMIT {K}),
        ustats AS (
          SELECT CAST(count(*) AS BIGINT) AS cu,
            CAST(max(h) AS BIGINT) AS hku,
            CAST(sum(CASE WHEN h IN (SELECT h FROM sk WHERE event_type = '{A}')
                      AND h IN (SELECT h FROM sk WHERE event_type = '{B}')
                     THEN 1 ELSE 0 END) AS BIGINT) AS c_both
          FROM u),
        skstats AS (
          SELECT
            (SELECT n FROM stats WHERE event_type = '{A}') AS na,
            (SELECT n FROM stats WHERE event_type = '{B}') AS nb,
            (SELECT CAST(max(h) AS BIGINT) FROM sk
             WHERE event_type = '{A}') AS hka,
            (SELECT CAST(max(h) AS BIGINT) FROM sk
             WHERE event_type = '{B}') AS hkb),
        exact AS (
          SELECT
            CAST(count(DISTINCT CASE WHEN event_type = '{A}'
                 THEN user_id END) AS BIGINT) AS xa,
            CAST(count(DISTINCT CASE WHEN event_type = '{B}'
                 THEN user_id END) AS BIGINT) AS xb,
            CAST(count(DISTINCT user_id) AS BIGINT) AS xu
          FROM events WHERE event_type IN ('{A}', '{B}')),
        exact_i AS (
          SELECT CAST(count(*) AS BIGINT) AS xi FROM (
            SELECT user_id FROM events
            WHERE event_type IN ('{A}', '{B}')
            GROUP BY user_id
            HAVING count(DISTINCT event_type) = 2)),
        one AS (SELECT * FROM skstats, ustats, exact, exact_i)
        SELECT * FROM (
          SELECT 'distinct_{A}' AS measure, xa AS exact_count,
            CASE WHEN na < {K} THEN CAST(na AS DOUBLE)
                 ELSE CAST({K - 1} AS DOUBLE) * {P} / hka END AS kmv_estimate,
            na < {K} AS sketch_exhaustive FROM one
          UNION ALL
          SELECT 'distinct_{B}', xb,
            CASE WHEN nb < {K} THEN CAST(nb AS DOUBLE)
                 ELSE CAST({K - 1} AS DOUBLE) * {P} / hkb END,
            nb < {K} FROM one
          UNION ALL
          SELECT 'union', xu,
            CASE WHEN cu < {K} THEN CAST(cu AS DOUBLE)
                 ELSE CAST({K - 1} AS DOUBLE) * {P} / hku END,
            cu < {K} FROM one
          UNION ALL
          SELECT 'intersection', xi,
            CASE WHEN cu < {K} THEN CAST(c_both AS DOUBLE)
                 ELSE CAST(c_both * {K - 1} AS DOUBLE) * {P}
                      / ({K} * hku) END,
            cu < {K} FROM one)
        ORDER BY measure
        """,
        tags=("agg", "B7", "approx", "sketch", "kmv", "distinct"),
    )
    def agg_kmv_set_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
        """K-minimum-values (KMV / theta-style) distinct sketch over the
        'view' and 'click' audiences, with the two estimates HLL cannot
        give: the UNION estimate composes by keeping the k smallest of
        the merged sketch values, and the INTERSECTION estimate is the
        Jaccard-scaled union ((|U ∩ A ∩ B| / k) · est_union) — the
        audience-overlap primitives for 100 TB segment analytics. The k
        smallest deterministic hashes are a SET property (no dependence
        on row or partition order, unlike HLL/Misra-Gries state), so
        the sketch contents — and every estimate — are value-exact
        cross-engine: each estimate is one division of exactly-
        representable integers ((k−1)·P ≈ 6.3e10 < 2^53). Rows carry
        the exact ground truth next to the estimate plus the
        exhaustive-branch flag (k=64 < 150 distinct users at sf0.01,
        so the ESTIMATOR branch is what the driver certifies).

        Scale shape: one map-side-combinable distinct over (type, hash),
        per-type k-smallest via a rank window that Spark rewrites to
        WindowGroupLimit (per-partition top-k, no full per-type sort
        materialization), union/intersection over <= 2k-row relations,
        exact ground truth from one multi-count-distinct pass. Sketch
        states merge by set-union + re-truncation — shard/day sketches
        compose exactly like the HLL row's shards."""
        ev = (
            load_table(spark, sf_dir, "events")
            .filter(F.col("event_type").isin(A, B))
            .select("event_type", "user_id")
        )
        # pairs feeds the per-type counts AND the sketch ranking; the
        # <=2k-row sketch feeds the union and both membership sides.
        # Materialize each once so the scan + distinct shuffle run once,
        # not four times.
        pairs = ev.select(
            "event_type",
            md5_mod(F.col("user_id").cast("string")).alias("h"),
        ).distinct().localCheckpoint(eager=False)
        stats = pairs.groupBy("event_type").agg(
            F.count(F.lit(1)).alias("n")
        )
        wsk = Window.partitionBy("event_type").orderBy("h")
        sk = (
            pairs.withColumn("rn", F.row_number().over(wsk))
            .filter(F.col("rn") <= K)
            .select("event_type", "h")
            .localCheckpoint(eager=False)
        )
        u = sk.select("h").distinct().orderBy("h").limit(K)
        ska = sk.filter(F.col("event_type") == A).select(
            "h", F.lit(1).alias("_ina")
        )
        skb = sk.filter(F.col("event_type") == B).select(
            "h", F.lit(1).alias("_inb")
        )
        ustats = (
            u.join(F.broadcast(ska), "h", "left")
            .join(F.broadcast(skb), "h", "left")
            .agg(
                F.count(F.lit(1)).alias("cu"),
                F.max("h").alias("hku"),
                F.sum(
                    F.when(
                        F.col("_ina").isNotNull()
                        & F.col("_inb").isNotNull(),
                        1,
                    ).otherwise(0)
                ).alias("c_both"),
            )
        )
        skstats = (
            sk.groupBy("event_type")
            .agg(F.max("h").alias("hk"))
            .join(stats, "event_type")
            .groupBy()
            .agg(
                F.max(F.when(F.col("event_type") == A, F.col("n"))).alias("na"),
                F.max(F.when(F.col("event_type") == B, F.col("n"))).alias("nb"),
                F.max(F.when(F.col("event_type") == A, F.col("hk"))).alias("hka"),
                F.max(F.when(F.col("event_type") == B, F.col("hk"))).alias("hkb"),
            )
        )
        exact = ev.agg(
            F.countDistinct(
                F.when(F.col("event_type") == A, F.col("user_id"))
            ).alias("xa"),
            F.countDistinct(
                F.when(F.col("event_type") == B, F.col("user_id"))
            ).alias("xb"),
            F.countDistinct("user_id").alias("xu"),
        )
        exact_i = (
            ev.groupBy("user_id")
            .agg(F.countDistinct("event_type").alias("_nt"))
            .filter(F.col("_nt") == 2)
            .agg(F.count(F.lit(1)).alias("xi"))
        )
        one = (
            skstats.crossJoin(F.broadcast(ustats))
            .crossJoin(F.broadcast(exact))
            .crossJoin(F.broadcast(exact_i))
        )

        def est(n, hk):
            return F.when(
                F.col(n) < K, F.col(n).cast("double")
            ).otherwise(F.lit(float(K - 1)) * P / F.col(hk))

        rows = one.select(
            F.array(
                F.struct(
                    F.lit(f"distinct_{A}").alias("measure"),
                    F.col("xa").alias("exact_count"),
                    est("na", "hka").alias("kmv_estimate"),
                    (F.col("na") < K).alias("sketch_exhaustive"),
                ),
                F.struct(
                    F.lit(f"distinct_{B}").alias("measure"),
                    F.col("xb").alias("exact_count"),
                    est("nb", "hkb").alias("kmv_estimate"),
                    (F.col("nb") < K).alias("sketch_exhaustive"),
                ),
                F.struct(
                    F.lit("union").alias("measure"),
                    F.col("xu").alias("exact_count"),
                    est("cu", "hku").alias("kmv_estimate"),
                    (F.col("cu") < K).alias("sketch_exhaustive"),
                ),
                F.struct(
                    F.lit("intersection").alias("measure"),
                    F.col("xi").alias("exact_count"),
                    F.when(
                        F.col("cu") < K, F.col("c_both").cast("double")
                    )
                    .otherwise(
                        (F.col("c_both") * (K - 1)).cast("double")
                        * P
                        / (K * F.col("hku"))
                    )
                    .alias("kmv_estimate"),
                    (F.col("cu") < K).alias("sketch_exhaustive"),
                ),
            ).alias("_r")
        )
        return (
            rows.select(F.explode("_r").alias("r"))
            .select("r.*")
            .orderBy("measure")
        )


_register_kmv()


# ---------------------------------------------------------------------------
# agg_listagg_bitwise — ordered string aggregation + boolean/bitwise
# aggregates (the Spark 4 aggregate surface the battery had not exposed)
# ---------------------------------------------------------------------------


@query(
    "agg_listagg_bitwise",
    oracle="""
    SELECT o_orderkey % 16 AS bucket,
      CAST(count(*) AS BIGINT) AS n,
      string_agg(substr(o_orderpriority, 1, 1), '' ORDER BY o_orderkey)
        AS pri_seq,
      string_agg(DISTINCT substr(o_orderpriority, 1, 1), ','
                 ORDER BY substr(o_orderpriority, 1, 1)) AS pri_domain,
      bool_and(o_totalprice > 0) AS all_positive,
      bool_or(o_orderpriority = '1-URGENT') AS any_urgent,
      bit_and(o_orderkey) AS key_bit_and,
      bit_or(o_orderkey) AS key_bit_or,
      bit_xor(o_orderkey) AS key_bit_xor
    FROM orders WHERE o_orderkey < 4000
    GROUP BY 1
    """,
    tags=("agg", "B7", "listagg", "bitwise"),
)
def agg_listagg_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation (``listagg``, SQL:2016, landed in
    Spark 4.0) plus the boolean and bitwise aggregate families — the
    remaining built-in aggregates the battery had not exposed. Per
    16-way key bucket over a bounded orders slice: the priority
    first-letter sequence in strict key order (LISTAGG WITHIN GROUP —
    deterministic because the order key is unique; an unordered listagg
    is nondeterministic by definition and banned from the declared
    surface), the DISTINCT ordered domain, ``bool_and``/``bool_or``
    predicates, and ``bit_and``/``bit_or``/``bit_xor`` over the keys
    (the idiom behind permission-mask rollups and XOR checksums).
    DuckDB replays via ``string_agg`` — listagg IS string_agg under
    SQL:2016 naming.

    Scale shape: one scan, one group-sized shuffle; everything is a
    mergeable partial aggregate EXCEPT listagg, whose state is the
    concatenated string — bounded here by the key slice (≤250 chars per
    group). At 100 TB listagg over unbounded groups is a deliberate
    anti-pattern (state = group size); the query documents the bounded
    contract."""
    load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderkey") < 4000
    ).createOrReplaceTempView("agg_la_orders")
    return spark.sql("""
      SELECT o_orderkey % 16 AS bucket,
        CAST(count(*) AS BIGINT) AS n,
        listagg(substr(o_orderpriority, 1, 1), '')
          WITHIN GROUP (ORDER BY o_orderkey) AS pri_seq,
        listagg(DISTINCT substr(o_orderpriority, 1, 1), ',')
          WITHIN GROUP (ORDER BY substr(o_orderpriority, 1, 1))
          AS pri_domain,
        bool_and(o_totalprice > 0) AS all_positive,
        bool_or(o_orderpriority = '1-URGENT') AS any_urgent,
        bit_and(o_orderkey) AS key_bit_and,
        bit_or(o_orderkey) AS key_bit_or,
        bit_xor(o_orderkey) AS key_bit_xor
      FROM agg_la_orders
      GROUP BY 1
    """)


# ---------------------------------------------------------------------------
# agg_approx_topk — Spark 4.1's native approximate top-k sketch
# ---------------------------------------------------------------------------


@query(
    "agg_approx_topk",
    oracle="""
    SELECT event_type AS item,
      CAST(count(*) AS BIGINT) AS est_count,
      CAST(count(*) AS BIGINT) AS exact_count,
      TRUE AS est_is_exact
    FROM events GROUP BY 1
    """,
    tags=("agg", "B7", "sketch", "approx-top-k"),
)
def agg_approx_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``approx_top_k`` — Spark 4.1's native frequent-items sketch
    (Datasketches frequent-items / Misra-Gries lineage), the
    engine-provided counterpart to the hand-rolled SpaceSaving shard
    merge in ``agg_heavy_hitters``: one aggregate returns the k most
    frequent values WITH estimated counts as an array of structs,
    exploded here back to scalar rows and joined against the exact
    counts. k = the full event-type domain and the default sketch
    capacity (10 000) vastly exceeds the domain, so every estimate must
    be EXACT — the regime the oracle can pin value-for-value. The
    interesting 100 TB property documented here: the sketch state is
    O(capacity) regardless of input rows and merges associatively
    across partitions, so the shuffle moves KBs, never the key stream
    (same argument as the HLL/KMV/CM family).

    Scale shape: one scan, one O(capacity) partial aggregate per
    partition, a 1-row merge, a domain-sized explode + broadcast join
    against the exact groupBy (itself map-side combinable over 5
    keys)."""
    ev = load_table(spark, sf_dir, "events")
    ev.createOrReplaceTempView("topk_events")
    sketched = spark.sql(
        "SELECT explode(approx_top_k(event_type, 5)) AS kv FROM topk_events"
    ).select(
        F.col("kv.item").alias("item"),
        F.col("kv.count").cast("long").alias("est_count"),
    )
    exact = ev.groupBy(F.col("event_type").alias("item")).agg(
        F.count(F.lit(1)).cast("long").alias("exact_count")
    )
    return sketched.join(F.broadcast(exact), "item").select(
        "item",
        "est_count",
        "exact_count",
        (F.col("est_count") == F.col("exact_count")).alias("est_is_exact"),
    )


# ---------------------------------------------------------------------------
# events_hll_sliding_window — preaggregated-sketch rollup over a time window
# ---------------------------------------------------------------------------

_HLLW = 24  # trailing window, hours


@query(
    "events_hll_sliding_window",
    # Sketch estimates are engine-internal; the row carries the exact
    # trailing distinct plus the 3-sigma bounds predicate (the
    # agg_hll_sketch_merge convention).
    oracle=f"""
    WITH pairs AS (
      SELECT DISTINCT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS h,
        user_id
      FROM events),
    hours AS (
      SELECT h, count(*) OVER (ORDER BY h RANGE BETWEEN INTERVAL 23 HOURS
                               PRECEDING AND CURRENT ROW) AS wh
      FROM (SELECT DISTINCT h FROM pairs)),
    contrib AS (
      SELECT p.h + to_hours(o.off) AS win_h, p.user_id
      FROM pairs p, (SELECT unnest(generate_series(0, {_HLLW - 1})) AS off) o),
    exact AS (
      SELECT c.win_h AS h, CAST(count(DISTINCT c.user_id) AS BIGINT)
        AS exact_trailing
      FROM contrib c JOIN hours hh ON c.win_h = hh.h
      GROUP BY 1)
    SELECT hh.h AS hour_ts,
      CAST(hh.wh AS BIGINT) AS window_hours,
      e.exact_trailing,
      TRUE AS est_within_3sigma
    FROM hours hh JOIN exact e ON hh.h = e.h
    """,
    tags=("events", "B7", "sketch", "sliding-window"),
)
def events_hll_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window distinct users via PREAGGREGATED HLL sketches — the
    100 TB rolling-cardinality idiom this registry's exact variant
    (``events_rolling_distinct_users``) cannot scale to: raw events
    collapse once into hourly sketches (KB each), and every trailing
    24-hour estimate is a WINDOW ``hll_union_agg`` over 24 sketch rows —
    no re-touching of raw data, no distinct-expansion shuffle at query
    time, and the same sketches serve any window length. The emitted row
    carries the exact trailing count (computed independently by a
    bounded ×24 contribution expansion — equi-grouped, never a range
    join) and a 3σ bounds predicate on the sketch estimate
    (lgConfigK=12 → rse ≈ 1.6%, 3σ ≈ 4.9%); at fixture cardinalities
    the datasketches HLL is still in exact (coupon) mode, so the
    predicate is tight, not vacuous. Window semantics are
    CALENDAR-trailing (RANGE BETWEEN INTERVAL 23 HOURS PRECEDING) on
    both legs, so sparse hours cannot skew the window — the rows-based
    formulation would silently widen over gaps.

    Scale shape: one scan → hourly (hour, user) dedup → hour-sized
    sketch table; the window pass moves 720 sketch rows. The exact leg
    costs ×24 row expansion and exists only to ground-truth the sketch
    path."""
    ev = load_table(spark, sf_dir, "events")
    pairs = ev.select(
        F.date_trunc("hour", "ts").alias("h"), "user_id"
    ).distinct()
    sk = pairs.groupBy("h").agg(F.expr("hll_sketch_agg(user_id)").alias("s"))
    # hour-grain sketch table is calendar-bounded (720 rows) — total-order
    # windows go through bounded_window / its SQL equivalent.
    est = sk.select(
        "h",
        F.expr(
            "count(*) OVER (PARTITION BY pmod(hash(h), 1) ORDER BY h "
            "RANGE BETWEEN INTERVAL 23 HOURS PRECEDING AND CURRENT ROW)"
        ).alias("wh"),
        F.expr(
            "hll_sketch_estimate(hll_union_agg(s) OVER "
            "(PARTITION BY pmod(hash(h), 1) ORDER BY h "
            "RANGE BETWEEN INTERVAL 23 HOURS PRECEDING AND CURRENT ROW))"
        ).alias("est"),
    )
    contrib = pairs.select(
        F.expr(
            f"explode(sequence(0, {_HLLW - 1}))"
        ).alias("off"),
        "h",
        "user_id",
    ).select(
        (F.col("h") + F.expr("make_interval(0,0,0,0,off,0,0)")).alias(
            "win_h"
        ),
        "user_id",
    )
    exact = (
        contrib.join(
            sk.select(F.col("h").alias("win_h")), "win_h"
        )
        .groupBy("win_h")
        .agg(F.countDistinct("user_id").cast("long").alias("exact_trailing"))
    )
    return (
        est.join(exact, est.h == exact.win_h)
        .select(
            F.col("h").alias("hour_ts"),
            F.col("wh").cast("long").alias("window_hours"),
            "exact_trailing",
            (
                F.abs(F.col("est") - F.col("exact_trailing"))
                <= 0.049 * F.col("exact_trailing")
            ).alias("est_within_3sigma"),
        )
    )


# ---------------------------------------------------------------------------
# agg_hll_sketch_persist — sketches as a STORED table (continuous aggregate)
# ---------------------------------------------------------------------------


@query(
    "agg_hll_sketch_persist",
    # Sketch bytes are engine-internal; the row carries the exact daily
    # distinct plus the 3-sigma bounds predicate (house convention).
    oracle="""
    SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
      CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users,
      TRUE AS est_within_3sigma
    FROM events GROUP BY 1
    """,
    tags=("agg", "B7", "sketch", "persistence"),
)
def agg_hll_sketch_persist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL sketches as a PERSISTED table — the continuous-aggregate
    pattern that makes sketch rollups operational at 100 TB: hourly
    sketches land in parquet as a binary column (KBs per hour instead
    of the raw key stream), a LATER session reads the sketch table
    back and answers the daily-distinct question by ``hll_union_agg``
    over 24 stored rows — the raw events are never re-scanned, and the
    same stored sketches serve daily, weekly, or all-time unions. This
    completes the sketch story: mergeability in-query
    (``agg_hll_sketch_merge``), over windows
    (``events_hll_sliding_window``), under streaming
    (``streaming_hll_distinct_window``), and now across the
    WRITE/READ boundary — pinning that Spark's datasketches binary
    representation survives a parquet round trip bit-intact (estimates
    after the round trip equal the in-memory path; the 3σ bounds
    predicate against the exact count is the certified output).

    Scale shape: one raw scan EVER (at sketch-build time); every query
    thereafter touches only the hour-grain sketch table. The daily
    union shuffles |hours| KB-sized rows."""
    import shutil
    import tempfile

    ev = load_table(spark, sf_dir, "events")
    pairs = ev.select(
        F.date_trunc("hour", "ts").alias("h"), "user_id"
    )
    root = tempfile.mkdtemp(prefix="hll_store_")
    try:
        pairs.groupBy("h").agg(
            F.expr("hll_sketch_agg(user_id)").alias("sk")
        ).write.parquet(f"{root}/hourly_sketches")
        stored = spark.read.parquet(f"{root}/hourly_sketches")
        daily_est = (
            stored.groupBy(F.date_trunc("day", "h").alias("day"))
            .agg(
                F.expr(
                    "hll_sketch_estimate(hll_union_agg(sk))"
                ).alias("est")
            )
        )
        exact = ev.groupBy(F.date_trunc("day", "ts").alias("day")).agg(
            F.countDistinct("user_id").cast("long").alias("exact_users")
        )
        out = daily_est.join(exact, "day").select(
            "day",
            "exact_users",
            (
                F.abs(F.col("est") - F.col("exact_users"))
                <= 0.049 * F.col("exact_users")
            ).alias("est_within_3sigma"),
        )
        return materialize_result(spark, out)
    finally:
        shutil.rmtree(root, ignore_errors=True)
