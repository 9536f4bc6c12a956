"""Warehouse analytics: OHLC downsampling, exact finite-memory EWMA,
A/B-test significance, incremental view maintenance, and the temporal
(SCD-2) dimension join — round-8 additions extending SURVEY.md §2.B
B6/B7/B8/B9 with the query shapes a production warehouse runs daily on
top of the CDC streams the reference produces.

Every float output is either a raw passthrough (min/max/first of stored
values) or a single IEEE division of exact integer/decimal aggregates,
so the driver's bit-exact hash comparison holds (functions/exact.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.bounded import bounded_window
from ..functions.exact import dec2
from ..functions.hashing import SQL_MD5_MOD, md5_mod
from .registry import query


@query(
    "events_ohlc_hourly",
    oracle="""
    WITH ordered AS (
      SELECT event_type, date_trunc('hour', ts) AS bar_ts, value,
        row_number() OVER (PARTITION BY event_type, date_trunc('hour', ts)
                           ORDER BY ts, event_id) AS rn_open,
        row_number() OVER (PARTITION BY event_type, date_trunc('hour', ts)
                           ORDER BY ts DESC, event_id DESC) AS rn_close
      FROM events
    )
    SELECT event_type, bar_ts,
      max(CASE WHEN rn_open = 1 THEN value END) AS open,
      max(value) AS high, min(value) AS low,
      max(CASE WHEN rn_close = 1 THEN value END) AS close,
      count(*) AS n_ticks
    FROM ordered GROUP BY event_type, bar_ts
    """,
    tags=("timeseries", "B7", "B9", "ohlc"),
)
def events_ohlc_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OHLC candlestick downsampling: open/high/low/close of ``value``
    per (event_type, hour). The financial-tick rollup every time-series
    store ships (TimescaleDB ``candlestick_agg``, kdb+ ``xbar``).

    One hash aggregation: ``min_by``/``max_by`` on the (ts, event_id)
    struct pick the first/last tick deterministically (event_id breaks
    equal-timestamp ties), high/low are plain min/max — all partial-agg
    friendly, so the map side combines before the one shuffle. Every
    output is a stored value passed through untouched: bit-exact by
    construction, no float summation anywhere."""
    ev = load_table(spark, sf_dir, "events")
    ordkey = F.struct(F.col("ts"), F.col("event_id"))
    return (
        ev.withColumn("bar_ts", F.date_trunc("hour", F.col("ts")))
        .groupBy("event_type", "bar_ts")
        .agg(
            F.min_by("value", ordkey).alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max_by("value", ordkey).alias("close"),
            F.count(F.lit(1)).alias("n_ticks"),
        )
    )


# Truncated-EWMA weights: alpha = 1/2 over the last 8 observations.
# Weight of lag i is 2^-(i+1); scaling by 2^8 makes every weight the
# integer 2^(7-i), so the numerator is an exact DECIMAL sum of
# cents-exact values times integer weights, the denominator an integer,
# and the smoothed value ONE IEEE division — bit-identical cross-engine.
_EWMA_LAGS = 8


@query(
    "events_ewma",
    oracle=f"""
    WITH lagged AS (
      SELECT event_id, user_id, ts,
        {", ".join(
            f"lag(CAST(value AS DECIMAL(18,2)), {i}) OVER "
            f"(PARTITION BY user_id ORDER BY ts, event_id) AS l{i}"
            for i in range(_EWMA_LAGS)
        )}
      FROM events
    )
    SELECT event_id, user_id, ts,
      CAST({" + ".join(f"coalesce(l{i} * {2 ** (_EWMA_LAGS - 1 - i)}, 0)" for i in range(_EWMA_LAGS))} AS DOUBLE)
      / ({" + ".join(f"CASE WHEN l{i} IS NOT NULL THEN {2 ** (_EWMA_LAGS - 1 - i)} ELSE 0 END" for i in range(_EWMA_LAGS))})
      AS ewma
    FROM lagged
    """,
    tags=("timeseries", "B9", "window"),
)
def events_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-weighted moving average (alpha=1/2) of ``value`` per
    user, truncated to the last 8 observations so it is EXACT: the
    infinite-memory recurrence s_t = a*x_t + (1-a)*s_{t-1} is inherently
    sequential and float-accumulating, but with dyadic alpha and a finite
    window the 2^8-scaled weights are integers, making the numerator an
    exact decimal dot product and the result a single IEEE division.

    One window pass (one shuffle on user_id); the 8 ``lag`` columns
    evaluate over the same sorted run map-side. The truncation error vs
    the infinite EWMA is bounded by (1-a)^8 < 0.4% of the weight mass —
    the standard production trade for deterministic, order-independent
    results (the untruncated form changes with partition merge order)."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    lags = [F.lag(dec2("value"), i).over(w).alias(f"l{i}") for i in range(_EWMA_LAGS)]
    lagged = ev.select("event_id", "user_id", "ts", *lags)
    num = None
    den = None
    for i in range(_EWMA_LAGS):
        wt = 2 ** (_EWMA_LAGS - 1 - i)
        term = F.coalesce(F.col(f"l{i}") * wt, F.lit(0).cast("decimal(18,2)"))
        dterm = F.when(F.col(f"l{i}").isNotNull(), F.lit(wt)).otherwise(F.lit(0))
        num = term if num is None else num + term
        den = dterm if den is None else den + dterm
    return lagged.select(
        "event_id", "user_id", "ts", (num.cast("double") / den).alias("ewma")
    )


@query(
    "events_ab_test",
    oracle=f"""
    WITH users AS (
      SELECT user_id, ({SQL_MD5_MOD("CAST(user_id AS VARCHAR)")}) % 2 AS arm,
        max(CASE WHEN event_type = 'purchase' AND value >= 100 THEN 1 ELSE 0 END)
          AS converted
      FROM events GROUP BY user_id
    ), counts AS (
      SELECT
        CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
        CAST(sum(CASE WHEN arm = 0 THEN converted ELSE 0 END) AS BIGINT) AS conv_a,
        CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
        CAST(sum(CASE WHEN arm = 1 THEN converted ELSE 0 END) AS BIGINT) AS conv_b
      FROM users
    )
    SELECT n_a, conv_a, n_b, conv_b,
      625 * CAST(n_a + n_b AS DECIMAL(38,0))
          * CAST(conv_a * n_b - conv_b * n_a AS DECIMAL(38,0))
          * CAST(conv_a * n_b - conv_b * n_a AS DECIMAL(38,0))
      > 2401 * CAST(n_a AS DECIMAL(38,0)) * CAST(n_b AS DECIMAL(38,0))
             * CAST(conv_a + conv_b AS DECIMAL(38,0))
             * CAST(n_a + n_b - conv_a - conv_b AS DECIMAL(38,0))
      AS significant
    FROM counts
    """,
    tags=("experiment", "B7", "abtest"),
)
def events_ab_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-proportion A/B significance test, EXACT: users deterministically
    assigned to arms by md5(user_id) % 2 (same assignment on every engine
    and rerun — no RNG state), conversion = any purchase event. The
    pooled two-proportion z-test at p<0.05 is decided WITHOUT floats by
    cross-multiplying z^2 > 1.96^2 into the integer inequality

        625*N*(cA*nB - cB*nA)^2  >  2401*nA*nB*C*(N-C)

    (1.96^2 = 2401/625; strict > so the zero-variance degenerate case —
    everyone or no one converting — reads not-significant), evaluated in
    DECIMAL(38,0). The lhs grows like 625·N·(cA·nB − cB·nA)² ≈ 39·N⁵ in
    the worst (maximally-unbalanced) case, so exactness is guaranteed for
    cohorts up to ~1e7 users (worst case; ~3e7 for balanced arms) — beyond
    that Spark yields NULL rather than a wrong answer, and the inequality
    would need common-factor reduction before scaling further. Two aggregations
    over user-sized data: per-user conversion rollup (one shuffle on
    user_id), then a single global row — both partial-agg friendly; the
    fact table streams once."""
    ev = load_table(spark, sf_dir, "events")
    users = ev.groupBy("user_id").agg(
        F.max(
            F.when(
                (F.col("event_type") == "purchase") & (F.col("value") >= 100), 1
            ).otherwise(0)
        ).alias("converted")
    ).withColumn("arm", md5_mod(F.col("user_id").cast("string")) % 2)
    counts = users.agg(
        F.sum(F.when(F.col("arm") == 0, 1).otherwise(0)).alias("n_a"),
        F.sum(F.when(F.col("arm") == 0, F.col("converted")).otherwise(0)).alias("conv_a"),
        F.sum(F.when(F.col("arm") == 1, 1).otherwise(0)).alias("n_b"),
        F.sum(F.when(F.col("arm") == 1, F.col("converted")).otherwise(0)).alias("conv_b"),
    )
    d38 = "decimal(38,0)"
    n = (F.col("n_a") + F.col("n_b")).cast(d38)
    diff = (F.col("conv_a") * F.col("n_b") - F.col("conv_b") * F.col("n_a")).cast(d38)
    conv = (F.col("conv_a") + F.col("conv_b")).cast(d38)
    nonconv = (F.col("n_a") + F.col("n_b") - F.col("conv_a") - F.col("conv_b")).cast(d38)
    lhs = F.lit(625).cast(d38) * n * diff * diff
    rhs = (
        F.lit(2401).cast(d38)
        * F.col("n_a").cast(d38)
        * F.col("n_b").cast(d38)
        * conv
        * nonconv
    )
    return counts.select(
        "n_a", "conv_a", "n_b", "conv_b", (lhs > rhs).alias("significant")
    )


@query(
    "ivm_orders_summary",
    # The oracle is the full recompute: merging partial states must be
    # indistinguishable from rescanning the base.
    oracle="""
    SELECT o_custkey, count(*) AS n_orders,
      CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS total_spent
    FROM orders GROUP BY o_custkey
    """,
    tags=("ivm", "B7", "scale"),
)
def ivm_orders_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental view maintenance of a per-customer order summary:
    the materialized base state (orders before the cutoff, pre-aggregated
    to per-key count + exact decimal sum) is REFRESHED by aggregating only
    the delta batch and merging partial states per key — count+count,
    sum+sum — never rescanning the base fact table.

    This is the 100 TB maintenance pattern for every additive aggregate
    in this registry: because the sums are exact decimals, the merge is
    associative and the refreshed view is bit-identical to a full
    recompute (which is exactly what the oracle demands). Cost per
    refresh: one scan of the delta + a key-sized outer join — independent
    of base-table size."""
    o = load_table(spark, sf_dir, "orders")
    cutoff = F.lit("1997-01-01 00:00:00").cast("timestamp")

    def partial(df: DataFrame) -> DataFrame:
        return df.groupBy("o_custkey").agg(
            F.count(F.lit(1)).alias("cnt"), F.sum(dec2("o_totalprice")).alias("tot")
        )

    base = partial(o.filter(F.col("o_orderdate") < cutoff))
    delta = partial(o.filter(F.col("o_orderdate") >= cutoff))
    zero = F.lit(0).cast("decimal(28,2)")
    merged = base.alias("b").join(delta.alias("d"), "o_custkey", "full_outer").select(
        "o_custkey",
        (F.coalesce(F.col("b.cnt"), F.lit(0)) + F.coalesce(F.col("d.cnt"), F.lit(0))).alias("n_orders"),
        (F.coalesce(F.col("b.tot"), zero) + F.coalesce(F.col("d.tot"), zero)).alias("tot"),
    )
    return merged.select(
        "o_custkey",
        "n_orders",
        F.round(F.col("tot"), 2).cast("double").alias("total_spent"),
    )


@query(
    "join_fact_scd2_temporal",
    oracle="""
    WITH history AS (
      SELECT user_id, event_id AS version_id, value AS version_value,
        ts AS valid_from,
        lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to
      FROM events WHERE event_type = 'purchase'
    )
    SELECT e.event_id, e.user_id, e.event_type, e.ts,
      h.version_id, h.version_value
    FROM events e
    LEFT JOIN history h ON e.user_id = h.user_id
      AND e.ts >= h.valid_from
      AND (h.valid_to IS NULL OR e.ts < h.valid_to)
    WHERE e.event_type IN ('view', 'click')
    """,
    tags=("cdc", "scd2", "B6", "B8", "temporal-join"),
)
def join_fact_scd2_temporal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal dimension join — the warehouse staple the SCD-2 history
    exists FOR: each fact row (view/click event) joins to the dimension
    VERSION valid at the fact's timestamp (the user's purchase state as
    of that instant), not the current one.

    A naive formulation is the interval theta-join the oracle runs. The
    engine path rides :func:`operators.asof.asof_join` instead: because
    SCD-2 intervals abut ([valid_from, valid_to) with valid_to = next
    valid_from), "version containing ts" equals "latest version start at
    or before ts" — a backward as-of join, ONE shuffle of facts+versions
    on the key, no range explosion at any history depth. Empty versions
    (two changes at the same instant; superseded at birth) are dropped
    first, which also makes (user, valid_from) unique so the match is
    deterministic. LEFT keeps pre-first-purchase facts with null
    version — same rows the interval predicate produces."""
    from ..operators.asof import asof_join
    from ..operators.cdc import scd2_history

    ev = load_table(spark, sf_dir, "events")
    history = scd2_history(
        ev.filter(F.col("event_type") == "purchase").select(
            "user_id", "event_id", "value", "ts"
        ),
        ["user_id"],
        "ts",
        tiebreak_col="event_id",
    ).filter(F.col("valid_to").isNull() | (F.col("valid_to") > F.col("valid_from")))
    versions = history.select(
        "user_id",
        F.col("event_id").alias("version_id"),
        F.col("value").alias("version_value"),
        F.col("valid_from"),
    )
    facts = ev.filter(F.col("event_type").isin("view", "click")).select(
        "event_id", "user_id", "event_type", "ts"
    )
    joined = asof_join(
        facts,
        versions,
        on=["user_id"],
        left_ts="ts",
        right_ts="valid_from",
        right_payload=["version_id", "version_value"],
        how="left",
    )
    return joined.select(
        "event_id", "user_id", "event_type", "ts", "version_id", "version_value"
    )


_SNM_WINDOW = 7  # neighbors compared per row in the sorted order
_SNM_MAXDIST = 2


@query(
    "er_name_neardup",
    oracle=f"""
    WITH r AS (
      SELECT c_nationkey, c_name, c_custkey,
        row_number() OVER (PARTITION BY c_nationkey ORDER BY c_name, c_custkey) AS rn
      FROM customer
    )
    SELECT a.c_nationkey AS nationkey,
      a.c_custkey AS key_a, b.c_custkey AS key_b,
      a.c_name AS name_a, b.c_name AS name_b,
      levenshtein(a.c_name, b.c_name) AS dist
    FROM r a JOIN r b
      ON a.c_nationkey = b.c_nationkey
      AND b.rn > a.rn AND b.rn <= a.rn + {_SNM_WINDOW}
    WHERE levenshtein(a.c_name, b.c_name) <= {_SNM_MAXDIST}
    """,
    tags=("er", "dedup", "B6", "B8", "fuzzy"),
)
def er_name_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity resolution by BLOCKED SORTED-NEIGHBORHOOD matching
    (Hernandez–Stolfo): within each block (nation), records sort by name
    and each row is compared against only its next 7 neighbors in the
    sorted order; survivors are pairs with levenshtein distance <= 2 —
    likely duplicate customer records filed under slightly different
    names.

    This is the ER formulation that scales: candidate generation is ONE
    window pass (7 lead() columns over the per-block sort — a single
    shuffle on the block key, map-side comparisons), cost O(n*w) instead
    of the O(n^2) all-pairs edit-distance join; no skewed bucket can
    form because the window width is constant by construction. The
    verify step (levenshtein) is a codegen'd built-in in both engines.
    The oracle states the same contract declaratively via a rn-banded
    self-join."""
    c = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy("c_name", "c_custkey")
    # Window exprs first (generators can't contain them), explode second.
    leads = c.select(
        F.col("c_nationkey").alias("nationkey"),
        F.col("c_custkey").alias("key_a"),
        F.col("c_name").alias("name_a"),
        *[
            F.struct(
                F.lead("c_name", i).over(w).alias("name_b"),
                F.lead("c_custkey", i).over(w).alias("key_b"),
            ).alias(f"nbr{i}")
            for i in range(1, _SNM_WINDOW + 1)
        ],
    )
    pairs = (
        leads.select(
            "nationkey",
            "key_a",
            "name_a",
            F.explode(
                F.array(*[f"nbr{i}" for i in range(1, _SNM_WINDOW + 1)])
            ).alias("nbr"),
        )
        .filter(F.col("nbr.key_b").isNotNull())
        .select(
            "nationkey",
            "key_a",
            F.col("nbr.key_b").alias("key_b"),
            "name_a",
            F.col("nbr.name_b").alias("name_b"),
        )
    )
    return pairs.withColumn(
        "dist", F.levenshtein("name_a", "name_b")
    ).filter(F.col("dist") <= _SNM_MAXDIST)


@query(
    "events_trend_mannkendall",
    oracle="""
    WITH daily AS (
      SELECT event_type, date_trunc('day', ts) AS d, count(*) AS c
      FROM events GROUP BY 1, 2
    ), s AS (
      SELECT a.event_type,
        CAST(sum(CASE WHEN b.c > a.c THEN 1 WHEN b.c < a.c THEN -1 ELSE 0 END)
             AS BIGINT) AS s_stat,
        CAST(count(*) AS BIGINT) AS n_pairs
      FROM daily a JOIN daily b
        ON a.event_type = b.event_type AND b.d > a.d
      GROUP BY a.event_type
    ), n AS (
      SELECT event_type, CAST(count(*) AS BIGINT) AS n_days FROM daily GROUP BY 1
    )
    SELECT n.event_type, n.n_days, s.s_stat,
      CASE WHEN s.s_stat > 0 THEN 1 WHEN s.s_stat < 0 THEN -1 ELSE 0 END AS trend,
      11250 * s.s_stat * s.s_stat
        > 2401 * n.n_days * (n.n_days - 1) * (2 * n.n_days + 5) AS significant
    FROM n JOIN s ON n.event_type = s.event_type
    """,
    tags=("timeseries", "B7", "B9", "trend", "stats"),
)
def events_trend_mannkendall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann–Kendall trend test per event type over the daily count series
    — the standard nonparametric 'is this metric drifting' monitor
    (rank-based, so spikes don't dominate the way they do in a least-
    squares slope). S = sum of sign(c_j - c_i) over ordered day pairs;
    significance at p<0.05 uses Var(S) = n(n-1)(2n+5)/18 and is decided
    by cross-multiplying |S|/sqrt(Var) > 1.96 into the exact integer
    inequality 11250*S^2 > 2401*n(n-1)(2n+5) — no sqrt, no floats, so
    the verdict is bit-stable cross-engine.

    Scale shape: the pair enumeration runs over the AGGREGATED
    (type, day) relation — calendar-bounded (the orders_open_backlog
    argument), never event-count-bounded — via an equi-join on the type
    key; the raw table contributes one partial-aggregable group-by."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", F.col("ts")).alias("d")
    ).agg(F.count(F.lit(1)).alias("c"))
    a, b = daily.alias("a"), daily.alias("b")
    s = (
        a.join(b, (F.col("a.event_type") == F.col("b.event_type")) & (F.col("b.d") > F.col("a.d")))
        .groupBy(F.col("a.event_type").alias("event_type"))
        .agg(
            F.sum(
                F.when(F.col("b.c") > F.col("a.c"), 1)
                .when(F.col("b.c") < F.col("a.c"), -1)
                .otherwise(0)
            ).alias("s_stat")
        )
    )
    n = daily.groupBy("event_type").agg(F.count(F.lit(1)).alias("n_days"))
    out = n.join(s, "event_type")
    sig = (
        F.lit(11250) * F.col("s_stat") * F.col("s_stat")
        > F.lit(2401) * F.col("n_days") * (F.col("n_days") - 1) * (2 * F.col("n_days") + 5)
    )
    return out.select(
        "event_type",
        "n_days",
        "s_stat",
        F.signum("s_stat").cast("int").alias("trend"),
        sig.alias("significant"),
    )


@query(
    "orders_pareto_customers",
    oracle="""
    WITH rev AS (
      SELECT o_custkey, sum(CAST(o_totalprice AS DECIMAL(18,2))) AS r
      FROM orders GROUP BY o_custkey
    ), ranked AS (
      SELECT o_custkey, r,
        row_number() OVER (ORDER BY r DESC, o_custkey ASC) AS rnk,
        sum(r) OVER (ORDER BY r DESC, o_custkey ASC
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      FROM rev
    ), tot AS (SELECT sum(r) AS total FROM rev)
    SELECT rnk, o_custkey, CAST(r AS DOUBLE) AS revenue,
      (cum - r) * 100 < total * 80 AS in_top80
    FROM ranked, tot
    """,
    tags=("warehouse", "B7", "B9", "pareto"),
)
def orders_pareto_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto revenue-concentration analysis: customers ranked by exact-
    decimal lifetime revenue with an in_top80 flag — a customer is in the
    80% head while the mass STRICTLY BEFORE it is under 80% of total (so
    the flag flips exactly once and the head always includes rank 1).
    The comparison cross-multiplies (cum - r)/total < 0.8 into exact
    decimal arithmetic — no division, bit-stable.

    Scale shape: one partial-aggregable per-customer rollup over orders,
    then the global rank/cumsum is the two-phase block-prefix
    decomposition (per-revenue-band partials + exclusive prefix over the
    tiny band table + band-partitioned window) with a 1-row total
    broadcast — no single-partition sort at any size."""
    o = load_table(spark, sf_dir, "orders")
    rev = o.groupBy("o_custkey").agg(F.sum(dec2("o_totalprice")).alias("r"))
    # Global rank+cumsum over the UNBOUNDED customer relation WITHOUT a
    # single-partition sort: the two-phase parallel-prefix decomposition
    # (same device as events_disorder_profile / layout_zorder's grouped
    # rank). The coarse block key -⌊cents/10⁶⌋ (~$10k revenue bands) is
    # a monotone function of the leading sort key, hence a prefix of the
    # total order: per-block counts AND revenue sums roll up map-side,
    # the exclusive running totals cross the tiny block table only, and
    # the within-block window is partitioned BY block. Global rank =
    # prior-block count + within-block row_number; global cumsum =
    # prior-block sum + within-block running sum — identical to the
    # oracle's plain global window because ties never straddle blocks.
    b = rev.withColumn(
        "_blk", F.expr("-div(CAST(r * 100 AS BIGINT), 1000000)")
    )
    blocks = b.groupBy("_blk").agg(
        F.count(F.lit(1)).alias("_c"), F.sum("r").alias("_s")
    )
    wb = bounded_window("_blk", "_blk").rowsBetween(Window.unboundedPreceding, -1)
    prior = blocks.select(
        "_blk",
        F.coalesce(F.sum("_c").over(wb), F.lit(0)).alias("_prior_n"),
        F.coalesce(F.sum("_s").over(wb), F.lit(0)).alias("_prior_s"),
    )
    ww = Window.partitionBy("_blk").orderBy(F.desc("r"), F.asc("o_custkey"))
    ranked = b.join(F.broadcast(prior), "_blk").select(
        (F.col("_prior_n") + F.row_number().over(ww)).alias("rnk"),
        "o_custkey",
        "r",
        (
            F.col("_prior_s")
            + F.sum("r").over(ww.rowsBetween(Window.unboundedPreceding, 0))
        ).alias("cum"),
    )
    total = rev.agg(F.sum("r").alias("total"))
    return ranked.crossJoin(F.broadcast(total)).select(
        "rnk",
        "o_custkey",
        F.col("r").cast("double").alias("revenue"),
        ((F.col("cum") - F.col("r")) * 100 < F.col("total") * 80).alias("in_top80"),
    )


@query(
    "events_ols_trend",
    oracle="""
    WITH pts AS (
      SELECT event_type,
        epoch_us(ts) // 3600000000 AS x,
        CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS y
      FROM events),
    s AS (
      SELECT event_type,
        CAST(count(*) AS HUGEINT) AS n,
        min(x) AS x0,
        sum(CAST(x AS HUGEINT)) AS sx,
        sum(CAST(y AS HUGEINT)) AS sy,
        sum(CAST(x AS HUGEINT) * y) AS sxy,
        sum(CAST(x AS HUGEINT) * x) AS sxx,
        sum(CAST(y AS HUGEINT) * y) AS syy
      FROM pts GROUP BY event_type),
    c AS (
      SELECT event_type, n, x0,
        sx - n * x0 AS csx,
        sy AS csy,
        sxy - x0 * sy AS csxy,
        sxx - 2 * x0 * sx + n * x0 * x0 AS csxx,
        syy AS csyy
      FROM s)
    SELECT event_type, CAST(n AS BIGINT) AS n,
      CAST(n * csxy - csx * csy AS DOUBLE)
        / CAST(n * csxx - csx * csx AS DOUBLE) AS slope_cents_per_hour,
      CAST(csy * csxx - csx * csxy AS DOUBLE)
        / CAST(n * csxx - csx * csx AS DOUBLE) AS intercept_cents,
      (CAST(n * csxy - csx * csy AS DOUBLE)
         * CAST(n * csxy - csx * csy AS DOUBLE))
        / (CAST(n * csxx - csx * csx AS DOUBLE)
           * CAST(n * csyy - csy * csy AS DOUBLE)) AS r2
    FROM c
    """,
    tags=("timeseries", "stats", "B7", "regression"),
)
def events_ols_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type ordinary-least-squares trend line of value over
    time — the magnitude companion to events_trend_mannkendall (that one
    answers 'is there a monotonic trend?', this one 'how many cents per
    hour, fitted where?'). Classic sufficient-statistics regression: ONE
    partial-aggregable pass collects (n, Σx, Σy, Σxy, Σx², Σy², min x)
    per group — the textbook distributed-OLS shape, map-side combinable,
    no second scan — then the per-group x-origin shift (x' = x − min x,
    which keeps every product far inside 128-bit range) is applied
    ALGEBRAICALLY to the raw sums: Σx' = Σx − n·x0, Σx'y = Σxy − x0·Σy,
    Σx'² = Σx² − 2·x0·Σx + n·x0².

    x is integer epoch-hours (floor µs/3.6e9), y integer cents, every
    accumulator an exact integer (DECIMAL(38,0) on the Spark side,
    HUGEINT in the oracle) — slope and intercept are each ONE IEEE
    division of exact integers; r² multiplies/divides the same exact
    statistics in IEEE (its numerator squared can pass 38 digits, so it
    is float by construction, from exact inputs). Intercept is the
    fitted value at the group's FIRST hour (x' = 0)."""
    d38 = "decimal(38,0)"
    ev = load_table(spark, sf_dir, "events")
    pts = ev.select(
        "event_type",
        (F.unix_micros("ts") / F.lit(3600000000)).cast("long").alias("x"),
        (F.col("value").cast("decimal(18,2)") * 100).cast("long").alias("y"),
    )
    s = pts.groupBy("event_type").agg(
        F.count(F.lit(1)).cast(d38).alias("n"),
        F.min("x").alias("x0"),
        F.sum(F.col("x").cast(d38)).alias("sx"),
        F.sum(F.col("y").cast(d38)).alias("sy"),
        F.sum((F.col("x").cast(d38) * F.col("y"))).alias("sxy"),
        F.sum((F.col("x").cast(d38) * F.col("x"))).alias("sxx"),
        F.sum((F.col("y").cast(d38) * F.col("y"))).alias("syy"),
    )
    c = s.select(
        "event_type",
        "n",
        (F.col("sx") - F.col("n") * F.col("x0")).alias("csx"),
        F.col("sy").alias("csy"),
        (F.col("sxy") - F.col("x0") * F.col("sy")).alias("csxy"),
        (
            F.col("sxx")
            - 2 * F.col("x0") * F.col("sx")
            + F.col("n") * F.col("x0") * F.col("x0")
        ).alias("csxx"),
        F.col("syy").alias("csyy"),
    )
    num = F.col("n") * F.col("csxy") - F.col("csx") * F.col("csy")
    den = F.col("n") * F.col("csxx") - F.col("csx") * F.col("csx")
    deny = F.col("n") * F.col("csyy") - F.col("csy") * F.col("csy")
    inum = F.col("csy") * F.col("csxx") - F.col("csx") * F.col("csxy")
    return c.select(
        "event_type",
        F.col("n").cast("long").alias("n"),
        (num.cast("double") / den.cast("double")).alias("slope_cents_per_hour"),
        (inum.cast("double") / den.cast("double")).alias("intercept_cents"),
        (
            (num.cast("double") * num.cast("double"))
            / (den.cast("double") * deny.cast("double"))
        ).alias("r2"),
    )


# Truncated dyadic decay: half-life = 1 day, horizon 30 days. Scaling by
# 2^30 makes every per-event weight the exact integer 2^(30 - age_days);
# events older than the horizon carry weight 0 (< 1e-9 of the mass) and
# are FILTERED before aggregation, so the scan prunes to the hot window.
_DECAY_HORIZON_DAYS = 30
_DECAY_TOPK = 100


@query(
    "events_decayed_leaderboard",
    oracle=f"""
    WITH ref AS (SELECT max(CAST(ts AS DATE)) AS ref_d FROM events),
    aged AS (
      SELECT user_id,
        date_diff('day', CAST(ts AS DATE), ref_d) AS age
      FROM events, ref
      WHERE date_diff('day', CAST(ts AS DATE), ref_d)
            <= {_DECAY_HORIZON_DAYS}),
    scores AS (
      SELECT user_id,
        sum(CAST(2 AS HUGEINT) ** ({_DECAY_HORIZON_DAYS} - age))
          AS score_scaled
      FROM aged GROUP BY user_id)
    SELECT user_id, CAST(score_scaled AS BIGINT) AS score_scaled,
           CAST(score_scaled AS DOUBLE) / {2 ** _DECAY_HORIZON_DAYS}
             AS score
    FROM scores
    ORDER BY score_scaled DESC, user_id
    LIMIT {_DECAY_TOPK}
    """,
    tags=("timeseries", "B7", "leaderboard", "decay"),
)
def events_decayed_leaderboard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trending-now leaderboard: top-{_DECAY_TOPK} users by exponentially
    time-decayed event count (half-life 1 day) — the freshness-weighted
    ranking every feed/abuse/trending system runs, made EXACT by the
    same dyadic-decay device as events_ewma: with half-life one day and
    a 30-day horizon, the 2^30-scaled weight of an event aged d days is
    the integer 2^(30-d), so each user's score is an exact int64 sum and
    the reported score one exact binary scaling (division by 2^30 is
    lossless in IEEE). Events past the horizon (< 1e-9 of the mass) are
    dropped BEFORE the shuffle — at 100 TB the scan prunes to the hot
    30-day partition range instead of decaying cold history by zero.

    One partial-aggregable user-keyed sum + a {_DECAY_TOPK}-row
    TakeOrdered with the (score desc, user asc) deterministic tie-break;
    the 1-row reference-date broadcast pins 'now' to the corpus max so
    every engine and rerun ranks the same instant."""
    ev = load_table(spark, sf_dir, "events")
    ref = ev.agg(F.max(F.to_date("ts")).alias("ref_d"))
    aged = (
        ev.crossJoin(F.broadcast(ref))
        .select(
            "user_id",
            F.datediff(F.col("ref_d"), F.to_date("ts")).alias("age"),
        )
        .filter(F.col("age") <= _DECAY_HORIZON_DAYS)
    )
    scores = aged.groupBy("user_id").agg(
        F.sum(
            F.expr(
                f"shiftleft(CAST(1 AS BIGINT), {_DECAY_HORIZON_DAYS} - age)"
            )
        ).alias("score_scaled")
    )
    return (
        scores.orderBy(F.desc("score_scaled"), "user_id")
        .limit(_DECAY_TOPK)
        .select(
            "user_id",
            "score_scaled",
            (F.col("score_scaled").cast("double") / F.lit(float(2 ** _DECAY_HORIZON_DAYS))).alias("score"),
        )
    )


# Seasonal-naive backtest: lcm(1..9) — every possible train-day count of
# one weekday slot (<= 4 in a 23-day train window, 9 leaves headroom)
# divides it, so per-bucket errors with denominator nd scale to exact
# integers via err * (2520 / nd) and MAE is ONE final IEEE division.
_SEASONAL_LCM = 2520
_BACKTEST_DAYS = 7


@query(
    "events_seasonal_backtest",
    oracle=f"""
    WITH ref AS (SELECT max(CAST(ts AS DATE)) AS ref_d FROM events),
    buckets AS (
      SELECT event_type, CAST(ts AS DATE) AS d, hour(ts) AS h,
        CAST(sum(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT) AS cents
      FROM events GROUP BY 1, 2, 3),
    marked AS (
      SELECT b.*, date_diff('day', DATE '1970-01-05', d) % 7 AS dow,
             d > ref_d - {_BACKTEST_DAYS} AS is_test
      FROM buckets b, ref),
    nd AS (
      SELECT dow, CAST(count(DISTINCT d) AS BIGINT) AS n_days
      FROM marked WHERE NOT is_test GROUP BY dow),
    train AS (
      SELECT event_type, dow, h,
        CAST(sum(cents) AS BIGINT) AS train_cents
      FROM marked WHERE NOT is_test GROUP BY 1, 2, 3),
    test AS (
      SELECT m.event_type, m.dow, m.h, m.cents,
        coalesce(t.train_cents, 0) AS train_cents, nd.n_days
      FROM marked m
        LEFT JOIN train t ON m.event_type = t.event_type
                         AND m.dow = t.dow AND m.h = t.h
        JOIN nd ON m.dow = nd.dow
      WHERE m.is_test),
    scored AS (
      SELECT event_type,
        abs(cents * n_days - train_cents) * ({_SEASONAL_LCM} // n_days)
          AS abs_scaled,
        (cents * n_days - train_cents) * ({_SEASONAL_LCM} // n_days)
          AS signed_scaled
      FROM test)
    SELECT event_type,
      CAST(count(*) AS BIGINT) AS n_buckets,
      CAST(sum(abs_scaled) AS DOUBLE) / ({_SEASONAL_LCM} * count(*))
        AS mae_cents,
      CAST(sum(signed_scaled) AS DOUBLE) / ({_SEASONAL_LCM} * count(*))
        AS bias_cents
    FROM scored GROUP BY event_type
    """,
    tags=("timeseries", "forecast", "B7", "backtest"),
)
def events_seasonal_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal-naive forecast BACKTEST: hold out the last
    {_BACKTEST_DAYS} days, forecast each test (event_type, weekday,
    hour) slot's hourly revenue as the train-period mean of the same
    slot, and report exact MAE + signed bias per event type — the
    evaluate-before-you-trust step of every capacity/revenue forecast,
    expressed as a relation.

    All arithmetic is exact until the final division: actuals are
    integer cents per bucket; a slot's forecast is the RATIONAL
    train_total/nd (nd = that weekday's train-day count), so each
    bucket's error scales to the exact integer
    |actual·nd − train_total| · (2520/nd) (2520 = lcm(1..9), every nd
    divides it), and MAE = Σ / (2520·|buckets|) is one IEEE division.
    Weekday is pure date arithmetic (days-since-Monday-epoch mod 7) —
    no engine-specific DOW convention. Shuffle profile: one hourly
    aggregation of the events scan, then everything runs on
    bucket-sized data (slot table and the 7-row nd relation broadcast);
    the 1-row reference-date broadcast pins the split."""
    ev = load_table(spark, sf_dir, "events")
    ref = ev.agg(F.max(F.to_date("ts")).alias("ref_d"))
    buckets = (
        ev.groupBy(
            "event_type",
            F.to_date("ts").alias("d"),
            F.hour("ts").alias("h"),
        )
        .agg((F.sum(dec2("value")) * 100).cast("long").alias("cents"))
    )
    marked = buckets.crossJoin(F.broadcast(ref)).select(
        "event_type",
        "d",
        "h",
        "cents",
        (F.datediff("d", F.lit("1970-01-05").cast("date")) % 7).alias("dow"),
        (F.col("d") > F.date_sub("ref_d", _BACKTEST_DAYS)).alias("is_test"),
    )
    nd = (
        marked.filter(~F.col("is_test"))
        .groupBy("dow")
        .agg(F.countDistinct("d").alias("n_days"))
    )
    train = (
        marked.filter(~F.col("is_test"))
        .groupBy("event_type", "dow", "h")
        .agg(F.sum("cents").alias("train_cents"))
    )
    test = (
        marked.filter(F.col("is_test"))
        .join(F.broadcast(train), ["event_type", "dow", "h"], "left")
        .join(F.broadcast(nd), "dow")
        .select(
            "event_type",
            "cents",
            F.coalesce("train_cents", F.lit(0)).alias("train_cents"),
            "n_days",
        )
    )
    diff = F.col("cents") * F.col("n_days") - F.col("train_cents")
    wt = F.floor(F.lit(_SEASONAL_LCM) / F.col("n_days")).cast("long")
    scored = test.select(
        "event_type",
        (F.abs(diff) * wt).alias("abs_scaled"),
        (diff * wt).alias("signed_scaled"),
    )
    return scored.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_buckets"),
        (
            F.sum("abs_scaled").cast("double")
            / (F.lit(_SEASONAL_LCM) * F.count(F.lit(1)))
        ).alias("mae_cents"),
        (
            F.sum("signed_scaled").cast("double")
            / (F.lit(_SEASONAL_LCM) * F.count(F.lit(1)))
        ).alias("bias_cents"),
    )


_DISORDER_BLOCK = 4096


@query(
    "events_disorder_profile",
    oracle="""
    WITH seen AS (
      SELECT event_type,
        epoch_us(max(ts) OVER (ORDER BY event_id
                               ROWS UNBOUNDED PRECEDING)) - epoch_us(ts)
          AS late_us
      FROM events)
    SELECT event_type,
      CAST(count(*) AS BIGINT) AS n_events,
      CAST(sum(CASE WHEN late_us = 0 THEN 1 ELSE 0 END) AS BIGINT)
        AS n_in_order,
      CAST(sum(CASE WHEN late_us > 0 AND late_us < 60000000 THEN 1 ELSE 0 END)
           AS BIGINT) AS n_lt_1m,
      CAST(sum(CASE WHEN late_us >= 60000000 AND late_us < 600000000
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_lt_10m,
      CAST(sum(CASE WHEN late_us >= 600000000 AND late_us < 3600000000
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_lt_1h,
      CAST(sum(CASE WHEN late_us >= 3600000000 THEN 1 ELSE 0 END) AS BIGINT)
        AS n_ge_1h,
      max(late_us) AS max_late_us,
      CAST(sum(CASE WHEN late_us > 0 THEN 1 ELSE 0 END) AS DOUBLE) / count(*)
        AS frac_late
    FROM seen GROUP BY event_type
    """,
    tags=("diagnostics", "B9", "B13", "watermark"),
)
def events_disorder_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-time DISORDER profile: for each event, its lateness behind
    the running maximum event time over arrival order (event_id — the
    fixture's ingestion sequence), bucketed per event type — THE
    measurement that sizes a watermark before deploying any of the B13
    streaming queries: `withWatermark("ts", X)` drops exactly the rows
    this profile counts past X, so you read the histogram and pick the
    delay that bounds loss (frac ≥1h here = what a 1-hour watermark
    loses).

    The running max over a GLOBAL order is the textbook sequential scan;
    the Spark side parallelizes it as a two-phase PREFIX MAX — the same
    decomposition as a parallel prefix sum: (1) per-4096-id-block max
    (one partial-aggregable pass, blocks = n/4096 rows), (2) exclusive
    running max across the tiny block table, (3) broadcast-join the
    prior-block max back and combine with the ROWS-bounded within-block
    running max (each window partition is ≤ 4096 rows — NO global
    single-partition sort ever materializes the event table). Lateness
    is exact integer µs; the one division (frac_late) is the output."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        "event_id",
        F.unix_micros("ts").alias("us"),
        (F.col("event_id") / _DISORDER_BLOCK).cast("long").alias("blk"),
    )
    blocks = ev.groupBy("blk").agg(F.max("us").alias("blk_max"))
    wb = bounded_window("blk", "blk").rowsBetween(Window.unboundedPreceding, -1)
    prior = blocks.select(
        "blk", F.max("blk_max").over(wb).alias("prior_max")
    )
    ww = (
        Window.partitionBy("blk")
        .orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    seen = (
        ev.join(F.broadcast(prior), "blk")
        .withColumn("run_max", F.max("us").over(ww))
        .select(
            "event_type",
            (
                F.greatest(F.coalesce("prior_max", F.lit(0)), F.col("run_max"))
                - F.col("us")
            ).alias("late_us"),
        )
    )
    c = lambda cond: F.sum(F.when(cond, 1).otherwise(0))  # noqa: E731
    lu = F.col("late_us")
    return seen.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        c(lu == 0).alias("n_in_order"),
        c((lu > 0) & (lu < 60_000_000)).alias("n_lt_1m"),
        c((lu >= 60_000_000) & (lu < 600_000_000)).alias("n_lt_10m"),
        c((lu >= 600_000_000) & (lu < 3_600_000_000)).alias("n_lt_1h"),
        c(lu >= 3_600_000_000).alias("n_ge_1h"),
        F.max("late_us").alias("max_late_us"),
        (c(lu > 0).cast("double") / F.count(F.lit(1))).alias("frac_late"),
    )


@query(
    "orders_trimmed_mean",
    oracle="""
    WITH ranked AS (
      SELECT o_orderpriority,
        CAST(o_totalprice AS DECIMAL(18,2)) AS p,
        row_number() OVER (PARTITION BY o_orderpriority
                           ORDER BY o_totalprice, o_orderkey) AS rn,
        count(*) OVER (PARTITION BY o_orderpriority) AS n
      FROM orders),
    kept AS (
      SELECT o_orderpriority, p, n FROM ranked
      WHERE rn * 10 > n AND (n - rn) * 10 >= n)
    SELECT o_orderpriority,
      CAST(max(n) AS BIGINT) AS n_total,
      CAST(count(*) AS BIGINT) AS n_kept,
      CAST(sum(p) AS DOUBLE) / count(*) AS trimmed_mean
    FROM kept GROUP BY o_orderpriority
    """,
    tags=("agg", "B7", "B9", "robust-stats"),
)
def orders_trimmed_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """10%-trimmed mean of order value per priority — the robust
    location estimate that survives the fat tails plain AVG drowns in
    (and the reason Deequ/TFDV profile trimmed stats next to means).
    EXACT trimming by rank arithmetic, no percentile call: rows ranked
    per group with the (price, orderkey) deterministic tie-break; a row
    is kept iff rn*10 > n AND (n-rn)*10 >= n — integer inequalities,
    so both engines drop exactly the same floor(n/10)-ish tail rows.
    The kept sum is exact DECIMAL; the mean ONE IEEE division.

    Scale: one grouped sort window (parallel across the 5 priority
    groups; within-group ORDER BY is the standard window sort, not a
    global single partition), then a partial-aggregable keyed mean.
    Heavier-keyed variants ride the same distributed-selection machinery
    as agg_quantiles_distributed."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        "o_totalprice", "o_orderkey"
    )
    wn = Window.partitionBy("o_orderpriority")
    ranked = o.select(
        "o_orderpriority",
        dec2("o_totalprice").alias("p"),
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    kept = ranked.filter(
        (F.col("rn") * 10 > F.col("n"))
        & ((F.col("n") - F.col("rn")) * 10 >= F.col("n"))
    )
    return kept.groupBy("o_orderpriority").agg(
        F.max("n").cast("long").alias("n_total"),
        F.count(F.lit(1)).alias("n_kept"),
        (F.sum("p").cast("double") / F.count(F.lit(1))).alias("trimmed_mean"),
    )


_FULFILL_DAYS = 30


@query(
    "join_interval_overlap",
    oracle=f"""
    SELECT a.o_custkey AS custkey,
           a.o_orderkey AS order_a, b.o_orderkey AS order_b,
           date_diff('day',
             greatest(a.o_orderdate, b.o_orderdate),
             least(a.o_orderdate + INTERVAL {_FULFILL_DAYS} DAY,
                   b.o_orderdate + INTERVAL {_FULFILL_DAYS} DAY))
             AS overlap_days
    FROM orders a JOIN orders b
      ON a.o_custkey = b.o_custkey
     AND a.o_orderkey < b.o_orderkey
     AND a.o_orderdate < b.o_orderdate + INTERVAL {_FULFILL_DAYS} DAY
     AND b.o_orderdate < a.o_orderdate + INTERVAL {_FULFILL_DAYS} DAY
    """,
    tags=("join", "B6", "interval"),
)
def join_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERVAL x INTERVAL overlap join — completes the join matrix's
    temporal corner next to point-in-interval (`join_range_binned`) and
    as-of: each order occupies a [orderdate, orderdate+{_FULFILL_DAYS}d)
    fulfilment window; emit every same-customer pair whose windows
    overlap, with the exact overlap length in whole days (integer date
    arithmetic — min(end) − max(start), no floats anywhere).

    Scale shape: the customer equi-key carries the join (ONE hash
    shuffle); the interval predicates filter WITHIN each key's bounded
    group (orders per customer is a dimension-bounded handful), so no
    theta join and no bin explosion is needed — the keyed form of an
    interval join is just an equi-join plus residual predicates, which
    is exactly how Catalyst plans it. The unkeyed/global form of this
    operator is `join_range_binned`'s bin-explode device."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", "o_orderdate"
    )
    a = o.select(
        F.col("o_custkey").alias("custkey"),
        F.col("o_orderkey").alias("order_a"),
        F.col("o_orderdate").alias("start_a"),
        F.timestamp_add("DAY", F.lit(_FULFILL_DAYS), "o_orderdate").alias(
            "end_a"
        ),
    )
    b = o.select(
        F.col("o_custkey").alias("custkey"),
        F.col("o_orderkey").alias("order_b"),
        F.col("o_orderdate").alias("start_b"),
        F.timestamp_add("DAY", F.lit(_FULFILL_DAYS), "o_orderdate").alias(
            "end_b"
        ),
    )
    return (
        a.join(b, "custkey")
        .filter(
            (F.col("order_a") < F.col("order_b"))
            & (F.col("start_a") < F.col("end_b"))
            & (F.col("start_b") < F.col("end_a"))
        )
        .select(
            "custkey",
            "order_a",
            "order_b",
            F.datediff(
                F.least("end_a", "end_b").cast("date"),
                F.greatest("start_a", "start_b").cast("date"),
            ).cast("long").alias("overlap_days"),
        )
    )


# ---------------------------------------------------------------------------
# er_fuzzy_join_edit1 — complete edit-distance-1 self-join via FastSS
# ---------------------------------------------------------------------------


@query(
    "er_fuzzy_join_edit1",
    # Oracle: brute-force all-pairs Levenshtein over the name set — the
    # FastSS deletion-neighborhood join below is provably identical for
    # distance <= 1 (a substitution pair shares the deletion at the
    # differing position; an insert/delete pair shares the shorter
    # string itself), so any neighborhood bug (off-by-one slice, lost
    # identity variant, dropped bucket) surfaces as a missing pair.
    oracle="""
    SELECT a.s_name AS name_a, b.s_name AS name_b,
      CAST(levenshtein(a.s_name, b.s_name) AS INT) AS dist
    FROM supplier a JOIN supplier b ON a.s_name < b.s_name
    WHERE levenshtein(a.s_name, b.s_name) <= 1
    """,
    tags=("er", "B6", "fuzzy-join", "fastss"),
)
def er_fuzzy_join_edit1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Complete fuzzy self-join at edit distance ≤ 1 via the FastSS
    deletion neighborhood (Bocek et al. 2007): each name emits itself
    plus its |name| single-character deletions; two names are within
    one edit iff they SHARE a neighborhood member, so candidates come
    from a hash equi-join on the variant string — COMPLETE by
    construction (unlike the sorted-neighborhood er_name_neardup, which
    trades recall for its O(n·w) bound) and still never an all-pairs
    scan. The exact Levenshtein verify runs only on bucket-mates, and
    keeps only true pairs (shared-variant false positives — e.g. two
    different substitutions meeting at the same deletion — die there).

    Exactness: edit distance is integer; both engines implement
    standard unit-cost Levenshtein.

    Scale: the variant relation is Σ(len+1) rows ≈ corpus chars — the
    same budget as any shingle explode; the join is hash-partitioned by
    variant, bucket width = names per deletion bucket (tiny for
    real-world name sets). Distance-k generalizes with k-deletion
    neighborhoods (size ≈ lenᵏ/k!), the standard FastSS trade."""
    s = load_table(spark, sf_dir, "supplier")
    names = s.select("s_name").distinct()
    variants = names.select(
        F.col("s_name"),
        F.explode(
            F.concat(
                F.array(F.col("s_name")),
                F.expr(
                    "transform(sequence(1, length(s_name)),"
                    " i -> concat(substring(s_name, 1, i - 1),"
                    " substring(s_name, i + 1, length(s_name))))"
                ),
            )
        ).alias("v"),
    ).distinct()
    a = variants.select(F.col("s_name").alias("name_a"), "v")
    b = variants.select(F.col("s_name").alias("name_b"), "v")
    cand = (
        a.join(b, "v")
        .filter(F.col("name_a") < F.col("name_b"))
        .select("name_a", "name_b")
        .distinct()
    )
    return cand.select(
        "name_a",
        "name_b",
        F.levenshtein("name_a", "name_b").cast("int").alias("dist"),
    ).filter(F.col("dist") <= 1)


# ---------------------------------------------------------------------------
# ivm_join_delta — incremental JOIN view maintenance (textbook delta rules)
# ---------------------------------------------------------------------------

_IVM_CUT = "1999-01-01"  # orders delta: on/after this date
_IVM_DIM_MOD = 20  # customer delta: every 20th custkey is "late-arriving"


@query(
    "ivm_join_delta",
    # The oracle is the FULL recompute of the join view: the three
    # delta terms plus the base must be indistinguishable from
    # rescanning everything.
    oracle="""
    SELECT c.c_mktsegment AS segment,
      CAST(count(*) AS BIGINT) AS n_orders,
      CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,2))), 2) AS DOUBLE)
        AS revenue
    FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
    GROUP BY 1 ORDER BY 1
    """,
    tags=("ivm", "B6", "B7", "scale", "delta-join"),
)
def ivm_join_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental view maintenance for a JOIN view — the textbook
    delta-join rules (Δ(A ⋈ B) = ΔA ⋈ B ∪ A ⋈ ΔB ∪ ΔA ⋈ ΔB, Blakeley
    et al. 1986) realized as four partial-aggregate tables that merge
    into the exact full-recompute answer. Both relations carry a delta:
    orders split at a date cutoff (the daily increment), customer split
    on a key residue (late-arriving dimension rows — the case one-sided
    "dim is static" IVM silently corrupts). The engine computes
    V₀ = γ(C₀ ⋈ O₀) plus the three delta terms γ(ΔC ⋈ O₀),
    γ(C₀ ⋈ ΔO), γ(ΔC ⋈ ΔO), unions the four segment-sized partials,
    and re-aggregates; the oracle is the monolithic join. Equality
    proves the cross term is neither dropped nor double-counted —
    exactly the invariant a production IVM pipeline must hold.

    Exactness: counts integer, revenue exact DECIMAL(18,2) summed per
    partial and re-summed across the 4 partials (decimal addition is
    associative — no float until the final cast).

    Scale shape: maintaining the view costs |Δ|-sized joins (each
    delta term joins ONE small relation against a filtered base — at
    100 TB the ΔC/ΔO sides are day-sized, broadcastable), and the
    merge is |segments| × 4 rows — the whole point of IVM: the 100 TB
    base is never rescanned. Here all four terms run in one plan for
    the oracle comparison; in production V₀ is the stored view."""
    from ..functions.exact import dec2

    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_totalprice", "o_orderdate"
    )
    cut = F.lit(_IVM_CUT).cast("timestamp")
    c_base = c.filter(F.col("c_custkey") % _IVM_DIM_MOD != 0)
    c_delta = c.filter(F.col("c_custkey") % _IVM_DIM_MOD == 0)
    o_base = o.filter(F.col("o_orderdate") < cut)
    o_delta = o.filter(F.col("o_orderdate") >= cut)

    def part(cs, os):
        return (
            cs.join(os, cs.c_custkey == os.o_custkey)
            .groupBy("c_mktsegment")
            .agg(
                F.count(F.lit(1)).alias("pn"),
                F.sum(dec2("o_totalprice")).alias("prev"),
            )
        )

    partials = (
        part(c_base, o_base)
        .unionByName(part(c_delta, o_base))
        .unionByName(part(c_base, o_delta))
        .unionByName(part(c_delta, o_delta))
    )
    return (
        partials.groupBy("c_mktsegment")
        .agg(
            F.sum("pn").cast("long").alias("n_orders"),
            F.round(F.sum("prev"), 2).cast("double").alias("revenue"),
        )
        .select(F.col("c_mktsegment").alias("segment"), "n_orders", "revenue")
        .orderBy("segment")
    )
