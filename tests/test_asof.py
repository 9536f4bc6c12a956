"""Unit tests for the as-of join operator (union + window formulation)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from mk_kafka_connect_spark.operators.asof import asof_join


def _ts(s):
    return dt.datetime.fromisoformat(s)


def _frames(spark):
    left = spark.createDataFrame(
        [
            (1, _ts("2024-01-01 10:00:00"), "e1"),
            (1, _ts("2024-01-01 12:00:00"), "e2"),
            (2, _ts("2024-01-01 09:00:00"), "e3"),  # before any right row
            (3, _ts("2024-01-01 10:00:00"), "e4"),  # key with no right rows
        ],
        "key long, lts timestamp, tag string",
    )
    right = spark.createDataFrame(
        [
            (1, _ts("2024-01-01 09:30:00"), 100),
            (1, _ts("2024-01-01 11:00:00"), 200),
            (2, _ts("2024-01-01 09:30:00"), 300),
        ],
        "key long, rts timestamp, payload long",
    )
    return left, right


def test_asof_inner(spark):
    left, right = _frames(spark)
    out = asof_join(left, right, ["key"], "lts", "rts", ["payload"], how="inner")
    rows = {r.tag: r.payload for r in out.collect()}
    assert rows == {"e1": 100, "e2": 200}  # e3 too early, e4 keyless → dropped


def test_asof_left(spark):
    left, right = _frames(spark)
    out = asof_join(left, right, ["key"], "lts", "rts", ["payload"], how="left")
    rows = {r.tag: r.payload for r in out.collect()}
    assert rows == {"e1": 100, "e2": 200, "e3": None, "e4": None}


def test_asof_tie_at_equal_ts(spark):
    """A right row exactly at the left timestamp matches (<= semantics)."""
    left = spark.createDataFrame(
        [(1, _ts("2024-01-01 10:00:00"), "e")], "key long, lts timestamp, tag string"
    )
    right = spark.createDataFrame(
        [(1, _ts("2024-01-01 10:00:00"), 42)], "key long, rts timestamp, payload long"
    )
    out = asof_join(left, right, ["key"], "lts", "rts", ["payload"])
    assert out.first().payload == 42


def test_asof_single_shuffle_plan(spark):
    """The physical plan must contain exactly one exchange on the key —
    the formulation's whole point at scale (no range-join explosion)."""
    left, right = _frames(spark)
    out = asof_join(left, right, ["key"], "lts", "rts", ["payload"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning(key") <= 1


def test_asof_forward(spark):
    """Forward direction: earliest right row at-or-after each left ts.
    e1@10:00 -> 11:00/200; e2@12:00 -> no later row (dropped inner, null
    left); e3@09:00 -> 09:30/300."""
    left, right = _frames(spark)
    out = asof_join(
        left, right, ["key"], "lts", "rts", ["payload"], direction="forward"
    )
    got = {r.tag: r.payload for r in out.collect()}
    assert got == {"e1": 200, "e3": 300}
    kept = asof_join(
        left, right, ["key"], "lts", "rts", ["payload"], how="left",
        direction="forward",
    )
    lgot = {r.tag: r.payload for r in kept.collect()}
    assert lgot == {"e1": 200, "e2": None, "e3": 300, "e4": None}


def test_asof_forward_tie_at_equal_ts(spark):
    """A right row exactly at the left timestamp matches (>= semantics)."""
    left = spark.createDataFrame(
        [(1, _ts("2024-01-01 10:00:00"), "e")], "key long, lts timestamp, tag string"
    )
    right = spark.createDataFrame(
        [
            (1, _ts("2024-01-01 10:00:00"), 42),
            (1, _ts("2024-01-01 11:00:00"), 99),
        ],
        "key long, rts timestamp, payload long",
    )
    out = asof_join(
        left, right, ["key"], "lts", "rts", ["payload"], direction="forward"
    )
    assert out.first().payload == 42


def test_asof_nearest_picks_smaller_gap_ties_backward(spark):
    """Nearest: e1@10:00 is 30min after 09:30 and 60min before 11:00 ->
    backward 100; a left row equidistant between two right rows takes the
    backward one (pandas merge_asof tie rule)."""
    left, right = _frames(spark)
    out = asof_join(
        left, right, ["key"], "lts", "rts", ["payload"], direction="nearest"
    )
    got = {r.tag: r.payload for r in out.collect()}
    # e2@12:00: nearest is 11:00 (backward only); e3: forward only 09:30.
    assert got == {"e1": 100, "e2": 200, "e3": 300}
    tie_left = spark.createDataFrame(
        [(1, _ts("2024-01-01 10:00:00"), "mid")], "key long, lts timestamp, tag string"
    )
    tie_right = spark.createDataFrame(
        [
            (1, _ts("2024-01-01 09:00:00"), 1),
            (1, _ts("2024-01-01 11:00:00"), 2),
        ],
        "key long, rts timestamp, payload long",
    )
    tie = asof_join(
        tie_left, tie_right, ["key"], "lts", "rts", ["payload"],
        direction="nearest",
    )
    assert tie.first().payload == 1  # equidistant -> backward


def test_asof_nearest_single_shuffle_plan(spark):
    """Nearest evaluates both directional fills over ONE key exchange —
    two Window nodes, one hashpartitioning, no join of two asof runs."""
    left, right = _frames(spark)
    out = asof_join(
        left, right, ["key"], "lts", "rts", ["payload"], direction="nearest"
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning(key") <= 1
    assert plan.count("Window") == 2
