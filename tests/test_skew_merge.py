"""Unit tests for skew-mitigation operators and the CDC merge apply."""

from __future__ import annotations

from pyspark.sql import functions as F

from mk_kafka_connect_spark.catalog import load_table
from mk_kafka_connect_spark.functions.exact import dec2
from mk_kafka_connect_spark.operators.cdc import merge_upsert
from mk_kafka_connect_spark.operators.skew import (
    salted_agg_sum,
    salted_broadcast_join,
    salted_count,
)

SF = "/root/testdata/sf0.01"


def test_salted_count_equals_direct(spark):
    ev = load_table(spark, SF, "events")
    direct = {r.event_type: r.n for r in ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("n")).collect()}
    salted = {r.event_type: r.n for r in salted_count(ev, ["event_type"]).collect()}
    assert direct == salted


def test_salted_sum_exact_decimal(spark):
    ev = load_table(spark, SF, "events")
    direct = {
        r.event_type: r.s
        for r in ev.groupBy("event_type").agg(F.sum(dec2("value")).alias("s")).collect()
    }
    salted = {
        r.event_type: r.total
        for r in salted_agg_sum(ev, ["event_type"], dec2("value"), "total").collect()
    }
    assert direct == salted  # decimal reassociation is exact


def test_salted_broadcast_join_matches_plain(spark):
    ev = load_table(spark, SF, "events").withColumnRenamed("user_id", "c_custkey")
    cust = load_table(spark, SF, "customer").select("c_custkey", "c_mktsegment")
    plain = (
        ev.join(cust, "c_custkey")
        .groupBy("c_mktsegment").agg(F.count(F.lit(1)).alias("n"))
    )
    salted = (
        salted_broadcast_join(ev, cust, "c_custkey")
        .groupBy("c_mktsegment").agg(F.count(F.lit(1)).alias("n"))
    )
    assert {(r.c_mktsegment, r.n) for r in plain.collect()} == {
        (r.c_mktsegment, r.n) for r in salted.collect()
    }


def test_merge_upsert_semantics(spark):
    snapshot = spark.createDataFrame(
        [(1, "a", 1), (2, "b", 1), (3, "c", 1)], "k long, v string, ver long"
    )
    changes = spark.createDataFrame(
        [
            (2, "b2", 2, False),   # update
            (2, "b3", 3, False),   # later update wins
            (3, None, 2, True),    # delete
            (4, "d", 1, False),    # insert
        ],
        "k long, v string, ver long, is_del boolean",
    )
    out = merge_upsert(snapshot, changes, ["k"], "ver", delete_col="is_del")
    got = {r.k: (r.v, r.ver) for r in out.collect()}
    assert got == {1: ("a", 1), 2: ("b3", 3), 4: ("d", 1)}  # 3 deleted
