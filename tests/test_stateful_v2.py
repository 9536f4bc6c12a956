"""transformWithStateInPandas surface: env-gated like the Kafka wrappers.

The TWS driver-side Python worker needs ``google.protobuf``, absent in
this container — so the gate must refuse with a clear pointer to the
equivalent applyInPandasWithState operator, and the real path runs (and
must match the batch aggregate) wherever the dependency exists."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mk_kafka_connect_spark.catalog import load_table
from mk_kafka_connect_spark.streaming import windows as SW
from mk_kafka_connect_spark.streaming.stateful_v2 import (
    running_user_stats_tws,
    tws_available,
)

SF = "/root/testdata/sf0.001"


def test_gate_refuses_clearly_when_unavailable(spark):
    if tws_available():
        pytest.skip("protobuf present — gate inactive")
    ev = SW.read_events_stream(spark, SF)
    with pytest.raises(NotImplementedError, match="applyInPandasWithState"):
        running_user_stats_tws(ev)


def test_tws_matches_batch_aggregate_when_available(spark):
    if not tws_available():
        pytest.skip("google.protobuf not installed in this container")
    ev = SW.read_events_stream(spark, SF)
    out = SW.run_to_memory(running_user_stats_tws(ev), "update")
    from pyspark.sql import Window as W

    w = W.partitionBy("user_id").orderBy(F.desc("n_seen"))
    final = (
        out.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1)
    )
    batch = (
        load_table(spark, SF, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_seen"))
    )
    got = {r.user_id: r.n_seen for r in final.collect()}
    want = {r.user_id: r.n_seen for r in batch.collect()}
    assert got == want
