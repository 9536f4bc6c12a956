"""Exactly-once foreachBatch sink: replaying an epoch must not duplicate
rows (dynamic partition overwrite keyed on epoch id)."""

from __future__ import annotations

from mk_kafka_connect_spark.streaming.sinks import (
    epoch_partitioned_writer,
    run_foreach_batch,
)
from mk_kafka_connect_spark.streaming.windows import read_events_stream

SF = "/root/testdata/sf0.001"


def test_foreach_batch_idempotent_replay(spark, tmp_path):
    out = str(tmp_path / "out")
    apply = epoch_partitioned_writer(out)

    ev = read_events_stream(spark, SF)
    run_foreach_batch(ev, apply, str(tmp_path / "ckpt"), timeout_s=120)
    first = spark.read.parquet(out)
    n = first.count()
    assert n == 1000
    epochs = [r._epoch for r in first.select("_epoch").distinct().collect()]

    # Simulate the crash-replay: re-apply an already-committed epoch's
    # batch. The write must OVERWRITE its partition, not append. A real
    # replay gets the batch from the SOURCE checkpoint — materialize it
    # first (reading lazily from the sink while overwriting the sink would
    # be a self-overwrite race, which is not the replay scenario).
    replay_rows = (
        spark.read.parquet(out).filter(f"_epoch = {epochs[0]}").drop("_epoch").collect()
    )
    schema = spark.read.parquet(out).drop("_epoch").schema
    replay_df = spark.createDataFrame(replay_rows, schema=schema)
    apply(replay_df, epochs[0])
    again = spark.read.parquet(out)
    assert again.count() == n  # no duplicates
    assert again.select("event_id").distinct().count() == 1000
