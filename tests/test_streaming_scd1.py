"""Contract tests for streaming/sinks.py::scd1_state_writer — the
out-of-order tolerance and replay idempotence the registered
streaming_cdc_scd1 query's oracle can't isolate (the driver only sees
the final state of one batch order)."""

from __future__ import annotations

import datetime as dt
import tempfile

from mk_kafka_connect_spark.streaming.sinks import scd1_state_writer


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


SCHEMA = "user_id long, event_id long, value double, ts timestamp, is_delete boolean"

# Three users: 1 = plain upserts, 2 = deleted then (earlier ts) upsert
# arriving late, 3 = upsert then tombstone arriving in an EARLIER batch.
BATCH_A = [
    (1, 10, 5.0, _ts("2024-01-01 00:00:00"), False),
    (2, 20, 7.0, _ts("2024-01-02 00:00:00"), True),  # tombstone, latest for 2
    (3, 31, 9.0, _ts("2024-01-03 00:00:00"), False),  # latest for 3
]
BATCH_B = [
    (1, 11, 6.0, _ts("2024-01-05 00:00:00"), False),  # latest for 1
    (2, 21, 8.0, _ts("2024-01-01 00:00:00"), False),  # OLDER than 2's tombstone
    (3, 30, 1.0, _ts("2024-01-01 00:00:00"), False),  # older upsert for 3
]
EXPECTED = {1: (11, 6.0), 3: (31, 9.0)}  # user 2 stays deleted


def _run(spark, batches):
    root = tempfile.mkdtemp(prefix="scd1_test_")
    apply, read_final = scd1_state_writer(
        root, ["user_id"], ["ts", "event_id"], tombstone_col="is_delete"
    )
    for epoch, rows in enumerate(batches):
        apply(spark.createDataFrame(rows, SCHEMA), epoch)
    return root, apply, read_final


def _state(spark, read_final):
    return {
        r.user_id: (r.event_id, r.value)
        for r in read_final(spark).select("user_id", "event_id", "value").collect()
    }


def test_batch_order_does_not_change_final_state(spark):
    _, _, read_fwd = _run(spark, [BATCH_A, BATCH_B])
    _, _, read_rev = _run(spark, [BATCH_B, BATCH_A])
    assert _state(spark, read_fwd) == EXPECTED
    assert _state(spark, read_rev) == EXPECTED


def test_epoch_replay_is_idempotent(spark):
    _, apply, read_final = _run(spark, [BATCH_A, BATCH_B])
    # Crash-replay the last epoch: same input, same epoch id.
    apply(spark.createDataFrame(BATCH_B, SCHEMA), 1)
    assert _state(spark, read_final) == EXPECTED


def test_tombstone_suppresses_late_older_upsert(spark):
    # The tombstone arrives FIRST; the older upsert lands in a later
    # micro-batch and must not resurrect the row.
    _, _, read_final = _run(
        spark,
        [
            [(2, 20, 7.0, _ts("2024-01-02 00:00:00"), True)],
            [(2, 21, 8.0, _ts("2024-01-01 00:00:00"), False)],
        ],
    )
    assert _state(spark, read_final) == {}


def test_epoch_gap_resolves_to_highest_prior_version(spark):
    # Epoch ids need not be contiguous (checkpoint reuse, skipped empty
    # batches): epoch 5 after epoch 0 must merge with v=0, not silently
    # reset state to the new batch alone.
    root = tempfile.mkdtemp(prefix="scd1_test_")
    apply, read_final = scd1_state_writer(
        root, ["user_id"], ["ts", "event_id"], tombstone_col="is_delete"
    )
    apply(spark.createDataFrame(BATCH_A, SCHEMA), 0)
    apply(spark.createDataFrame(BATCH_B, SCHEMA), 5)
    assert _state(spark, read_final) == EXPECTED


def test_missing_prior_state_raises_instead_of_resetting(spark):
    # epoch > 0 with NO state versions at all = checkpoint/state dir
    # mismatch; resetting the dimension from one batch would be silent
    # data loss.
    import pytest

    root = tempfile.mkdtemp(prefix="scd1_test_")
    apply, _ = scd1_state_writer(
        root, ["user_id"], ["ts", "event_id"], tombstone_col="is_delete"
    )
    with pytest.raises(RuntimeError, match="no prior state"):
        apply(spark.createDataFrame(BATCH_B, SCHEMA), 3)
