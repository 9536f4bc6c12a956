"""Contract tests for the streaming SCD-2 history writer
(streaming/sinks.py::scd2_state_writer): batch-order invariance (late
changes splice into existing chains), replay idempotence, epoch-gap
resolution, and the missing-prior-state error."""

from __future__ import annotations

import datetime
import tempfile

import pytest

from mk_kafka_connect_spark.streaming.sinks import scd2_state_writer

SCHEMA = "user_id long, event_id long, value double, ts timestamp"


def _ts(s):
    return datetime.datetime.fromisoformat(s)


# Two users; user 1's changes are split across batches OUT of time order,
# so the later batch must splice a version into the middle of the chain.
BATCH_A = [
    (1, 10, 1.0, _ts("2024-01-01 00:00:00")),
    (1, 12, 3.0, _ts("2024-01-03 00:00:00")),
    (2, 20, 5.0, _ts("2024-01-02 00:00:00")),
]
BATCH_B = [
    (1, 11, 2.0, _ts("2024-01-02 00:00:00")),  # splices between 10 and 12
]
# (event_id -> (valid_from, valid_to, is_current))
EXPECTED = {
    10: ("2024-01-01 00:00:00", "2024-01-02 00:00:00", False),
    11: ("2024-01-02 00:00:00", "2024-01-03 00:00:00", False),
    12: ("2024-01-03 00:00:00", None, True),
    20: ("2024-01-02 00:00:00", None, True),
}


def _run(spark, batches, epochs=None):
    root = tempfile.mkdtemp(prefix="scd2_test_")
    apply, read_final = scd2_state_writer(root, ["user_id"], "ts", "event_id")
    for epoch, rows in zip(epochs or range(len(batches)), batches):
        apply(spark.createDataFrame(rows, SCHEMA), epoch)
    return apply, read_final


def _hist(spark, read_final):
    out = {}
    for r in read_final(spark).collect():
        out[r.event_id] = (
            r.valid_from.strftime("%Y-%m-%d %H:%M:%S"),
            r.valid_to.strftime("%Y-%m-%d %H:%M:%S") if r.valid_to else None,
            r.is_current,
        )
    return out


def test_late_change_splices_into_chain(spark):
    _, read_final = _run(spark, [BATCH_A, BATCH_B])
    assert _hist(spark, read_final) == EXPECTED


def test_batch_order_does_not_change_history(spark):
    _, read_fwd = _run(spark, [BATCH_A, BATCH_B])
    _, read_rev = _run(spark, [BATCH_B, BATCH_A])
    assert _hist(spark, read_fwd) == _hist(spark, read_rev) == EXPECTED


def test_epoch_replay_is_idempotent(spark):
    apply, read_final = _run(spark, [BATCH_A, BATCH_B])
    apply(spark.createDataFrame(BATCH_B, SCHEMA), 1)  # crash-replay epoch 1
    assert _hist(spark, read_final) == EXPECTED


def test_epoch_gap_resolves_to_highest_prior_version(spark):
    _, read_final = _run(spark, [BATCH_A, BATCH_B], epochs=[0, 7])
    assert _hist(spark, read_final) == EXPECTED


def test_missing_prior_state_raises_instead_of_resetting(spark):
    root = tempfile.mkdtemp(prefix="scd2_test_")
    apply, _ = scd2_state_writer(root, ["user_id"], "ts", "event_id")
    with pytest.raises(RuntimeError, match="no prior state"):
        apply(spark.createDataFrame(BATCH_B, SCHEMA), 4)


def test_additive_agg_writer_order_invariant_and_gap_tolerant(spark):
    import tempfile

    from mk_kafka_connect_spark.streaming.sinks import additive_agg_state_writer

    SCH = "k long, v double"
    b1 = [(1, 10.0), (1, 2.5), (2, 1.0)]
    b2 = [(1, 0.5), (3, 7.0)]

    def run(batches, epochs):
        root = tempfile.mkdtemp(prefix="ivm_test_")
        apply, read_final = additive_agg_state_writer(root, ["k"], {"s": "v"})
        for e, rows in zip(epochs, batches):
            apply(spark.createDataFrame(rows, SCH), e)
        return {
            r.k: (r.n_rows, float(r.s))
            for r in read_final(spark).collect()
        }

    want = {1: (3, 13.0), 2: (1, 1.0), 3: (1, 7.0)}
    assert run([b1, b2], [0, 1]) == want
    assert run([b2, b1], [0, 1]) == want  # arrival order irrelevant
    assert run([b1, b2], [0, 9]) == want  # epoch gap resolves to max prior

    import pytest as _pytest

    root = tempfile.mkdtemp(prefix="ivm_test_")
    apply, _ = additive_agg_state_writer(root, ["k"], {"s": "v"})
    with _pytest.raises(RuntimeError, match="no prior"):
        apply(spark.createDataFrame(b1, SCH), 2)


def test_prune_state_versions_keeps_replay_target(spark):
    import os
    import tempfile

    from mk_kafka_connect_spark.streaming.sinks import (
        prune_state_versions,
        scd1_state_writer,
    )

    root = tempfile.mkdtemp(prefix="prune_test_")
    apply, read_final = scd1_state_writer(
        root, ["user_id"], ["ts", "event_id"], tombstone_col="is_delete"
    )
    sch = "user_id long, event_id long, value double, ts timestamp, is_delete boolean"
    for e in range(5):
        apply(
            spark.createDataFrame(
                [(1, e, float(e), _ts(f"2024-01-0{e + 1} 00:00:00"), False)], sch
            ),
            e,
        )
    pruned = prune_state_versions(root, keep_last=2)
    assert pruned == [0, 1, 2]
    assert sorted(os.listdir(root)) == ["v=3", "v=4"]
    # Live state unaffected...
    assert {r.user_id: r.event_id for r in read_final(spark).collect()} == {1: 4}
    # ...and a crash-replay of the LAST epoch still resolves (v=3 kept).
    apply(
        spark.createDataFrame(
            [(1, 4, 4.0, _ts("2024-01-05 00:00:00"), False)], sch
        ),
        4,
    )
    assert {r.user_id: r.event_id for r in read_final(spark).collect()} == {1: 4}

    import pytest as _pytest

    with _pytest.raises(ValueError, match="keep_last"):
        prune_state_versions(root, keep_last=1)
