"""Fixture-drift tripwires (VERDICT r6 item 2 / ADVICE r6 item 1).

Round 5 lost 17 driver rows to a silent fixture-format change: events.ts
flipped from TIMESTAMP(NANOS) to naive timestamp[us], and µs epochs divided
as nanos collapse into 1970 — plausible-looking timestamps, wrong answers.
These tests make that class structurally impossible:

* the loaded events table's ts range must land in the fixture's documented
  epoch band (Jan 2024; FIXTURES.md §1a) — a unit mix-up lands in 1970 or
  past year 3000, never inside the band;
* a raw-int64 ts column whose magnitude is NOT nanoseconds must raise, not
  divide.
"""

from __future__ import annotations

import datetime as dt
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from mk_kafka_connect_spark.catalog import load_table, probe_events_ts

import pyspark.sql.functions as F

SF_DIR = "/root/testdata/sf0.001"

# Generous band around the documented Jan-2024 fixture range: wide enough to
# survive a driver regeneration that shifts the simulated month, narrow
# enough that any unit mix-up (µs-as-ns → 1970, ns-as-µs → year ~56k) trips.
BAND_LO = dt.datetime(2020, 1, 1)
BAND_HI = dt.datetime(2030, 1, 1)


def _write_events(tmp_path, ts_array: pa.Array) -> str:
    table = pa.table(
        {"event_id": pa.array(range(len(ts_array)), pa.int64()), "ts": ts_array}
    )
    path = os.path.join(tmp_path, "events.parquet")
    pq.write_table(table, path)
    return path


def test_loaded_events_ts_in_documented_epoch_band(spark):
    row = (
        load_table(spark, SF_DIR, "events")
        .agg(F.min("ts").alias("lo"), F.max("ts").alias("hi"))
        .first()
    )
    assert BAND_LO <= row["lo"] <= row["hi"] < BAND_HI, (
        f"events.ts range [{row['lo']}, {row['hi']}] outside the documented "
        f"fixture band [{BAND_LO}, {BAND_HI}) — fixture format drift (unit "
        "mix-up?); see FIXTURES.md §1a"
    )


def test_current_fixture_probe_classification():
    kind = probe_events_ts(os.path.join(SF_DIR, "events.parquet"))
    assert kind in ("nanos", "us_naive", "us_utc")


def test_int64_nanos_magnitude_accepted(spark, tmp_path):
    ns_2024 = int(dt.datetime(2024, 1, 15).timestamp() * 1_000_000_000)
    _write_events(tmp_path, pa.array([ns_2024, ns_2024 + 10**9], pa.int64()))
    assert probe_events_ts(os.path.join(tmp_path, "events.parquet")) == "nanos"
    df = load_table(spark, str(tmp_path), "events")
    got = sorted(r["ts"] for r in df.select("ts").collect())
    assert got[0] == dt.datetime(2024, 1, 15)
    assert got[1] == dt.datetime(2024, 1, 15, 0, 0, 1)


@pytest.mark.parametrize(
    "unit,factor",
    [("micros", 1_000_000), ("millis", 1_000), ("seconds", 1)],
)
def test_int64_non_nanos_magnitude_raises(spark, tmp_path, unit, factor):
    # The r5 silent-wrong-answer: int64 µs (or ms/s) epochs divided as
    # nanos yield 1970-adjacent timestamps. Must raise, never guess.
    epoch = int(dt.datetime(2024, 1, 15).timestamp()) * factor
    _write_events(tmp_path, pa.array([epoch, epoch + factor], pa.int64()))
    with pytest.raises(TypeError, match="not nanosecond epochs"):
        probe_events_ts(os.path.join(tmp_path, "events.parquet"))
    with pytest.raises(TypeError, match="not nanosecond epochs"):
        load_table(spark, str(tmp_path), "events")


def test_naive_micros_fixture_normalizes_to_utc_timestamp(spark, tmp_path):
    ts = pa.array(
        [dt.datetime(2024, 1, 15, 12, 30), dt.datetime(2024, 1, 16)],
        pa.timestamp("us"),
    )
    _write_events(tmp_path, ts)
    assert probe_events_ts(os.path.join(tmp_path, "events.parquet")) == "us_naive"
    df = load_table(spark, str(tmp_path), "events")
    assert df.schema["ts"].dataType.typeName() == "timestamp"
    got = sorted(r["ts"] for r in df.select("ts").collect())
    assert got == [dt.datetime(2024, 1, 15, 12, 30), dt.datetime(2024, 1, 16)]


def test_unknown_ts_type_raises(tmp_path):
    _write_events(tmp_path, pa.array(["2024-01-15"], pa.string()))
    with pytest.raises(TypeError, match="unexpected parquet type"):
        probe_events_ts(os.path.join(tmp_path, "events.parquet"))


def test_directory_parquet_events_probe_and_load(spark, tmp_path):
    """Spark writes datasets as part-file DIRECTORIES; the footer probe
    must handle that layout (probe the first part) so the engine can read
    its own event output back — the 20x scale probe hit this."""
    src = load_table(spark, "/root/testdata/sf0.001", "events")
    out = os.path.join(tmp_path, "events.parquet")
    src.limit(50).repartition(3).write.parquet(out)
    assert probe_events_ts(out) in ("nanos", "us_utc", "us_naive")
    df = load_table(spark, str(tmp_path), "events")
    assert df.schema["ts"].dataType.typeName() == "timestamp"
    assert df.count() == 50
