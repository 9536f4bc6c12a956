"""Watermark late-data-drop semantics (SURVEY.md §2.B B13).

The reference never drops late data — its next poll re-covers the range
(CO-README:512-525). The engine's streaming surface instead uses event-time
watermarks. Spark's exact contract (3.4+, SPARK-42376 two-watermark design
for chained stateful operators): a batch ADMITS rows against the previous
batch's watermark and EVICTS/emits state against the current one — so a
late record is dropped once it is older than the watermark as of the
*prior* batch, and an append-mode window is emitted exactly once, when the
eviction watermark passes its end. The bounded fixture replays are in-order
and never exercise the drop path; this test feeds three explicit
micro-batches (maxFilesPerTrigger=1 + AvailableNow) with late events in
batches 2 and 3 and pins both admission and drop.
"""

from __future__ import annotations

import datetime as dt
import os
import tempfile
import time
import uuid

import pyarrow as pa
import pyarrow.parquet as pq
import pyspark.sql.functions as F
from pyspark.sql import types as T


def _write(path: str, stamps: list[dt.datetime], mtime: float) -> None:
    pq.write_table(pa.table({"ts": pa.array(stamps, pa.timestamp("us"))}), path)
    os.utime(path, (mtime, mtime))


def test_watermark_drops_late_event_and_finalizes_windows(spark, tmp_path):
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    src = tmp_path / "stream_src"
    src.mkdir()
    now = time.time()
    # Batch 1: 10:05, 10:50, 11:00 → watermark after the batch: 10:30.
    _write(
        str(src / "f1.parquet"),
        [
            dt.datetime(2024, 1, 1, 10, 5),
            dt.datetime(2024, 1, 1, 10, 50),
            dt.datetime(2024, 1, 1, 11, 0),
        ],
        now - 120,
    )
    # Batch 2: on-time 11:30 + late 08:30. Admission still checks the
    # PREVIOUS watermark (epoch), so 08:30 is admitted — and its [08:00,
    # 09:00) window is immediately evicted and emitted by this batch's
    # 10:30 eviction watermark. Watermark after the batch: 11:00.
    _write(
        str(src / "f2.parquet"),
        [dt.datetime(2024, 1, 1, 11, 30), dt.datetime(2024, 1, 1, 8, 30)],
        now - 60,
    )
    # Batch 3: on-time 12:30 + late 08:45. NOW the admission watermark is
    # 10:30 > 08:45 — the row must be DROPPED (no second [08:00, 09:00)
    # output row, no resurrection of evicted state).
    _write(
        str(src / "f3.parquet"),
        [dt.datetime(2024, 1, 1, 12, 30), dt.datetime(2024, 1, 1, 8, 45)],
        now,
    )

    stream = (
        spark.readStream.schema(T.StructType([T.StructField("ts", T.TimestampType())]))
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    agg = (
        stream.withWatermark("ts", "30 minutes")
        .groupBy(F.window("ts", "1 hour"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("window.start").alias("wstart"), "n")
    )
    name = f"wm_{uuid.uuid4().hex[:12]}"
    q = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", tempfile.mkdtemp(prefix="ckpt_wm_"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    dropped = sum(
        op.get("numRowsDroppedByWatermark", 0)
        for p in q.recentProgress
        for op in p["stateOperators"]
    )
    assert dropped == 1, f"expected exactly the 08:45 row dropped, got {dropped}"

    rows = sorted((r["wstart"], r["n"]) for r in spark.table(name).collect())
    # [08:00): only the batch-2 late event (admitted once, emitted once —
    # 08:45 did NOT produce a duplicate window row). [10:00): the two
    # 10:xx events. [11:00): 11:00 + 11:30, finalized by the batch-3
    # watermark (12:00). [12:00): still open — not emitted.
    assert rows == [
        (dt.datetime(2024, 1, 1, 8, 0), 1),
        (dt.datetime(2024, 1, 1, 10, 0), 2),
        (dt.datetime(2024, 1, 1, 11, 0), 2),
    ], rows
