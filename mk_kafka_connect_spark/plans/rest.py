"""Driver-certifiable REST-source query: the A-surface (A1 paginated
scan, A3 sort, A4 limit/offset pagination, A7 keyed records + null-id
drop, A8 metadata, A17 per-entity fan-out) exercised END-TO-END through
the real ``paginated_rest`` Python DataSource against an in-process HTTP
server — not a mock of the source, the source itself doing real HTTP.

The server serves a deterministic slice of the events fixture as the
``{"response": [...]}`` envelope (ChargeOverApiClient.java:144-158), so
the DuckDB oracle can state the expected keyed records directly from the
same table. ``_ingestion_timestamp`` (wall-clock, Task.java:427) is
excluded from the certified projection.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

import uuid

from ..catalog import load_table
from ..sources.fake_server import FakeRestServer
from ..sources.rest_sink import register_sink
from ..sources.rest_source import register
from .registry import query

# One server per (process, sf_dir): queries are constructed lazily and
# evaluated after return, so the server must outlive the call — it parks
# on a daemon thread for the process lifetime (a few KB of fixture rows).
_SERVERS: dict[str, FakeRestServer] = {}


def _events_server(spark: SparkSession, sf_dir: str) -> FakeRestServer:
    if sf_dir in _SERVERS:
        return _SERVERS[sf_dir]
    rows = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_id") < 500)
        .select(
            "event_id",
            "event_type",
            "user_id",
            # The incremental field (A2/A11): second-truncated wall form,
            # lexicographically ordered == chronologically ordered.
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("mod_datetime"),
        )
        .orderBy("event_id")
        .collect()
    )
    data = [
        {
            "event_id": str(r["event_id"]),
            "event_type": r["event_type"],
            "user_id": str(r["user_id"]),
            "mod_datetime": r["mod_datetime"],
        }
        for r in rows
    ]
    # One keyless record: createSourceRecord drops it (Task.java:396-401);
    # the oracle row set proves it never surfaces.
    data.append({"event_type": "keyless", "user_id": "0"})
    srv = FakeRestServer({"events": data})
    srv.__enter__()
    _SERVERS[sf_dir] = srv
    return srv


@query(
    "rest_scan_events",
    # json.dumps(rec, sort_keys=True) with default separators — stated
    # literally; every served value is a string so the byte layout is
    # engine-independent.
    oracle="""
    SELECT 'events' AS entity,
      '{"event_id": "' || CAST(event_id AS VARCHAR) || '"}' AS key,
      '{"event_id": "' || CAST(event_id AS VARCHAR)
        || '", "event_type": "' || event_type
        || '", "mod_datetime": "' || strftime(ts, '%Y-%m-%d %H:%M:%S')
        || '", "user_id": "' || CAST(user_id AS VARCHAR) || '"}' AS payload,
      'INITIAL_LOAD' AS _load_mode
    FROM events WHERE event_id < 500
    """,
    tags=("rest", "source", "A1", "A4", "A7", "B3"),
)
def rest_scan_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The REST source end-to-end with a driver row: 500 fixture events
    served over real localhost HTTP in 100-row pages (5 paginated
    requests + the hasMore probe), read through the registered
    ``paginated_rest`` DataSource, keyed and metadata-stamped exactly as
    the reference's createSourceRecord — including dropping the planted
    keyless record. This promotes the A1/A4/A7 surface from
    pytest-contract evidence to the same hash-checked certification as
    every relational query."""
    srv = _events_server(spark, sf_dir)
    register(spark)
    df = (
        spark.read.format("paginated_rest")
        .option("url", srv.url)
        .option("entities", "events")
        .option("batch.size", "100")
        .option("entity.id.fields", "events:event_id")
        .load()
    )
    return df.select("entity", "key", "payload", "_load_mode")


@query(
    "rest_filter_pushdown",
    # The pushed window is exact on the lexicographically ordered
    # second-truncated datetime string, so the oracle is the same
    # envelope construction under the equivalent WHERE.
    oracle="""
    SELECT 'events' AS entity,
      '{"event_id": "' || CAST(event_id AS VARCHAR) || '"}' AS key,
      '{"event_id": "' || CAST(event_id AS VARCHAR)
        || '", "event_type": "' || event_type
        || '", "mod_datetime": "' || strftime(ts, '%Y-%m-%d %H:%M:%S')
        || '", "user_id": "' || CAST(user_id AS VARCHAR) || '"}' AS payload,
      'INITIAL_LOAD' AS _load_mode,
      strftime(ts, '%Y-%m-%d %H:%M:%S') AS _event_datetime
    FROM events
    WHERE event_id < 500
      AND strftime(ts, '%Y-%m-%d %H:%M:%S') >= '2024-01-01 00:30:00'
      AND strftime(ts, '%Y-%m-%d %H:%M:%S') < '2024-01-01 02:00:00'
    """,
    tags=("rest", "source", "pushdown", "A2", "A5", "B3", "B4"),
)
def rest_filter_pushdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Planner-level filter pushdown through the Python DataSource
    (Spark 4.1 ``pushFilters``, VERDICT r15 #2): a user-written
    ``.filter()`` on the ``paginated_rest`` relation — NOT an option —
    tightens the GTE/LT window in the HTTP fetch, the parity with the
    reference's own URL planner (``ApiClient.java:91-112``) that
    option-based windowing alone does not prove. The runtime guard
    asserts the fake server actually received the narrowed ``where=``:
    a silent pushdown regression (e.g. the feature flag going cold)
    would still return correct rows via Spark-side filtering, so row
    parity alone cannot certify the fetch narrowed."""
    lo, hi = "2024-01-01 00:30:00", "2024-01-01 02:00:00"
    srv = _events_server(spark, sf_dir)
    register(spark)
    df = (
        spark.read.format("paginated_rest")
        .option("url", srv.url)
        .option("entities", "events")
        .option("batch.size", "100")
        .option("entity.id.fields", "events:event_id")
        .load()
        .filter(
            (F.col("_event_datetime") >= lo) & (F.col("_event_datetime") < hi)
        )
    )
    out = df.select("entity", "key", "payload", "_load_mode", "_event_datetime")
    out.count()  # force one execution so the fetch log is populated
    import urllib.parse

    reqs = [urllib.parse.unquote(r).replace("\\:", ":") for r in srv.requests]
    assert any(
        f"GTE:{lo}" in r and f"LT:{hi}" in r for r in reqs
    ), "pushed datetime window never reached the HTTP fetch"
    return out


@query(
    "rest_stream_events",
    # Same expected rows as the batch scan: the first streaming drain's
    # half-open window [1970-01-01, batch-start-now) covers the whole
    # served range, mode INITIAL_LOAD (Task.java:117-129), and the
    # second micro-batch's window [now1, now2) is empty so the bounded
    # drain terminates.
    oracle="""
    SELECT 'events' AS entity,
      '{"event_id": "' || CAST(event_id AS VARCHAR) || '"}' AS key,
      '{"event_id": "' || CAST(event_id AS VARCHAR)
        || '", "event_type": "' || event_type
        || '", "mod_datetime": "' || strftime(ts, '%Y-%m-%d %H:%M:%S')
        || '", "user_id": "' || CAST(user_id AS VARCHAR) || '"}' AS payload,
      'INITIAL_LOAD' AS _load_mode
    FROM events WHERE event_id < 500
    """,
    tags=("rest", "source", "streaming", "A11", "A12", "B3", "B13"),
)
def rest_stream_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The STREAMING REST source end-to-end with a driver row: the
    ``paginated_rest`` SimpleDataSourceStreamReader drains the server
    through real micro-batches — frozen-upper-bound half-open windows,
    the 7-field EntityState offset dict, INITIAL→INCREMENTAL mode switch
    (ChargeOverSourceTask.java:245-291) — into a memory sink, and the
    result hash-matches the batch oracle. This is the reference's actual
    operating mode (stateful incremental scan driver) certified the same
    way as every relational query; the crash-replay and window-continuity
    contracts are additionally pinned in tests/test_incremental.py."""
    from ..streaming.windows import run_to_memory

    srv = _events_server(spark, sf_dir)
    register(spark)
    stream = (
        spark.readStream.format("paginated_rest")
        .option("url", srv.url)
        .option("entities", "events")
        .option("batch.size", "100")
        .option("entity.id.fields", "events:event_id")
        .option("initial.datetimes", "events:1970-01-01 00:00:00")
        .load()
        .select("entity", "key", "payload", "_load_mode")
    )
    return run_to_memory(stream, "append")


@query(
    "rest_roundtrip_events",
    # The sink posts row dicts; the source re-keys + re-wraps them with
    # sorted keys, so the expected payloads are identical to the scan's
    # (minus the dynamic entity name, which is excluded from the output).
    oracle="""
    SELECT
      '{"event_id": "' || CAST(event_id AS VARCHAR) || '"}' AS key,
      '{"event_id": "' || CAST(event_id AS VARCHAR)
        || '", "event_type": "' || event_type
        || '", "user_id": "' || CAST(user_id AS VARCHAR) || '"}' AS payload,
      'INITIAL_LOAD' AS _load_mode
    FROM events WHERE event_id < 200
    """,
    tags=("rest", "sink", "source", "A10", "A14", "B3"),
)
def rest_roundtrip_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sink→source ROUND TRIP through real HTTP: 200 fixture events are
    written through the registered ``rest_sink`` DataSource (batched
    50-row POSTs with the reference's retry contract — the write runs
    eagerly at plan-construction time, like IVF training), accumulate on
    the in-process server under a per-call entity name, and are read
    back through the ``paginated_rest`` source with the usual keying.
    The driver's hash check then certifies the WRITE path too: any
    dropped, duplicated, or mangled POST batch surfaces as a row-count
    or payload mismatch. A fresh entity per call keeps reruns
    independent (at-least-once sink + new namespace = exactly-once
    observable effect)."""
    srv = _events_server(spark, sf_dir)
    register(spark)
    register_sink(spark)
    entity = f"rt_{uuid.uuid4().hex[:10]}"
    (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_id") < 200)
        .select(
            F.col("event_id").cast("string").alias("event_id"),
            "event_type",
            F.col("user_id").cast("string").alias("user_id"),
        )
        .write.format("rest_sink")
        .option("url", srv.url)
        .option("entity", entity)
        .option("batch.size", "50")
        .mode("append")
        .save()
    )
    df = (
        spark.read.format("paginated_rest")
        .option("url", srv.url)
        .option("entities", entity)
        .option("batch.size", "100")
        .option("entity.id.fields", f"{entity}:event_id")
        .load()
    )
    return df.select("key", "payload", "_load_mode")


@query(
    "rest_stream_sink_e2e",
    # Same envelope expectations as the batch round trip: the streaming
    # write must deliver exactly the 200 source rows (no drops from an
    # epoch boundary, no duplicates from micro-batch replay) for the
    # read-back hash to match.
    oracle="""
    SELECT
      '{"event_id": "' || CAST(event_id AS VARCHAR) || '"}' AS key,
      '{"event_id": "' || CAST(event_id AS VARCHAR)
        || '", "event_type": "' || event_type
        || '", "user_id": "' || CAST(user_id AS VARCHAR) || '"}' AS payload,
      'INITIAL_LOAD' AS _load_mode
    FROM events WHERE event_id < 200
    """,
    tags=("rest", "sink", "streaming", "A10", "A12", "B13"),
)
def rest_stream_sink_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING sink→source round trip through real HTTP: 200 fixture
    events staged as a 4-file parquet stream (maxFilesPerTrigger=2 → 2
    micro-batches) are written through the ``rest_sink`` DataSource's
    DataSourceStreamWriter — per-task batched/throttled/retried POSTs
    plus a driver-side per-epoch commit marker to ``{entity}__commits``,
    the streaming analogue of the reference's offset flush
    (``Task.java:267-291``) — then read back through ``paginated_rest``
    with the usual keying. The runtime guard checks the marker log:
    every epoch's marker present, marked record counts summing to the
    source row count, so a silently dropped or double-committed epoch
    fails even before the row hash does. Scale: the data path is
    executor-side and epoch-incremental (state is one marker per epoch);
    a fresh entity namespace per call keeps reruns independent."""
    import shutil
    import tempfile

    srv = _events_server(spark, sf_dir)
    register(spark)
    register_sink(spark)
    entity = f"st_{uuid.uuid4().hex[:10]}"
    rows = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_id") < 200)
        .select(
            F.col("event_id").cast("string").alias("event_id"),
            "event_type",
            F.col("user_id").cast("string").alias("user_id"),
        )
    )
    n_src = rows.count()
    root = tempfile.mkdtemp(prefix="rest_stream_sink_")
    try:
        src = f"{root}/src"
        rows.repartition(4).write.mode("overwrite").parquet(src)
        stream = (
            spark.readStream.schema(
                "event_id string, event_type string, user_id string"
            )
            .option("maxFilesPerTrigger", 2)
            .parquet(src)
        )
        q = (
            stream.writeStream.format("rest_sink")
            .option("url", srv.url)
            .option("entity", entity)
            .option("batch.size", "50")
            .option("checkpointLocation", f"{root}/ckpt")
            .trigger(availableNow=True)
            .start()
        )
        if not q.awaitTermination(300):
            q.stop()
            raise TimeoutError("rest_stream_sink_e2e: streaming write stalled")
    finally:
        shutil.rmtree(root, ignore_errors=True)
    markers = list(srv.posted.get(f"{entity}__commits", []))
    assert markers, "no epoch commit markers were posted"
    assert sum(m["n_records"] for m in markers) == n_src, markers
    assert len({m["batch_id"] for m in markers}) == len(markers), markers
    df = (
        spark.read.format("paginated_rest")
        .option("url", srv.url)
        .option("entities", entity)
        .option("batch.size", "100")
        .option("entity.id.fields", f"{entity}:event_id")
        .load()
    )
    return df.select("key", "payload", "_load_mode")


@query(
    "kafka_file_roundtrip",
    # Spark's to_json emits no spaces; the key/value byte contracts are
    # stated literally. _ingestion_timestamp (wall clock) is serialized
    # into the value but excluded from the certified decode schema.
    oracle="""
    SELECT 'cdc.events' AS topic,
      '{"event_id":' || CAST(event_id AS VARCHAR) || '}' AS key,
      event_id, event_type, user_id,
      'events' AS _entity_type, 'INITIAL_LOAD' AS _load_mode
    FROM events WHERE event_id < 300
    """,
    tags=("kafka", "cdc", "A7", "A8", "A9", "A10", "B2"),
)
def kafka_file_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full Kafka record pipeline certified broker-lessly: keyed
    records (A7) → metadata enrichment (A8) → topic routing (A9) → the
    (topic, key, value) sink shape (A10) — written through the
    file-transport twin of ``write.format("kafka")`` (BINARY key/value in
    topic-partitioned parquet, the exact byte contract a broker would
    receive; eager at plan-construction time) and read back + JSON-decoded
    through the Kafka source column shape. A serialization, routing, or
    key-construction defect surfaces as a hash mismatch. The real broker
    path shares this byte contract and stays classpath-gated
    (sources/kafka.py); the files themselves are replayable into a live
    cluster."""
    import tempfile

    from ..operators.cdc import (
        enrich_metadata,
        keyed_records,
        route_topics,
        to_kafka_shape,
    )
    from ..sources.kafka import (
        decode_json_topic,
        read_kafka_files,
        write_kafka_files,
    )

    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_id") < 300)
        .select("event_id", "event_type", "user_id")
    )
    rec = to_kafka_shape(
        route_topics(
            enrich_metadata(keyed_records(ev, "event_id"), "events", "INITIAL_LOAD"),
            "cdc",
        )
    )
    path = tempfile.mkdtemp(prefix="kafka_files_")
    write_kafka_files(rec, path)
    back = read_kafka_files(spark, path, topic="cdc.events")
    decoded = decode_json_topic(
        back,
        "event_id long, event_type string, user_id long, "
        "_entity_type string, _load_mode string",
    )
    return decoded.select(
        "topic", "key", "event_id", "event_type", "user_id",
        "_entity_type", "_load_mode",
    )


@query(
    "cdc_pipeline_end_to_end",
    # Drained rows carry entity/key/payload/_load_mode plus the derived
    # _entity_type and routed topic; _ingestion_timestamp (wall clock) is
    # dropped by the SMT chain before the sink.
    oracle="""
    SELECT 'events' AS entity,
      '{"event_id": "' || CAST(event_id AS VARCHAR) || '"}' AS key,
      '{"event_id": "' || CAST(event_id AS VARCHAR)
        || '", "event_type": "' || event_type
        || '", "mod_datetime": "' || strftime(ts, '%Y-%m-%d %H:%M:%S')
        || '", "user_id": "' || CAST(user_id AS VARCHAR) || '"}' AS payload,
      'INITIAL_LOAD' AS _load_mode,
      'events' AS _entity_type,
      'cdc.events' AS topic
    FROM events WHERE event_id < 500
    """,
    tags=("rest", "cdc", "pipeline", "streaming", "B3", "B13", "composite"),
)
def cdc_pipeline_end_to_end(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The COMPLETE reference deployment as one certified run: a
    ``CdcPipeline`` (connector options + SMT chain + topic routing)
    streams the in-process REST server through real micro-batches into a
    CHECKPOINTED parquet sink — Structured Streaming's offset WAL +
    commit log standing in for Connect's offset storage
    (CO-README:70-86) — and the landed files are read back for the hash
    check. This certifies the one piece the per-stage queries don't: the
    exactly-once file-sink commit of the streaming drain. Fresh
    sink/checkpoint dirs per call keep reruns independent."""
    import tempfile

    from ..pipeline import CdcPipeline

    srv = _events_server(spark, sf_dir)
    pipe = CdcPipeline(
        source_options={
            "url": srv.url,
            "entities": "events",
            "batch.size": "100",
            "entity.id.fields": "events:event_id",
            "initial.datetimes": "events:1970-01-01 00:00:00",
        },
        transform_chain=[
            {"name": "drop_fields", "fields": ["_ingestion_timestamp"]},
        ],
        topic_prefix="cdc",
    )
    path = tempfile.mkdtemp(prefix="cdc_sink_")
    ckpt = tempfile.mkdtemp(prefix="cdc_ckpt_")
    pipe.run_stream_to_parquet(spark, path, ckpt)
    return spark.read.parquet(path).select(
        "entity", "key", "payload", "_load_mode", "_entity_type", "topic"
    )


@query(
    "rest_retry_backoff_e2e",
    # The constants restate the scripted failure schedule (two 500s,
    # then one 429, then clean pages) and the reference's recovery
    # arithmetic; the count/checksum prove the retried fetch still
    # delivered every record exactly once.
    oracle="""
    SELECT 'events' AS entity,
      CAST(count(*) AS BIGINT) AS n_records,
      CAST(sum(event_id) AS BIGINT) AS id_checksum,
      CAST(7 AS BIGINT) AS n_requests,
      CAST(2 AS BIGINT) AS n_failed_retried,
      CAST(1 AS BIGINT) AS n_rate_limited,
      CAST(3 AS BIGINT) AS backoff_base_s,
      CAST(60 AS BIGINT) AS rate_limit_wait_s
    FROM events WHERE event_id < 300
    """,
    tags=("rest", "A14", "retry", "backoff", "B3"),
)
def rest_retry_backoff_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A14 retry/backoff/429 recovery END-TO-END with a driver row — the
    one §2.A surface whose correctness was pytest-only: a dedicated
    in-process HTTP server is armed to answer the first two requests
    with HTTP 500 and the third with HTTP 429, and the reference's
    recovery loop (``Task.java:294-343``) must fetch THROUGH the
    failures: attempt 0 → 500 → exponential backoff 2^0×1 s (+10%
    jitter), attempt 1 → 500 → 2^1×1 s, attempt 2 → 429 → the fixed
    60 s rate-limit wait (``Task.java:314-324``), attempt 3 → clean —
    then 3 full pages + the has-more probe complete the pagination
    loop. The emitted audit row pins the recovery arithmetic as
    integers (floor of each backoff strips the jitter; the 429 wait is
    exact) plus the request count, and the record count/id-checksum
    prove the retried window was delivered complete, exactly once —
    the no-data-ever-skipped contract (CO-README:512-525).

    The fetch itself is the reference's DRIVER loop (task-side HTTP,
    bounded pages), not a distributed scan — the DataSource path is
    certified by ``rest_scan_events``; this query certifies the A14
    arithmetic at registry level. Sleeps are captured, never slept."""
    import random

    from ..sources.fake_server import FakeRestServer
    from ..sources.rest_client import RestClient

    key = f"{sf_dir}::retry"
    if key not in _SERVERS:
        rows = (
            load_table(spark, sf_dir, "events")
            .filter(F.col("event_id") < 300)
            .select("event_id", "event_type")
            .orderBy("event_id")
            .collect()
        )
        srv = FakeRestServer(
            {
                "events": [
                    {
                        "event_id": str(r["event_id"]),
                        "event_type": r["event_type"],
                    }
                    for r in rows
                ]
            }
        )
        srv.__enter__()
        _SERVERS[key] = srv
    srv = _SERVERS[key]

    sleeps: list[float] = []
    client = RestClient(
        srv.url,
        max_retries=3,
        sleeper=sleeps.append,
        rng=random.Random(42),
    )
    start = len(srv.requests)
    srv.fail_next(2)
    srv.rate_limit_next(1)
    n_records = 0
    id_checksum = 0
    for _offset, page in client.fetch_all("events", "mod_datetime", None, None, 100):
        for rec in page.records:
            n_records += 1
            id_checksum += int(rec["event_id"])
    n_requests = len(srv.requests) - start
    rate_limited = [s for s in sleeps if s >= 60.0]
    backoff = [s for s in sleeps if s < 60.0]
    row = (
        "events",
        n_records,
        id_checksum,
        n_requests,
        len(backoff),
        len(rate_limited),
        int(sum(int(s) for s in backoff)),
        int(rate_limited[0]) if rate_limited else 0,
    )
    return spark.createDataFrame(
        [row],
        "entity string, n_records long, id_checksum long, n_requests long,"
        " n_failed_retried long, n_rate_limited long, backoff_base_s long,"
        " rate_limit_wait_s long",
    )


@query(
    "rest_config_fanout_probe",
    # The constants restate the parsed config and the validation/probe
    # verdicts; the per-entity counts/checksums come from the fixture —
    # together they certify parse → validate → probe → fan-out → read.
    oracle="""
    SELECT 'events,customers' AS entities_csv,
      'custkey' AS id_field_customers,
      'event_id' AS id_field_events,
      'mod_datetime' AS dt_field_events,
      '1970-01-01 00:00:00' AS initial_dt_events,
      CAST(100 AS BIGINT) AS batch_size,
      TRUE AS rejects_batch_600,
      TRUE AS rejects_malformed_map,
      TRUE AS rejects_bad_datetime,
      TRUE AS conn_ok,
      TRUE AS conn_dead_fails,
      (SELECT CAST(count(*) AS BIGINT) FROM events WHERE event_id < 200)
        AS n_events,
      (SELECT CAST(sum(event_id) AS BIGINT) FROM events WHERE event_id < 200)
        AS sum_event_ids,
      (SELECT CAST(count(*) AS BIGINT) FROM customer WHERE c_custkey < 150)
        AS n_customers,
      (SELECT CAST(sum(c_custkey) AS BIGINT) FROM customer
        WHERE c_custkey < 150) AS sum_custkeys
    """,
    tags=("rest", "A16", "A17", "A18", "B3", "config"),
)
def rest_config_fanout_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A16 + A17 + A18 with a driver row — the last §2.A surfaces whose
    correctness evidence was pytest-only, certified as one composite:

    * **A18 config parsing** (Config.java:29-94): a FULL connector
      option map parses through ``RestSourceConfig.from_options`` — CSV
      entity list, FIRST-colon entity maps (the initial-datetime value
      itself contains colons, so a naive split corrupts it), per-entity
      id/datetime-field defaults — and the parsed values are emitted
      verbatim. Validation is certified by REJECTION: batch.size 600
      (outside Range.between(1,500), Config.java:53-58), a malformed
      colon-less entity map, and a non-``YYYY-MM-DD HH:MM:SS`` initial
      datetime must each raise, and the booleans say they did.
    * **A16 connection test** (ApiClient.java:185-209): the one-row
      probe returns True against the live in-process server and False
      against a dead port — both outcomes exercised.
    * **A17 task fan-out** (one task/partition per entity): BOTH
      entities read through ONE ``paginated_rest`` load; the per-entity
      counts and id checksums prove each entity's partition scanned its
      own slice completely and nothing leaked across.

    Scale shape: bounded probe + two bounded entity scans; the
    DataSource path's distributed posture is certified by
    ``rest_scan_events`` — this row certifies the CONFIG surface."""
    from ..sources.config import RestSourceConfig
    from ..sources.rest_client import RestClient

    key = f"{sf_dir}::config_probe"
    if key not in _SERVERS:
        ev = (
            load_table(spark, sf_dir, "events")
            .filter(F.col("event_id") < 200)
            .select(
                "event_id",
                "event_type",
                # The incremental field: the configured initial datetime
                # opens a half-open window on it (A2/A11), so the served
                # records must carry it or the window filters them out.
                F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias(
                    "mod_datetime"
                ),
            )
            .orderBy("event_id")
            .collect()
        )
        cu = (
            load_table(spark, sf_dir, "customer")
            .filter(F.col("c_custkey") < 150)
            .select("c_custkey", "c_name")
            .orderBy("c_custkey")
            .collect()
        )
        srv = FakeRestServer(
            {
                "events": [
                    {
                        "event_id": str(r["event_id"]),
                        "event_type": r["event_type"],
                        "mod_datetime": r["mod_datetime"],
                    }
                    for r in ev
                ],
                "customers": [
                    {"custkey": str(r["c_custkey"]), "name": r["c_name"]}
                    for r in cu
                ],
            }
        )
        srv.__enter__()
        _SERVERS[key] = srv
    srv = _SERVERS[key]

    options = {
        "url": srv.url,
        "entities": "events,customers",
        "batch.size": "100",
        "entity.id.fields": "events:event_id,customers:custkey",
        "initial.datetimes": "events:1970-01-01 00:00:00",
    }
    cfg = RestSourceConfig.from_options(options)

    def rejects(**bad) -> bool:
        try:
            RestSourceConfig.from_options({**options, **bad})
            return False
        except ValueError:
            return True

    conn_ok = RestClient(srv.url).test_connection()
    conn_dead = RestClient("http://127.0.0.1:9").test_connection()

    register(spark)
    fetched = (
        spark.read.format("paginated_rest")
        .options(**options)
        .load()
        .select(
            "entity",
            F.get_json_object("key", "$.event_id").cast("long").alias("eid"),
            F.get_json_object("key", "$.custkey").cast("long").alias("cid"),
        )
        .groupBy("entity")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("eid").alias("se"),
            F.sum("cid").alias("sc"),
        )
    )
    by_entity = {r.entity: r for r in fetched.collect()}
    row = (
        ",".join(cfg.entities),
        cfg.id_field("customers"),
        cfg.id_field("events"),
        cfg.datetime_field("events"),
        cfg.initial_datetimes["events"],
        cfg.batch_size,
        rejects(**{"batch.size": "600"}),
        rejects(**{"entity.id.fields": "events_no_colon"}),
        rejects(**{"initial.datetimes": "events:yesterday"}),
        conn_ok,
        not conn_dead,
        by_entity["events"].n,
        by_entity["events"].se,
        by_entity["customers"].n,
        by_entity["customers"].sc,
    )
    return spark.createDataFrame(
        [row],
        "entities_csv string, id_field_customers string,"
        " id_field_events string, dt_field_events string,"
        " initial_dt_events string, batch_size long,"
        " rejects_batch_600 boolean, rejects_malformed_map boolean,"
        " rejects_bad_datetime boolean, conn_ok boolean,"
        " conn_dead_fails boolean, n_events long, sum_event_ids long,"
        " n_customers long, sum_custkeys long",
    )
