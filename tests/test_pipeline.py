"""End-to-end pipeline test: fake REST API → paginated_rest source →
transform chain → routed records → partitioned parquet, batch AND
streaming — the full reference deployment in one config object."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from mk_kafka_connect_spark.pipeline import CdcPipeline

from .fake_rest_server import FakeRestServer


def _rows(entity: str, n: int):
    return [
        {
            "id": i,
            "name": f"{entity}-{i}",
            "amount": i * 1.5,
            "mod_datetime": f"2024-01-01 00:00:{i % 60:02d}",
        }
        for i in range(n)
    ]


def _pipeline(url: str) -> CdcPipeline:
    return CdcPipeline(
        source_options={
            "url": url,
            "entities": "customer,invoice",
            "batch.size": "7",
        },
        transform_chain=[
            # SMT-chain parity: stringify then rename, in config order.
            {"name": "string_cast", "fields": ["_ingestion_timestamp"]},
            {"name": "rename", "mapping": {"payload": "value"}},
        ],
        topic_prefix="mk.chargeover",
    )


def test_batch_pipeline_to_parquet(spark, tmp_path):
    with FakeRestServer({"customer": _rows("customer", 17), "invoice": _rows("invoice", 3)}) as srv:
        p = _pipeline(srv.url)
        total = p.run_batch_to_parquet(spark, str(tmp_path / "out"))
    assert total == 20
    back = spark.read.parquet(str(tmp_path / "out"))
    assert set(r._entity_type for r in back.select("_entity_type").distinct().collect()) == {
        "customer", "invoice",
    }
    row = back.filter("_entity_type = 'customer'").first()
    assert row.topic == "mk.chargeover.customer"
    assert json.loads(row.value)["name"].startswith("customer-")
    # string_cast SMT applied: epoch-ms long became its JSON string form
    assert isinstance(row._ingestion_timestamp, str)


def test_stream_pipeline_to_parquet(spark, tmp_path):
    with FakeRestServer({"customer": _rows("customer", 9), "invoice": _rows("invoice", 2)}) as srv:
        p = CdcPipeline(
            source_options={
                "url": srv.url,
                "entities": "customer,invoice",
                "batch.size": "4",
                "initial.datetimes": "customer:2024-01-01 00:00:00,invoice:2024-01-01 00:00:00",
            },
            topic_prefix="mk.chargeover",
        )
        p.run_stream_to_parquet(
            spark, str(tmp_path / "out"), str(tmp_path / "ckpt"), timeout_s=120
        )
    back = spark.read.parquet(str(tmp_path / "out"))
    assert back.count() == 11
    assert back.filter(F.col("topic").startswith("mk.chargeover.")).count() == 11


def test_kafka_shape(spark):
    with FakeRestServer({"customer": _rows("customer", 2), "invoice": []}) as srv:
        p = _pipeline(srv.url)
        shaped = p.kafka_shaped(spark)
        rows = shaped.collect()
    assert shaped.columns == ["topic", "key", "value"]
    assert all(json.loads(r.value)["_entity_type"] == "customer" for r in rows)


def test_kafka_files_roundtrip_byte_parity(spark, tmp_path):
    """Broker-less end-to-end: REST → CDC envelope → to_kafka_shape →
    binary topic-partitioned files → Kafka-source-shaped read →
    decode_json_topic. Asserts the BYTE contract of
    ChargeOverSourceTask.java:434-443: key = JSON {id_field: id} bytes,
    value = full-record JSON bytes, topic = {prefix}.{entity}."""
    from mk_kafka_connect_spark.sources.kafka import (
        decode_json_topic,
        read_kafka_files,
        write_kafka_files,
    )

    def _mask_ts(value_bytes: bytes) -> bytes:
        # _ingestion_timestamp is stamped per evaluation (wall clock); mask
        # it so the two materializations compare on every OTHER byte.
        d = json.loads(value_bytes)
        d["_ingestion_timestamp"] = "X"
        return json.dumps(d, sort_keys=True).encode()

    with FakeRestServer({"customer": _rows("customer", 3)}) as srv:
        p = _pipeline(srv.url)
        shaped = p.kafka_shaped(spark)
        original = {
            bytes(r.key, "utf-8"): _mask_ts(bytes(r.value, "utf-8"))
            for r in shaped.collect()
        }
        write_kafka_files(shaped, str(tmp_path / "topics"))

    back = read_kafka_files(spark, str(tmp_path / "topics"))
    rows = back.collect()
    assert len(rows) == 3
    assert {r.topic for r in rows} == {"mk.chargeover.customer"}
    # keys byte-exact; values byte-exact modulo the wall-clock stamp:
    assert {bytes(r.key): _mask_ts(bytes(r.value)) for r in rows} == original

    decoded = decode_json_topic(
        back, "entity STRING, value STRING, _entity_type STRING, _load_mode STRING"
    )
    got = decoded.collect()
    # the schemaless record payload is the nested JSON string (the
    # reference's Map<String,Object> posture):
    assert {json.loads(r.value)["id"] for r in got} == {0, 1, 2}
    assert all(r._entity_type == "customer" for r in got)
    assert all(r._load_mode == "INITIAL_LOAD" for r in got)
    # raw value survives for late-bound access:
    assert all(
        json.loads(json.loads(r.raw_value)["value"])["name"].startswith("customer-")
        for r in got
    )

    # topic filter prunes to the same rows
    assert read_kafka_files(
        spark, str(tmp_path / "topics"), topic="mk.chargeover.customer"
    ).count() == 3
