"""Kafka source/sink wrappers (SURVEY.md §2.B B2) — the engine-side form
of the reference's topic surface (``{topic.prefix}.{entity}`` routing,
schemaless JSON key/value; ``ChargeOverSourceTask.java:418-443``).

The connector jar (spark-sql-kafka) and a broker are not present in this
environment, so every entry point first probes availability and raises a
clear error instead of a deep ClassNotFound — the wiring itself (options,
projections, checkpointing) is exercised by unit tests against the
wrapper's plan-building surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = [
    "kafka_available",
    "read_kafka_batch",
    "read_kafka_stream",
    "write_kafka_batch",
    "write_kafka_stream",
    "write_kafka_files",
    "read_kafka_files",
    "decode_json_topic",
]


def kafka_available(spark: SparkSession) -> bool:
    """True when the spark-sql-kafka data source is on the classpath."""
    try:
        spark._jvm.java.lang.Class.forName(  # noqa: SLF001
            "org.apache.spark.sql.kafka010.KafkaSourceProvider"
        )
        return True
    except Exception:  # noqa: BLE001
        return False


def _require_kafka(spark: SparkSession) -> None:
    if not kafka_available(spark):
        raise RuntimeError(
            "Kafka connector not on classpath: add the spark-sql-kafka-0-10 "
            "package (--packages org.apache.spark:spark-sql-kafka-0-10_2.13:<ver>)"
        )


def read_kafka_batch(
    spark: SparkSession, bootstrap: str, topics: str, starting: str = "earliest"
) -> DataFrame:
    _require_kafka(spark)
    return (
        spark.read.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap)
        .option("subscribe", topics)
        .option("startingOffsets", starting)
        .load()
    )


def read_kafka_stream(
    spark: SparkSession,
    bootstrap: str,
    topics: str,
    starting: str = "latest",
    max_offsets_per_trigger: int | None = None,
) -> DataFrame:
    _require_kafka(spark)
    r = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap)
        .option("subscribe", topics)
        .option("startingOffsets", starting)
    )
    if max_offsets_per_trigger:  # the engine's maxRecordsPerBatch knob
        r = r.option("maxOffsetsPerTrigger", str(max_offsets_per_trigger))
    return r.load()


def write_kafka_batch(df: DataFrame, bootstrap: str) -> None:
    """Batch produce; ``df`` must already be Kafka-shaped (topic, key,
    value — see operators/cdc.py to_kafka_shape)."""
    _require_kafka(df.sparkSession)
    (
        df.write.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap)
        .save()
    )


def write_kafka_stream(
    df: DataFrame, bootstrap: str, checkpoint: str, trigger_available_now: bool = False
):
    _require_kafka(df.sparkSession)
    w = (
        df.writeStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap)
        .option("checkpointLocation", checkpoint)
    )
    if trigger_available_now:
        w = w.trigger(availableNow=True)
    return w.start()


def write_kafka_files(df: DataFrame, path: str) -> None:
    """Broker-less Kafka-shaped sink: persist (topic, key, value) as
    BINARY columns in topic-partitioned parquet — the same byte contract
    ``write.format("kafka")`` would produce (key/value byte arrays,
    ``ChargeOverSourceTask.java:434-443``), so pipelines and tests
    exercise real serialization end-to-end without a broker, and the
    files can be replayed into a real cluster later. Partitioning by
    topic mirrors topic routing and gives partition pruning on read."""
    (
        df.select(
            F.col("topic"),
            F.col("key").cast("binary").alias("key"),
            F.col("value").cast("binary").alias("value"),
            F.current_timestamp().alias("timestamp"),
        )
        .write.mode("append")
        .partitionBy("topic")
        .parquet(path)
    )


def read_kafka_files(spark: SparkSession, path: str, topic: str | None = None) -> DataFrame:
    """Read a ``write_kafka_files`` layout back in the Kafka SOURCE
    column shape (topic, key binary, value binary, timestamp) — drop-in
    input for ``decode_json_topic``. ``topic`` prunes partitions."""
    df = spark.read.parquet(path)
    if topic is not None:
        df = df.filter(F.col("topic") == topic)
    return df.select("topic", "key", "value", "timestamp")


def decode_json_topic(df: DataFrame, schema) -> DataFrame:
    """Kafka record → typed columns: parse the JSON value against a
    declared schema, keep the raw string for late-bound access (the
    schemaless-payload posture from SURVEY.md §1.2)."""
    return df.select(
        F.col("topic"),
        F.col("key").cast("string").alias("key"),
        F.col("value").cast("string").alias("raw_value"),
        F.from_json(F.col("value").cast("string"), schema).alias("v"),
        F.col("timestamp").alias("kafka_ts"),
    ).select("topic", "key", "raw_value", "v.*", "kafka_ts")
