"""End-to-end CDC pipeline assembly — the engine-level equivalent of a
whole Kafka Connect deployment (connector + SMT chain + converter + topic
routing), declared as one config object.

Reference lifecycle being replaced (SURVEY.md §3.1): Connect runtime →
``Connector.start`` → ``Task.poll`` → SMT chain → JsonConverter → Kafka.
Engine lifecycle: ``CdcPipeline.run_batch`` / ``run_stream`` →
``paginated_rest`` DataSource → transform chain (``transforms.py``) →
keyed/enriched/routed records (``operators/cdc.py``) → sink (partitioned
parquet, Kafka when on classpath, or any writer callable).

One pipeline object covers both modes with the same transforms — the
batch/streaming unification the reference approximates with its
INITIAL/INCREMENTAL modes.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .operators.cdc import route_topics, to_kafka_shape
from .sources.rest_source import register
from .transforms import apply_chain

__all__ = ["CdcPipeline"]


@dataclass
class CdcPipeline:
    """Declarative CDC pipeline: source options (the reference's connector
    properties), a transform chain (the SMT chain), and a sink."""

    source_options: dict[str, str]
    transform_chain: list[dict[str, Any]] = field(default_factory=list)
    topic_prefix: str = "rest"

    def _apply(self, raw: DataFrame) -> DataFrame:
        """Source rows (entity, key, payload, _ingestion_timestamp,
        _load_mode) → transformed, routed records."""
        df = raw.withColumn("_entity_type", F.col("entity"))
        df = apply_chain(df, self.transform_chain)
        return route_topics(df, self.topic_prefix)

    def read_batch(self, spark: SparkSession) -> DataFrame:
        register(spark)
        raw = (
            spark.read.format("paginated_rest")
            .options(**self.source_options)
            .load()
        )
        return self._apply(raw)

    def run_batch_to_parquet(self, spark: SparkSession, path: str) -> int:
        """One full batch pull → entity-partitioned parquet. Returns row
        count written. Partitioning by entity + ingestion date gives the
        time-range pruning layout (SURVEY.md §4)."""
        # Defensive cast: a transform chain may have stringified the
        # ingestion timestamp (the string-cast SMT does exactly that).
        out = self.read_batch(spark).withColumn(
            "dt",
            F.date_format(
                F.timestamp_millis(F.col("_ingestion_timestamp").cast("long")),
                "yyyy-MM-dd",
            ),
        )
        out.write.mode("append").partitionBy("_entity_type", "dt").parquet(path)
        return spark.read.parquet(path).count()

    def stream(self, spark: SparkSession) -> DataFrame:
        register(spark)
        raw = (
            spark.readStream.format("paginated_rest")
            .options(**self.source_options)
            .load()
        )
        return self._apply(raw)

    def run_stream_to_parquet(
        self, spark: SparkSession, path: str, checkpoint: str, timeout_s: int = 300
    ) -> None:
        """Checkpointed streaming drain to partitioned parquet — resume and
        exactly-once file commits come from Structured Streaming's offset
        WAL + commit log (the reference's offset-storage semantics,
        CO-README:70-86, for free)."""
        q = (
            self.stream(spark)
            .writeStream.format("parquet")
            .option("path", path)
            .option("checkpointLocation", checkpoint)
            .partitionBy("_entity_type")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(timeout_s)

    def kafka_shaped(self, spark: SparkSession) -> DataFrame:
        """Batch pull in Kafka sink shape (topic, key, value) — pipe into
        sources/kafka.write_kafka_batch when a broker + jar are present."""
        return to_kafka_shape(self.read_batch(spark))
