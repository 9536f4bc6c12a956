"""CDC record pipeline operators (SURVEY.md §2.A A7-A10): keyed record
construction, metadata enrichment, topic routing, Kafka-shaped output, and
latest-wins compaction — the DataFrame form of what the reference does per
record in ``ChargeOverSourceTask.java:394-449``.

All narrow ``withColumn``/filter ops → whole-stage codegen, no shuffle
until compaction (which shuffles once on the entity key).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

__all__ = [
    "keyed_records",
    "enrich_metadata",
    "route_topics",
    "to_kafka_shape",
    "compact_latest",
    "write_entity_partitioned",
    "merge_upsert",
    "scd2_history",
]


def keyed_records(df: DataFrame, id_col: str, key_col: str = "key") -> DataFrame:
    """A7 (Task.java:394-449): drop rows missing the id, build the
    ``{id_field: id}`` JSON key."""
    return df.filter(F.col(id_col).isNotNull()).withColumn(
        key_col, F.to_json(F.struct(F.col(id_col)))
    )


def enrich_metadata(df: DataFrame, entity: str, load_mode: str) -> DataFrame:
    """A8 (Task.java:425-428): _entity_type, _ingestion_timestamp (epoch
    ms), _load_mode."""
    return (
        df.withColumn("_entity_type", F.lit(entity))
        .withColumn(
            "_ingestion_timestamp",
            # True epoch-millis (Task.java:427 System.currentTimeMillis();
            # unix_timestamp() would truncate to whole seconds while
            # presenting a millis-scaled value).
            F.unix_millis(F.current_timestamp()),
        )
        .withColumn("_load_mode", F.lit(load_mode))
    )


def route_topics(df: DataFrame, topic_prefix: str, entity_col: str = "_entity_type") -> DataFrame:
    """A9 (Task.java:418-419): topic = ``{prefix}.{entity}`` per row."""
    return df.withColumn(
        "topic", F.concat(F.lit(topic_prefix + "."), F.col(entity_col))
    )


def to_kafka_shape(df: DataFrame, key_col: str = "key", topic_col: str = "topic") -> DataFrame:
    """A10: project to the Kafka sink contract (topic, key, value) with the
    full payload JSON-serialized as the value — ready for
    ``df.write.format("kafka")`` / ``writeStream.format("kafka")``."""
    payload_cols = [c for c in df.columns if c not in (key_col, topic_col)]
    return df.select(
        F.col(topic_col).alias("topic"),
        F.col(key_col).cast("string").alias("key"),
        F.to_json(F.struct(*[F.col(c) for c in payload_cols])).alias("value"),
    )


def compact_latest(
    df: DataFrame, key_cols: list[str], order_col: str, tiebreak_col: str | None = None
) -> DataFrame:
    """B8: latest-wins compaction per key (the reason the reference builds
    record keys at all — downstream log compaction). Deterministic via the
    tie-break column. One shuffle on the key."""
    order = [F.desc(order_col)]
    if tiebreak_col:
        order.append(F.desc(tiebreak_col))
    w = W.partitionBy(*key_cols).orderBy(*order)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def write_entity_partitioned(
    df: DataFrame, path: str, mode: str = "append", date_col: str | None = None
) -> None:
    """Batch sink: parquet partitioned by entity (+ date when present) —
    the layout that makes the engine's own time-range scans partition-prune
    at 100 TB (SURVEY.md §4 'Partition pruning')."""
    cols = ["_entity_type"] + ([date_col] if date_col else [])
    df.write.mode(mode).partitionBy(*cols).parquet(path)


def merge_upsert(
    snapshot: DataFrame,
    changes: DataFrame,
    key_cols: list[str],
    order_col: str,
    delete_col: str | None = None,
) -> DataFrame:
    """CDC MERGE (upsert + delete) without Delta: apply a change batch to a
    snapshot.

    1. compact the change batch to latest-per-key (order_col desc),
    2. anti-join the snapshot against change keys (rows not touched),
    3. union with the surviving (non-delete) change rows.

    Semantics match ``MERGE INTO ... WHEN MATCHED UPDATE / DELETE / WHEN
    NOT MATCHED INSERT`` with latest-wins on the batch. Two shuffles on
    the key (compaction + anti-join); at scale, bucketing the snapshot on
    the key removes its shuffle entirely — this is the SCD-1 building
    block the reference's keyed CDC streams exist to feed."""
    latest = compact_latest(changes, key_cols, order_col)
    untouched = snapshot.join(latest.select(*key_cols), key_cols, "left_anti")
    if delete_col is not None:
        surviving = latest.filter(~F.coalesce(F.col(delete_col), F.lit(False))).drop(
            delete_col
        )
    else:
        surviving = latest
    surviving = surviving.select(*snapshot.columns)
    return untouched.unionByName(surviving)


def scd2_history(
    changes: DataFrame,
    key_cols: list[str],
    ts_col: str,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """SCD-2 versioned history from a change stream: each change row
    becomes a version valid over ``[valid_from, valid_to)``, where
    ``valid_to`` is the NEXT change's timestamp for the same key (null =
    current version). The versioned-dimension counterpart of
    :func:`merge_upsert` (SCD-1 latest-wins) — the reference's keyed CDC
    topics (``ChargeOverSourceTask.java:394-449``) exist to feed exactly
    these two apply modes.

    One window pass partitioned on the key: a single shuffle, state
    bounded by rows-per-key, deterministic ordering via the tiebreak
    column. Scale-safe at any history depth."""
    from pyspark.sql import Window

    order = [F.col(ts_col)] + ([F.col(tiebreak_col)] if tiebreak_col else [])
    w = Window.partitionBy(*key_cols).orderBy(*order)
    nxt = F.lead(ts_col).over(w)
    return (
        changes.withColumn("valid_from", F.col(ts_col))
        .withColumn("valid_to", nxt)
        .withColumn("is_current", nxt.isNull())
    )
