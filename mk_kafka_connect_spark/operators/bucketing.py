"""Bucketed-table layout: shuffle-free repeated joins and aggregations.

At 100 TB the fact-fact join (lineitem ⋈ orders on orderkey) is THE
dominant shuffle: every query that touches both tables pays a full
re-partition of both sides. Writing the tables ``bucketBy(N, key)`` +
``sortBy(key)`` pays that shuffle ONCE at write time; afterwards every
equi-join or aggregation on the bucket key reads co-located, pre-sorted
buckets and the physical plan contains NO Exchange on either side (the
SortMergeJoin consumes the bucketed scan's output partitioning directly).

This is the table-layout counterpart of AQE: AQE optimizes the shuffles a
plan still has; bucketing removes the recurring ones. The same applies to
``groupBy(bucket_key)`` — partial aggregation feeds straight into the
final aggregate with no repartition.

Spark-side mechanics: ``bucketBy`` requires ``saveAsTable`` (bucket
metadata lives in the catalog, not the parquet footer), so the demo
registers catalog tables backed by an explicit ``path``. Both join sides
must use the SAME bucket count, and ``spark.sql.sources.bucketing.enabled``
(default true) must be on.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

__all__ = ["write_bucketed", "ensure_bucketed_pair", "bucketed_table"]


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    num_buckets: int = 8,
    path: str | None = None,
) -> None:
    """Write ``df`` as a bucketed+sorted catalog table (overwrite)."""
    w = (
        df.write.format("parquet")
        .mode("overwrite")
        .bucketBy(num_buckets, bucket_col)
        .sortBy(bucket_col)
    )
    if path:
        w = w.option("path", path)
    w.saveAsTable(table)


def bucketed_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)


def ensure_bucketed_pair(
    spark: SparkSession,
    sf_dir: str,
    cache_dir: str,
    num_buckets: int = 8,
) -> tuple[str, str]:
    """Idempotently materialize bucketed lineitem/orders for ``sf_dir``
    (bucketed by orderkey on both sides, SAME bucket count — the
    co-location contract). Returns the two table names.

    The write is the one-time shuffle this layout amortizes; repeated
    calls (same session or later sessions with the same cache_dir) reuse
    the existing files and only re-register the catalog entries."""
    from ..catalog import load_table

    tag = "".join(c if c.isalnum() else "_" for c in sf_dir.strip("/"))
    li_tbl, o_tbl = f"bkt_lineitem_{tag}", f"bkt_orders_{tag}"
    for tbl, src, key in (
        (li_tbl, "lineitem", "l_orderkey"),
        (o_tbl, "orders", "o_orderkey"),
    ):
        path = os.path.join(cache_dir, tbl)
        done = os.path.join(path, "_SUCCESS")
        if spark.catalog.tableExists(tbl) and os.path.exists(done):
            continue  # already materialized this session
        if os.path.exists(done):
            # Files already written by a previous session. Bucket metadata
            # lives in the (in-memory) catalog, not the parquet footer, so
            # a fresh session must re-REGISTER — but it must NOT re-WRITE:
            # at 100 TB the rewrite is the whole shuffle this layout
            # amortizes. CREATE TABLE ... CLUSTERED BY ... LOCATION points
            # the catalog at the existing bucket files (bucket ids are
            # encoded in the file names, which the scan trusts).
            cols = ", ".join(
                f"{f.name} {f.dataType.simpleString()}"
                for f in load_table(spark, sf_dir, src).schema.fields
            )
            spark.sql(f"DROP TABLE IF EXISTS {tbl}")
            spark.sql(
                f"CREATE TABLE {tbl} ({cols}) USING parquet "
                f"CLUSTERED BY ({key}) SORTED BY ({key}) "
                f"INTO {num_buckets} BUCKETS LOCATION '{path}'"
            )
            continue
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")
        write_bucketed(load_table(spark, sf_dir, src), tbl, key, num_buckets, path)
    return li_tbl, o_tbl
