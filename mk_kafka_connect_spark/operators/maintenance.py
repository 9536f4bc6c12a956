"""Table-maintenance operators: small-file compaction.

A CDC/streaming ingest (the reference's poll loop lands one batch per
poll; Structured Streaming lands one file set per micro-batch) slowly
poisons a table with thousands of tiny files — at 100 TB the scan cost
becomes dominated by file-open overhead and the driver's listing, not
bytes. Table formats solve this with OPTIMIZE/rewrite_data_files
(Delta/Iceberg); for plain parquet directories this module is that
operation: measure the layout, rewrite to size-targeted files, swap
atomically, verify before the swap.

Filesystem access goes through the Hadoop FileSystem API (not
``os.listdir``), so the same code path works on file://, HDFS and S3A —
anywhere Spark itself can write.
"""

from __future__ import annotations

import math

from pyspark.sql import SparkSession

__all__ = ["layout_stats", "compact_parquet"]


def _fs_and_path(spark: SparkSession, path: str):
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs, jpath, jvm


def layout_stats(spark: SparkSession, path: str) -> dict:
    """File-layout health of a parquet directory: data-file count, total
    bytes, and the fraction of files below 1/4 of the mean target —
    driver-side listing only, no Spark job."""
    fs, jpath, _ = _fs_and_path(spark, path)
    files = [
        st
        for st in fs.listStatus(jpath)
        if st.isFile() and st.getPath().getName().endswith(".parquet")
    ]
    sizes = [st.getLen() for st in files]
    return {
        "n_files": len(sizes),
        "total_bytes": sum(sizes),
        "min_bytes": min(sizes) if sizes else 0,
        "max_bytes": max(sizes) if sizes else 0,
    }


def compact_parquet(
    spark: SparkSession,
    path: str,
    target_bytes: int = 128 << 20,
) -> dict:
    """Rewrite a parquet directory to ``ceil(total/target_bytes)`` files.

    Safety order matters: the compacted copy is written to a sibling
    temp directory first, its row count is verified against the source,
    and only then does the directory swap happen (two renames — the
    window where neither location holds the table is two metadata ops,
    and the original is deleted last). A crash before the swap leaves
    the source untouched; after it, the temp name. No-op (and no job)
    when the layout already meets the target.

    At scale this is the nightly OPTIMIZE a streaming-ingested table
    needs; the rewrite is one shuffle-free coalesce when shrinking file
    count, so cost ≈ one read + one write of the partition's bytes.
    """
    stats = layout_stats(spark, path)
    n_target = max(1, math.ceil(stats["total_bytes"] / target_bytes))
    if n_target >= stats["n_files"]:
        return {**stats, "compacted": False, "n_files_after": stats["n_files"]}

    fs, jpath, jvm = _fs_and_path(spark, path)
    df = spark.read.parquet(path)
    n_rows = df.count()
    tmp = path.rstrip("/") + "._compact_tmp"
    old = path.rstrip("/") + "._compact_old"
    # coalesce, not repartition: shrinking file count needs no shuffle.
    df.coalesce(n_target).write.mode("overwrite").parquet(tmp)
    if spark.read.parquet(tmp).count() != n_rows:
        fs.delete(jvm.org.apache.hadoop.fs.Path(tmp), True)
        raise RuntimeError(f"compaction row-count mismatch for {path}; aborted")
    fs.rename(jpath, jvm.org.apache.hadoop.fs.Path(old))
    fs.rename(jvm.org.apache.hadoop.fs.Path(tmp), jpath)
    fs.delete(jvm.org.apache.hadoop.fs.Path(old), True)
    after = layout_stats(spark, path)
    return {**stats, "compacted": True, "n_files_after": after["n_files"]}
