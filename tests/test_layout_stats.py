"""Semantic assertions for layout_zorder_pruning_stats: the relational
row-group model must show the clustering trade-off the physical
footer-stats test (test_r7_batch2.py::test_zorder_layout_prunes_row_groups)
measures on real parquet files."""

from __future__ import annotations

from mk_kafka_connect_spark.plans import QUERIES

SF = "/root/testdata/sf0.01"


def test_zorder_model_shows_clustering_tradeoff(spark):
    rows = QUERIES["layout_zorder_pruning_stats"].fn(spark, SF).collect()
    frac = {(r.layout, r.predicate): r.overlap_frac for r in rows}
    # Natural (orderkey-sorted) layout: partkey stats are useless —
    # every group spans ~the whole partkey domain.
    assert frac[("natural", "partkey_only")] > 0.9
    # Z-order makes the partkey dimension prunable...
    assert frac[("zorder", "partkey_only")] < frac[("natural", "partkey_only")]
    # ...and wins the conjunctive box (the reason it exists).
    assert frac[("zorder", "box_both")] <= frac[("natural", "box_both")]
    # The price: orderkey-only pruning is tighter in the natural layout.
    assert frac[("natural", "orderkey_only")] <= frac[("zorder", "orderkey_only")]
    # Hilbert is the third layout (r9): like Z-order it clusters BOTH
    # dimensions, so partkey-only pruning must beat the natural layout.
    assert frac[("hilbert", "partkey_only")] < frac[("natural", "partkey_only")]
    assert frac[("hilbert", "box_both")] <= frac[("natural", "box_both")]
    # Every (layout, predicate) pair present.
    assert len(frac) == 9


def test_schema_evolution_scan_semantics(spark):
    # The merged scan must (a) surface NULL for the late column on the
    # pre-evolution era even though the fixture HAS values there (the
    # column did not exist in those files), (b) partition-prune on the
    # directory batch id, (c) aggregate to the fixture's own totals.
    import duckdb

    from mk_kafka_connect_spark.plans import QUERIES

    rows = QUERIES["scan_schema_evolution"].fn(spark, SF).collect()
    b1 = [r for r in rows if r.ingest_batch == 1]
    b2 = [r for r in rows if r.ingest_batch == 2]
    assert len(b1) == 1 and b1[0].o_orderpriority is None
    assert len(b2) >= 2 and all(r.o_orderpriority is not None for r in b2)
    n_pre, n_post = duckdb.sql(
        f"""SELECT sum(CASE WHEN o_orderdate < DATE '1997-01-01' THEN 1 ELSE 0 END),
          sum(CASE WHEN o_orderdate >= DATE '1997-01-01' THEN 1 ELSE 0 END)
        FROM '{SF}/orders.parquet'"""
    ).fetchone()
    assert b1[0].n_orders == n_pre
    assert sum(r.n_orders for r in b2) == n_post


def test_schema_evolution_partition_pruning(spark):
    # A predicate on the discovered partition column must reach the scan
    # as a PartitionFilter (directory pruning - old files never open).
    import os
    import shutil
    import tempfile

    from mk_kafka_connect_spark.catalog import load_table
    from pyspark.sql import functions as F

    o = load_table(spark, SF, "orders").select("o_orderkey", "o_totalprice")
    root = tempfile.mkdtemp(prefix="schema_evo_prune_")
    try:
        o.limit(100).write.parquet(f"{root}/ingest_batch=1")
        o.limit(100).withColumn("extra", F.lit(1)).write.parquet(
            f"{root}/ingest_batch=2"
        )
        df = (
            spark.read.option("mergeSchema", "true")
            .parquet(root)
            .filter(F.col("ingest_batch") == 2)
        )
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "PartitionFilters: [" in plan
        assert "ingest_batch" in plan.split("PartitionFilters:")[1].split("]")[0]
        assert df.count() == 100 and df.filter("extra = 1").count() == 100
    finally:
        shutil.rmtree(root, ignore_errors=True)
