"""Bucketed-table layout tests: the one-time bucketBy write must buy
shuffle-free repeated joins and aggregations on the bucket key (the
recurring fact-fact shuffle is THE scale cost this layout removes)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mk_kafka_connect_spark.operators.bucketing import ensure_bucketed_pair

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def bucketed(spark, tmp_path_factory):
    cache = str(tmp_path_factory.mktemp("bkt"))
    li_tbl, o_tbl = ensure_bucketed_pair(spark, SF, cache, num_buckets=8)
    return spark.table(li_tbl), spark.table(o_tbl)


def _executed(df) -> str:
    df.collect()  # materialize so AQE finalizes the plan
    return df._jdf.queryExecution().executedPlan().toString()


def test_bucketed_join_has_no_exchange(spark, bucketed):
    """Equi-join on the bucket key: both sides read co-located buckets;
    the sort-merge join must consume them with ZERO Exchange operators."""
    li, o = bucketed
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = li.join(o, li.l_orderkey == o.o_orderkey).select(
            "l_orderkey", "o_orderpriority", "l_extendedprice"
        )
        plan = _executed(joined)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    assert "SortMergeJoin" in plan
    assert "Exchange" not in plan, plan
    assert "Bucketed: true" in plan


def test_bucketed_groupby_has_no_exchange(spark, bucketed):
    """Aggregation keyed on the bucket column: partial→final aggregate
    without a repartition."""
    li, _ = bucketed
    agg = li.groupBy("l_orderkey").agg(F.count(F.lit(1)).alias("n"))
    plan = _executed(agg)
    assert "Exchange" not in plan, plan


def test_reregister_reuses_files_without_rewrite(spark, tmp_path):
    """A fresh session (simulated: catalog entry dropped, files kept) must
    re-REGISTER the bucketed table via DDL, not re-WRITE the data — at
    100 TB the rewrite would re-pay the shuffle the layout amortizes. The
    re-registered table must still join shuffle-free."""
    import os

    cache = str(tmp_path / "bkt2")
    li_tbl, o_tbl = ensure_bucketed_pair(spark, SF, cache, num_buckets=8)

    def mtimes():
        out = {}
        for root, _, files in os.walk(cache):
            for f in files:
                p = os.path.join(root, f)
                out[p] = os.stat(p).st_mtime_ns
        return out

    before = mtimes()
    assert before, "expected bucket files on disk"
    # Simulate a fresh session: the in-memory catalog forgets the tables.
    spark.sql(f"DROP TABLE IF EXISTS {li_tbl}")
    spark.sql(f"DROP TABLE IF EXISTS {o_tbl}")

    li_tbl2, o_tbl2 = ensure_bucketed_pair(spark, SF, cache, num_buckets=8)
    assert (li_tbl2, o_tbl2) == (li_tbl, o_tbl)
    assert mtimes() == before, "re-register must not rewrite bucket files"

    li, o = spark.table(li_tbl2), spark.table(o_tbl2)
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = _executed(
            li.join(o, li.l_orderkey == o.o_orderkey).select(
                "l_orderkey", "o_orderpriority"
            )
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    assert "SortMergeJoin" in plan
    assert "Exchange" not in plan, plan
    assert mtimes() == before


def test_unbucketed_join_does_shuffle(spark):
    """Control: the same join over the raw parquet DOES exchange both
    sides — proving the bucketed plans above are the layout's doing."""
    from mk_kafka_connect_spark.catalog import load_table

    li = load_table(spark, SF, "lineitem")
    o = load_table(spark, SF, "orders")
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = _executed(
            li.join(o, li.l_orderkey == o.o_orderkey).select("l_orderkey")
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    assert "Exchange" in plan
