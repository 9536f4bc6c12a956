"""B1 source/sink format coverage: parquet/CSV/JSON/ORC round-trips with
declared schemas, plus partitioned writes with partition pruning — the
file-source generalization of the reference's ingestion surface."""

from __future__ import annotations

from pyspark.sql import functions as F

from mk_kafka_connect_spark.catalog import load_table
from mk_kafka_connect_spark.operators.cdc import write_entity_partitioned

SF = "/root/testdata/sf0.001"


def _orders(spark):
    return load_table(spark, SF, "orders")


def test_csv_roundtrip(spark, tmp_path):
    o = _orders(spark).select("o_orderkey", "o_orderstatus", "o_totalprice")
    path = str(tmp_path / "csv")
    o.write.option("header", True).csv(path)
    back = spark.read.schema("o_orderkey long, o_orderstatus string, o_totalprice double").option("header", True).csv(path)
    assert back.count() == o.count()
    a = {r.o_orderkey: r.o_totalprice for r in o.collect()}
    b = {r.o_orderkey: r.o_totalprice for r in back.collect()}
    assert a == b


def test_json_roundtrip(spark, tmp_path):
    o = _orders(spark).select("o_orderkey", "o_orderpriority", "o_orderdate")
    path = str(tmp_path / "json")
    o.write.json(path)
    back = spark.read.schema(
        "o_orderkey long, o_orderpriority string, o_orderdate timestamp"
    ).json(path)
    assert back.count() == o.count()
    assert back.filter(F.col("o_orderdate").isNull()).count() == 0


def test_orc_roundtrip(spark, tmp_path):
    o = _orders(spark)
    path = str(tmp_path / "orc")
    o.write.orc(path)
    back = spark.read.orc(path)
    assert back.count() == o.count()
    assert set(back.columns) == set(o.columns)


def test_partitioned_write_prunes(spark, tmp_path):
    """Entity+date-partitioned CDC sink layout → a filtered read must scan
    only matching partition directories (PartitionFilters, not data
    filters) — the 100 TB time-range access path."""
    ev = load_table(spark, SF, "events").withColumn(
        "_entity_type", F.lit("events")
    ).withColumn("dt", F.date_format("ts", "yyyy-MM-dd"))
    path = str(tmp_path / "cdc")
    write_entity_partitioned(ev, path, mode="overwrite", date_col="dt")

    back = spark.read.parquet(path).filter(
        (F.col("dt") == "2024-01-05") & (F.col("_entity_type") == "events")
    )
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan
    assert "isnotnull(dt" in plan
    expected = ev.filter(F.col("dt") == "2024-01-05").count()
    assert back.count() == expected


def test_csv_malformed_modes(spark, tmp_path):
    """Schema-on-read resilience: PERMISSIVE nulls bad cells, DROPMALFORMED
    drops bad rows — late-binding posture for dirty feeds."""
    p = tmp_path / "bad.csv"
    p.write_text("id,amount\n1,10.5\n2,notanumber\n3,30.0\n")
    schema = "id long, amount double"
    permissive = spark.read.schema(schema).option("header", True).csv(str(p))
    assert permissive.count() == 3
    assert permissive.filter(F.col("amount").isNull()).count() == 1
    dropped = (
        spark.read.schema(schema)
        .option("header", True)
        .option("mode", "DROPMALFORMED")
        .csv(str(p))
    )
    # NB: count() alone prunes every column, so no cell is ever parsed and
    # nothing registers as malformed — collect() forces the full parse.
    assert len(dropped.collect()) == 2
