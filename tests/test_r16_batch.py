"""Semantic contracts for the round-16 additions — properties the oracle
comparison alone can't express: plain-Python recomputation of the parsed
image dimensions and chunk arithmetic, state-store completeness against
an independent distinct count, session-variable capture-by-value, and
the XML round trip's nested-struct fidelity on a hand-built fixture."""

from __future__ import annotations

from typing import Iterator

import duckdb
import pandas as pd

from mk_kafka_connect_spark.plans import QUERIES

SF = "/root/testdata/sf0.001"


def _run(spark, name, sf=SF):
    return QUERIES[name].fn(spark, sf)


def test_image_dims_recomputed_in_python(spark):
    # Independent recomputation: the staged-dimension formula applied in
    # plain Python over DuckDB-read doc_ids must equal the Spark-parsed
    # header values, per container.
    rows = {r["container"]: r for r in _run(spark, "multimodal_image_dims").collect()}
    ids = [r[0] for r in duckdb.sql(
        f"SELECT doc_id FROM '{SF}/documents.parquet'").fetchall()]
    expect = {"png": [0, 0, 0, 0, 0], "gif": [0, 0, 0, 0, 0]}
    for i in ids:
        w, h = 16 + (i * 7) % 1009, 16 + (i * 13) % 997
        e = expect["png" if i % 2 == 0 else "gif"]
        e[0] += 1
        e[1] += w
        e[2] += h
        e[3] += w * h
        e[4] = max(e[4], w)
    for c, e in expect.items():
        r = rows[c]
        assert [r["n_images"], r["sum_width"], r["sum_height"],
                r["total_pixels"], r["max_width"]] == e, c


def test_udtf_chunks_reassemble_to_original_text(spark):
    # The three analyze-time chunk columns must concatenate back to the
    # original text for every doc — stronger than the aggregate oracle.
    from pyspark.sql import functions as F

    from mk_kafka_connect_spark.catalog import load_table
    from mk_kafka_connect_spark.plans.udf import udf_udtf_dynamic_schema  # noqa: F401

    _run(spark, "udf_udtf_dynamic_schema").collect()  # registers split_fixed
    docs = (
        load_table(spark, SF, "documents")
        .filter((F.col("doc_id") < 200) & (F.length("text") >= 3))
        .select("doc_id", "text")
    )
    docs.createOrReplaceTempView("_chunk_contract_docs")
    bad = spark.sql(
        """
        SELECT d.doc_id FROM _chunk_contract_docs d,
          LATERAL split_fixed(d.text, 3) s
        WHERE concat(s.chunk_0, s.chunk_1, s.chunk_2) <> d.text
        """
    ).count()
    assert bad == 0


def test_state_introspection_matches_duckdb_distinct(spark):
    got = sorted(r["user_id"] for r in
                 _run(spark, "streaming_state_introspection").collect())
    want = sorted(r[0] for r in duckdb.sql(
        f"SELECT DISTINCT user_id FROM '{SF}/events.parquet'"
        " WHERE event_id < 2000").fetchall())
    assert got == want


def test_join_state_buffers_match_duckdb_side_counts(spark):
    rows = {r["side"]: r for r in
            _run(spark, "streaming_join_state_introspection").collect()}
    for side, etype in (("left", "view"), ("right", "click")):
        n, chk = duckdb.sql(
            f"SELECT count(*), coalesce(sum(event_id), 0)"
            f" FROM '{SF}/events.parquet'"
            f" WHERE event_id < 3000 AND event_type = '{etype}'"
        ).fetchall()[0]
        assert rows[side]["n_buffered"] == n, side
        assert rows[side]["id_checksum"] == chk, side


def test_session_variable_captures_value_not_expression(spark):
    # SET VAR must snapshot the value at set time: mutating the backing
    # view afterwards must NOT change the variable.
    spark.createDataFrame([(10.0,)], "x double").createOrReplaceTempView("_sv_t")
    spark.sql("DECLARE OR REPLACE VARIABLE _sv_probe DOUBLE")
    spark.sql("SET VAR _sv_probe = (SELECT max(x) FROM _sv_t)")
    spark.createDataFrame([(99.0,)], "x double").createOrReplaceTempView("_sv_t")
    assert spark.sql("SELECT _sv_probe AS v").collect()[0]["v"] == 10.0


def test_lateral_alias_chain_equals_written_out_expressions(spark):
    # Engine-internal equivalence: the alias chain must plan to the same
    # values as the fully written-out expressions.
    from pyspark.sql import functions as F

    chained = _run(spark, "sql_lateral_column_alias")
    from mk_kafka_connect_spark.catalog import load_table
    from mk_kafka_connect_spark.functions.exact import dec2, one_minus, one_plus

    li = load_table(spark, SF, "lineitem").filter(F.col("l_quantity") < 24.0)
    disc = dec2("l_extendedprice") * one_minus("l_discount")
    charge = disc * one_plus("l_tax")
    explicit = li.groupBy("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum(disc), 2).cast("double").alias("sum_disc_price"),
        F.round(F.sum(charge), 2).cast("double").alias("sum_charge"),
        F.sum(
            F.when(charge > dec2("l_extendedprice"), 1).otherwise(0)
        ).alias("n_tax_exceeds_discount"),
    )
    key = lambda r: (r["l_returnflag"], r["l_linestatus"])  # noqa: E731
    got = {key(r): r.asDict() for r in chained.collect()}
    want = {key(r): r.asDict() for r in explicit.collect()}
    assert got == want


def test_iter_scalar_udf_initializes_once_per_task(spark):
    # The SCALAR_ITER body must run once per task, not once per batch:
    # count function entries via an accumulator over a multi-batch input.
    from pyspark.sql import functions as F
    from pyspark.sql import types as T
    from pyspark.sql.functions import pandas_udf

    acc = spark.sparkContext.accumulator(0)

    @pandas_udf(T.LongType())
    def tagged(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        acc.add(1)  # once per worker entry
        for b in batches:
            yield b * 2

    # 1 partition, batches forced small so > 1 batch flows through.
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "100")
    try:
        df = spark.range(0, 1000, 1, 1).select(tagged("id").alias("d"))
        assert df.agg(F.sum("d")).collect()[0][0] == 999 * 1000
        assert acc.value == 1  # one init despite ~10 Arrow batches
    finally:
        spark.conf.unset("spark.sql.execution.arrow.maxRecordsPerBatch")


def test_ccnet_buckets_partition_each_language_into_balanced_terciles(spark):
    rows = _run(spark, "docs_ccnet_buckets").collect()
    by_lang: dict[str, dict[str, int]] = {}
    for r in rows:
        by_lang.setdefault(r["lang"], {})[r["bucket"]] = r["n_docs"]
        assert r["min_xent"] <= r["max_xent"]
    for lang, buckets in by_lang.items():
        assert set(buckets) == {"head", "middle", "tail"}
        # ntile balance: sizes differ by at most 1
        sizes = sorted(buckets.values())
        assert sizes[-1] - sizes[0] <= 1, (lang, buckets)
    # head must be the fluent (low-xent) end
    for r in rows:
        if r["bucket"] == "head":
            tail = next(
                t for t in rows
                if t["lang"] == r["lang"] and t["bucket"] == "tail"
            )
            assert r["min_xent"] <= tail["min_xent"]
