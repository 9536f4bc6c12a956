"""Semantic contracts for the round-14 additions — properties the oracle
comparison alone can't express (quarantine payload fidelity, independent
recomputation in plain Python)."""

from __future__ import annotations

import duckdb

from mk_kafka_connect_spark.plans import QUERIES

SF = "/root/testdata/sf0.01"


def test_quarantine_counts_match_corruption_rule(spark):
    rows = {
        r.event_type: r
        for r in QUERIES["dq_corrupt_record_quarantine"].fn(spark, SF).collect()
    }
    orc = duckdb.sql(
        f"""SELECT event_type, count(*) AS n,
          sum(CASE WHEN event_id % 10 = 0 THEN 1 ELSE 0 END) AS bad,
          sum(CASE WHEN event_id % 10 <> 0
              THEN CAST(json_extract_string(props, '$.k') AS BIGINT) END) AS s
        FROM '{SF}/events.parquet' GROUP BY 1"""
    ).fetchall()
    assert len(rows) == len(orc)
    for et, n, bad, s in orc:
        r = rows[et]
        assert r.n_rows == n
        assert r.n_quarantined == bad
        assert r.n_valid == n - bad
        assert r.sum_k == s
        assert r.n_quarantined > 0  # the corruption rule really fired


def test_quarantine_preserves_original_payload_for_replay(spark):
    # The point of PERMISSIVE quarantine: a bad record's RAW payload
    # survives in the corrupt column, so it can be repaired and
    # replayed. Rebuild the parse step and check payload fidelity.
    from pyspark.sql import functions as F

    from mk_kafka_connect_spark.catalog import load_table

    ev = load_table(spark, SF, "events").select("event_id", "props")
    staged = ev.withColumn(
        "raw",
        F.when(
            F.col("event_id") % 10 == 0, F.concat(F.lit("x"), F.col("props"))
        ).otherwise(F.col("props")),
    )
    parsed = staged.withColumn(
        "p",
        F.from_json(
            "raw",
            "k bigint, _corrupt string",
            {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": "_corrupt"},
        ),
    )
    bad = parsed.filter(F.col("p._corrupt").isNotNull()).limit(20).collect()
    assert bad, "no quarantined rows"
    for r in bad:
        assert r.event_id % 10 == 0
        assert r.p._corrupt == r.raw  # full original payload, repairable
        assert r.p._corrupt == "x" + r.props
        assert r.p.k is None
    good = parsed.filter(F.col("p._corrupt").isNull()).limit(20).collect()
    for r in good:
        assert r.p.k is not None or '"k": null' in r.props


def test_dpp_prunes_fact_partitions_at_runtime(spark):
    # The broadcast dim's keys must become a runtime PartitionFilter on
    # the staged fact scan (dynamicpruningexpression) - and vanish when
    # DPP is disabled, proving the filter is the dynamic one.
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from mk_kafka_connect_spark.catalog import load_table

    li = load_table(spark, SF, "lineitem").select(
        "l_orderkey", F.year("l_shipdate").alias("ship_year")
    )
    root = tempfile.mkdtemp(prefix="dpp_test_")
    try:
        li.write.partitionBy("ship_year").mode("overwrite").parquet(root)
        fact = spark.read.parquet(root)
        dim = (
            load_table(spark, SF, "orders")
            .filter(F.col("o_orderdate") >= F.lit("1999-01-01").cast("timestamp"))
            .select(F.year("o_orderdate").alias("ship_year"))
            .distinct()
        )
        q = fact.join(F.broadcast(dim), "ship_year").groupBy("ship_year").count()
        plan = q._jdf.queryExecution().executedPlan().toString()
        assert "dynamicpruningexpression" in plan.lower()
        spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.enabled", "false")
        try:
            q2 = (
                fact.join(F.broadcast(dim), "ship_year")
                .groupBy("ship_year")
                .count()
            )
            plan2 = q2._jdf.queryExecution().executedPlan().toString()
            assert "dynamicpruningexpression" not in plan2.lower()
        finally:
            spark.conf.set(
                "spark.sql.optimizer.dynamicPartitionPruning.enabled", "true"
            )
    finally:
        shutil.rmtree(root, ignore_errors=True)


def test_arrow_batches_norms_match_naive_recompute(spark):
    import math

    rows = {
        r.vec_id: r for r in QUERIES["udf_arrow_batches"].fn(spark, SF).collect()
    }
    raw = duckdb.sql(
        f"SELECT vec_id, label, embedding FROM "
        f"'{SF}/embeddings.parquet' WHERE vec_id < 500"
    ).fetchall()
    assert len(rows) == len(raw) > 0
    for vid, label, emb in raw:
        r = rows[vid]
        assert r.label == label and r.dim == len(emb)
        s = 0.0
        for x in emb:  # position order, float64 accumulation
            s += float(x) * float(x)
        assert r.l2_norm == round(math.sqrt(s), 6)


def test_null_safe_join_null_bucket_matches(spark):
    # NULL <=> NULL must MATCH (ordinary equality drops those rows), and
    # the NULL bucket's pair count must be exactly |nulled c| x |nulled s|.
    rows = {r.nkey: r.n_pairs for r in QUERIES["join_null_safe"].fn(spark, SF).collect()}
    nc, ns = duckdb.sql(
        f"""SELECT
          (SELECT count(*) FROM '{SF}/customer.parquet' WHERE c_custkey % 7 = 0),
          (SELECT count(*) FROM '{SF}/supplier.parquet' WHERE s_suppkey % 5 = 0)"""
    ).fetchone()
    assert None in rows and rows[None] == nc * ns
    # And an ordinary-equality join must produce ZERO null-bucket pairs.
    from pyspark.sql import functions as F

    from mk_kafka_connect_spark.catalog import load_table

    c = load_table(spark, SF, "customer").select(
        F.when(F.col("c_custkey") % 7 == 0, None)
        .otherwise(F.col("c_nationkey")).alias("nkey")
    )
    s = load_table(spark, SF, "supplier").select(
        F.when(F.col("s_suppkey") % 5 == 0, None)
        .otherwise(F.col("s_nationkey")).alias("nkey_s")
    )
    plain = c.join(s, c.nkey == s.nkey_s).filter(F.col("nkey").isNull()).count()
    assert plain == 0


def test_union_by_name_aligns_columns_not_positions(spark):
    rows = QUERIES["set_union_by_name"].fn(spark, SF).collect()
    cust = [r for r in rows if r.src == "customer"]
    orde = [r for r in rows if r.src == "order"]
    assert cust and orde
    # Each side's missing columns are NULL; present columns are intact.
    assert all(r.priority is None and r.nationkey is not None for r in cust)
    assert all(r.nationkey is None and r.acctbal is None for r in orde)
    assert all(r.priority is not None for r in orde)
    n_c, n_o = duckdb.sql(
        f"""SELECT (SELECT count(*) FROM '{SF}/customer.parquet'),
          (SELECT count(*) FROM '{SF}/orders.parquet'
           WHERE o_totalprice > 400000.0)"""
    ).fetchone()
    assert len(cust) == n_c and len(orde) == n_o


def test_observe_metrics_ride_the_job_not_a_second_scan(spark):
    # observe() must not add a scan: the instrumented pipeline's plan
    # contains exactly ONE parquet scan (CollectMetrics rides it).
    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    from mk_kafka_connect_spark.catalog import load_table

    o = load_table(spark, SF, "orders")
    obs = Observation("audit")
    observed = o.observe(obs, F.count(F.lit(1)).alias("n")).filter(
        F.col("o_totalprice") > 100000.0
    )
    plan = observed._jdf.queryExecution().executedPlan().toString()
    assert plan.count("FileScan parquet") == 1
    assert "CollectMetrics" in plan
    observed.write.format("noop").mode("overwrite").save()
    n_direct = duckdb.sql(
        f"SELECT count(*) FROM '{SF}/orders.parquet'"
    ).fetchone()[0]
    assert obs.get["n"] == n_direct


def test_grouped_arrow_fold_matches_naive_recompute(spark):
    rows = {
        r.label: r
        for r in QUERIES["udf_grouped_apply_arrow"].fn(spark, SF).collect()
    }
    raw = duckdb.sql(
        f"SELECT label, embedding FROM '{SF}/embeddings.parquet'"
    ).fetchall()
    import math
    from collections import defaultdict

    acc: dict = defaultdict(lambda: [0, 0, None])
    for label, emb in raw:
        a = acc[label]
        a[0] += 1
        a[2] = len(emb)
        for x in emb:
            v = abs(float(x)) * 1_000_000
            a[1] += int(math.copysign(math.floor(v + 0.5), float(x)))
    assert len(rows) == len(acc)
    for label, (n, sq, dim) in acc.items():
        r = rows[label]
        assert (r.n_vecs, r.sum_q, r.dim) == (n, sq, dim)
        assert r.mean_component == sq / (n * dim * 1_000_000)
