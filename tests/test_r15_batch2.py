"""Semantic contracts for the round-15 continuation additions (batch 2):
ORC round-trip + pushdown reaching the ORC reader, GROUP BY ALL binding,
listagg/bitwise aggregate recomputation, and a plain-Python Earth Mover's
Distance recompute for t-closeness."""

from __future__ import annotations

import math
from collections import defaultdict

import duckdb

from mk_kafka_connect_spark.plans import QUERIES

SF = "/root/testdata/sf0.001"


def test_orc_roundtrip_matches_parquet_recompute(spark):
    got = {
        r.o_orderpriority: (r.n_lines, r.revenue, r.total_qty)
        for r in QUERIES["scan_orc_roundtrip"].fn(spark, SF).collect()
    }
    want = {
        pri: (n, rev, qty)
        for pri, n, rev, qty in duckdb.sql(
            f"""SELECT o_orderpriority, count(*),
              CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))), 2)
                   AS DOUBLE),
              CAST(round(sum(CAST(l_quantity AS DECIMAL(18,2))), 2)
                   AS DOUBLE)
            FROM '{SF}/orders.parquet' o
            JOIN '{SF}/lineitem.parquet' l ON o_orderkey = l_orderkey
            WHERE l_discount >= 0.07 AND l_quantity > 10.0
            GROUP BY 1"""
        ).fetchall()
    }
    assert got == want


def test_orc_scan_receives_pushed_filter(spark, tmp_path):
    """The docstring's pushdown claim, pinned: a post-read predicate on an
    ORC scan must surface in the scan node's PushedFilters, exactly like
    parquet row-group pruning."""
    path = str(tmp_path / "li_orc")
    spark.read.parquet(f"{SF}/lineitem.parquet").select(
        "l_orderkey", "l_quantity"
    ).write.mode("overwrite").orc(path)
    df = (
        spark.read.schema("l_orderkey long, l_quantity double")
        .orc(path)
        .filter("l_quantity > 10.0")
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan
    assert "GreaterThan(l_quantity,10.0)" in plan


def test_group_by_all_binds_every_nonaggregate_item(spark):
    """GROUP BY ALL must bind exactly the three non-aggregate select items
    (including the computed year) — proven engine-internally against the
    explicit DataFrame formulation."""
    from pyspark.sql import functions as F

    from mk_kafka_connect_spark.catalog import load_table
    from mk_kafka_connect_spark.functions.exact import dec2, one_minus

    got = {
        (r.l_returnflag, r.l_linestatus, r.ship_year): (r.n, r.revenue)
        for r in QUERIES["sql_group_by_all"].fn(spark, SF).collect()
    }
    li = load_table(spark, SF, "lineitem").filter(F.col("l_quantity") < 25.0)
    want = {
        (r.l_returnflag, r.l_linestatus, r.ship_year): (r.n, r.revenue)
        for r in li.groupBy(
            "l_returnflag",
            "l_linestatus",
            F.year("l_shipdate").cast("int").alias("ship_year"),
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(
                F.sum(dec2("l_extendedprice") * one_minus("l_discount")), 2
            )
            .cast("double")
            .alias("revenue"),
        )
        .collect()
    }
    assert got == want


def test_listagg_bitwise_matches_python_recompute(spark):
    rows = duckdb.sql(
        f"""SELECT o_orderkey, o_orderpriority, o_totalprice
        FROM '{SF}/orders.parquet' WHERE o_orderkey < 4000"""
    ).fetchall()
    groups: dict[int, list] = defaultdict(list)
    for key, pri, price in rows:
        groups[key % 16].append((key, pri, price))
    got = {
        r.bucket: (
            r.n,
            r.pri_seq,
            r.pri_domain,
            r.all_positive,
            r.any_urgent,
            r.key_bit_and,
            r.key_bit_or,
            r.key_bit_xor,
        )
        for r in QUERIES["agg_listagg_bitwise"].fn(spark, SF).collect()
    }
    assert set(got) == set(groups)
    for b, members in groups.items():
        members.sort()
        seq = "".join(pri[0] for _, pri, _ in members)
        domain = ",".join(sorted({pri[0] for _, pri, _ in members}))
        band = bor = bxor = members[0][0]
        for key, _, _ in members[1:]:
            band &= key
            bor |= key
            bxor ^= key
        assert got[b] == (
            len(members),
            seq,
            domain,
            all(p > 0 for _, _, p in members),
            any(pri == "1-URGENT" for _, pri, _ in members),
            band,
            bor,
            bxor,
        )


def test_t_closeness_matches_python_emd(spark):
    rows = duckdb.sql(
        f"""SELECT c_mktsegment, c_nationkey,
          CAST(floor(c_acctbal / 2000.0) AS BIGINT)
        FROM '{SF}/customer.parquet'"""
    ).fetchall()
    by_class: dict[tuple, dict[int, int]] = defaultdict(
        lambda: defaultdict(int)
    )
    global_bands: dict[int, int] = defaultdict(int)
    for seg, nat, band in rows:
        by_class[(seg, nat)][band] += 1
        global_bands[band] += 1
    lo, hi = min(global_bands), max(global_bands)
    n_total = sum(global_bands.values())
    n_bands = len(global_bands)
    got = {
        (r.c_mktsegment, r.c_nationkey): (r.k_size, r.t_closeness, r.t_close)
        for r in QUERIES["dq_t_closeness"].fn(spark, SF).collect()
    }
    assert set(got) == set(by_class)
    for cls, bands in by_class.items():
        k = sum(bands.values())
        cumc = cumg = num = 0
        for band in range(lo, hi + 1):
            cumc += bands.get(band, 0)
            cumg += global_bands.get(band, 0)
            num += abs(cumc * n_total - cumg * k)
        t = num / (k * n_total * (n_bands - 1))
        k_got, t_got, flag_got = got[cls]
        assert k_got == k
        assert math.isclose(t_got, t, rel_tol=0, abs_tol=1e-12)
        assert flag_got == (t_got <= 0.25)
        assert 0.0 <= t_got <= 1.0
