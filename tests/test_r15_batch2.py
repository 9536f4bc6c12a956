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


def _md5_mod(s: str) -> int:
    import hashlib

    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16) % 1_000_000_007


def test_geo_gridblock_matches_python_bruteforce(spark):
    """The grid-block join must find EXACTLY the radius-bounded nearest
    depot the O(points x depots) brute force finds — the blocking is a
    pure optimization, never a recall trade."""
    R = 15_000
    custs = duckdb.sql(
        f"SELECT c_custkey FROM '{SF}/customer.parquet'"
    ).fetchall()
    depots = duckdb.sql(
        f"SELECT s_suppkey FROM '{SF}/supplier.parquet'"
    ).fetchall()
    dpos = [
        (
            k,
            _md5_mod(f"slat:{k}") % 180_001,
            _md5_mod(f"slon:{k}") % 360_001,
        )
        for (k,) in depots
    ]
    stats: dict[int, list] = {}
    n_covered = 0
    for (ck,) in custs:
        clat = _md5_mod(f"glat:{ck}") % 180_001
        clon = _md5_mod(f"glon:{ck}") % 360_001
        best = None
        for sk, slat, slon in dpos:
            d2 = (clat - slat) ** 2 + (clon - slon) ** 2
            if d2 <= R * R and (best is None or (d2, sk) < best):
                best = (d2, sk)
        if best is None:
            continue
        n_covered += 1
        d2, sk = best
        s = stats.setdefault(sk, [0, d2, d2, 0])
        s[0] += 1
        s[1] = min(s[1], d2)
        s[2] = max(s[2], d2)
        s[3] += d2
    got = {
        r.s_suppkey: [r.n_assigned, r.min_d2, r.max_d2, r.sum_d2]
        for r in QUERIES["join_geo_gridblock"].fn(spark, SF).collect()
    }
    assert got == stats
    assert sum(v[0] for v in got.values()) == n_covered
    assert 0 < n_covered < len(custs)  # geofence semantics are exercised


def test_interval_clamping_and_stagger(spark):
    """Month arithmetic must clamp to end-of-month and the per-row
    interval multiplication must stagger by key — recomputed with
    Python's calendar, no SQL engine involved."""
    import calendar
    from datetime import timedelta

    def add_months(d, n):
        y, m = divmod((d.year * 12 + d.month - 1) + n, 12)
        m += 1
        day = min(d.day, calendar.monthrange(y, m)[1])
        return d.replace(year=y, month=m, day=day)

    rows = {
        r.o_orderkey: r
        for r in QUERIES["scalar_interval_funcs"].fn(spark, SF).collect()
    }
    src = dict(
        duckdb.sql(
            f"""SELECT o_orderkey, o_orderdate
            FROM '{SF}/orders.parquet' WHERE o_orderkey < 5000"""
        ).fetchall()
    )
    assert set(rows) == set(src)
    for k, d in src.items():
        r = rows[k]
        assert r.plus_3m == add_months(d, 3)
        assert r.plus_1y6m == add_months(d, 18)
        assert r.minus_45d == d - timedelta(days=45)
        assert r.plus_90min == d + timedelta(minutes=90)
        assert r.staggered == d + timedelta(days=k % 5)
        assert r.month_end.day == calendar.monthrange(d.year, d.month)[1]
        assert r.qtr_start.month in (1, 4, 7, 10) and r.qtr_start.day == 1


def test_stl_decomposition_identity_and_recompute(spark):
    """value = trend + seasonal + remainder (the additive contract), and
    every component matches a plain-Python recompute of the classical
    decomposition from the raw events."""
    from collections import defaultdict
    from decimal import Decimal

    HALF, W = 12, 25
    raw = duckdb.sql(
        f"""SELECT event_type, CAST(date_trunc('hour', ts) AS TIMESTAMP),
          CAST(sum(CAST(round(CAST(value AS DECIMAL(18,2)) * 100, 0)
                        AS BIGINT)) AS BIGINT)
        FROM '{SF}/events.parquet' GROUP BY 1, 2"""
    ).fetchall()
    series: dict[str, list] = defaultdict(list)
    for et, h, cents in raw:
        series[et].append((h, int(cents)))
    want = {}
    for et, pts in series.items():
        pts.sort()
        cents = [c for _, c in pts]
        t25 = {}
        for i in range(HALF, len(pts) - HALF):
            t25[i] = sum(cents[i - HALF : i + HALF + 1])
        snum, sn = defaultdict(int), defaultdict(int)
        for i, t in t25.items():
            hod = pts[i][0].hour
            snum[hod] += W * cents[i] - t
            sn[hod] += 1
        for i, t in t25.items():
            hod = pts[i][0].hour
            seasonal = snum[hod] / (sn[hod] * W * 100)
            want[(et, pts[i][0])] = (
                cents[i] / 100,
                t / (W * 100),
                seasonal,
                (W * cents[i] - t) / (W * 100) - seasonal,
            )
    got = {
        (r.event_type, r.hour_ts): (r.value, r.trend, r.seasonal, r.remainder)
        for r in QUERIES["events_stl_decompose"].fn(spark, SF).collect()
    }
    assert set(got) == set(want)
    for key, (v, t, s, rem) in want.items():
        gv, gt, gs, grem = got[key]
        assert gv == v and gt == t and gs == s and grem == rem
        # additive identity (exact in rationals, ~1 ulp in doubles)
        assert abs((gt + gs + grem) - gv) < 1e-9


def test_binaryfile_manifest_is_byte_exact(spark):
    import hashlib

    got = {
        r.doc_id: (r.n_bytes, r.content_md5, r.head)
        for r in QUERIES["scan_binaryfile_manifest"].fn(spark, SF).collect()
    }
    src = duckdb.sql(
        f"SELECT doc_id, text FROM '{SF}/documents.parquet' WHERE doc_id < 64"
    ).fetchall()
    assert set(got) == {d for d, _ in src}
    for d, text in src:
        b = text.encode("utf-8")
        assert got[d] == (len(b), hashlib.md5(b).hexdigest(), text[:12])


def test_time_funcs_match_python_recompute(spark):
    got = {
        r.event_id: (r.tod_str, r.t_h, r.t_m, r.t_s, r.secs_of_day, r.is_am)
        for r in QUERIES["scalar_time_funcs"].fn(spark, SF).collect()
    }
    src = duckdb.sql(
        f"SELECT event_id, ts FROM '{SF}/events.parquet' WHERE event_id < 2000"
    ).fetchall()
    assert set(got) == {e for e, _ in src}
    for e, ts in src:
        h, m, s = ts.hour, ts.minute, ts.second
        assert got[e] == (
            f"{h:02d}:{m:02d}:{s:02d}",
            h,
            m,
            s,
            h * 3600 + m * 60 + s,
            h < 12,
        )


def test_parameterized_binding_is_typed_not_spliced(spark):
    """Markers must bind VALUES: a hostile string argument is compared as
    a literal, never spliced into the SQL text."""
    from mk_kafka_connect_spark.catalog import load_table

    load_table(spark, SF, "orders").createOrReplaceTempView("inj_orders")
    hostile = "1-URGENT' OR '1'='1"
    n = spark.sql(
        "SELECT count(*) AS n FROM inj_orders WHERE o_orderpriority = :p",
        args={"p": hostile},
    ).collect()[0].n
    assert n == 0  # spliced text would match every 1-URGENT row

    # Each param_set slice equals its literal replay.
    rows = QUERIES["sql_parameterized_exec"].fn(spark, SF).collect()
    got = {(r.param_set, r.o_orderpriority): (r.n, r.total) for r in rows}
    want = {}
    for tag, sql in [
        (
            "low_cap",
            "o_totalprice < 150000.0"
            " AND o_orderdate >= TIMESTAMP '1997-01-01'",
        ),
        (
            "high_cap",
            "o_totalprice < 400000.0"
            " AND o_orderdate >= TIMESTAMP '1995-06-01'",
        ),
        ("exec_imm", "o_orderkey % 10 = 3"),
    ]:
        for pri, cnt, tot in duckdb.sql(
            f"""SELECT o_orderpriority, count(*),
              CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,2))), 2)
                   AS DOUBLE)
            FROM '{SF}/orders.parquet' WHERE {sql} GROUP BY 1"""
        ).fetchall():
            want[(tag, pri)] = (cnt, tot)
    assert got == want


def test_approx_topk_is_exact_below_capacity(spark):
    got = {
        r.item: (r.est_count, r.exact_count, r.est_is_exact)
        for r in QUERIES["agg_approx_topk"].fn(spark, SF).collect()
    }
    want = dict(
        duckdb.sql(
            f"SELECT event_type, count(*) FROM '{SF}/events.parquet' GROUP BY 1"
        ).fetchall()
    )
    assert set(got) == set(want)
    for item, n in want.items():
        assert got[item] == (n, n, True)


def test_ridge_matches_numpy_solve(spark):
    """The Cramer solve must agree with numpy's linear solver on the same
    normal equations — and fitting with lambda=0 on synthetic exact-linear
    data is implicitly covered by the closed form."""
    import numpy as np

    rows = duckdb.sql(
        f"""SELECT CAST(round(CAST(embedding[1] AS DOUBLE) * 10000) AS BIGINT),
          CAST(round(CAST(embedding[2] AS DOUBLE) * 10000) AS BIGINT),
          CAST(label AS BIGINT)
        FROM '{SF}/embeddings.parquet'"""
    ).fetchall()
    X = np.array([[1.0, q0, q1] for q0, q1, _ in rows])
    y = np.array([float(v) for _, _, v in rows])
    lam = 1000.0
    M = X.T @ X + np.diag([0.0, lam, lam])
    beta = np.linalg.solve(M, X.T @ y)
    r = QUERIES["emb_ridge_normal_eq"].fn(spark, SF).collect()[0]
    assert r.n == len(rows) and r.lambda_q == 1000
    got = np.array([r.beta_intercept, r.beta_d0, r.beta_d1])
    assert np.allclose(got, beta, rtol=1e-9, atol=1e-12)


def test_feature_standardize_matches_python(spark):
    import math
    import statistics

    rows = duckdb.sql(
        f"""SELECT o_orderkey, o_orderpriority,
          CAST(round(CAST(o_totalprice AS DECIMAL(18,2)) * 100, 0) AS BIGINT)
        FROM '{SF}/orders.parquet' WHERE o_orderkey < 8000"""
    ).fetchall()
    groups = defaultdict(list)
    for k, pri, cents in rows:
        groups[pri].append((k, int(cents)))
    got = {
        r.o_orderkey: r
        for r in QUERIES["orders_feature_standardize"].fn(spark, SF).collect()
    }
    assert len(got) == len(rows)
    for pri, members in groups.items():
        cents = [c for _, c in members]
        n, s = len(cents), sum(cents)
        mu = s / n
        sd = math.sqrt(
            (sum(c * c for c in cents) * n - s * s) / (n * (n - 1))
        )
        assert math.isclose(
            sd, statistics.stdev(cents), rel_tol=1e-12
        )  # the integer-moment identity IS the sample stdev
        mn, mx = min(cents), max(cents)
        # deterministic decile assignment: rank in (cents, key) order
        order = sorted(members, key=lambda t: (t[1], t[0]))
        for rank, (k, c) in enumerate(order):
            r = got[k]
            assert math.isclose(r.z_price, (c - mu) / sd, rel_tol=1e-12)
            assert math.isclose(
                r.minmax_price, (c - mn) / (mx - mn), rel_tol=1e-12
            )
            # ntile(10): first (len % 10) bins get the extra row
            base, extra = divmod(n, 10)
            bin_edges, acc = [], 0
            for b in range(10):
                acc += base + (1 if b < extra else 0)
                bin_edges.append(acc)
            want_bin = next(
                b + 1 for b, edge in enumerate(bin_edges) if rank < edge
            )
            assert r.decile == want_bin
            assert (r.oh_urgent, r.oh_high, r.oh_medium) == (
                int(pri == "1-URGENT"),
                int(pri == "2-HIGH"),
                int(pri == "3-MEDIUM"),
            )


def test_arrow_scalar_udf_is_arrow_vectorized_and_exact(spark):
    rows = QUERIES["udf_arrow_scalar"].fn(spark, SF)
    plan = rows._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" in plan  # Arrow path, not BatchEvalPython
    assert "BatchEvalPython\n" not in plan
    # (l_orderkey, l_linenumber) is NOT unique in this fixture — compare
    # as sorted multisets keyed on the full row.
    got = sorted(
        (r.l_orderkey, r.l_linenumber, r.scaled_qty, r.hashed_qty)
        for r in rows.collect()
    )
    src = duckdb.sql(
        f"""SELECT l_orderkey, l_linenumber,
          CAST(round(CAST(l_quantity AS DECIMAL(18,2)), 0) AS BIGINT)
        FROM '{SF}/lineitem.parquet' WHERE l_orderkey < 2000"""
    ).fetchall()
    want = sorted(
        (a, b, q * 2.5, (q * q + 7) % 97) for a, b, q in src
    )
    assert got == want


def test_udtf_table_arg_receives_ordered_complete_partitions(spark):
    """The PTF contract: each partition arrives complete and in ORDER BY
    order — recomputed sequentially in plain Python."""
    src = duckdb.sql(
        f"""SELECT event_type, event_id, ts FROM '{SF}/events.parquet'
        WHERE event_id < 3000 ORDER BY event_type, ts, event_id"""
    ).fetchall()
    want = {}
    for et, eid, ts in src:
        st = want.setdefault(et, {"n": 0, "first": eid, "last": eid,
                                  "prev": None, "gap": None})
        st["n"] += 1
        st["last"] = eid
        epoch = int(ts.timestamp())
        if st["prev"] is not None:
            g = epoch - st["prev"]
            st["gap"] = g if st["gap"] is None else max(st["gap"], g)
        st["prev"] = epoch
    got = {
        r.event_type: (r.n_events, r.first_id, r.last_id, r.max_gap_s)
        for r in QUERIES["udf_udtf_table_arg"].fn(spark, SF).collect()
    }
    assert got == {
        et: (st["n"], st["first"], st["last"], st["gap"])
        for et, st in want.items()
    }


def test_sql_udf_inlines_into_codegen(spark):
    """A SQL UDF must dissolve into the plan — no Python eval node, and
    the rollup equals the plain-Python recompute."""
    from decimal import ROUND_HALF_UP, Decimal

    df = QUERIES["sql_udf_functions"].fn(spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan  # no Python boundary at all
    src = duckdb.sql(
        f"""SELECT l_quantity, l_extendedprice, l_discount
        FROM '{SF}/lineitem.parquet' WHERE l_orderkey < 3000"""
    ).fetchall()
    agg = defaultdict(lambda: [0, Decimal(0)])
    for q, p, d in src:
        band = "bulk" if q >= 40.0 else ("mid" if q >= 15.0 else "small")
        net = (
            Decimal(str(round(p, 2))) * (1 - Decimal(str(round(d, 2))))
        ).quantize(Decimal("0.01"), rounding=ROUND_HALF_UP)
        agg[band][0] += 1
        agg[band][1] += net
    got = {r.qty_band: (r.n, r.net_revenue) for r in df.collect()}
    assert set(got) == set(agg)
    for band, (n, tot) in agg.items():
        assert got[band][0] == n
        assert abs(got[band][1] - float(tot)) < 1e-6


def test_identifier_clause_binds_names_safely(spark):
    """IDENTIFIER(:p) must resolve names (not splice SQL), and a hostile
    name must fail resolution as ONE identifier rather than execute."""
    import pytest
    from pyspark.sql.utils import AnalysisException

    from mk_kafka_connect_spark.catalog import load_table

    load_table(spark, SF, "orders").createOrReplaceTempView("ident_orders")
    # hostile "column name" must not become an expression
    with pytest.raises(AnalysisException):
        spark.sql(
            "SELECT IDENTIFIER(:c) FROM ident_orders LIMIT 1",
            args={"c": "o_orderkey; DROP VIEW ident_orders"},
        ).collect()
    # and the view must still exist afterwards
    assert spark.sql("SELECT count(*) FROM ident_orders").collect()[0][0] > 0

    got = {
        r.dim_value: (r.n, r.total)
        for r in QUERIES["sql_identifier_clause"].fn(spark, SF).collect()
    }
    want = {
        pri: (n, tot)
        for pri, n, tot in duckdb.sql(
            f"""SELECT o_orderpriority, count(*),
              CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,2))), 2)
                   AS DOUBLE)
            FROM '{SF}/orders.parquet' GROUP BY 1"""
        ).fetchall()
    }
    assert got == want


def test_static_partition_pruning_reads_only_matching_dirs(spark, tmp_path):
    """The pruning mechanism itself: with a literal partition predicate,
    inputFiles() must contain ONLY the matching partition directories and
    the plan must carry a metadata-level PartitionFilter."""
    from pyspark.sql import functions as F

    from mk_kafka_connect_spark.catalog import load_table

    root = str(tmp_path / "orders_by_year")
    load_table(spark, SF, "orders").select(
        "o_orderkey",
        "o_totalprice",
        F.year("o_orderdate").cast("int").alias("order_year"),
    ).write.partitionBy("order_year").parquet(root)
    pruned = spark.read.parquet(root).filter(
        F.col("order_year").isin(1996, 1997)
    )
    # inputFiles() reflects the unfiltered relation; the EXECUTED read is
    # what pruning governs — collect the files actually touched.
    files = [
        r.f
        for r in pruned.select(
            F.input_file_name().alias("f")
        ).distinct().collect()
    ]
    assert files, "pruned scan read no files"
    assert all(
        "order_year=1996" in f or "order_year=1997" in f for f in files
    )
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "order_year" in plan.split(
        "PartitionFilters"
    )[1].split("]")[0]

    got = {
        (r.order_year, r.o_orderpriority): (r.n, r.total)
        for r in QUERIES["scan_partition_pruning_static"]
        .fn(spark, SF)
        .collect()
    }
    want = {
        (y, pri): (n, tot)
        for y, pri, n, tot in duckdb.sql(
            f"""SELECT CAST(year(o_orderdate) AS INTEGER), o_orderpriority,
              count(*),
              CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,2))), 2)
                   AS DOUBLE)
            FROM '{SF}/orders.parquet'
            WHERE year(o_orderdate) IN (1996, 1997) GROUP BY 1, 2"""
        ).fetchall()
    }
    assert got == want


def test_hll_sliding_window_exact_leg_and_sketch_bounds(spark):
    """The exact trailing distinct must equal a plain-Python trailing-set
    recompute, the window_hours ramp must be correct, and the sketch
    estimate must sit inside its 3-sigma band everywhere."""
    rows = duckdb.sql(
        f"""SELECT DISTINCT CAST(date_trunc('hour', ts) AS TIMESTAMP),
          user_id FROM '{SF}/events.parquet'"""
    ).fetchall()
    by_hour = defaultdict(set)
    for h, u in rows:
        by_hour[h].add(u)
    hours = sorted(by_hour)
    got = {
        r.hour_ts: (r.window_hours, r.exact_trailing, r.est_within_3sigma)
        for r in QUERIES["events_hll_sliding_window"].fn(spark, SF).collect()
    }
    assert set(got) == set(hours)
    from datetime import timedelta

    for h in hours:
        lo = h - timedelta(hours=23)
        in_win = [g for g in hours if lo <= g <= h]
        trailing = set()
        for g in in_win:
            trailing |= by_hour[g]
        wh, exact, in_bounds = got[h]
        assert wh == len(in_win)  # calendar-trailing present hours
        assert exact == len(trailing)
        assert in_bounds is True


def test_higher_moments_match_python_recompute(spark):
    import math

    rows = duckdb.sql(
        f"""SELECT event_type,
          CAST(round(CAST(value AS DECIMAL(18,2)) * 100, 0) AS BIGINT)
        FROM '{SF}/events.parquet'"""
    ).fetchall()
    groups = defaultdict(list)
    for et, c in rows:
        groups[et].append(int(c))
    got = {
        r.event_type: r
        for r in QUERIES["events_higher_moments"].fn(spark, SF).collect()
    }
    assert set(got) == set(groups)
    for et, cs in groups.items():
        n = len(cs)
        mu = sum(cs) / n
        m2 = sum(c * c for c in cs) / n - mu * mu
        m3 = sum((c - mu) ** 3 for c in cs) / n
        m4 = sum((c - mu) ** 4 for c in cs) / n
        r = got[et]
        assert r.n == n
        assert math.isclose(r.mean_value, mu / 100, rel_tol=1e-12)
        assert math.isclose(r.std_value, math.sqrt(m2) / 100, rel_tol=1e-9)
        assert math.isclose(r.skewness, m3 / m2**1.5, rel_tol=1e-6)
        assert math.isclose(
            r.kurtosis_excess, m4 / m2**2 - 3, rel_tol=1e-6
        )
        assert math.isclose(r.cv, math.sqrt(m2) / mu, rel_tol=1e-9)


def test_join_hints_steer_the_physical_strategy(spark):
    """Each hint must produce its physical join node, and all three legs
    must agree with each other and with a plain recompute."""
    from pyspark.sql import functions as F

    from mk_kafka_connect_spark.catalog import load_table
    from mk_kafka_connect_spark.functions.exact import dec2, dsum

    c = load_table(spark, SF, "customer").select("c_custkey", "c_mktsegment")
    o = load_table(spark, SF, "orders").select("o_custkey", "o_totalprice")
    for hint, node in [
        ("broadcast", "BroadcastHashJoin"),
        ("merge", "SortMergeJoin"),
        ("shuffle_hash", "ShuffledHashJoin"),
    ]:
        j = o.join(c.hint(hint), o.o_custkey == F.col("c_custkey"))
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert node in plan, f"{hint} did not plan as {node}"

    rows = QUERIES["join_strategy_hints"].fn(spark, SF).collect()
    legs = defaultdict(dict)
    for r in rows:
        legs[r.strategy][r.c_mktsegment] = (r.n, r.total)
    assert set(legs) == {"broadcast", "merge", "shuffle_hash"}
    assert legs["broadcast"] == legs["merge"] == legs["shuffle_hash"]
    want = {
        seg: (n, tot)
        for seg, n, tot in duckdb.sql(
            f"""SELECT c_mktsegment, count(*),
              CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,2))), 2)
                   AS DOUBLE)
            FROM '{SF}/orders.parquet' o
            JOIN '{SF}/customer.parquet' c ON o_custkey = c_custkey
            GROUP BY 1"""
        ).fetchall()
    }
    assert legs["broadcast"] == want


def test_streaming_hll_window_matches_batch_exact(spark):
    """The streaming sketch estimates must cover every hour, equal the
    batch-exact leg within the stated band everywhere, and the exact leg
    must match a plain recompute."""
    got = {
        r.wstart: (r.exact_users, r.est_within_3sigma)
        for r in QUERIES["streaming_hll_distinct_window"]
        .fn(spark, SF)
        .collect()
    }
    want = dict(
        duckdb.sql(
            f"""SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP),
              count(DISTINCT user_id)
            FROM '{SF}/events.parquet' GROUP BY 1"""
        ).fetchall()
    )
    assert set(got) == set(want)
    for h, n in want.items():
        assert got[h] == (n, True)


def test_aqe_skew_split_actually_fires(spark):
    """With the lowered thresholds and a multi-mapper fact, the skewed
    sort-merge join's executed adaptive plan must mark the join
    skew=true (the split fired), and the result must match a plain
    recompute. Also pins the mapper-granularity constraint: the SAME
    join with a single-mapper fact cannot split."""
    from pyspark.sql import functions as F

    from mk_kafka_connect_spark.catalog import load_table
    from mk_kafka_connect_spark.plans.relational import (
        _AQE_SKEW_CONFS,
        _AQE_SKEW_MAPPERS,
    )

    old = {k: spark.conf.get(k, None) for k in _AQE_SKEW_CONFS}
    for k, v in _AQE_SKEW_CONFS.items():
        spark.conf.set(k, v)
    try:
        def run(n_mappers):
            li = load_table(spark, "/root/testdata/sf0.01", "lineitem")
            if n_mappers:
                li = li.repartition(n_mappers)
            fact = li.select(
                F.when(F.col("l_orderkey") % 5 != 0, F.lit(1))
                .otherwise(1 + F.col("l_orderkey") % 100)
                .alias("k"),
                "l_extendedprice",
            )
            dim = load_table(
                spark, "/root/testdata/sf0.01", "supplier"
            ).select("s_suppkey", "s_nationkey")
            j = fact.join(dim.hint("merge"), fact.k == dim.s_suppkey)
            j.collect()
            return j._jdf.queryExecution().executedPlan().toString()

        assert "skew=true" in run(_AQE_SKEW_MAPPERS), "skew split must fire"
        # single map task -> nothing to split at mapper granularity
        assert "skew=true" not in run(None)
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)

    got = {
        r.s_nationkey: (r.n, r.revenue)
        for r in QUERIES["join_aqe_skew_split"].fn(spark, SF).collect()
    }
    want = {
        g: (n, rev)
        for g, n, rev in duckdb.sql(
            f"""WITH fact AS (
              SELECT CASE WHEN l_orderkey % 5 != 0 THEN 1
                          ELSE 1 + l_orderkey % 100 END AS k,
                     l_extendedprice
              FROM '{SF}/lineitem.parquet')
            SELECT s.s_nationkey, count(*),
              CAST(round(sum(CAST(f.l_extendedprice AS DECIMAL(18,2))), 2)
                   AS DOUBLE)
            FROM fact f JOIN '{SF}/supplier.parquet' s ON f.k = s.s_suppkey
            GROUP BY 1"""
        ).fetchall()
    }
    assert got == want


def test_compaction_preserves_values_and_survives_crash_window(spark, tmp_path):
    """Compaction must be value-preserving, and a verify failure must
    leave the source directory untouched (the safety-order contract)."""
    from pyspark.sql import functions as F

    from mk_kafka_connect_spark.catalog import load_table
    from mk_kafka_connect_spark.operators.maintenance import (
        compact_parquet,
        layout_stats,
    )

    path = str(tmp_path / "frag")
    load_table(spark, SF, "orders").select(
        "o_orderkey", "o_totalprice"
    ).repartition(16).write.parquet(path)
    before = layout_stats(spark, path)
    assert before["n_files"] == 16
    src_sum = spark.read.parquet(path).agg(
        F.sum("o_orderkey")
    ).collect()[0][0]
    res = compact_parquet(spark, path, target_bytes=1 << 30)
    assert res["compacted"] is True and res["n_files_after"] == 1
    assert (
        spark.read.parquet(path).agg(F.sum("o_orderkey")).collect()[0][0]
        == src_sum
    )
    # no-op path: already at target
    res2 = compact_parquet(spark, path, target_bytes=1 << 30)
    assert res2["compacted"] is False and res2["n_files_after"] == 1

    got = QUERIES["layout_compaction_roundtrip"].fn(spark, SF).collect()[0]
    want_n, want_sum = duckdb.sql(
        f"""SELECT count(*), CAST(sum(o_orderkey) AS BIGINT)
        FROM '{SF}/orders.parquet' WHERE o_orderkey < 6000"""
    ).fetchall()[0]
    assert (got.n_files_before, got.n_files_after, got.compacted) == (
        64,
        1,
        True,
    )
    assert (got.n_rows, got.key_checksum) == (want_n, want_sum)


def test_pivot_unpivot_clause_is_exact_inverse(spark):
    got = {
        (r.user_bucket, r.event_type): r.n
        for r in QUERIES["sql_pivot_unpivot_clause"].fn(spark, SF).collect()
    }
    want = {
        (b, et): n
        for b, et, n in duckdb.sql(
            f"""SELECT user_id % 50, event_type, count(*)
            FROM '{SF}/events.parquet'
            WHERE event_type IN ('click', 'view', 'purchase')
            GROUP BY 1, 2"""
        ).fetchall()
    }
    assert got == want
    # sparsity restored: no zero-count rows survive the round trip
    assert all(n > 0 for n in got.values())


def test_sax_word_matches_python_recompute(spark):
    import math

    rows = duckdb.sql(
        f"""SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP),
          CAST(sum(CAST(round(CAST(value AS DECIMAL(18,2)) * 100, 0)
                        AS BIGINT)) AS BIGINT),
          count(*)
        FROM '{SF}/events.parquet' GROUP BY 1, 2"""
    ).fetchall()
    series = defaultdict(list)
    for et, day, s, c in rows:
        series[et].append((day, int(s), int(c)))
    got = {
        r.event_type: (r.n_segments, r.sax_word, r.n_symbols)
        for r in QUERIES["events_sax_motifs"].fn(spark, SF).collect()
    }
    assert set(got) == set(series)

    def half_up(x):
        return math.floor(x + 0.5) if x >= 0 else math.ceil(x - 0.5)

    for et, days in series.items():
        days.sort()
        q = [half_up(s * 100.0 / c) for _, s, c in days]
        segs = defaultdict(list)
        for i, v in enumerate(q):
            segs[i // 5].append(v)
        seg_q = {
            g: half_up(sum(vs) * 1.0 / len(vs)) for g, vs in segs.items()
        }
        d = len(seg_q)
        s1 = sum(seg_q.values())
        s2 = sum(v * v for v in seg_q.values())
        word = ""
        for g in sorted(seg_q):
            if s2 * d == s1 * s1:
                word += "c"
                continue
            z = (seg_q[g] - s1 / d) / math.sqrt(s2 / d - (s1 / d) ** 2)
            word += (
                "a" if z < -0.6745 else "b" if z < 0 else
                "c" if z < 0.6745 else "d"
            )
        assert got[et] == (d, word, len(set(word)))


def test_fdr_bh_matches_python_stepup(spark):
    """Plain-Python BH over plain-Python Welch tests (scipy-free normal
    tail via the same A&S polynomial): ranks, threshold, and rejection
    set must match, and the rejected set must be exactly the planted
    click-shift tests at this scale."""
    import math

    rows = duckdb.sql(
        f"""SELECT event_type, user_id % 5,
          CAST(round(CAST(value AS DECIMAL(18,2)) * 100, 0) AS BIGINT)
        FROM '{SF}/events.parquet'"""
    ).fetchall()
    cells = defaultdict(list)
    for t, b, c in rows:
        c = int(c) + (5000 if t == "click" and b in (0, 1) else 0)
        cells[(t, b)].append(c)

    def p_from_z(z):
        x = abs(z) / math.sqrt(2.0)
        t = 1.0 / (1.0 + 0.3275911 * x)
        poly = (
            0.254829592 * t
            - 0.284496736 * t**2
            + 1.421413741 * t**3
            - 1.453152027 * t**4
            + 1.061405429 * t**5
        )
        return round(poly * math.exp(-x * x), 8)

    tests = []
    types = sorted({t for t, _ in cells})
    for i, ta in enumerate(types):
        for tb in types[i + 1 :]:
            for b in range(5):
                A, B = cells[(ta, b)], cells[(tb, b)]
                na, nb = len(A), len(B)
                ma, mb = sum(A) / na, sum(B) / nb
                va = (sum(c * c for c in A) - sum(A) ** 2 / na) / (na - 1)
                vb = (sum(c * c for c in B) - sum(B) ** 2 / nb) / (nb - 1)
                z = (ma - mb) / math.sqrt(va / na + vb / nb)
                tests.append((ta, tb, b, p_from_z(z)))
    tests.sort(key=lambda t: (t[3], t[0], t[1], t[2]))
    m = len(tests)
    p_star = None
    for k, (_, _, _, p) in enumerate(tests, 1):
        if p * m <= k * 0.05:
            p_star = p
    want_rejected = {
        (ta, tb, b) for ta, tb, b, p in tests
        if p_star is not None and p <= p_star
    }
    got = {
        (r.type_a, r.type_b, r.bucket): (r.p, r.p_rank, r.rejected)
        for r in QUERIES["events_fdr_bh"].fn(spark, SF).collect()
    }
    assert len(got) == m
    for k, (ta, tb, b, p) in enumerate(tests, 1):
        gp, grank, grej = got[(ta, tb, b)]
        assert math.isclose(gp, p, abs_tol=2e-8)
        assert grank == k
        assert grej == ((ta, tb, b) in want_rejected)
    # the planted effects are the only rejections, and there ARE some
    assert want_rejected
    assert all(
        ("click" in (ta, tb)) and b in (0, 1)
        for ta, tb, b in want_rejected
    )


def test_filter_clause_matches_python_and_window_binds(spark):
    rows = QUERIES["sql_filter_window_clause"].fn(spark, SF).collect()
    src = duckdb.sql(
        f"""SELECT event_type, user_id, value,
          CAST(round(CAST(value AS DECIMAL(18,2)) * 100, 0) AS BIGINT)
        FROM '{SF}/events.parquet' WHERE event_id < 2000"""
    ).fetchall()
    agg = defaultdict(lambda: [0, 0, 0, 0])
    for et, uid, v, cents in src:
        a = agg[et]
        a[0] += 1
        a[1] += 1 if v > 100.0 else 0
        a[2] += int(cents) if uid % 2 == 0 else 0
        a[3] += int(cents)
    got = {
        r.event_type: (r.n, r.n_high, r.cents_even, r.max_rn,
                       r.final_run_cents)
        for r in rows
    }
    assert set(got) == set(agg)
    for et, (n, nh, ce, tot) in agg.items():
        # max_rn == n and final running sum == group total: the named
        # window bound to the same partitioning as the aggregate.
        assert got[et] == (n, nh, ce, n, tot)


def test_url_canonical_dedup_matches_python(spark):
    import re

    src = duckdb.sql(
        f"SELECT doc_id, source FROM '{SF}/documents.parquet'"
    ).fetchall()
    clusters = defaultdict(list)
    for doc_id, source in src:
        scheme = "HTTPS://" if doc_id % 3 == 0 else "https://"
        base = f"cdn{(doc_id // 4) % 10}"
        host = base.upper() if doc_id % 2 == 0 else base
        tail = {
            1: "?utm_source=feed&utm_campaign=x",
            2: "?utm_medium=rss",
            3: "#section-2",
            0: "",
        }[doc_id % 4]
        url = f"{scheme}{host}.example.com/docs/{doc_id // 4}{tail}"
        c = re.sub(r"#.*$", "", url)
        c = re.sub(r"\?utm_[a-z_]+=[^&#]*(&utm_[a-z_]+=[^&#]*)*$", "", c)
        clusters[c.lower()].append(doc_id)
    r = QUERIES["docs_url_canonical_dedup"].fn(spark, SF).collect()[0]
    assert r.n_canonical == len(clusters)
    assert r.n_raw == len(src)
    assert r.n_removed == sum(len(v) - 1 for v in clusters.values() if len(v) > 1)
    assert r.keeper_checksum == sum(min(v) for v in clusters.values())
    # the planted variants actually collide: ~4 raw urls per canonical
    assert r.n_removed > 0 and r.n_canonical < r.n_raw


def test_magic_bytes_detection_matches_python(spark):
    sigs = {
        0: (bytes.fromhex("89504E470D0A1A0A"), "png"),
        1: (bytes.fromhex("FFD8FF"), "jpeg"),
        2: (bytes.fromhex("25504446"), "pdf"),
        3: (bytes.fromhex("504B0304"), "zip"),
    }
    src = duckdb.sql(
        f"SELECT doc_id, text FROM '{SF}/documents.parquet'"
    ).fetchall()
    agg = defaultdict(lambda: [0, 0, 0])
    for doc_id, text in src:
        sig, fmt = sigs.get(doc_id % 5, (b"", "unknown"))
        blob = sig + text.encode("utf-8")
        # detect from the BYTES, independently of how they were staged
        det = "unknown"
        for s, f in [sigs[k] for k in sorted(sigs)]:
            if blob.startswith(s):
                det = f
                break
        assert det == fmt  # staged signature must be detectable
        a = agg[det]
        a[0] += 1
        a[1] += len(blob)
        a[2] += doc_id
    got = {
        r.detected: (r.n_blobs, r.total_bytes, r.id_checksum)
        for r in QUERIES["multimodal_magic_bytes"].fn(spark, SF).collect()
    }
    assert got == {k: tuple(v) for k, v in agg.items()}
    assert set(got) == {"png", "jpeg", "pdf", "zip", "unknown"}


def test_hll_sketch_survives_parquet_roundtrip(spark, tmp_path):
    """The stored-sketch estimate must equal the in-memory union exactly
    (bit-intact serialization), and the certified rows must match the
    exact daily distincts."""
    from pyspark.sql import functions as F

    from mk_kafka_connect_spark.catalog import load_table

    pairs = load_table(spark, SF, "events").select(
        F.date_trunc("hour", "ts").alias("h"), "user_id"
    )
    sk = pairs.groupBy("h").agg(
        F.expr("hll_sketch_agg(user_id)").alias("sk")
    )
    mem = {
        r.day: r.est
        for r in sk.groupBy(F.date_trunc("day", "h").alias("day"))
        .agg(F.expr("hll_sketch_estimate(hll_union_agg(sk))").alias("est"))
        .collect()
    }
    path = str(tmp_path / "sketches")
    sk.write.parquet(path)
    stored = {
        r.day: r.est
        for r in spark.read.parquet(path)
        .groupBy(F.date_trunc("day", "h").alias("day"))
        .agg(F.expr("hll_sketch_estimate(hll_union_agg(sk))").alias("est"))
        .collect()
    }
    assert stored == mem  # parquet round trip is bit-intact

    got = {
        r.day: (r.exact_users, r.est_within_3sigma)
        for r in QUERIES["agg_hll_sketch_persist"].fn(spark, SF).collect()
    }
    want = dict(
        duckdb.sql(
            f"""SELECT CAST(date_trunc('day', ts) AS TIMESTAMP),
              count(DISTINCT user_id)
            FROM '{SF}/events.parquet' GROUP BY 1"""
        ).fetchall()
    )
    assert got == {d: (n, True) for d, n in want.items()}
