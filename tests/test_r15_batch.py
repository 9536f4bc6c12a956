"""Semantic contracts for the round-15 additions — properties the oracle
comparison alone can't express: the incremental driver's cron gate and
frozen crash window, semi-join emit-at-most-once, and independent plain-
Python recomputation of every aggregate."""

from __future__ import annotations

import json

import duckdb

from mk_kafka_connect_spark.plans import QUERIES

SF = "/root/testdata/sf0.001"
SF01 = "/root/testdata/sf0.01"


def test_incremental_cron_replay_cycle_script(spark):
    from mk_kafka_connect_spark.plans.streaming import (
        _INC_ENTITIES,
        _INC_T0,
        _INC_T1,
        _INC_T2,
        _INC_T3,
        _INC_T4,
        _INC_T4R,
        _INC_T5,
        _run_incremental_cron_replay,
    )

    audit: dict = {}
    result = {
        r.entity: r for r in _run_incremental_cron_replay(spark, SF, audit).collect()
    }
    cycles = dict((at, wins) for at, wins in audit["cycles"])

    # INITIAL backfill covers [T0, T1) for every entity, then the mode
    # switch makes everything cron-gated.
    assert cycles[_INC_T1] == [(e, _INC_T0, _INC_T1) for e in _INC_ENTITIES]
    # The readiness gate (Task.java:178-190): a poll before the next
    # Quartz fire processes NOTHING.
    assert cycles[_INC_T2] == []
    assert cycles[_INC_T3] == [(e, _INC_T1, _INC_T3) for e in _INC_ENTITIES]
    # The crash hit the LAST entity's sink: earlier entities committed
    # their [T3, T4) batch, so the recovery cycle resumes ONLY the
    # crashed entity — and with the FROZEN upper bound T4, not the
    # resume-time clock T4R (Task.java:245-262 semantics).
    assert audit["crashed_at"] == _INC_T4
    assert _INC_T4 not in cycles  # run_once raised before returning
    assert cycles[_INC_T4R] == [(_INC_ENTITIES[-1], _INC_T3, _INC_T4)]
    assert cycles[_INC_T5] == [(e, _INC_T4, _INC_T5) for e in _INC_ENTITIES]

    # Independent recompute: counts/checksums/window-bucketing straight
    # off the parquet via DuckDB.
    orc = duckdb.sql(
        f"""SELECT event_type, count(*), sum(event_id),
          count(DISTINCT CASE
            WHEN ts < TIMESTAMP '{_INC_T1}' THEN 0
            WHEN ts < TIMESTAMP '{_INC_T3}' THEN 1
            WHEN ts < TIMESTAMP '{_INC_T4}' THEN 2 ELSE 3 END)
        FROM '{SF}/events.parquet'
        WHERE event_type IN {tuple(_INC_ENTITIES)}
          AND ts >= TIMESTAMP '{_INC_T0}' AND ts < TIMESTAMP '{_INC_T5}'
        GROUP BY 1"""
    ).fetchall()
    assert len(orc) == len(_INC_ENTITIES)
    for entity, n, checksum, n_windows in orc:
        r = result[entity]
        assert r.n_records == n
        assert r.id_checksum == checksum
        assert r.n_windows == n_windows == 4


def test_semi_join_emits_each_view_at_most_once(spark):
    rows = (
        QUERIES["streaming_stream_stream_semi_join"].fn(spark, SF).collect()
    )
    ids = [r.view_id for r in rows]
    assert len(ids) == len(set(ids)), "semi join emitted a view twice"

    # Plain-Python recompute of the EXISTS semantics.
    ev = duckdb.sql(
        f"""SELECT event_id, user_id, event_type, ts
        FROM '{SF}/events.parquet'
        WHERE event_type IN ('view', 'click')"""
    ).fetchall()
    clicks_by_user: dict = {}
    for eid, uid, et, ts in ev:
        if et == "click":
            clicks_by_user.setdefault(uid, []).append(ts)
    expected = set()
    horizon = 6 * 3600
    for eid, uid, et, ts in ev:
        if et != "view":
            continue
        for cts in clicks_by_user.get(uid, ()):
            gap = (cts - ts).total_seconds()
            if 0 < gap <= horizon:
                expected.add(eid)
                break
    assert set(ids) == expected
    assert expected, "fixture produced no converted views"


def test_variant_pipeline_matches_plain_recompute(spark):
    rows = {
        r.topic: r for r in QUERIES["cdc_variant_pipeline"].fn(spark, SF01).collect()
    }
    raw = duckdb.sql(
        f"""SELECT event_type, user_id, event_id, props
        FROM '{SF01}/events.parquet' WHERE user_id IS NOT NULL"""
    ).fetchall()
    agg: dict = {}
    for et, uid, eid, props in raw:
        t = f"events.{et}"
        a = agg.setdefault(
            t, {"n": 0, "users": set(), "sum_k": 0, "max_k": None, "ids": 0}
        )
        k = json.loads(props or "{}").get("k")
        a["n"] += 1
        a["users"].add(uid)
        a["ids"] += eid
        if k is not None:
            a["sum_k"] += k
            a["max_k"] = k if a["max_k"] is None else max(a["max_k"], k)
    assert set(rows) == set(agg)
    for t, a in agg.items():
        r = rows[t]
        assert r.n_records == a["n"]
        assert r.n_keys == len(a["users"])
        assert r.sum_k == a["sum_k"]
        assert r.max_k == a["max_k"]
        assert r.id_checksum == a["ids"]
        # Late-binding tolerance: the missing path bound NULL on every
        # record instead of erroring.
        assert r.n_missing_tolerated == a["n"]


def test_variant_pipeline_wire_format_is_canonical_json(spark):
    # The A10 value must be valid JSON whose payload field is the
    # CANONICAL re-serialization of the ingested VARIANT (parse→print
    # normalizes), and the key must be the A7 {id_field: id} contract.
    from pyspark.sql import functions as F

    from mk_kafka_connect_spark.catalog import load_table
    from mk_kafka_connect_spark.operators.cdc import (
        keyed_records,
        route_topics,
        to_kafka_shape,
    )

    ev = load_table(spark, SF, "events").select(
        "event_id", "user_id", "event_type", "props"
    )
    ingested = ev.select(
        "event_id",
        "user_id",
        "event_type",
        F.parse_json(F.coalesce(F.col("props"), F.lit("{}"))).alias("payload"),
    )
    shaped = to_kafka_shape(
        route_topics(
            keyed_records(ingested, "user_id").withColumn(
                "_entity_type", F.col("event_type")
            ),
            "events",
        )
    )
    for r in shaped.limit(50).collect():
        key = json.loads(r.key)
        val = json.loads(r.value)
        assert set(key) == {"user_id"}
        assert r.topic == f"events.{val['event_type']}"
        assert val["payload"] == json.loads(
            json.dumps(val["payload"], separators=(",", ":"))
        )
        assert "k" in val["payload"]


def test_retry_backoff_sleep_schedule(spark):
    # The A14 arithmetic, observed directly: two 500s then a 429 must
    # produce sleeps [2^0*1s (+<=10% jitter), 2^1*1s (+<=10% jitter),
    # exactly 60s], and the fetch must still complete in 7 requests.
    import random

    from mk_kafka_connect_spark.sources.fake_server import FakeRestServer
    from mk_kafka_connect_spark.sources.rest_client import RestClient

    data = {"events": [{"event_id": str(i)} for i in range(250)]}
    with FakeRestServer(data) as srv:
        sleeps: list[float] = []
        client = RestClient(
            srv.url, max_retries=3, sleeper=sleeps.append,
            rng=random.Random(7),
        )
        srv.fail_next(2)
        srv.rate_limit_next(1)
        got = []
        for _off, page in client.fetch_all("events", "mod_datetime", None, None, 100):
            got.extend(page.records)
    assert [int(r["event_id"]) for r in got] == list(range(250))
    assert len(sleeps) == 3
    assert 1.0 <= sleeps[0] <= 1.1
    assert 2.0 <= sleeps[1] <= 2.2
    assert sleeps[2] == 60.0
    # 3 failed + 3 pages (100/100/50; the short page ends pagination).
    assert len(srv.requests) == 6


def test_right_join_surfaces_every_click_exactly(spark):
    rows = (
        QUERIES["streaming_stream_stream_right_join"].fn(spark, SF).collect()
    )
    # Plain-Python recompute of the RIGHT OUTER semantics.
    ev = duckdb.sql(
        f"""SELECT event_id, user_id, event_type, ts
        FROM '{SF}/events.parquet'
        WHERE event_type IN ('view', 'click')"""
    ).fetchall()
    views_by_user: dict = {}
    clicks = []
    for eid, uid, et, ts in ev:
        if et == "view":
            views_by_user.setdefault(uid, []).append((eid, ts))
        else:
            clicks.append((eid, uid, ts))
    expected = set()
    horizon = 6 * 3600
    for cid, uid, cts in clicks:
        matched = False
        for vid, vts in views_by_user.get(uid, ()):
            gap = (cts - vts).total_seconds()
            if 0 < gap <= horizon:
                expected.add((cid, vid))
                matched = True
        if not matched:
            expected.add((cid, None))
    got = set((r.click_id, r.view_id) for r in rows)
    assert got == expected
    null_rows = [r for r in rows if r.view_id is None]
    assert null_rows, "fixture produced no organic clicks"
    assert all(r.gap_us is None for r in null_rows)


def test_recursive_hierarchy_matches_python_bfs(spark):
    rows = {
        r.depth: r for r in QUERIES["sql_recursive_hierarchy"].fn(spark, SF01).collect()
    }
    keys = [
        k for (k,) in duckdb.sql(
            f"SELECT s_suppkey FROM '{SF01}/supplier.parquet'"
        ).fetchall()
    ]
    bals = dict(
        duckdb.sql(
            f"SELECT s_suppkey, round(s_acctbal, 2) FROM '{SF01}/supplier.parquet'"
        ).fetchall()
    )
    keyset = set(keys)
    # Plain-Python BFS over parent(k) = k // 2, rooted at 1.
    level = {1} if 1 in keyset else set()
    depth = 0
    expected = {}
    while level:
        expected[depth] = set(level)
        level = {k for k in keyset if k // 2 in level and k // 2 != k}
        depth += 1
    assert set(rows) == set(expected)
    for d, nodes in expected.items():
        r = rows[d]
        assert r.n_nodes == len(nodes)
        assert r.min_key == min(nodes)
        assert r.max_key == max(nodes)
        assert abs(r.total_acctbal - round(sum(bals[k] for k in nodes), 2)) < 1e-6


def test_pipe_query_equals_classic_formulation(spark):
    # The pipe chain must be sugar over the same semantics as the
    # classic SQL formulation — engine-internal equality, independent
    # of the DuckDB oracle.
    from mk_kafka_connect_spark.catalog import load_table

    load_table(spark, SF01, "lineitem").createOrReplaceTempView(
        "sql_pipe_lineitem_t"
    )
    classic = spark.sql("""
      SELECT l_returnflag, l_linestatus,
        CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
             * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(18,2))))
             AS DOUBLE) AS revenue,
        CAST(count(*) AS BIGINT) AS n
      FROM sql_pipe_lineitem_t
      WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      GROUP BY l_returnflag, l_linestatus
      ORDER BY l_returnflag, l_linestatus
    """).collect()
    piped = QUERIES["sql_pipe_query"].fn(spark, SF01).collect()
    assert piped == classic


def test_collation_grouping_merges_case_variants(spark):
    rows = {
        r.priority: r
        for r in QUERIES["scalar_collation_funcs"].fn(spark, SF01).collect()
    }
    raw = duckdb.sql(
        f"""SELECT o_orderkey, o_orderpriority
        FROM '{SF01}/orders.parquet'"""
    ).fetchall()
    agg: dict = {}
    for okey, pri in raw:
        mangled = pri.upper() if okey % 2 == 0 else pri
        low = mangled.lower()
        a = agg.setdefault(low, {"n": 0, "urgent": 0, "h": 0, "ge": 0})
        a["n"] += 1
        a["urgent"] += low == "1-urgent"
        a["h"] += "h" in low
        a["ge"] += low >= "3-medium"
    assert set(rows) == set(agg)
    for low, a in agg.items():
        r = rows[low]
        assert (r.n, r.n_eq_urgent, r.n_contains_h, r.n_ge_medium) == (
            a["n"], a["urgent"], a["h"], a["ge"],
        )
    # The case-mangling really produced both casings pre-merge.
    assert any(okey % 2 == 0 for okey, _ in raw)
    assert rows["1-urgent"].n == rows["1-urgent"].n_eq_urgent


def test_fd_identity_holds_on_null_bearing_data(spark):
    # The fixture is NULL-free, so the NULL-as-value convention
    # (ADVICE r14 item 2) can only be proven here: on data WITH NULLs
    # in both LHS and RHS, the engine's sentinel-coalesced
    # distinct-count identity must equal the per-group ground truth
    # where NULL is a group of its own and a distinct B-value.
    from pyspark.sql import functions as F

    rows = [
        (1, "a"), (1, "a"), (1, None), (2, None), (2, None),
        (None, "a"), (None, "b"), (None, None), (3, "c"),
    ]
    df = spark.createDataFrame(rows, "k long, v string")
    k = F.coalesce(F.col("k"), F.lit(-(2**62)))
    v = F.coalesce(F.col("v"), F.concat(F.lit("\x00"), F.lit("NULL")))
    got = df.agg(
        (F.countDistinct(k, v) - F.countDistinct(k)).alias("violations"),
        F.countDistinct(k).alias("groups"),
    ).collect()[0]

    groups: dict = {}
    for kk, vv in rows:
        groups.setdefault(kk, set()).add(vv)
    expected_violations = sum(len(vs) - 1 for vs in groups.values())
    assert got.groups == len(groups) == 4
    assert got.violations == expected_violations == 3


def test_ansi_mode_is_on_and_try_funcs_recover(spark):
    # Spark 4 ships ANSI on: the plain operation THROWS on the staged
    # bad input, and the try_ variant is the sanctioned per-row
    # recovery (NULL exactly there, real values everywhere else).
    import pytest as _pytest
    from pyspark.sql import functions as F

    assert spark.conf.get("spark.sql.ansi.enabled") == "true"
    df = spark.range(1)
    with _pytest.raises(Exception, match="DIVIDE_BY_ZERO"):
        df.select(F.expr("1 / 0")).collect()
    with _pytest.raises(Exception, match="ARITHMETIC_OVERFLOW|OVERFLOW"):
        df.select(F.expr("9223372036854775807 + CAST(1 AS BIGINT)")).collect()
    rows = {
        r.event_id: r
        for r in QUERIES["scalar_ansi_try_funcs"].fn(spark, SF).collect()
    }
    for eid, r in rows.items():
        assert (r.safe_ratio is None) == (eid % 7 == 0)
        assert (r.parsed_id is None) == (eid % 3 == 0)
        assert (r.safe_inc is None) == (eid % 5 == 0)
        assert (r.parsed_ts is None) == (eid % 4 == 0)
        assert (r.elem is None) == (eid % 2 == 0)


def test_xml_roundtrip_matches_python_parser(spark):
    import xml.etree.ElementTree as ET

    from pyspark.sql import functions as F

    from mk_kafka_connect_spark.catalog import load_table

    # Rebuild the document column and parse it with Python's own XML
    # parser — independent of Spark's from_xml/xpath machinery.
    ev = load_table(spark, SF, "events").filter(F.col("event_id") < 50)
    v2 = F.round(F.col("value").cast("decimal(18,2)"), 2)
    xml = F.concat(
        F.lit('<e uid="'), F.col("user_id").cast("string"), F.lit('"><id>'),
        F.col("event_id").cast("string"), F.lit("</id><type>"),
        F.col("event_type"), F.lit("</type><val>"), v2.cast("string"),
        F.lit("</val></e>"),
    )
    docs = {
        r.event_id: r.x
        for r in ev.select("event_id", xml.alias("x")).collect()
    }
    rows = {
        r.event_id: r
        for r in QUERIES["scalar_xml_funcs"].fn(spark, SF).collect()
        if r.event_id < 50
    }
    assert set(rows) == set(docs)
    for eid, doc in docs.items():
        root = ET.fromstring(doc)
        r = rows[eid]
        assert r.x_id == int(root.find("id").text) == eid
        assert r.x_type == root.find("type").text
        assert abs(r.x_value - float(root.find("val").text)) < 1e-9
        assert r.xp_user == int(root.attrib["uid"])
        assert r.xp_type_upper == root.find("type").text.upper()


def test_jackknife_matches_python_recompute(spark):
    from decimal import Decimal

    rows = {
        r.event_type: r
        for r in QUERIES["events_jackknife_variance"].fn(spark, SF01).collect()
    }
    raw = duckdb.sql(
        f"""SELECT event_type, day(ts) AS d,
          CAST(round(CAST(value AS DECIMAL(18,2)) * 100, 0) AS BIGINT)
        FROM '{SF01}/events.parquet'"""
    ).fetchall()
    days: dict = {}
    for et, d, cents in raw:
        a = days.setdefault(et, {}).setdefault(d, [0, 0])
        a[0] += cents
        a[1] += 1
    for et, by_day in days.items():
        S = sum(v[0] for v in by_day.values())
        N = sum(v[1] for v in by_day.values())
        g = len(by_day)
        tis = [
            int(Decimal(str(round((S - s) / (100.0 * (N - n)), 6))) * 1000000)
            for s, n in by_day.values()
        ]
        tbar = sum(tis) / g
        v = (g - 1) / g * sum((t - tbar) ** 2 for t in tis) / 1e12
        r = rows[et]
        assert r.n_days == g
        assert abs(r.mean_value - round(S / (100.0 * N), 6)) < 1e-9
        assert abs(r.jk_var - v) < max(1e-6, abs(v) * 1e-6)
        assert r.jk_se > 0


def test_block_bootstrap_is_deterministic_and_sane(spark):
    r1 = QUERIES["events_block_bootstrap_ci"].fn(spark, SF01).collect()[0]
    r2 = QUERIES["events_block_bootstrap_ci"].fn(spark, SF01).collect()[0]
    # Bit-for-bit reproducible: every "draw" is md5 arithmetic.
    assert r1 == r2
    assert r1.n_replicates == 200
    assert r1.n_blocks >= 28  # the fixture's January
    # The CI must bracket the point estimate and be ordered.
    assert r1.ci_lo <= r1.mean_value <= r1.ci_hi
    assert r1.ci_lo < r1.ci_hi


def test_ivm_delta_terms_partition_the_join_exactly(spark):
    # The four delta terms must PARTITION the join — every (customer,
    # order) pair lands in exactly one term, and the cross term
    # (new-dim x new-fact) must be genuinely non-empty, or the test
    # proves nothing about the case one-sided IVM corrupts.
    from pyspark.sql import functions as F

    from mk_kafka_connect_spark.catalog import load_table
    from mk_kafka_connect_spark.plans.warehouse import (
        _IVM_CUT,
        _IVM_DIM_MOD,
    )

    c = load_table(spark, SF01, "customer").select("c_custkey")
    o = load_table(spark, SF01, "orders").select("o_custkey", "o_orderdate")
    j = c.join(o, c.c_custkey == o.o_custkey).select(
        (F.col("c_custkey") % _IVM_DIM_MOD == 0).alias("dc"),
        (F.col("o_orderdate") >= F.lit(_IVM_CUT).cast("timestamp")).alias(
            "do"
        ),
    )
    counts = {
        (r.dc, r.do): r["count"]
        for r in j.groupBy("dc", "do").count().collect()
    }
    assert len(counts) == 4 and all(v > 0 for v in counts.values()), counts
    total = QUERIES["ivm_join_delta"].fn(spark, SF01).collect()
    assert sum(r.n_orders for r in total) == sum(counts.values())


def test_config_probe_rejections_raise_for_the_right_reason(spark):
    # Independent of the registry row's booleans: each invalid option
    # must raise with the reference's message semantics.
    import pytest as _pytest

    from mk_kafka_connect_spark.sources.config import RestSourceConfig

    base = {
        "url": "http://x",
        "entities": "events,customers",
        "batch.size": "100",
        "entity.id.fields": "events:event_id,customers:custkey",
        "initial.datetimes": "events:1970-01-01 00:00:00",
    }
    cfg = RestSourceConfig.from_options(base)
    # FIRST-colon split: the datetime value keeps its own colons intact.
    assert cfg.initial_datetimes["events"] == "1970-01-01 00:00:00"
    assert cfg.id_field("customers") == "custkey"
    assert cfg.datetime_field("customers") == "mod_datetime"  # default
    with _pytest.raises(ValueError, match=r"\[1, 500\]"):
        RestSourceConfig.from_options({**base, "batch.size": "600"})
    with _pytest.raises(ValueError, match="no colon"):
        RestSourceConfig.from_options(
            {**base, "entity.id.fields": "events_no_colon"}
        )
    with _pytest.raises(ValueError, match="YYYY-MM-DD"):
        RestSourceConfig.from_options(
            {**base, "initial.datetimes": "events:yesterday"}
        )


def test_config_probe_fanout_is_one_partition_per_entity(spark):
    r = QUERIES["rest_config_fanout_probe"].fn(spark, SF01).collect()[0]
    assert r.conn_ok and r.conn_dead_fails
    assert r.rejects_batch_600 and r.rejects_malformed_map
    assert r.rejects_bad_datetime
    # Per-entity slices complete and disjoint (fixture truths).
    import duckdb as _dd

    n_e, s_e = _dd.sql(
        f"SELECT count(*), sum(event_id) FROM '{SF01}/events.parquet'"
        " WHERE event_id < 200"
    ).fetchall()[0]
    n_c, s_c = _dd.sql(
        f"SELECT count(*), sum(c_custkey) FROM '{SF01}/customer.parquet'"
        " WHERE c_custkey < 150"
    ).fetchall()[0]
    assert (r.n_events, r.sum_event_ids) == (n_e, s_e)
    assert (r.n_customers, r.sum_custkeys) == (n_c, s_c)
