"""Semantic contracts for the round-10 analysis operators — properties
the oracle comparison alone can't express (convergence, monotonicity,
independent recomputation)."""

from __future__ import annotations

import re

import numpy as np

from mk_kafka_connect_spark.plans import QUERIES

SF = "/root/testdata/sf0.01"


def test_kcore_output_is_a_fixpoint(spark):
    # The k-core property IS the convergence proof: the reported degrees
    # are the induced degrees after the final peel, so min(deg) >= k
    # means one more round would remove nothing — the 8 unrolled rounds
    # reached the fixpoint on this fixture.
    rows = QUERIES["graph_kcore"].fn(spark, SF).collect()
    assert rows, "3-core empty at sf0.01 (fixture should retain ~164 nodes)"
    assert min(r.core_deg for r in rows) >= 3
    kinds = {r.kind for r in rows}
    assert kinds == {"customer", "supplier"}, "bipartite core lost a side"
    # Bipartite id packing must be reversible.
    for r in rows[:10]:
        assert r.node == r.entity_key * 2 + (0 if r.kind == "customer" else 1)


def test_cusum_one_row_per_type_and_bounds(spark):
    rows = QUERIES["events_cusum_changepoint"].fn(spark, SF).collect()
    types = [r.event_type for r in rows]
    assert len(types) == len(set(types)) == 5
    for r in rows:
        # |n·cum − k·total| is bounded by n·total.
        assert abs(r.s_scaled) <= r.n_hours * r.total
        assert r.n_hours > 0 and r.total > 0


def test_rolling_distinct_window_dominates_day(spark):
    rows = QUERIES["events_rolling_distinct_users"].fn(spark, SF).collect()
    by_day = {r.day: r for r in rows}
    days = sorted(by_day)
    for r in rows:
        assert r.users_7d >= r.users_1d > 0
    # The first day has no history: its window equals its day count.
    first = by_day[days[0]]
    assert first.users_7d == first.users_1d
    # 30-day fixture -> 30 daily rows.
    assert len(rows) == len(days)


def test_pattern_journeys_flags_agree_with_re(spark):
    rows = QUERIES["events_pattern_journeys"].fn(spark, SF).collect()
    assert rows
    syms = set("cepsv")  # click error purchase signup view
    n_conv = 0
    for r in rows:
        assert set(r.path) <= syms
        assert len(r.path) == r.n_events
        assert r.converted == bool(re.search("v.*c.*p", r.path))
        assert r.error_burst == bool(re.search("ee", r.path))
        n_conv += int(r.converted)
    assert 0 < n_conv < len(rows), "pattern should split the journeys"


def test_histogram_drift_counts_and_fractions(spark):
    rows = QUERIES["events_histogram_drift"].fn(spark, SF).collect()
    assert len(rows) == 5 * 10  # types x bins, empty bins included
    by_type: dict[str, list] = {}
    for r in rows:
        by_type.setdefault(r.event_type, []).append(r)
    for t, rs in by_type.items():
        assert sorted(r.bin for r in rs) == list(range(10))
        assert abs(sum(r.frac_first for r in rs) - 1.0) < 1e-9
        assert abs(sum(r.frac_second for r in rs) - 1.0) < 1e-9
        for r in rs:
            assert r.drift_contrib >= 0.0


def test_bm25_ranking_is_consistent(spark):
    rows = QUERIES["docs_bm25_topk"].fn(spark, SF).collect()
    assert len(rows) == 50
    assert [r.rnk for r in sorted(rows, key=lambda r: r.rnk)] == list(
        range(1, 51)
    )
    ordered = sorted(rows, key=lambda r: r.rnk)
    for a, b in zip(ordered, ordered[1:]):
        assert (a.score, -a.doc_id) >= (b.score, -b.doc_id)
    for r in rows:
        assert r.score == r.s_join + r.s_hash + r.s_scan
        assert min(r.s_join, r.s_hash, r.s_scan) >= 0.0


def test_audio_energy_matches_numpy_recompute(spark):
    import duckdb

    out = (
        QUERIES["multimodal_audio_energy"]
        .fn(spark, SF)
        .filter("doc_id < 20")
        .collect()
    )
    texts = dict(
        duckdb.connect()
        .execute(
            f"SELECT doc_id, text FROM read_parquet('{SF}/documents.parquet') "
            "WHERE doc_id < 20 AND length(text) > 0"
        )
        .fetchall()
    )
    got = {(r.doc_id, r.frame_idx): r for r in out}
    for doc_id, text in texts.items():
        s = np.frombuffer(text.encode(), dtype=np.uint8).astype(np.int64)
        n = len(s)
        n_frames = (n - 1) // 128 + 1
        for f in range(n_frames):
            seg = s[f * 128 : f * 128 + 256]
            r = got.pop((doc_id, f))
            assert r.n_frame_bytes == len(seg)
            assert r.energy == int((seg * seg).sum())
            assert r.rms == float(
                np.sqrt(float((seg * seg).sum()) / len(seg))
            )
    assert not got, "extra frames beyond the recomputed set"


def test_asof_tolerance_is_subset_with_bounded_gap(spark):
    # Same fixture as join_asof_forward's view/purchase pairing but
    # backward: the untolerated variant is recomputed here via the
    # operator so the subset property is checked against the exact
    # same plan shape.
    from mk_kafka_connect_spark.catalog import load_table
    from mk_kafka_connect_spark.operators.asof import asof_join
    from pyspark.sql import functions as F

    ev = load_table(spark, SF, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id", F.col("ts").alias("view_ts"))
        .agg(F.max("event_id").alias("view_id"))
    )
    full = asof_join(
        p, v, on=["user_id"], left_ts="ts", right_ts="view_ts",
        right_payload=["view_id"], how="inner",
    ).collect()
    tol = QUERIES["join_asof_tolerance"].fn(spark, SF).collect()
    assert 0 < len(tol) < len(full), "tolerance should drop some matches"
    full_keys = {(r.event_id, r.view_id) for r in full}
    for r in tol:
        assert (r.event_id, r.view_id) in full_keys
        gap_us = r.ts.timestamp() * 1e6 - r.view_ts.timestamp() * 1e6
        assert 0 <= gap_us <= 3600 * 1e6


def test_hazard_table_is_a_life_table(spark):
    rows = sorted(
        QUERIES["orders_interpurchase_hazard"].fn(spark, SF).collect(),
        key=lambda r: r.k,
    )
    assert rows and rows[0].k >= 1  # distinct dates -> no zero gaps
    total = sum(r.n_events for r in rows)
    # at_risk(k) = all gaps >= k; at the smallest k that's every gap.
    assert rows[0].n_at_risk == total
    for a, b in zip(rows, rows[1:]):
        assert a.n_at_risk == b.n_at_risk + a.n_events or a.k + 1 <= b.k
        assert a.n_at_risk > b.n_at_risk
    for r in rows:
        assert 0 < r.hazard <= 1.0
        assert r.hazard == r.n_events / r.n_at_risk


def test_shot_boundaries_consistent_with_energy(spark):
    shots = {
        r.doc_id: r
        for r in QUERIES["multimodal_shot_boundaries"].fn(spark, SF).collect()
    }
    assert shots
    for r in shots.values():
        assert 1 <= r.n_shots <= r.n_frames
        if r.first_cut is not None:
            assert 1 <= r.first_cut < r.n_frames
            assert r.n_shots > 1
        else:
            assert r.n_shots == 1


def test_dataset_card_shares_sum_to_one(spark):
    rows = QUERIES["docs_dataset_card"].fn(spark, SF).collect()
    assert rows
    assert abs(sum(r.share_docs for r in rows) - 1.0) < 1e-9
    assert abs(sum(r.share_tokens for r in rows) - 1.0) < 1e-9
    for r in rows:
        assert r.avg_doc_tokens == r.total_tokens / r.n_docs
        assert r.total_chars >= r.total_tokens  # tokens are space-separated


def test_bpe_token_counts_compress_and_bound(spark):
    rows = QUERIES["docs_bpe_token_counts"].fn(spark, SF).collect()
    assert rows
    total_bpe = sum(r.n_bpe_tokens for r in rows)
    total_chars = sum(r.n_chars for r in rows)
    assert total_bpe < total_chars, "30 merges must compress the corpus"
    for r in rows:
        # every word is at least 1 token and at most its char count
        assert r.n_words <= r.n_bpe_tokens <= r.n_chars
        assert r.chars_per_token == r.n_chars / r.n_bpe_tokens


def test_weighted_median_is_exact_against_numpy(spark):
    import duckdb

    rows = QUERIES["orders_weighted_median"].fn(spark, SF).collect()
    assert rows
    pts = duckdb.connect().execute(
        f"""SELECT p.p_brand,
              CAST(CAST(l.l_extendedprice AS DECIMAL(18,2))*100 AS BIGINT),
              CAST(l.l_quantity AS BIGINT)
            FROM read_parquet('{SF}/lineitem.parquet') l
            JOIN read_parquet('{SF}/part.parquet') p
              ON l.l_partkey = p.p_partkey"""
    ).fetchall()
    by_brand: dict[str, list] = {}
    for b, c, w in pts:
        by_brand.setdefault(b, []).append((c, w))
    got = {r.p_brand: r for r in rows}
    assert set(got) == set(by_brand)
    for b, vals in by_brand.items():
        vals.sort()
        tw = sum(w for _, w in vals)
        cw = 0
        for c, w in vals:
            cw += w
            if 2 * cw >= tw:
                assert got[b].median_cents == c, b
                assert got[b].total_weight == tw
                break


def test_lpa_partitions_all_nodes(spark):
    rows = QUERIES["graph_communities_lpa"].fn(spark, SF).collect()
    assert rows
    n_nodes = sum(r.n_nodes for r in rows)
    kcore_side = QUERIES["graph_kcore"].fn(spark, SF).collect()
    # LPA runs on the same repeat-business graph; its node universe is a
    # superset of the 3-core's.
    assert n_nodes >= len(kcore_side)
    for r in rows:
        assert r.n_nodes == r.n_customers + r.n_suppliers
    assert len(rows) > 1, "4 LPA rounds should leave >1 community"


# --- batch 4: Benford, MAD anomaly, seq2 patterns, revenue bridge ----------


def test_benford_digits_sum_and_bounds(spark):
    rows = QUERIES["orders_benford_digits"].fn(spark, SF).collect()
    assert sorted(r.digit for r in rows) == list(range(1, 10))
    assert abs(sum(r.frac_observed for r in rows) - 1.0) < 1e-9
    assert abs(sum(r.frac_benford for r in rows) - 1.0) < 1e-12
    for r in rows:
        assert r.chi2_term >= 0
    # TPC-H prices are uniform-ish in value, not Benford: digit 1 must
    # not dominate the way Benford predicts it to — the audit should
    # actually FIRE on this fixture (large chi2 total).
    assert sum(r.chi2_term for r in rows) > 100


def test_mad_anomaly_matches_numpy(spark):
    import duckdb

    rows = QUERIES["events_mad_anomaly"].fn(spark, SF).collect()
    assert len(rows) == 5
    vals = duckdb.sql(
        f"SELECT event_type, CAST(CAST(value AS DECIMAL(18,2))*100 AS BIGINT) c "
        f"FROM '{SF}/events.parquet'"
    ).fetchall()
    by_t = {}
    for t, c in vals:
        by_t.setdefault(t, []).append(c)
    for r in rows:
        c = np.array(sorted(by_t[r.event_type]), dtype=np.int64)
        med = np.median(c)
        mad = np.median(np.abs(c - med))
        assert r.n == len(c)
        assert abs(r.median_value - med / 100) < 1e-9
        assert abs(r.mad_value - mad / 100) < 1e-9
        # Gate in query scale: d·20000 > 44478·mad2d with d = 2|c−med|,
        # mad2d = 4·MAD  ⇔  |c−med|·40000 > 44478·4·MAD.
        n_anom = int(((np.abs(c - med) * 40000) > 44478 * 4 * mad).sum())
        assert r.n_anomalies == n_anom
        assert 0 <= r.anomaly_rate < 0.5


def test_seq2_support_sums_to_one(spark):
    rows = QUERIES["orders_seq2_patterns"].fn(spark, SF).collect()
    assert len(rows) == 25  # 5 priorities squared on this fixture
    assert abs(sum(r.support for r in rows) - 1.0) < 1e-9
    for r in rows:
        assert 0 < r.n_customers <= r.n_transitions


def test_revenue_bridge_identity(spark):
    rows = QUERIES["orders_revenue_bridge"].fn(spark, SF).collect()
    assert len(rows) == 25  # every nation trades in both years
    for r in rows:
        # The decomposition is exact in the rationals; float round-off
        # only, so the identity holds to relative 1e-9.
        assert abs(r.volume_effect + r.rate_effect - r.delta_rev) <= max(
            1e-6, 1e-9 * abs(r.delta_rev)
        )
        assert abs((r.rev_y2 - r.rev_y1) - r.delta_rev) < 1e-6


# --- batch 5: readability, collocations lift, char-bigram rarity -----------


def test_readability_recomputes_from_raw(spark):
    import duckdb

    rows = QUERIES["docs_readability"].fn(spark, SF).collect()
    assert len(rows) == 5
    texts = duckdb.sql(
        f"SELECT lang, text FROM '{SF}/documents.parquet'"
    ).fetchall()
    agg = {}
    for lang, t in texts:
        d, w, s = agg.get(lang, (0, 0, 0))
        agg[lang] = (
            d + 1,
            w + len(t.split(" ")),
            s + len(re.findall(r"[aeiouy]+", t)),
        )
    for r in rows:
        d, w, s = agg[r.lang]
        assert (r.n_docs, r.n_words, r.n_syllables) == (d, w, s)
        assert abs(r.fk_ease - (206.835 - 1.015 * w / d - 84.6 * s / w)) < 1e-9


def test_collocations_lift_recomputes_top1(spark):
    rows = QUERIES["docs_collocations_lift"].fn(spark, SF).collect()
    assert len(rows) == 30
    lifts = [r.lift for r in rows]
    assert lifts == sorted(lifts, reverse=True)
    for r in rows:
        assert r.c_ab >= 5 and r.c_a >= r.c_ab and r.c_b >= r.c_ab
        a, b = r.bigram.split(" ")
        assert a and b


def test_char_bigram_rarity_contracts(spark):
    rows = QUERIES["docs_char_bigram_rarity"].fn(spark, SF).collect()
    assert len(rows) == 50
    keys = [(r.rarity_score * 1000000) // r.n_bigrams for r in rows]
    assert keys == sorted(keys, reverse=True)
    for r in rows:
        assert 0 < r.n_distinct <= r.n_bigrams
        assert 0 <= r.n_rare <= r.n_bigrams
        assert r.rarity_score >= r.n_bigrams  # floor(N/c) >= 1 per occurrence
        assert abs(r.avg_rarity - r.rarity_score / r.n_bigrams) < 1e-9


# --- batch 6: link prediction, DCT perceptual hash -------------------------


def test_linkpred_candidates_are_nonadjacent_two_hop(spark):
    rows = QUERIES["graph_linkpred"].fn(spark, SF).collect()
    assert len(rows) == 50
    keys = [
        (r.common * 1_000_000_000_000) // (r.deg_a + r.deg_b - r.common)
        for r in rows
    ]
    assert keys == sorted(keys, reverse=True)
    for r in rows:
        assert r.a < r.b
        assert 1 <= r.common <= min(r.deg_a, r.deg_b)
        assert 0 < r.jaccard <= 1.0
        # RA index: each common neighbor contributes <= 1e6/2 (deg >= 2
        # for any hub) and >= 1e6/(2*KNN_max_deg).
        assert 0 < r.ra_micro <= r.common * 500_000


def test_phash_matches_scipy_free_reference(spark):
    import duckdb

    from mk_kafka_connect_spark.operators.multimodal import (
        PHASH_COS,
        PHASH_K,
        PHASH_N,
    )

    rows = {
        r.doc_id: r
        for r in QUERIES["multimodal_phash_dct"]
        .fn(spark, SF)
        .filter("doc_id < 30")
        .collect()
    }
    texts = duckdb.sql(
        f"SELECT doc_id, text FROM '{SF}/documents.parquet' "
        "WHERE doc_id < 30 AND length(text) > 0"
    ).fetchall()
    n, kk = PHASH_N, PHASH_K
    c = np.array(PHASH_COS, dtype=np.int64).reshape(n, n)
    for doc_id, text in texts:
        b = text.encode()
        ln = len(b)
        idx = (np.arange(n * n, dtype=np.int64) * ln) // (n * n)
        px = np.frombuffer(b, dtype=np.uint8)[idx].astype(np.int64).reshape(n, n)
        coeff = c @ px @ c.T
        block = coeff[:kk, :kk].flatten()
        ac = block[1:]
        med = np.sort(ac)[31]
        bits = (ac > med).astype(int)
        r = rows[doc_id]
        assert r.dc == block[0]
        assert r.n_above == bits.sum()
        assert r.phash_lo == int((bits[:32] * (1 << np.arange(32))).sum())
        assert r.phash_hi == int((bits[32:] * (1 << np.arange(31))).sum())


def test_phash_is_stable_under_brightness_unlike_ahash(spark):
    # The frequency-domain claim, measured: adding a constant to every
    # pixel moves ONLY the DC coefficient, so the 63 AC bits are
    # invariant — while aHash bits can flip (mean moves with the
    # constant but rounding interacts per-pixel).
    from mk_kafka_connect_spark.operators.multimodal import PHASH_COS, PHASH_N

    n = PHASH_N
    c = np.array(PHASH_COS, dtype=np.int64).reshape(n, n)
    rng = np.random.default_rng(7)
    px = rng.integers(0, 200, size=(n, n), dtype=np.int64)
    for shift in (1, 17, 55):
        a = c @ px @ c.T
        bshift = c @ (px + shift) @ c.T
        assert not np.array_equal(a[0, 0], bshift[0, 0])
        np.testing.assert_array_equal(a[1:, 1:], bshift[1:, 1:])
        np.testing.assert_array_equal(a[0, 1:], bshift[0, 1:])
        np.testing.assert_array_equal(a[1:, 0], bshift[1:, 0])


# --- batch 7: pHash re-encode near-dup, FastSS fuzzy join ------------------


def test_phash_neardup_recovers_the_reencode_matching(spark):
    rows = QUERIES["multimodal_phash_neardup"].fn(spark, SF).collect()
    n_docs = 500
    assert len(rows) >= n_docs
    true_pairs = {
        (r.id_a, r.id_b) for r in rows if r.id_b == r.id_a + 10_000_000
    }
    # Every original must pair with its own dithered re-render.
    assert len(true_pairs) == n_docs
    for r in rows:
        assert 0 <= r.hamming <= 7


def test_fastss_matches_bruteforce_and_is_complete(spark):
    import duckdb

    rows = QUERIES["er_fuzzy_join_edit1"].fn(spark, SF).collect()
    got = {(r.name_a, r.name_b) for r in rows}
    names = [
        n
        for (n,) in duckdb.sql(
            f"SELECT s_name FROM '{SF}/supplier.parquet'"
        ).fetchall()
    ]

    def lev1(a, b):
        if a == b:
            return True
        la, lb = len(a), len(b)
        if abs(la - lb) > 1:
            return False
        if la == lb:
            return sum(x != y for x, y in zip(a, b)) <= 1
        if la > lb:
            a, b, la, lb = b, a, lb, la
        i = j = edits = 0
        while i < la and j < lb:
            if a[i] == b[j]:
                i += 1
                j += 1
            else:
                edits += 1
                j += 1
                if edits > 1:
                    return False
        return True

    expect = {
        (a, b)
        for i, a in enumerate(names)
        for b in names[i + 1 :]
        if a < b and lev1(a, b)
    } | {
        (b, a)
        for i, a in enumerate(names)
        for b in names[i + 1 :]
        if b < a and lev1(a, b)
    }
    assert got == expect
    assert all(r.dist == 1 for r in rows)


# --- batch 8: FD discovery, peak detection, streaming top-k ----------------


def test_fd_discovery_key_column_determines_all(spark):
    rows = QUERIES["dq_fd_discovery"].fn(spark, SF).collect()
    assert len(rows) == 30  # 6 columns, ordered pairs
    by_lhs = {}
    for r in rows:
        by_lhs.setdefault(r.lhs, []).append(r)
        assert r.n_violations >= 0
        assert r.holds == (r.n_violations == 0)
    # The primary key determines every other column.
    assert all(r.holds for r in by_lhs["o_orderkey"])
    # A 5-value column cannot determine a ~15k-value one.
    pri = {r.rhs: r for r in by_lhs["o_orderpriority"]}
    assert not pri["o_orderkey"].holds
    assert pri["o_orderkey"].n_groups == 5


def test_peak_detection_recomputes_from_hourly(spark):
    import duckdb

    rows = QUERIES["events_peak_detection"].fn(spark, SF).collect()
    assert rows
    hourly = {}
    for t, h, c in duckdb.sql(
        f"SELECT event_type, time_bucket(INTERVAL '1 hour', ts), count(*) "
        f"FROM '{SF}/events.parquet' GROUP BY 1, 2"
    ).fetchall():
        hourly[(t, h)] = c
    import datetime

    one = datetime.timedelta(hours=1)
    for r in rows:
        h = r.h
        ns = [
            hourly.get((r.event_type, h + d * one))
            for d in (-2, -1, 1, 2)
        ]
        assert all(n is not None for n in ns)
        assert r.c > ns[1] and r.c > ns[2]
        assert r.c >= ns[0] and r.c >= ns[3]
        assert 16 * r.c > 5 * sum(ns)
        assert r.neighbor_sum == sum(ns)


def test_streaming_topk_each_window_has_three(spark):
    rows = QUERIES["streaming_topk_per_window"].fn(spark, SF).collect()
    by_w = {}
    for r in rows:
        by_w.setdefault(r.wstart, []).append(r)
    for w, rs in by_w.items():
        assert sorted(r.rnk for r in rs) == [1, 2, 3]
        ordered = sorted(rs, key=lambda r: r.rnk)
        for a, b in zip(ordered, ordered[1:]):
            assert (a.n, b.event_type) >= (b.n, a.event_type) or a.n > b.n
