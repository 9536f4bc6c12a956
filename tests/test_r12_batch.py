"""Semantic contracts for the round-12 curation/audit operators —
properties the oracle comparison alone can't express (invariants,
monotonicity, cross-query consistency, independent recomputation)."""

from __future__ import annotations

from pyspark.sql import functions as F

from mk_kafka_connect_spark.plans import QUERIES

SF = "/root/testdata/sf0.01"


def test_boilerplate_fraction_bounds_and_flag(spark):
    rows = QUERIES["docs_boilerplate_fraction"].fn(spark, SF).collect()
    assert rows, "boilerplate report empty"
    for r in rows:
        assert 0 <= r.n_boiler <= r.n_shingles
        assert abs(r.boiler_frac - r.n_boiler / r.n_shingles) < 1e-12
        assert r.flagged == (r.n_boiler * 10 >= 3 * r.n_shingles)


def test_novelty_curve_epoch_zero_is_all_novel(spark):
    rows = {
        r.epoch: r
        for r in QUERIES["docs_ngram_novelty_curve"].fn(spark, SF).collect()
    }
    # Epoch 0 is the first snapshot: every hash it holds is first seen
    # there by definition of min-epoch.
    assert rows[0].n_novel == rows[0].n_hashes
    assert rows[0].novel_frac == 1.0
    # Later snapshots on a word-soup fixture must inherit SOMETHING.
    assert any(r.n_novel < r.n_hashes for e, r in rows.items() if e > 0)
    assert set(rows) == set(range(8))


def test_emb_outliers_are_per_label_topk(spark):
    rows = QUERIES["emb_outlier_centroid_dist"].fn(spark, SF).collect()
    by_label = {}
    for r in rows:
        by_label.setdefault(r.label, []).append(r)
    assert len(by_label) == 10, "expected all 10 labels"
    for label, rs in by_label.items():
        assert len(rs) == 5
        assert sorted(r.rnk for r in rs) == [1, 2, 3, 4, 5]
        ordered = sorted(rs, key=lambda r: r.rnk)
        devs = [r.dev2 for r in ordered]
        assert devs == sorted(devs, reverse=True), f"label {label} not ranked"


def test_candidate_keys_verdicts(spark):
    rows = {
        r.candidate: r for r in QUERIES["dq_candidate_keys"].fn(spark, SF).collect()
    }
    # o_orderkey is the primary key; a composite containing it is too.
    assert rows["o_orderkey"].is_key
    assert rows["o_custkey,o_orderkey"].is_key
    # o_custkey / o_orderdate repeat on any TPC-H-ish fixture.
    assert not rows["o_custkey"].is_key
    assert not rows["o_orderdate"].is_key
    n_rows = {r.n_rows for r in rows.values()}
    assert len(n_rows) == 1, "all candidates must profile the same table"


def test_bfs_levels_start_at_single_seed_and_expand(spark):
    rows = {
        r.level: r for r in QUERIES["graph_bfs_levels"].fn(spark, SF).collect()
    }
    assert rows[0].n_nodes == 1, "level 0 must be the seed alone"
    assert rows[0].min_node == rows[0].max_node
    assert set(rows) <= set(range(5))
    # Levels partition the reached set: total reach equals the sum.
    assert all(r.n_nodes >= 1 for r in rows.values())


def test_overlap_matrix_is_consistent_with_lsh_pairs(spark):
    pairs = QUERIES["dedup_minhash_lsh"].fn(spark, SF).count()
    matrix = QUERIES["docs_neardup_overlap_matrix"].fn(spark, SF).collect()
    assert sum(r.n_pairs for r in matrix) == pairs
    for r in matrix:
        assert r.source_a <= r.source_b, "matrix must be upper-triangular"
        assert 0.0 <= r.avg_est_jaccard <= 1.0


def test_fertility_consistent_with_per_doc_counts(spark):
    per_doc = QUERIES["docs_bpe_token_counts"].fn(spark, SF)
    total = per_doc.agg(
        F.sum("n_words").alias("w"), F.sum("n_bpe_tokens").alias("t")
    ).collect()[0]
    rows = QUERIES["bpe_fertility_by_source"].fn(spark, SF).collect()
    assert sum(r.n_words for r in rows) == total.w
    assert sum(r.n_bpe_tokens for r in rows) == total.t
    for r in rows:
        # Merges only ever shrink the symbol count; chars/word >= 1.
        assert r.n_bpe_tokens <= r.n_words * 30 + r.n_words  # sanity cap
        assert r.fertility >= 1.0 or r.n_bpe_tokens < r.n_words


def test_referential_orphans_clean_fixture(spark):
    rows = QUERIES["dq_referential_orphans"].fn(spark, SF).collect()
    assert len(rows) == 7
    assert all(r.ref_intact for r in rows), "fixture FKs must be intact"
    assert all(r.n_orphans == 0 for r in rows)
    # And the audit actually counts the child tables it claims to.
    by_fk = {r.fk: r for r in rows}
    li = by_fk["lineitem.l_orderkey->orders.o_orderkey"].n_child_rows
    assert li == by_fk["lineitem.l_partkey->part.p_partkey"].n_child_rows


def test_scd2_integrity_verdict_on_certified_history(spark):
    row = QUERIES["cdc_scd2_integrity"].fn(spark, SF).collect()[0]
    assert row.scd2_ok, "lead-built SCD2 history must satisfy invariants"
    assert row.n_keys == row.n_keys_one_current
    assert row.n_overlaps == 0 and row.n_gaps == 0
    assert row.n_versions >= row.n_keys


def test_stage_funnel_is_monotone_and_consistent(spark):
    rows = sorted(
        QUERIES["pipeline_stage_funnel"].fn(spark, SF).collect(),
        key=lambda r: r.stage,
    )
    assert [r.stage for r in rows] == [
        "0_raw",
        "1_quality_gate",
        "2_exact_dedup",
        "3_near_dedup",
    ]
    counts = [r.n_docs for r in rows]
    assert counts == sorted(counts, reverse=True), "stages must only shrink"
    for prev, cur in zip(rows, rows[1:]):
        assert cur.n_removed == prev.n_docs - cur.n_docs
    assert rows[0].n_removed == 0


def test_exact_budget_sample_apportionment(spark):
    rows = QUERIES["docs_sample_exact_budget"].fn(spark, SF).collect()
    # Every stratum reports, and the Hamilton apportionment is exact:
    # the allocations sum to the budget to the row.
    n_docs = {r.source: r.n_docs for r in rows}
    total = sum(n_docs.values())
    assert sum(r.alloc for r in rows) == 500
    for r in rows:
        base = (500 * r.n_docs) // total
        assert base <= r.alloc <= base + 1, f"{r.source}: quota violated"
        # Selection fills the allocation exactly (never oversamples).
        assert r.n_selected == min(r.alloc, r.n_docs)
        assert (r.sel_chars > 0) == (r.n_selected > 0)


def test_exact_budget_sample_matches_naive_rank(spark):
    """The block-prefix + pruned rank must select the IDENTICAL doc set
    as the naive per-stratum row_number (the thing it decomposes)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from mk_kafka_connect_spark.catalog import load_table
    from mk_kafka_connect_spark.functions.hashing import md5_mod

    got = {r.source: r for r in QUERIES["docs_sample_exact_budget"].fn(spark, SF).collect()}
    d = load_table(spark, SF, "documents")
    w = Window.partitionBy("source").orderBy(
        md5_mod(F.col("doc_id").cast("string")), "doc_id"
    )
    naive = d.withColumn("_rnk", F.row_number().over(w))
    # Rank every doc, join the query's own alloc, and re-derive the
    # per-source id-sum of the naive selection.
    alloc = spark.createDataFrame(
        [(s, int(r.alloc)) for s, r in got.items()], ["source", "alloc"]
    )
    sel = naive.join(alloc, "source").filter(F.col("_rnk") <= F.col("alloc"))
    check = {
        r.source: r
        for r in sel.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("doc_id").alias("ids"),
            F.sum("n_chars").alias("chars"),
        )
        .collect()
    }
    for s, r in got.items():
        if r.n_selected == 0:
            assert s not in check
            continue
        assert check[s].n == r.n_selected
        assert check[s].ids == r.sel_id_sum
        assert check[s].chars == r.sel_chars


def test_greedy_pack_replays_sequentially_and_bounds(spark):
    """Replay the close-on-overflow recurrence in plain Python per
    stream and demand the operator's per-doc assignment matches; then
    check the report's invariants against bin-packing bounds."""
    from pyspark.sql import functions as F

    from mk_kafka_connect_spark.catalog import load_table
    from mk_kafka_connect_spark.operators.pipeline import greedy_pack

    budget, n_streams = 256, 16
    d = load_table(spark, SF, "documents")
    toks = d.select(
        "doc_id",
        F.least(F.size(F.split(F.col("text"), " ")), F.lit(budget))
        .cast("long")
        .alias("tok"),
    )
    rows = greedy_pack(
        toks, "doc_id", "tok", budget=budget, n_streams=n_streams
    ).collect()
    by_stream = {}
    for r in rows:
        by_stream.setdefault(r.stream, []).append(r)
    assert sum(len(v) for v in by_stream.values()) == d.count()
    for stream, rs in by_stream.items():
        rs.sort(key=lambda r: (r._h, r.doc_id))
        fill, pack = 0, 0
        for r in rs:
            if fill + r.tok > budget:
                pack, fill = pack + 1, r.tok
            else:
                fill += r.tok
            assert r.pack_id == pack, f"stream {stream} doc {r.doc_id}"
            assert fill <= budget

    report = {
        r.stream: r
        for r in QUERIES["docs_greedy_pack_stats"].fn(spark, SF).collect()
    }
    for stream, rs in by_stream.items():
        rep = report[stream]
        total = sum(r.tok for r in rs)
        assert rep.n_docs == len(rs)
        assert rep.total_tok == total
        assert rep.n_packs == max(r.pack_id for r in rs) + 1
        # Bin-packing bounds: never fewer than the fractional lower
        # bound, never more than one pack per doc.
        assert -(-total // budget) <= rep.n_packs <= len(rs)
        assert rep.waste == rep.n_packs * budget - total >= 0
        assert 0.0 < rep.util <= 1.0


def test_split_leakage_consistent_with_lsh_pairs(spark):
    """Pair mass must equal the certified LSH pair set, every doc's
    split must come from hash_split, and the leak flag must mark
    exactly the off-diagonal cells."""
    rows = QUERIES["dedup_split_leakage"].fn(spark, SF).collect()
    total_pairs = QUERIES["dedup_minhash_lsh"].fn(spark, SF).count()
    assert sum(r.n_pairs for r in rows) == total_pairs
    for r in rows:
        assert r.split_lo <= r.split_hi
        assert r.is_leak == (r.split_lo != r.split_hi)
        assert 0.7 <= r.avg_est_jaccard <= 1.0
        assert r.split_lo in ("test", "train", "val")
        assert r.split_hi in ("test", "train", "val")


def test_hybrid_rrf_fusion_arithmetic_and_rank(spark):
    """Every fused score must equal the RRF formula applied to its own
    rank columns, ranks must be a 1..10 prefix ordered by score, and a
    doc absent from BOTH lists can't appear."""
    rows = QUERIES["sim_hybrid_rrf"].fn(spark, SF).collect()
    assert [r.rrf_rank for r in rows] == list(range(1, 11))
    scores = [r.rrf_score for r in rows]
    assert scores == sorted(scores, reverse=True)
    for r in rows:
        assert r.rank_lex is not None or r.rank_vec is not None
        expect = 0.0
        if r.rank_lex is not None:
            assert 1 <= r.rank_lex <= 50
            expect += 1.0 / (60 + r.rank_lex)
        if r.rank_vec is not None:
            assert 1 <= r.rank_vec <= 50
            expect += 1.0 / (60 + r.rank_vec)
        assert abs(r.rrf_score - expect) < 1e-15


def test_dsir_selection_excludes_target_and_counts_features(spark):
    """Selected docs must all come from the raw pool (never the target
    domain), ranks must be ordered by score, and each doc's feature
    count must equal 2·words−1 (unigrams + bigrams), recomputed
    independently from the documents table."""
    rows = QUERIES["docs_dsir_importance"].fn(spark, SF).collect()
    assert len(rows) == 20
    assert [r.sel_rank for r in rows] == list(range(1, 21))
    scores = [r.dsir_score for r in rows]
    assert scores == sorted(scores, reverse=True)
    assert all(r.source != "src0" for r in rows)

    from mk_kafka_connect_spark.catalog import load_table

    docs = load_table(spark, SF, "documents")
    nw = {
        r.doc_id: r.n
        for r in docs.select(
            "doc_id", F.size(F.split("text", " ")).alias("n")
        ).collect()
    }
    for r in rows:
        assert r.n_feats == 2 * nw[r.doc_id] - 1


def test_matryoshka_recall_anchor_and_bounds(spark):
    """The full-dimension row is the self-recall anchor (exactly 1.0);
    every budget reports over the same 25x10 denominator."""
    rows = {
        r.dim_budget: r
        for r in QUERIES["emb_matryoshka_recall"].fn(spark, SF).collect()
    }
    assert set(rows) == {8, 16, 32, 64}
    assert rows[64].n_match == 250
    assert rows[64].recall_at_10 == 1.0
    for r in rows.values():
        assert 0 <= r.n_match <= 250
        assert abs(r.recall_at_10 - r.n_match / 250) < 1e-15
    # Truncating to an eighth of the dimensions must actually cost
    # something on a 64-dim corpus — otherwise the gate measures nothing.
    assert rows[8].n_match < 250


def test_countmin_estimates_guarantee_and_exactness(spark):
    """CM must never underestimate, the reported overestimate must be
    internally consistent, and the exact counts must reconcile with a
    direct group-by recomputation."""
    rows = QUERIES["agg_countmin_estimates"].fn(spark, SF).collect()
    assert len(rows) == 10
    counts = [r.exact_count for r in rows]
    assert counts == sorted(counts, reverse=True)
    for r in rows:
        assert r.never_underestimates
        assert r.cm_estimate >= r.exact_count
        assert r.overestimate == r.cm_estimate - r.exact_count

    from mk_kafka_connect_spark.catalog import load_table

    orders = load_table(spark, SF, "orders")
    exact = {
        r.o_custkey: r.n
        for r in orders.groupBy("o_custkey").agg(
            F.count(F.lit(1)).alias("n")
        ).collect()
    }
    for r in rows:
        assert r.exact_count == exact[r.o_custkey]


def test_kmv_sketch_estimates_and_exhaustive_branch(spark):
    """At sf0.01 (150 distinct users per type > k=64) every sketch must
    take the ESTIMATOR branch; estimates must land within the k=64
    theoretical error envelope of the exact counts, and the exact
    ground-truth columns must reconcile with direct recomputation."""
    rows = {
        r.measure: r
        for r in QUERIES["agg_kmv_set_sketch"].fn(spark, SF).collect()
    }
    assert set(rows) == {"distinct_view", "distinct_click", "union",
                         "intersection"}
    for r in rows.values():
        assert not r.sketch_exhaustive
        assert r.kmv_estimate > 0
        # KMV rse = 1/sqrt(k-2) ~ 12.7%; 5 sigma is a generous but
        # non-vacuous envelope for a deterministic fixture.
        assert abs(r.kmv_estimate - r.exact_count) <= 0.65 * r.exact_count

    from mk_kafka_connect_spark.catalog import load_table

    ev = load_table(spark, SF, "events").filter(
        F.col("event_type").isin("view", "click")
    )
    xa = ev.filter(F.col("event_type") == "view").select(
        "user_id").distinct().count()
    xu = ev.select("user_id").distinct().count()
    assert rows["distinct_view"].exact_count == xa
    assert rows["union"].exact_count == xu
    assert rows["intersection"].exact_count <= min(
        rows["distinct_view"].exact_count,
        rows["distinct_click"].exact_count,
    )


def test_mutual_knn_is_reciprocal_subset_of_lsh_pairs(spark):
    """Every mutual pair must be an LSH candidate pair, each node may
    appear in at most one mutual pair... (reciprocity makes the best-
    neighbor relation a partial matching), and reciprocity must be
    recomputable from the candidates directly."""
    mutual = QUERIES["sim_mutual_knn"].fn(spark, SF).collect()
    assert mutual, "fixture should produce at least one mutual pair"
    cand = QUERIES["dedup_embedding_lsh"].fn(spark, SF).collect()
    cand_pairs = {(r.id_a, r.id_b): r.cosine for r in cand}
    # candidate-subset + node-disjointness
    seen = set()
    for r in mutual:
        assert (r.id_a, r.id_b) in cand_pairs
        assert abs(cand_pairs[(r.id_a, r.id_b)] - r.cosine) < 1e-15
        assert r.id_a not in seen and r.id_b not in seen
        seen.add(r.id_a)
        seen.add(r.id_b)
    # recompute best-neighbor argmax in plain Python and check
    best = {}
    for r in cand:
        for s, d in ((r.id_a, r.id_b), (r.id_b, r.id_a)):
            cur = best.get(s)
            if cur is None or (-r.cosine, d) < cur[0]:
                best[s] = ((-r.cosine, d), d)
    expect = {
        (s, b[1])
        for s, b in best.items()
        if s < b[1] and best.get(b[1], (None, None))[1] == s
    }
    assert {(r.id_a, r.id_b) for r in mutual} == expect


def test_ks_drift_statistic_matches_naive_recompute(spark):
    """Recompute the two-sample KS statistic naively in Python from the
    raw lengths and check the exact integer numerator, the derived
    statistic, and the critical-value arithmetic."""
    import math

    rows = QUERIES["docs_ks_drift_by_source"].fn(spark, SF).collect()
    assert len(rows) == 1
    r = rows[0]

    from mk_kafka_connect_spark.catalog import load_table

    docs = load_table(spark, SF, "documents").filter(
        F.col("source").isin("src0", "src1")
    )
    lens = [(x.source, x.n_chars) for x in docs.select("source", "n_chars").collect()]
    a = sorted(v for s, v in lens if s == "src0")
    b = sorted(v for s, v in lens if s == "src1")
    na, nb = len(a), len(b)
    assert (r.n_a, r.n_b) == (na, nb)
    d_num = 0
    for v in sorted(set(a) | set(b)):
        fa = sum(1 for x in a if x <= v)
        fb = sum(1 for x in b if x <= v)
        d_num = max(d_num, abs(fa * nb - fb * na))
    assert r.d_num == d_num
    assert abs(r.d_stat - d_num / (na * nb)) < 1e-15
    crit = 1.358 * math.sqrt((na + nb) / (na * nb))
    assert abs(r.ks_critical_95 - crit) < 1e-12
    assert r.drift_detected == (r.d_stat > r.ks_critical_95)


def test_gini_matches_naive_recompute_and_bounds(spark):
    """Recompute Gini naively from sorted per-customer revenues and
    check the bound 0 <= G < 1 plus consistency with the Pareto query's
    revenue total."""
    rows = QUERIES["orders_gini_coefficient"].fn(spark, SF).collect()
    assert len(rows) == 1
    r = rows[0]
    assert 0.0 <= r.gini < 1.0

    from mk_kafka_connect_spark.catalog import load_table

    o = load_table(spark, SF, "orders")
    cents = sorted(
        int(round(x.s * 100))
        for x in o.groupBy("o_custkey")
        .agg(F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("s"))
        .collect()
    )
    n = len(cents)
    s0 = sum(cents)
    s1 = sum((i + 1) * c for i, c in enumerate(cents))
    assert r.n_customers == n
    assert abs(r.total_revenue - s0 / 100) < 1e-9
    assert abs(r.gini - (2 * s1 - (n + 1) * s0) / (n * s0)) < 1e-15


def test_acf_matches_naive_recompute(spark):
    """Recompute the lag-1..6 autocorrelations naively in Python from
    the hourly counts and check bounds (|r_k| <= 1) and pair counts."""
    rows = {r.lag: r for r in QUERIES["events_acf_hourly"].fn(spark, SF).collect()}
    assert set(rows) == set(range(1, 7))

    from mk_kafka_connect_spark.catalog import load_table

    ev = load_table(spark, SF, "events")
    series = dict(
        (r.h, r.c)
        for r in ev.groupBy(
            (F.unix_micros("ts") / F.lit(3600000000)).cast("long").alias("h")
        )
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    )
    n, s = len(series), sum(series.values())
    dev = {h: n * c - s for h, c in series.items()}
    denom = sum(d * d for d in dev.values())
    for k, r in rows.items():
        pairs = [(h, h + k) for h in dev if h + k in dev]
        assert r.n_pairs == len(pairs)
        num = sum(dev[a] * dev[b] for a, b in pairs)
        assert abs(r.acf - num / denom) < 1e-15
        assert -1.0 <= r.acf <= 1.0
