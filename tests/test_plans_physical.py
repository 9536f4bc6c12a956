"""Physical-plan posture tests — the 100 TB checklist (SURVEY.md §4):
filters push into the parquet scan, projections prune the read schema,
dimension joins broadcast, aggregates partial-aggregate map-side, top-k
avoids global sorts. A regression here is a scale bug even when results
stay correct."""

from __future__ import annotations

from pyspark.sql import functions as F

from mk_kafka_connect_spark.catalog import load_table
from mk_kafka_connect_spark.plans import QUERIES

SF = "/root/testdata/sf0.01"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _optimized(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def test_filter_pushdown_reaches_scan(spark):
    df = QUERIES["filter_range_halfopen"].fn(spark, SF)
    plan = _plan(df)
    assert "PushedFilters:" in plan
    assert "IsNotNull(ts)" in plan or "GreaterThanOrEqual(ts" in plan


def test_projection_prunes_read_schema(spark):
    df = load_table(spark, SF, "lineitem").select("l_orderkey", "l_quantity")
    plan = _plan(df)
    assert "ReadSchema: struct<l_orderkey:bigint,l_quantity:double>" in plan


def test_q1_partial_aggregation(spark):
    """Q1 must partial-aggregate before the shuffle (two HashAggregates
    around one Exchange) — the property that bounds shuffle volume by
    group count, not row count."""
    plan = _plan(QUERIES["q1_pricing_summary"].fn(spark, SF))
    assert plan.count("HashAggregate") >= 2
    assert "partial_sum" in plan or "partial" in plan.lower()


def test_q3_broadcasts_dimension(spark):
    plan = _plan(QUERIES["q3_shipping_priority"].fn(spark, SF))
    assert "BroadcastHashJoin" in plan


def test_expand_join_no_fact_shuffle(spark):
    """expand_customer_flat: both dims broadcast — the orders scan must
    not hash-shuffle (no Exchange hashpartitioning over the fact side)."""
    plan = _plan(QUERIES["expand_customer_flat"].fn(spark, SF))
    assert plan.count("BroadcastHashJoin") == 2
    assert "Exchange hashpartitioning" not in plan


def test_topk_uses_take_ordered(spark):
    """ORDER BY + LIMIT compiles to TakeOrderedAndProject (per-partition
    top-k + merge), not a global Sort."""
    o = load_table(spark, SF, "orders")
    df = o.orderBy(F.desc("o_totalprice")).limit(10)
    assert "TakeOrderedAndProject" in _plan(df)


def test_semi_join_stays_semi(spark):
    plan = _plan(QUERIES["join_semi"].fn(spark, SF))
    assert "LeftSemi" in plan


def test_shuffled_hash_join_hint(spark):
    """B6 names all three equi-join strategies; broadcast and sort-merge
    are pinned elsewhere — the shuffle_hash hint must produce a
    ShuffledHashJoin (no sort on either side)."""
    li = load_table(spark, SF, "lineitem")
    o = load_table(spark, SF, "orders")
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = li.join(o.hint("shuffle_hash"), li.l_orderkey == o.o_orderkey).select(
            "l_orderkey", "o_orderpriority"
        )
        plan = _plan(df)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    assert "ShuffledHashJoin" in plan


def test_constant_folding(spark):
    """Catalyst folds constant expressions at plan time."""
    df = load_table(spark, SF, "orders").select(
        (F.lit(2) * F.lit(21)).alias("x"), "o_orderkey"
    )
    assert "42" in _optimized(df)


def test_dedup_latest_single_shuffle(spark):
    """Latest-wins compaction: exactly one hash exchange (on the key)."""
    plan = _plan(QUERIES["dedup_latest_wins"].fn(spark, SF))
    assert plan.count("Exchange hashpartitioning") == 1


def test_minhash_partial_aggregation(spark):
    """The MinHash signature aggregation must partial-aggregate map-side
    (explode+agg formulation): 32 partial_min before the doc_id shuffle."""
    from mk_kafka_connect_spark.operators.dedup import minhash_signatures_agg

    docs = load_table(spark, SF, "documents")
    plan = _plan(minhash_signatures_agg(docs, "text", "doc_id"))
    assert "partial_min" in plan


def test_whole_stage_codegen_on_scalar_battery(spark):
    """`*(n)` prefixes mark whole-stage-codegen'd operators."""
    plan = _plan(QUERIES["scalar_string_funcs"].fn(spark, SF))
    assert "*(1)" in plan


def test_lsh_topk_probe_is_equi_join(spark):
    """The LSH probe must be a hash EQUI-join on enumerated bucket ids —
    a BroadcastNestedLoopJoin over bit_count(xor) would re-scan the whole
    corpus per query (the round-1 scale-killer)."""
    df = QUERIES["sim_topk_lsh"].fn(spark, SF)
    plan = _plan(df)
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan


def test_q4_exists_is_semi_join(spark):
    """Q4's EXISTS must compile to ONE LeftSemi join (no duplication of
    order rows, no correlated re-execution) with a single aggregation
    exchange after it."""
    plan = _plan(QUERIES["q4_order_priority"].fn(spark, SF))
    assert "LeftSemi" in plan
    assert plan.count("Exchange hashpartitioning") == 1
    assert "CartesianProduct" not in plan


def test_q6_is_pure_scan_agg(spark):
    """Q6 is the canonical scan-filter-aggregate: no join, no hash
    exchange — partial sums combine map-side and one row crosses the
    network. All three predicates must reach the parquet scan."""
    plan = _plan(QUERIES["q6_forecast_revenue"].fn(spark, SF))
    assert "Join" not in plan
    assert "Exchange hashpartitioning" not in plan
    assert "PushedFilters:" in plan
    assert "l_shipdate" in plan.split("PushedFilters:")[1][:400]


def test_q15_single_fact_scan(spark):
    """Q15's max-selection must NOT re-compute the revenue aggregate (a
    scalar-subquery join re-scans lineitem; the window form scans once)."""
    plan = _plan(QUERIES["q15_top_supplier"].fn(spark, SF))
    assert plan.count("lineitem.parquet") == 1
    assert plan.count("Exchange hashpartitioning") == 1


def test_q18_aggregates_before_join(spark):
    """Q18 must aggregate lineitem first (HAVING prunes to the big-order
    tail) and join the survivor set — one fact shuffle, customer
    broadcast, top-k via TakeOrderedAndProject."""
    plan = _plan(QUERIES["q18_large_volume_customer"].fn(spark, SF))
    assert plan.count("Exchange hashpartitioning") == 1
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastHashJoin" in plan


def test_q21_single_pass_window(spark):
    """Q21's EXISTS/NOT-EXISTS pair must run as window aggregates over one
    l_orderkey partitioning — one scan of lineitem, not the classic triple
    self-join (nor an aggregate-then-rejoin double scan)."""
    plan = _plan(QUERIES["q21_suppliers_kept_waiting"].fn(spark, SF))
    assert plan.count("lineitem.parquet") == 1
    assert "CartesianProduct" not in plan
    assert plan.count("Exchange hashpartitioning") <= 2


def test_q22_anti_join_no_correlation(spark):
    """Q22's NOT EXISTS must be a LeftAnti join against the date-pruned
    orders side; the average threshold is a 1-row broadcast."""
    plan = _plan(QUERIES["q22_global_sales_opportunity"].fn(spark, SF))
    assert "LeftAnti" in plan
    assert plan.count("Exchange hashpartitioning") == 1


def test_range_join_is_binned_equi_join(spark):
    """The keyless interval join must run as a hash equi-join on bin ids
    — never the nested-loop scan Spark would pick for the raw theta
    predicate."""
    plan = _plan(QUERIES["join_range_binned"].fn(spark, SF))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "HashJoin" in plan or "SortMergeJoin" in plan


def test_funnel_is_single_pass(spark):
    """The funnel must compute every stage as chained windows over ONE
    user partitioning — one event scan, one shuffle — not the
    aggregate-and-rejoin form that re-scans events per stage."""
    plan = _plan(QUERIES["funnel_view_click_purchase"].fn(spark, SF))
    assert plan.count(".parquet") == 1
    assert plan.count("Exchange hashpartitioning") == 1


def test_lsh_near_dup_no_cross_product(spark):
    """Bucket-then-verify near-dup: candidates come from equi-joins on
    signature buckets; no all-pairs product may appear anywhere."""
    df = QUERIES["dedup_embedding_lsh"].fn(spark, SF)
    plan = _plan(df)
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_lateral_topk_decorrelates_to_window_group_limit(spark):
    """join_lateral_topk: Catalyst must DECORRELATE the LATERAL subquery
    into a pre-join WindowGroupLimit (keep ≤2 orders per customer before
    joining) — never a per-customer re-execution of the inner query."""
    plan = _plan(QUERIES["join_lateral_topk"].fn(spark, SF))
    assert "WindowGroupLimit" in plan
    assert "CartesianProduct" not in plan and "NestedLoop" not in plan


def test_epoch_mixture_and_ahash_are_shuffle_free(spark):
    """The map-side pipeline ops (fractional-epoch explode, perceptual
    hash) must plan with ZERO exchanges — at 100 TB these stream through
    the scan untouched."""
    for name in ("docs_epoch_mixture", "multimodal_ahash", "text_pii_redact"):
        plan = _plan(QUERIES[name].fn(spark, SF))
        assert "Exchange" not in plan, f"{name} plans a shuffle:\n{plan[:800]}"


def test_rollup_cascade_reuses_hourly_exchange(spark):
    """events_rollup_multires: after AQE the daily tier must REUSE the
    hourly aggregate's exchange (one raw scan + one hourly shuffle feed
    both resolutions), not recompute the hourly aggregation."""
    df = QUERIES["events_rollup_multires"].fn(spark, SF)
    df.collect()  # AQE finalizes reuse at execution time
    plan = _plan(df)
    assert "ReusedExchange" in plan


def test_ivf_sq8_probe_is_equi_join_with_packed_codes(spark):
    """sim_topk_ivf_sq8: the candidate stage must be a hash equi-join on
    cell (no cross product anywhere -- the |Q|x|C| term is gone), and the
    compressed codes must flow as BINARY (the int8 pack), not array<long>."""
    df = QUERIES["sim_topk_ivf_sq8"].fn(spark, SF)
    plan = _plan(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "cell" in plan  # the inverted-list join key survives to the plan
    # the Arrow pack/score kernels run as vectorized python stages (the
    # binary-typed codes themselves are pinned by
    # test_sq8_binary_pack_matches_hof_codes)
    assert "ArrowEvalPython" in plan


def test_hll_sketch_merge_is_two_level_aggregate(spark):
    """agg_hll_sketch_merge: shard sketches then union -- two aggregate
    levels, with the nation dimension broadcast into the fact join."""
    df = QUERIES["agg_hll_sketch_merge"].fn(spark, SF)
    plan = _plan(df)
    assert "BroadcastHashJoin" in plan
    assert plan.count("HashAggregate") >= 4  # partial+final for both levels


def test_heavy_hitters_summaries_shuffle_only_sketch_rows(spark):
    """agg_heavy_hitters: the Misra-Gries stage must be mapInPandas
    (ArrowEvalPython/MapInPandas), and the only wide exchange over raw
    events is the exact-count aggregate (which partial-aggregates)."""
    df = QUERIES["agg_heavy_hitters"].fn(spark, SF)
    plan = _plan(df)
    assert "MapInPandas" in plan
    assert "CartesianProduct" not in plan
    assert plan.count("HashAggregate") >= 2


def test_decontaminate_lsh_is_banded_equi_join(spark):
    """docs_decontaminate_lsh: candidates come from an equi-join on
    (band_idx, band_key) -- a shuffled hash/sort-merge join, never a
    nested loop -- and both signature pipelines partial-aggregate their
    32 min() components map-side."""
    df = QUERIES["docs_decontaminate_lsh"].fn(spark, SF)
    plan = _plan(df)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "band_key" in plan
    assert plan.count("partial_min") >= 32 or plan.count("min(") >= 32


def test_bloom_probe_filters_inside_join_subtree(spark):
    """join_bloom_prefilter: the Arrow-vectorized Bloom probe must sit in
    the fact-side subtree UNDER the join (map-side prune before any rows
    reach the join), and the revenue agg must still partial-aggregate."""
    plan = _plan(QUERIES["join_bloom_prefilter"].fn(spark, SF))
    assert "ArrowEvalPython" in plan  # the probe runs as one Arrow batch pass
    join_at = min(
        (plan.index(j) for j in ("BroadcastHashJoin", "SortMergeJoin", "ShuffledHashJoin") if j in plan),
        default=-1,
    )
    assert join_at != -1
    assert join_at < plan.index("ArrowEvalPython")  # probe below the join
    assert plan.count("HashAggregate") >= 2


def test_bitmap_distinct_is_mergeable_two_level_aggregate(spark):
    """agg_bitmap_distinct: partial bitmap states must build map-side
    (partial_bitmap_construct_agg before the exchange) and the ALL tier
    must reuse the per-type bitmap states via bitmap_or_agg — never a
    second Expand/shuffle of raw keys."""
    plan = _plan(QUERIES["agg_bitmap_distinct"].fn(spark, SF))
    assert "partial_bitmap_construct_agg" in plan
    assert "bitmap_or_agg" in plan
    assert "Expand" not in plan  # the COUNT(DISTINCT) plan shape is absent


def test_time_weighted_avg_single_key_exchange(spark):
    """events_time_weighted_avg: the lead window and the final aggregate
    share the user_id partitioning — exactly one hash exchange of event
    rows."""
    plan = _plan(QUERIES["events_time_weighted_avg"].fn(spark, SF))
    assert plan.count("Exchange hashpartitioning") == 1


def test_markov_only_one_row_sized_exchange(spark):
    """events_markov_transitions: the only exchange over event-sized data
    is the per-user window; the pair count and per-from normalization
    move |types|^2 rows at most."""
    plan = _plan(QUERIES["events_markov_transitions"].fn(spark, SF))
    assert plan.count("Exchange hashpartitioning(user_id") == 1
    assert plan.count("Exchange hashpartitioning") <= 3


def test_native_runtime_bloom_filter_injects(spark):
    """Catalyst's automatic counterpart of operators/bloom.py: with the
    size thresholds scaled down to test data (production defaults need a
    10 GB application side), a selective dim join must inject
    bloom_filter_agg on the creation side and might_contain on the fact
    scan — proof the engine's join surface composes with Spark's native
    runtime filtering at 100 TB, where these thresholds hold naturally."""
    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    old = {k: spark.conf.get(k) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        li = load_table(spark, SF, "lineitem")
        o = load_table(spark, SF, "orders").where(
            F.col("o_orderpriority") == "1-URGENT"
        )
        df = li.join(o, li.l_orderkey == o.o_orderkey).groupBy(
            "o_orderpriority"
        ).count()
        plan = df._jdf.queryExecution().optimizedPlan().toString()
    finally:
        for k, v in old.items():
            spark.conf.set(k, v)
    assert "bloom_filter_agg" in plan
    assert "might_contain" in plan


def test_session_paths_single_row_sized_exchange(spark):
    """events_session_paths: the session-numbering window (user_id) and
    the in-session rank window (user_id, session_id) must share ONE hash
    exchange — HashPartitioning(user_id) clusters the composite key, so
    a second row-sized shuffle would be a regression. Remaining
    exchanges carry only aggregated path rows."""
    plan = _plan(QUERIES["events_session_paths"].fn(spark, SF))
    assert plan.count("Exchange hashpartitioning(user_id") == 1
    assert "TakeOrderedAndProject" in plan


def test_global_topk_queries_take_ordered_not_global_sort(spark):
    """VERDICT r10/r11 item 2: the six global top-k queries must reach
    their K rows via TakeOrderedAndProject (per-partition top-k + merge)
    and run the rank window only over that bounded result — never an
    unpartitioned WindowExec over the data-sized relation. The window's
    input being limited is pinned by TakeOrderedAndProject appearing in
    the plan; test_plan_smells.WINDOW_ALLOWED carries the boundedness
    argument for the residual ≤K-row window."""
    for name in (
        "docs_bm25_topk",
        "docs_collocations_lift",
        "docs_char_bigram_rarity",
        "docs_zipf_fit",
        "docs_vocab_coverage",
        "graph_linkpred",
    ):
        plan = _plan(QUERIES[name].fn(spark, SF))
        assert "TakeOrderedAndProject" in plan, f"{name}: top-k lost TakeOrdered"


def test_pareto_rank_is_block_prefix_partitioned(spark):
    """orders_pareto_customers emits EVERY customer, so its global
    rank+cumsum must be the two-phase block-prefix decomposition: the
    per-row window partitioned BY the revenue-band block key (no
    single-partition sort of the customer relation), with the exclusive
    prefix running over the tiny band table only."""
    plan = _plan(QUERIES["orders_pareto_customers"].fn(spark, SF))
    assert "windowspecdefinition(_blk" in plan, (
        "customer-sized window lost its block partitioning"
    )
