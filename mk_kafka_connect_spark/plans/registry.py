"""Query registry: the engine's declared, oracle-checkable surface.

Every operator from SURVEY.md §2 lands here as a named query: a DataFrame
builder (the engine path) plus, where SQL-expressible, the equivalent
DuckDB SQL (the oracle path). The driver executes both at sf=0.01 and
compares row-count + schema + order-insensitive value hash — so builders
MUST alias every computed column to the same name the oracle uses, and
float-producing expressions use the exact-arithmetic helpers in
``mk_kafka_connect_spark.functions`` so both engines produce bit-identical
values.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

__all__ = [
    "QuerySpec",
    "QUERIES",
    "query",
    "spark_queries",
    "oracle_queries",
    "CERTIFICATION_FRONT",
    "R8_ADDITIONS",
    "R8_PRIORITY",
    "R8_BACKFILL",
    "certification_order",
]

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL over the pre-registered views, or None
    tags: tuple[str, ...] = field(default_factory=tuple)
    doc: str = ""


QUERIES: dict[str, QuerySpec] = {}

# The driver's correctness gate certifies only the FIRST 50 entries of the
# exposed query dict (CORRECTNESS_r02 checked set == first 50 of registration
# order). CERTIFICATION_FRONT pins the queries that most need a driver row —
# never-certified surfaces, fixed-but-not-recertified queries, and the
# queries added this round — into those slots. Everything else follows in
# registration order and stays covered by the pytest oracle-parity suite
# (tests/test_oracle_parity.py), which runs the same comparison locally.
# The per-round rotation schedule (which rounds certified which queries,
# and what to pin next round) is documented in COVERAGE.md §"Driver
# certification rotation".
#
# Round-8 window (per the r8 plan in COVERAGE.md): new r8 queries first
# (zero driver rows by definition), then the 29 r7 additions that did not
# fit the r7 window (also zero driver rows), then the backfill displaced
# by the r7 continuation batches, oldest driver row first. The window is
# the first 50 of the concatenation; anything that overflows stays covered
# by the local oracle-parity pytest and rotates into r9.

# Queries ADDED during round 8 — append here as they land; they take the
# front of the window automatically.
R8_ADDITIONS: tuple[str, ...] = (
    "events_ohlc_hourly",
    "events_ewma",
    "events_ab_test",
    "ivm_orders_summary",
    "join_fact_scd2_temporal",
    "graph_pagerank",
    "er_name_neardup",
    "docs_oov_rate",
    "streaming_cdc_scd1",
    "events_trend_mannkendall",
    "orders_pareto_customers",
)

# r7 additions that never fit the r7 driver window — zero driver rows.
R8_PRIORITY: tuple[str, ...] = (
    "docs_length_histogram",
    "dedup_verbatim_spans",
    "streaming_active_users_hourly",
    "cdc_pipeline_end_to_end",
    "join_bloom_prefilter",
    "agg_bitmap_distinct",
    "events_time_weighted_avg",
    "events_markov_transitions",
    "multimodal_ahash_neardup",
    "events_session_paths",
    "funnel_conversion_latency",
    "orders_rfm_segments",
    "events_dau_wau",
    "dq_checks_orders",
    "cdc_snapshot_asof",
    "sim_topk_pq",
    "sim_topk_ivf_pq",
    "basket_brand_affinity",
    "streaming_stream_stream_full_join",
    "dedup_ngram_containment",
    "agg_bitmap_audience_overlap",
    "text_langid_confusion",
    "orders_cohort_ltv",
    "events_attribution_models",
    "supplier_concentration_hhi",
    "orders_open_backlog",
    "agg_quantiles_distributed",
    "cdc_snapshot_diff",
    "diag_key_skew",
)

# Backfill: queries whose last driver row is r1/r2 (or that the late-r7
# additions displaced), stalest first. Overflow past slot 50 rotates to r9.
R8_BACKFILL: tuple[str, ...] = (
    "q7_volume_shipping",
    "q8_market_share",
    "q9_product_type_profit",
    "join_left_nulls",
    "join_right",
    "join_full_outer",
    "join_semi",
    "join_anti",
    "join_asof",
    "filter_range_halfopen",
    "cdc_merge_upsert",
    "dedup_latest_wins",
    "dedup_exact",
    "bucketed_join_revenue",
    "dedup_embedding_lsh",
    "agg_stats",
    "agg_rollup",
    "agg_cube",
    "agg_grouping_sets",
    "agg_having_filter",
    "agg_case_when_buckets",
    "agg_percentiles",
    "skew_salted_agg",
)

DRIVER_WINDOW = 50

CERTIFICATION_FRONT: tuple[str, ...] = (R8_ADDITIONS + R8_PRIORITY + R8_BACKFILL)[
    :DRIVER_WINDOW
]


def certification_order() -> list[str]:
    """Registry names with CERTIFICATION_FRONT pinned to the front."""
    front = [n for n in CERTIFICATION_FRONT if n in QUERIES]
    pinned = set(front)
    return front + [n for n in QUERIES if n not in pinned]


def query(name: str, oracle: str | None = None, tags: tuple[str, ...] = ()):
    """Register a (DataFrame builder, oracle SQL) pair under ``name``."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        QUERIES[name] = QuerySpec(name=name, fn=fn, oracle=oracle, tags=tags, doc=fn.__doc__ or "")
        return fn

    return deco


def spark_queries() -> dict[str, QueryFn]:
    return {name: QUERIES[name].fn for name in certification_order()}


def oracle_queries() -> dict[str, str]:
    return {
        name: QUERIES[name].oracle
        for name in certification_order()
        if QUERIES[name].oracle is not None
    }
