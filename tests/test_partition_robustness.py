"""Opt-in partition-count robustness: re-run the most numerically
sensitive oracle comparisons under a DIFFERENT (prime, larger) shuffle
partition count than every other suite uses.

The engine's determinism story rests on order-independence — exact
decimal/integer aggregation, fixed-point quantization before sums, one
final shared division — and partition count is the easiest way to
shuffle aggregation order. A query that only matches its oracle at
spark.sql.shuffle.partitions=8 is relying on accidental ordering; this
suite would catch it.

Opt-in (own SparkSession, ~6 min): SPARK_GRAFT_PARTITION_ROBUST=1
    python -m pytest tests/test_partition_robustness.py -q
"""

from __future__ import annotations

import os

import duckdb
import pytest

SENSITIVE = [
    "events_ols_trend",
    "orders_gini_coefficient",
    "events_acf_hourly",
    "docs_ks_drift_by_source",
    "docs_dsir_importance",
    "docs_bm25_topk",
    "orders_pareto_customers",
    "orders_weighted_median",
    "orders_trimmed_mean",
    "agg_quantiles_distributed",
    "supplier_concentration_hhi",
    "agg_kmv_set_sketch",
    "agg_countmin_estimates",
    "sim_hybrid_rrf",
    "emb_matryoshka_recall",
    "sim_mutual_knn",
    "q1_pricing_summary",
    "emb_pca_projection",
    "events_disorder_profile",
    "docs_char_bigram_rarity",
    "dq_k_anonymity",
    "docs_nb_quality_classifier",
    "docs_wordlm_xent",
    "dedup_semantic_kmeans",
    "events_holt_forecast",
    "docs_weighted_reservoir",
    "er_fellegi_sunter",
    "events_binseg_changepoints",
    "docs_wordpiece_fertility",
    "orders_survival_km",
    "dq_dp_noise_calibration",
    "docs_unigram_mdl",
    "docs_textrank_keywords",
    "sim_knn_loo_eval",
    "docs_good_turing",
    "docs_heaps_law",
    "events_mannwhitney_value",
    "orders_conformal_interval",
    "graph_assortativity",
    "events_permutation_test",
    "orders_theil_sen",
    "events_kruskal_wallis",
    "scan_schema_evolution",
    "join_dpp_partitioned",
    "scan_csv_json_roundtrip",
    "pipeline_observe_metrics",
    "udf_grouped_apply_arrow",
    "cdc_incremental_cron_replay",
    "streaming_stream_stream_semi_join",
    "cdc_variant_pipeline",
    "rest_retry_backoff_e2e",
    "streaming_stream_stream_right_join",
    "sql_recursive_hierarchy",
    "sql_pipe_query",
    "scalar_collation_funcs",
    "scalar_ansi_try_funcs",
    "scalar_xml_funcs",
    "events_jackknife_variance",
    "events_block_bootstrap_ci",
    "ivm_join_delta",
    "rest_config_fanout_probe",
    "scan_orc_roundtrip",
    "sql_group_by_all",
    "agg_listagg_bitwise",
    "dq_t_closeness",
    "join_geo_gridblock",
    "scalar_interval_funcs",
    "events_stl_decompose",
    "scan_binaryfile_manifest",
    "scalar_time_funcs",
    "sql_parameterized_exec",
    "agg_approx_topk",
    "emb_ridge_normal_eq",
    "orders_feature_standardize",
    "udf_arrow_scalar",
    "udf_udtf_table_arg",
    "sql_udf_functions",
    "sql_identifier_clause",
    "scan_partition_pruning_static",
    "events_hll_sliding_window",
    "events_higher_moments",
    "join_strategy_hints",
    "streaming_hll_distinct_window",
    "join_aqe_skew_split",
    "layout_compaction_roundtrip",
    "sql_pivot_unpivot_clause",
    "events_sax_motifs",
    "events_fdr_bh",
    "sql_filter_window_clause",
    "docs_url_canonical_dedup",
    "multimodal_magic_bytes",
    "agg_hll_sketch_persist",
    "rest_filter_pushdown",
    "rest_stream_sink_e2e",
    "scan_xml_roundtrip",
    "streaming_state_introspection",
    "sql_session_variables",
    "udf_udtf_dynamic_schema",
    "multimodal_image_dims",
    "sql_lateral_column_alias",
    "streaming_join_state_introspection",
    "udf_pandas_iter_scalar",
    "docs_ccnet_buckets",
    # round-17 additions: the ranking/metric divisions and the pair
    # cosines must be partition-order-independent by construction
    # (integer-scaled gains/contingency sums, single final divisions)
    "sim_eval_ndcg_mrr",
    "docs_annotator_kappa",
    "docs_distinct_ngrams",
    "sim_eval_hard_negatives",
    "docs_nb_quality_auc",
    "docs_nb_quality_classifier",
    "docs_doremi_mixture",
    # round-18 additions: impact/prevalence/sweep are integer-count
    # aggregations with one guarded division; the quantization report's
    # per-row int64-scaled doubles make its label means order-independent
    "docs_dedup_impact_report",
    "docs_pii_prevalence",
    "docs_nb_threshold_sweep",
    "emb_quantization_error",
]

SF = "/root/testdata/sf0.01"

pytestmark = pytest.mark.skipif(
    not os.environ.get("SPARK_GRAFT_PARTITION_ROBUST"),
    reason="partition robustness is opt-in: set SPARK_GRAFT_PARTITION_ROBUST=1",
)


@pytest.fixture(scope="module")
def odd_spark():
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[16]")
        .appName("partition-robustness")
        .config("spark.sql.shuffle.partitions", "37")
        .config("spark.default.parallelism", "13")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    yield spark
    spark.stop()


@pytest.fixture(scope="module")
def oracle_con():
    from mk_kafka_connect_spark import catalog

    con = duckdb.connect()
    for t in catalog.TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    return con


@pytest.mark.parametrize("name", SENSITIVE)
def test_oracle_parity_at_prime_partition_count(name, odd_spark, oracle_con):
    from mk_kafka_connect_spark.plans import QUERIES

    from .conftest import assert_matches_oracle

    q = QUERIES[name]
    assert q.oracle is not None
    assert_matches_oracle(q.fn(odd_spark, SF), oracle_con, q.oracle, name=name)
