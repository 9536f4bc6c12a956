"""Empirical scaling probe: run selected registry queries at sf0.001 /
sf0.01 / sf0.1 (fresh driver-style session, min-of-N timing) and report
the growth ratio over each 10x data step.

Interpretation: per 10x step, wall-time ratio ~1 means fixed-overhead-
dominated, ~10 means linear in the data, >~13 is a super-linear smell
worth a plan audit. Ratios are computed on raw wall time (including
~0.3-0.5 s/query fixed overhead), so small queries read LOW — a ratio
well under 10 never indicts; only a large ratio does.

Usage:
    python tools/scale_probe.py [name ...]       # default: probe set
    python tools/scale_probe.py --md > SCALING.md
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SFS = ("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")

# One representative per operator family (scan/join/agg/window/dedup/
# similarity/text/graph/timeseries/curation), weighted toward the ones
# whose 100 TB posture the docstrings argue hardest about.
PROBE_SET = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "join_asof",
    "bucketed_join_revenue",
    "topk_per_group",
    "sessionize_events",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "dedup_embedding_lsh",
    "sim_topk_bruteforce",
    "sim_topk_ivf",
    "docs_bm25_topk",
    "docs_dsir_importance",
    "docs_boilerplate_fraction",
    "docs_ks_drift_by_source",
    "orders_pareto_customers",
    "orders_gini_coefficient",
    "events_acf_hourly",
    "events_cusum_changepoint",
    "graph_pagerank",
    "agg_countmin_estimates",
    "agg_kmv_set_sketch",
    "multimodal_phash_dct",
    # r13 governance/quality family.
    "dq_k_anonymity",
    "docs_wordlm_xent",
    "dedup_semantic_kmeans",
    "docs_wordpiece_fertility",
    "er_fellegi_sunter",
    "orders_survival_km",
    # r13 statistical-inference family.
    "docs_heaps_law",
    "events_mannwhitney_value",
    "orders_conformal_interval",
    "events_permutation_test",
]

REPS = int(os.environ.get("SPARK_GRAFT_PROBE_REPS", "2"))


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    emit_md = "--md" in sys.argv

    from mk_kafka_connect_spark.session import get_spark
    from mk_kafka_connect_spark.plans import QUERIES

    names = args if args else [n for n in PROBE_SET if n in QUERIES]
    spark = get_spark(
        app_name="scale-probe",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )

    results: dict[str, list[float]] = {}
    for name in names:
        fn = QUERIES[name].fn
        ts = []
        for sf_dir in SFS:
            fn(spark, sf_dir).count()  # warm-up
            best = float("inf")
            for _ in range(REPS):
                t0 = time.perf_counter()
                fn(spark, sf_dir).count()
                best = min(best, time.perf_counter() - t0)
            ts.append(round(best, 3))
        results[name] = ts
        print(
            f"{name}: {ts[0]:.2f} / {ts[1]:.2f} / {ts[2]:.2f} s  "
            f"(x{ts[1] / max(ts[0], 1e-9):.1f}, x{ts[2] / max(ts[1], 1e-9):.1f})",
            file=sys.stderr,
            flush=True,
        )

    if emit_md:
        print("| query | sf0.001 | sf0.01 | sf0.1 | 10x step ratio |")
        print("|---|---|---|---|---|")
        for n, ts in sorted(results.items(), key=lambda kv: -kv[1][2] / max(kv[1][1], 1e-9)):
            print(
                f"| `{n}` | {ts[0]:.2f} s | {ts[1]:.2f} s | {ts[2]:.2f} s "
                f"| x{ts[2] / max(ts[1], 1e-9):.1f} |"
            )
    else:
        print(json.dumps(results))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
