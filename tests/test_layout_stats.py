"""Semantic assertions for layout_zorder_pruning_stats: the relational
row-group model must show the clustering trade-off the physical
footer-stats test (test_r7_batch2.py::test_zorder_layout_prunes_row_groups)
measures on real parquet files."""

from __future__ import annotations

from mk_kafka_connect_spark.plans import QUERIES

SF = "/root/testdata/sf0.01"


def test_zorder_model_shows_clustering_tradeoff(spark):
    rows = QUERIES["layout_zorder_pruning_stats"].fn(spark, SF).collect()
    frac = {(r.layout, r.predicate): r.overlap_frac for r in rows}
    # Natural (orderkey-sorted) layout: partkey stats are useless —
    # every group spans ~the whole partkey domain.
    assert frac[("natural", "partkey_only")] > 0.9
    # Z-order makes the partkey dimension prunable...
    assert frac[("zorder", "partkey_only")] < frac[("natural", "partkey_only")]
    # ...and wins the conjunctive box (the reason it exists).
    assert frac[("zorder", "box_both")] <= frac[("natural", "box_both")]
    # The price: orderkey-only pruning is tighter in the natural layout.
    assert frac[("natural", "orderkey_only")] <= frac[("zorder", "orderkey_only")]
    # Hilbert is the third layout (r9): like Z-order it clusters BOTH
    # dimensions, so partkey-only pruning must beat the natural layout.
    assert frac[("hilbert", "partkey_only")] < frac[("natural", "partkey_only")]
    assert frac[("hilbert", "box_both")] <= frac[("natural", "box_both")]
    # Every (layout, predicate) pair present.
    assert len(frac) == 9
