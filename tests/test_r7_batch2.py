"""Semantic tests for the late-round-7 batch-2 operators: time-weighted
average (hand-computed LOCF integral), Markov transition normalization,
and exact bitmap count-distinct vs COUNT(DISTINCT)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from mk_kafka_connect_spark.catalog import load_table
from mk_kafka_connect_spark.operators.timeseries import time_weighted_avg

from .conftest import SF_SMOKE


def test_time_weighted_avg_hand_computed(spark):
    """3 observations: value 10 holds 60 s, value 20 holds 30 s, last one
    has no span -> twa = (10*60 + 20*30) / 90 = 13.33..; a single-obs key
    gets NULL twa and zero span."""
    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        (1, t0, 10.0, 100),
        (1, t0 + dt.timedelta(seconds=60), 20.0, 101),
        (1, t0 + dt.timedelta(seconds=90), 99.0, 102),
        (2, t0, 55.5, 200),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, value double, event_id long")
    out = {
        r["user_id"]: r
        for r in time_weighted_avg(df, "user_id", "ts", "value", "event_id").collect()
    }
    assert out[1]["n_obs"] == 3
    assert out[1]["span_us"] == 90_000_000
    assert out[1]["twa_value"] == pytest.approx((10 * 60 + 20 * 30) / 90)
    assert out[2]["n_obs"] == 1
    assert out[2]["span_us"] == 0
    assert out[2]["twa_value"] is None


def test_time_weighted_avg_partitioning_invariant(spark):
    """Exact integer accumulation -> bit-identical on any partitioning."""
    ev = load_table(spark, SF_SMOKE, "events")
    a = time_weighted_avg(ev, "user_id", "ts", "value", "event_id")
    b = time_weighted_avg(ev.repartition(13), "user_id", "ts", "value", "event_id")
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_markov_rows_sum_to_one(spark):
    """Each from_type's outgoing probabilities must sum to ~1 and its
    counts to the exact number of non-terminal events of that type."""
    from mk_kafka_connect_spark.plans.relational import events_markov_transitions

    res = events_markov_transitions(spark, SF_SMOKE)
    sums = res.groupBy("from_type").agg(
        F.sum("p").alias("psum"), F.sum("n").alias("nsum")
    )
    for r in sums.collect():
        assert r["psum"] == pytest.approx(1.0, abs=1e-9)
        assert r["nsum"] > 0


def test_bitmap_distinct_equals_count_distinct(spark):
    """The bitmap popcount path is EXACT — must equal COUNT(DISTINCT) per
    type, and the OR-merged ALL row must equal the global distinct."""
    from mk_kafka_connect_spark.plans.advanced import agg_bitmap_distinct

    ev = load_table(spark, SF_SMOKE, "events")
    got = {
        r["event_type"]: r["distinct_users"]
        for r in agg_bitmap_distinct(spark, SF_SMOKE).collect()
    }
    want = {
        r["event_type"]: r["d"]
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("d"))
        .collect()
    }
    want["ALL"] = ev.select("user_id").distinct().count()
    assert got == want


def test_ahash_neardup_finds_planted_duplicate(spark):
    """A byte-identical payload pair must surface at hamming 0; a
    one-char edit stays within the threshold (aHash is robust to small
    perturbations — that is its job)."""
    from mk_kafka_connect_spark.operators.multimodal import (
        ahash_near_dups,
        attach_fake_binary,
    )

    docs = load_table(spark, SF_SMOKE, "documents").limit(20)
    base = docs.collect()[0]["text"]
    extra = spark.createDataFrame(
        [(9001, base), (9002, base), (9003, base[:-1] + ("x" if base[-1] != "x" else "y"))],
        "doc_id long, text string",
    )
    d = docs.select("doc_id", "text").unionAll(extra)
    pairs = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in ahash_near_dups(attach_fake_binary(d), max_hamming=7).collect()
    }
    assert pairs.get((9001, 9002)) == 0
    assert any(a in (9001, 9002) and b == 9003 for (a, b) in pairs)


def test_ahash_band_completeness_property():
    """Pigeonhole: ANY pair of 64-bit words at hamming <= 7 shares at
    least one of the 8 8-bit bands — the property that makes the band
    join a complete candidate generator."""
    import numpy as np

    rng = np.random.RandomState(11)
    for _ in range(500):
        a = rng.randint(0, 2**63 - 1, dtype=np.int64)
        flips = rng.choice(64, size=rng.randint(0, 8), replace=False)
        b = a
        for f in flips:
            b = np.int64(b) ^ (np.int64(1) << np.int64(f))
        shares = any(
            (int(a) >> (8 * k)) & 255 == (int(b) >> (8 * k)) & 255 for k in range(8)
        )
        assert shares


def test_dau_wau_counts_bucket_silent_on_target_day(spark):
    """The failure mode the explode-contribution form exists for: a user
    active earlier in the trailing week whose id-bucket has NO events on
    the target day must still count toward that day's WAU. User 0 sits
    alone in bitmap bucket 0, active only on day 1; day 3's WAU must
    include them, day 10's must not."""
    from mk_kafka_connect_spark.plans.advanced import events_dau_wau
    import datetime as dt
    import os
    import tempfile

    t0 = dt.datetime(2024, 3, 1, 12, 0, 0)
    rows = [(1, t0, 0)]  # user 0: bucket 0, day 1 only
    rows += [
        (100 + d * 10 + i, t0 + dt.timedelta(days=d), 10 + i)
        for d in range(0, 12)
        for i in range(3)
    ]
    df = spark.createDataFrame(
        [(eid, ts, uid, "view", 1.0, "{}") for eid, ts, uid in rows],
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    )
    with tempfile.TemporaryDirectory() as tmp:
        df.write.parquet(os.path.join(tmp, "events.parquet"))
        out = {r["day"].date(): (r["dau"], r["wau"]) for r in events_dau_wau(spark, tmp).collect()}
    d1, d3, d10 = (dt.date(2024, 3, 1), dt.date(2024, 3, 3), dt.date(2024, 3, 10))
    assert out[d1] == (4, 4)          # user 0 + 3 regulars
    assert out[d3] == (3, 4)          # bucket 0 silent on day 3, still in WAU
    assert out[d10] == (3, 3)         # user 0 aged out of the 7-day window


def test_compact_parquet_reduces_files_preserves_rows(spark, tmp_path):
    """Small-file compaction: a 24-file directory collapses to the
    size-targeted count, rows and values survive byte-for-byte, and a
    second run is a no-op."""
    import os

    from mk_kafka_connect_spark.operators.maintenance import (
        compact_parquet,
        layout_stats,
    )

    src = load_table(spark, SF_SMOKE, "orders")
    path = os.path.join(tmp_path, "orders_small")
    src.repartition(24).write.parquet(path)
    before = layout_stats(spark, path)
    assert before["n_files"] == 24
    want = sorted(map(tuple, spark.read.parquet(path).collect()))

    res = compact_parquet(spark, path, target_bytes=1 << 30)
    assert res["compacted"] and res["n_files_after"] == 1
    assert sorted(map(tuple, spark.read.parquet(path).collect())) == want

    res2 = compact_parquet(spark, path, target_bytes=1 << 30)
    assert not res2["compacted"]


def test_zorder_layout_prunes_row_groups(spark, tmp_path):
    """Z-ordering must make row-group min/max stats selective on BOTH
    participating columns: for a small box predicate on (l_orderkey,
    l_partkey), the fraction of row groups whose stats overlap the box
    must drop by at least 2x vs the natural (insertion-ordered) layout,
    and the data must survive the rewrite byte-for-byte."""
    import glob
    import os

    import pyarrow.parquet as pq

    from mk_kafka_connect_spark.operators.layout import zorder_write

    li = load_table(spark, "/root/testdata/sf0.01", "lineitem").select(
        "l_orderkey", "l_partkey", "l_quantity"
    )
    plain, zpath = os.path.join(tmp_path, "plain"), os.path.join(tmp_path, "zord")
    li.repartition(8).write.parquet(plain)
    zorder_write(li, zpath, ["l_orderkey", "l_partkey"], n_files=8)

    def overlap_frac(path, lo1, hi1, lo2, hi2):
        tot = hit = 0
        for f in glob.glob(os.path.join(path, "*.parquet")):
            pf = pq.ParquetFile(f)
            i1 = pf.schema_arrow.get_field_index("l_orderkey")
            i2 = pf.schema_arrow.get_field_index("l_partkey")
            for rg in range(pf.metadata.num_row_groups):
                s1 = pf.metadata.row_group(rg).column(i1).statistics
                s2 = pf.metadata.row_group(rg).column(i2).statistics
                tot += 1
                if s1.min <= hi1 and s1.max >= lo1 and s2.min <= hi2 and s2.max >= lo2:
                    hit += 1
        return hit / tot

    # A small box in both dimensions (~10% of each domain:
    # l_orderkey 0..15000, l_partkey 0..2000 in this fixture).
    f_plain = overlap_frac(plain, 1000, 2500, 100, 300)
    f_z = overlap_frac(zpath, 1000, 2500, 100, 300)
    assert f_z <= f_plain / 2, f"z-order did not prune: plain {f_plain:.2f} vs z {f_z:.2f}"

    want = sorted(map(tuple, li.collect()))
    assert sorted(map(tuple, spark.read.parquet(zpath).collect())) == want


def _reference_bpe(word_freqs, n_merges):
    """Pure-Python BPE (the textbook algorithm) to pin the distributed
    trainer: same tie-break (count desc, pair lexicographic asc), same
    left-to-right non-overlapping merge application."""
    vocab = {tuple(w): f for w, f in word_freqs.items()}
    merges = []
    for _ in range(n_merges):
        counts = {}
        for syms, f in vocab.items():
            for i in range(len(syms) - 1):
                counts[(syms[i], syms[i + 1])] = counts.get((syms[i], syms[i + 1]), 0) + f
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        a, b = best
        new_vocab = {}
        for syms, f in vocab.items():
            res, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    res.append(a + b)
                    i += 2
                else:
                    res.append(syms[i])
                    i += 1
            new_vocab[tuple(res)] = new_vocab.get(tuple(res), 0) + f
        vocab = new_vocab
    return merges


def test_bpe_matches_reference_implementation(spark):
    """The distributed trainer's merge list must equal the pure-Python
    textbook BPE on the same word frequencies, merge for merge."""
    from mk_kafka_connect_spark.operators.bpe import train_bpe, word_frequencies

    docs = load_table(spark, SF_SMOKE, "documents").limit(60)
    wf = {r["word"]: r["freq"] for r in word_frequencies(docs, "text").collect()}
    want = _reference_bpe(wf, 15)
    got = train_bpe(docs, "text", n_merges=15, checkpoint_every=5)
    assert got == want
    assert len(got) == 15


def test_bpe_deterministic_across_partitionings(spark):
    from mk_kafka_connect_spark.operators.bpe import train_bpe

    docs = load_table(spark, SF_SMOKE, "documents").limit(40)
    assert train_bpe(docs, "text", n_merges=8) == train_bpe(
        docs.repartition(7), "text", n_merges=8
    )


def test_containment_catches_quote_jaccard_misses(spark):
    """A short document quoted verbatim inside a much longer one:
    containment of the short side ~1 (fires at 0.9), while symmetric
    Jaccard is diluted far below the 0.8 dedup threshold."""
    from mk_kafka_connect_spark.operators.dedup import (
        ngram_containment_pairs,
        ngram_jaccard_pairs,
    )

    quote = " ".join(f"tok{i}" for i in range(30))
    filler = " ".join(f"pad{i}" for i in range(300))
    df = spark.createDataFrame(
        [(1, quote), (2, filler + " " + quote)], "doc_id long, text string"
    )
    cont = ngram_containment_pairs(df, "text", "doc_id", threshold=0.9).collect()
    assert len(cont) == 1 and cont[0]["containment_ab"] >= 0.9
    jac = ngram_jaccard_pairs(df, "text", "doc_id", threshold=0.8).collect()
    assert jac == []  # symmetric dedup never fires on this pair


def test_distributed_quantile_heavy_duplicates(spark):
    """Radix descent must terminate and stay exact when the target rank
    falls inside a massive duplicate run (the lo == hi fast path)."""
    from mk_kafka_connect_spark.operators.sketch import exact_quantile_distributed

    rows = [(7.0,)] * 5000 + [(1.0,)] * 100 + [(9.0,)] * 100
    df = spark.createDataFrame(rows, "v double")
    assert exact_quantile_distributed(df, "v", q=0.5) == 7.0
    assert exact_quantile_distributed(df, "v", q=0.01) == 1.0
    assert exact_quantile_distributed(df, "v", q=1.0) == 9.0


def test_bpe_local_path_equals_distributed(spark):
    """The hybrid's collected-vocab merge loop must be bit-identical to
    the distributed loop on the same corpus."""
    from mk_kafka_connect_spark.operators.bpe import train_bpe

    docs = load_table(spark, SF_SMOKE, "documents").limit(60)
    dist = train_bpe(docs, "text", n_merges=15, checkpoint_every=5)
    local = train_bpe(docs, "text", n_merges=15, local_threshold=10**6)
    assert local == dist
