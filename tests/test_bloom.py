"""Bloom-filter semi-join reduction contracts (operators/bloom.py): zero
false negatives (result == plain join), real pruning power, calibrated
false-positive rate, and a deterministic bitmap."""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from mk_kafka_connect_spark.catalog import load_table
from mk_kafka_connect_spark.operators.bloom import (
    bloom_prefilter_join,
    build_bloom_bits,
)

from .conftest import SF_SMOKE


def test_bloom_join_equals_plain_join(spark):
    """The Bloom pass only prunes — the joined result must be row-for-row
    the plain inner join."""
    li = load_table(spark, SF_SMOKE, "lineitem").withColumnRenamed(
        "l_orderkey", "o_orderkey"
    )
    o = (
        load_table(spark, SF_SMOKE, "orders")
        .where(F.col("o_orderpriority") == "1-URGENT")
        .select("o_orderkey", "o_orderdate")
    )
    got = bloom_prefilter_join(li, o, "o_orderkey").select("o_orderkey", "l_linenumber")
    want = li.join(o, "o_orderkey").select("o_orderkey", "l_linenumber")
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_bloom_prunes_before_shuffle(spark):
    """With a ~20% selective dim, the Bloom mask must kill most of the
    fact side map-side (fp rate pushes survivors slightly above the true
    match fraction, never below it)."""
    li = load_table(spark, SF_SMOKE, "lineitem").withColumnRenamed(
        "l_orderkey", "o_orderkey"
    )
    o = load_table(spark, SF_SMOKE, "orders").where(
        F.col("o_orderpriority") == "1-URGENT"
    )
    bits = build_bloom_bits(o, "o_orderkey")
    from pyspark.sql.functions import pandas_udf

    from mk_kafka_connect_spark.operators.bloom import _bit_positions

    bm = np.frombuffer(bits, dtype=np.uint8)

    @pandas_udf("boolean")
    def probe(h: pd.Series) -> pd.Series:
        x = h.to_numpy(np.int64).astype(np.uint64)
        ok = np.ones(len(x), dtype=bool)
        for idx in _bit_positions(x, 1 << 20, 5):
            ok &= ((bm[idx >> 3] >> (idx & 7).astype(np.uint8)) & 1).astype(bool)
        return pd.Series(ok)

    n_fact = li.count()
    n_true = li.join(o.select("o_orderkey"), "o_orderkey", "left_semi").count()
    n_pass = li.where(probe(F.xxhash64("o_orderkey"))).count()
    assert n_true <= n_pass  # no false negatives
    # 2^20 bits for a few hundred keys -> fp rate is essentially zero;
    # allow a generous 1% of the fact table as fp slack.
    assert n_pass <= n_true + max(10, n_fact // 100)


def test_bloom_fp_rate_calibrated():
    """Off-Spark unit check of the bit math: 10 bits/key, k=5 gives
    ~1% fp; assert < 3% measured, and exactly zero false negatives."""
    rng = np.random.RandomState(7)
    keys = rng.randint(-(2**62), 2**62, size=10_000, dtype=np.int64)
    probes = rng.randint(-(2**62), 2**62, size=20_000, dtype=np.int64)
    probes = probes[~np.isin(probes, keys)]
    from mk_kafka_connect_spark.operators.bloom import _bit_positions

    num_bits = 1 << 17  # ~13 bits/key
    bm = np.zeros(num_bits // 8, dtype=np.uint8)
    for idx in _bit_positions(keys.astype(np.uint64), num_bits, 5):
        np.bitwise_or.at(bm, idx >> 3, np.uint8(1) << (idx & 7).astype(np.uint8))

    def contains(arr):
        ok = np.ones(len(arr), dtype=bool)
        for idx in _bit_positions(arr.astype(np.uint64), num_bits, 5):
            ok &= ((bm[idx >> 3] >> (idx & 7).astype(np.uint8)) & 1).astype(bool)
        return ok

    assert contains(keys).all()  # Bloom guarantee: members always pass
    assert contains(probes).mean() < 0.03


def test_bloom_bits_deterministic(spark):
    """Same keys -> same bitmap regardless of partitioning (OR-merge is
    commutative and the hash chain has no randomness)."""
    o = load_table(spark, SF_SMOKE, "orders").select("o_orderkey")
    a = build_bloom_bits(o, "o_orderkey", num_bits=1 << 16)
    b = build_bloom_bits(o.repartition(7), "o_orderkey", num_bits=1 << 16)
    assert a == b
