"""Property-based contracts for the r9 operator batch: randomized inputs
checked against independent brute-force references (the SURVEY §5
strategy — hypothesis drives the generator, a 20-line oracle decides).

Spark session startup dominates, so examples are kept small and few;
the brute references are O(n³)-ish but n <= ~40.
"""

from __future__ import annotations

import datetime

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


# ---------------------------------------------------------------------------
# Triangle counting vs brute-force triple enumeration.
# ---------------------------------------------------------------------------


@st.composite
def _graphs(draw):
    n = draw(st.integers(min_value=3, max_value=12))
    pairs = [(a, b) for a in range(n) for b in range(a + 1, n)]
    edges = draw(
        st.lists(st.sampled_from(pairs), min_size=1, max_size=30, unique=True)
    )
    return edges


@given(edges=_graphs())
@settings(**_SETTINGS)
def test_triangle_counts_match_brute_force(spark, edges):
    from mk_kafka_connect_spark.operators.graph import triangle_counts

    adj = set(edges) | {(b, a) for a, b in edges}
    nodes = sorted({v for e in edges for v in e})
    brute = {v: 0 for v in nodes}
    for i, a in enumerate(nodes):
        for b in nodes[i + 1 :]:
            for c in nodes:
                if c <= b:
                    continue
                if (a, b) in adj and (b, c) in adj and (a, c) in adj:
                    for v in (a, b, c):
                        brute[v] += 1
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.node: r.n_triangles for r in triangle_counts(df).collect()}
    assert got == brute


# ---------------------------------------------------------------------------
# Streaming SCD-2 writer vs the batch history build, any batch split/order.
# ---------------------------------------------------------------------------


@st.composite
def _change_sets(draw):
    n = draw(st.integers(min_value=2, max_value=10))
    rows = []
    for eid in range(n):
        uid = draw(st.integers(min_value=1, max_value=3))
        day = draw(st.integers(min_value=1, max_value=9))
        rows.append(
            (uid, eid, float(eid), datetime.datetime(2024, 1, day))
        )
    cut = draw(st.integers(min_value=0, max_value=n))
    order = draw(st.booleans())
    batches = [rows[:cut], rows[cut:]]
    if order:
        batches.reverse()
    return rows, [b for b in batches if b]


@given(data=_change_sets())
@settings(**_SETTINGS)
def test_scd2_writer_equals_batch_history(spark, data):
    import tempfile

    from mk_kafka_connect_spark.operators.cdc import scd2_history
    from mk_kafka_connect_spark.streaming.sinks import scd2_state_writer

    rows, batches = data
    sch = "user_id long, event_id long, value double, ts timestamp"
    root = tempfile.mkdtemp(prefix="scd2_prop_")
    apply, read_final = scd2_state_writer(root, ["user_id"], "ts", "event_id")
    for e, b in enumerate(batches):
        apply(spark.createDataFrame(b, sch), e)
    got = {
        r.event_id: (r.valid_from, r.valid_to, r.is_current)
        for r in read_final(spark).collect()
    }
    want_df = scd2_history(
        spark.createDataFrame(rows, sch), ["user_id"], "ts", "event_id"
    )
    want = {
        r.event_id: (r.valid_from, r.valid_to, r.is_current)
        for r in want_df.collect()
    }
    assert got == want


# ---------------------------------------------------------------------------
# Two-phase parallel prefix max == naive sequential running max.
# ---------------------------------------------------------------------------


@given(
    us=st.lists(
        st.integers(min_value=0, max_value=10**9), min_size=1, max_size=40
    )
)
@settings(**_SETTINGS)
def test_prefix_max_decomposition_equals_sequential(spark, us):
    # Mirrors the events_disorder_profile decomposition with a tiny block
    # size so multiple blocks actually occur.
    from pyspark.sql import Window, functions as F

    B = 4
    rows = [(i, u, i // B) for i, u in enumerate(us)]
    df = spark.createDataFrame(rows, "event_id long, us long, blk long")
    blocks = df.groupBy("blk").agg(F.max("us").alias("blk_max"))
    wb = Window.orderBy("blk").rowsBetween(Window.unboundedPreceding, -1)
    prior = blocks.select("blk", F.max("blk_max").over(wb).alias("prior_max"))
    ww = (
        Window.partitionBy("blk")
        .orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    got = {
        r.event_id: r.rm
        for r in df.join(F.broadcast(prior), "blk")
        .withColumn("wmax", F.max("us").over(ww))
        .select(
            "event_id",
            F.greatest(
                F.coalesce("prior_max", F.lit(0)), F.col("wmax")
            ).alias("rm"),
        )
        .collect()
    }
    run, want = 0, {}
    for i, u in enumerate(us):
        run = max(run, u)
        want[i] = run
    assert got == want
