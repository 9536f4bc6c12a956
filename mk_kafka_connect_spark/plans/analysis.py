"""Round-10 analysis operators: sliding distinct counts, change-point
detection, distribution drift, sequence-pattern matching (the
MATCH_RECOGNIZE surrogate), k-core decomposition, BM25 relevance, and
audio-frame energy — extending SURVEY.md §2.B B6/B7/B9/B15 with the
operator families a monitoring/retrieval deployment layers on top of
the engine's CDC and corpus surfaces.

Exactness contract (same as the rest of the registry): every float
output is one IEEE operation (division / multiply / sqrt — all
correctly rounded per IEEE 754, hence bit-identical across engines)
applied to EXACT integer or decimal aggregates; no float value is ever
summed across rows, and multi-term float sums use a fixed expression
order over pivoted columns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.bounded import bounded_window
from .registry import query

# ---------------------------------------------------------------------------
# events_rolling_distinct_users — sliding-window COUNT DISTINCT
# ---------------------------------------------------------------------------

_ROLL_DAYS = 7


@query(
    "events_rolling_distinct_users",
    oracle=f"""
    WITH du AS (
      SELECT DISTINCT CAST(ts AS DATE) AS d, user_id FROM events),
    days AS (SELECT DISTINCT d FROM du)
    SELECT CAST(days.d AS TIMESTAMP) AS day,
      count(DISTINCT CASE WHEN du.d = days.d THEN du.user_id END)
        AS users_1d,
      count(DISTINCT du.user_id) AS users_7d
    FROM days JOIN du
      ON date_diff('day', du.d, days.d) BETWEEN 0 AND {_ROLL_DAYS - 1}
    GROUP BY days.d
    """,
    tags=("window", "B7", "B9", "distinct", "timeseries"),
)
def events_rolling_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-7-day distinct active users per day — the sliding-window
    COUNT DISTINCT that plain window frames cannot express (DISTINCT is
    not frame-decomposable; Spark rejects it over a RANGE frame).

    The classic scalable decomposition: reduce the fact table ONCE to
    distinct (day, user) pairs (one hash shuffle, map-side combinable),
    then re-associate each pair with every window it falls in via a
    bounded range join against the tiny day dimension (≤7× row
    amplification, constant in fact size) and count distinct per day.
    At 100 TB the |days| side stays broadcastable by construction and
    the amplified relation is |active pairs|·7, never |events|·7.

    The window association is an EXPLODE + EQUI-JOIN, not a theta join:
    each (day, user) pair emits its 7 candidate window anchors
    (day + 0..6) and a broadcast hash semi-join against the real day
    dimension drops anchors past the data's edge — byte-identical to
    the oracle's BETWEEN join, but hash-joinable (no
    BroadcastNestedLoopJoin in the plan)."""
    ev = load_table(spark, sf_dir, "events")
    du = ev.select(F.to_date("ts").alias("d"), "user_id").distinct()
    days = du.select(F.col("d").alias("day")).distinct()
    anchored = du.select(
        "d",
        "user_id",
        F.explode(F.sequence(F.lit(0), F.lit(_ROLL_DAYS - 1))).alias("off"),
    ).withColumn("day", F.date_add(F.col("d"), F.col("off")))
    joined = anchored.join(F.broadcast(days), "day", "inner")
    return joined.groupBy(F.col("day").cast("timestamp").alias("day")).agg(
        F.countDistinct(
            F.when(F.col("d") == F.col("day"), F.col("user_id"))
        ).alias("users_1d"),
        F.countDistinct("user_id").alias("users_7d"),
    )


# ---------------------------------------------------------------------------
# events_cusum_changepoint — integer-exact CUSUM change-point detection
# ---------------------------------------------------------------------------


@query(
    "events_cusum_changepoint",
    oracle="""
    WITH hourly AS (
      SELECT event_type, date_trunc('hour', ts) AS h,
             CAST(count(*) AS BIGINT) AS y
      FROM events GROUP BY 1, 2),
    stats AS (
      SELECT event_type, CAST(count(*) AS BIGINT) AS n_hours,
             CAST(sum(y) AS BIGINT) AS total
      FROM hourly GROUP BY event_type),
    walked AS (
      SELECT h.event_type, h.h, s.n_hours, s.total,
        CAST(s.n_hours * sum(h.y) OVER (PARTITION BY h.event_type
                                        ORDER BY h.h
                                        ROWS UNBOUNDED PRECEDING)
          - row_number() OVER (PARTITION BY h.event_type ORDER BY h.h)
            * s.total AS BIGINT) AS s_scaled
      FROM hourly h JOIN stats s USING (event_type)),
    best AS (
      SELECT *, row_number() OVER (PARTITION BY event_type
                                   ORDER BY abs(s_scaled) DESC, h) AS rnk
      FROM walked)
    SELECT event_type, h AS change_hour, s_scaled, n_hours, total
    FROM best WHERE rnk = 1
    """,
    tags=("timeseries", "B9", "changepoint", "monitoring"),
)
def events_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM change-point detection on hourly event volume: per event
    type, the hour where the cumulative deviation from the mean rate
    |Σ(yᵢ − μ)| peaks — the standard single-change-point estimator
    (Page 1954) a rate-monitoring deployment runs per stream.

    Integer-exact: with μ = total/n kept as a RATIO, the walk is scaled
    by n — S'ₖ = n·Σyᵢ − k·total — so every value is an exact int64
    (hours ≤ 1e5 and counts ≤ 1e12 at 100 TB keep the product < 2⁶³).
    One hourly pre-aggregation (map-side combinable) collapses the fact
    table to |types|·|hours| rows before the two windows, which share
    one hash exchange on event_type; the argmax is a row_number, not a
    self-join."""
    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("h")
    ).agg(F.count(F.lit(1)).alias("y"))
    stats = hourly.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_hours"), F.sum("y").alias("total")
    )
    wcum = W.partitionBy("event_type").orderBy("h")
    walked = hourly.join(stats, "event_type").select(
        "event_type",
        "h",
        "n_hours",
        "total",
        (
            F.col("n_hours")
            * F.sum("y").over(wcum.rowsBetween(W.unboundedPreceding, W.currentRow))
            - F.row_number().over(wcum) * F.col("total")
        ).alias("s_scaled"),
    )
    wbest = W.partitionBy("event_type").orderBy(
        F.abs(F.col("s_scaled")).desc(), F.col("h")
    )
    return (
        walked.withColumn("rnk", F.row_number().over(wbest))
        .where(F.col("rnk") == 1)
        .select(
            "event_type",
            F.col("h").alias("change_hour"),
            "s_scaled",
            "n_hours",
            "total",
        )
    )


# ---------------------------------------------------------------------------
# events_histogram_drift — binned distribution drift between time halves
# ---------------------------------------------------------------------------

_DRIFT_BINS = 10


@query(
    "events_histogram_drift",
    oracle=f"""
    WITH base AS (
      SELECT event_type, epoch_us(ts) AS us,
        CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
      FROM events),
    bounds AS (
      SELECT event_type, min(us) AS lo_us, max(us) AS hi_us,
             min(cents) AS lo_c, max(cents) AS hi_c
      FROM base GROUP BY event_type),
    binned AS (
      SELECT b.event_type,
        CASE WHEN bo.hi_c = bo.lo_c THEN 0
             ELSE least({_DRIFT_BINS - 1},
                        ((b.cents - bo.lo_c) * {_DRIFT_BINS})
                          // (bo.hi_c - bo.lo_c)) END AS bin,
        CASE WHEN b.us <= (bo.lo_us + bo.hi_us) // 2 THEN 1 ELSE 0 END
          AS is_first
      FROM base b JOIN bounds bo USING (event_type)),
    counts AS (
      SELECT event_type, bin,
        CAST(sum(is_first) AS BIGINT) AS n_first,
        CAST(sum(1 - is_first) AS BIGINT) AS n_second
      FROM binned GROUP BY event_type, bin),
    frame AS (
      SELECT bo.event_type, f.bin
      FROM bounds bo, (SELECT unnest(range({_DRIFT_BINS})) AS bin) f),
    filled AS (
      SELECT fr.event_type, fr.bin,
        coalesce(c.n_first, 0) AS n_first,
        coalesce(c.n_second, 0) AS n_second
      FROM frame fr LEFT JOIN counts c
        ON fr.event_type = c.event_type AND fr.bin = c.bin),
    tot AS (
      SELECT event_type, CAST(sum(n_first) AS BIGINT) AS na_tot,
             CAST(sum(n_second) AS BIGINT) AS nb_tot
      FROM filled GROUP BY event_type)
    SELECT f.event_type, f.bin, f.n_first, f.n_second,
      CAST(f.n_first AS DOUBLE) / t.na_tot AS frac_first,
      CAST(f.n_second AS DOUBLE) / t.nb_tot AS frac_second,
      CASE WHEN f.n_first + f.n_second = 0 THEN 0.0
           ELSE (CAST(f.n_first * t.nb_tot - f.n_second * t.na_tot
                      AS DOUBLE)
                 * CAST(f.n_first * t.nb_tot - f.n_second * t.na_tot
                        AS DOUBLE))
                / CAST(t.na_tot * t.nb_tot
                       * (f.n_first * t.nb_tot + f.n_second * t.na_tot)
                       AS DOUBLE) END AS drift_contrib
    FROM filled f JOIN tot t USING (event_type)
    """,
    tags=("stats", "B7", "drift", "monitoring"),
)
def events_histogram_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Value-distribution drift per event type between the first and
    second half of the stream's time range — the data-quality monitor
    that catches 'the metric changed shape' before dashboards do. Per
    (type, bin): both halves' counts, their exact fractions, and the
    chi-square-style per-bin divergence (pₐ−p_b)²/(pₐ+p_b), the log-free
    member of the PSI/Jeffreys family (same zeros, same ranking; no
    transcendental whose last ulp could differ between engines).

    Everything before the final per-bin casts is integer: cents-scaled
    values, integer bin arithmetic ((c−lo)·B DIV (hi−lo), clamped),
    µs-midpoint half split, and the cross-multiplied divergence
    numerator n_a·N_B − n_b·N_A. One scan builds the per-type bounds
    (agg, broadcast back), a second bins and counts — |types|·|bins|
    rows thereafter. The bin frame (types × 0..B−1) guarantees empty
    bins appear with zero counts in both engines."""
    ev = load_table(spark, sf_dir, "events")
    base = ev.select(
        "event_type",
        F.unix_micros("ts").alias("us"),
        (F.col("value").cast("decimal(18,2)") * 100)
        .cast("long")
        .alias("cents"),
    )
    bounds = base.groupBy("event_type").agg(
        F.min("us").alias("lo_us"),
        F.max("us").alias("hi_us"),
        F.min("cents").alias("lo_c"),
        F.max("cents").alias("hi_c"),
    )
    binned = base.join(F.broadcast(bounds), "event_type").select(
        "event_type",
        F.when(F.col("hi_c") == F.col("lo_c"), F.lit(0))
        .otherwise(
            F.least(
                F.lit(_DRIFT_BINS - 1),
                F.expr(
                    f"((cents - lo_c) * {_DRIFT_BINS}) DIV (hi_c - lo_c)"
                ),
            )
        )
        .cast("long")
        .alias("bin"),
        F.when(
            F.col("us") <= F.expr("(lo_us + hi_us) DIV 2"), F.lit(1)
        )
        .otherwise(F.lit(0))
        .alias("is_first"),
    )
    counts = binned.groupBy("event_type", "bin").agg(
        F.sum("is_first").alias("n_first"),
        F.sum(1 - F.col("is_first")).alias("n_second"),
    )
    frame = bounds.select(
        "event_type",
        F.explode(F.sequence(F.lit(0), F.lit(_DRIFT_BINS - 1))).alias("_bin"),
    ).select("event_type", F.col("_bin").cast("long").alias("bin"))
    filled = frame.join(counts, ["event_type", "bin"], "left").select(
        "event_type",
        "bin",
        F.coalesce("n_first", F.lit(0)).alias("n_first"),
        F.coalesce("n_second", F.lit(0)).alias("n_second"),
    )
    tot = filled.groupBy("event_type").agg(
        F.sum("n_first").alias("na_tot"), F.sum("n_second").alias("nb_tot")
    )
    d = F.col("n_first") * F.col("nb_tot") - F.col("n_second") * F.col("na_tot")
    den = F.col("na_tot") * F.col("nb_tot") * (
        F.col("n_first") * F.col("nb_tot")
        + F.col("n_second") * F.col("na_tot")
    )
    return filled.join(F.broadcast(tot), "event_type").select(
        "event_type",
        "bin",
        "n_first",
        "n_second",
        (F.col("n_first").cast("double") / F.col("na_tot")).alias("frac_first"),
        (F.col("n_second").cast("double") / F.col("nb_tot")).alias(
            "frac_second"
        ),
        F.when(F.col("n_first") + F.col("n_second") == 0, F.lit(0.0))
        .otherwise(
            (d.cast("double") * d.cast("double")) / den.cast("double")
        )
        .alias("drift_contrib"),
    )


# ---------------------------------------------------------------------------
# events_pattern_sessions — regex sequence matching (MATCH_RECOGNIZE-ish)
# ---------------------------------------------------------------------------

_PAT_CONVERT = "v.*c.*p"  # view … click … purchase, in order
_PAT_ERRBURST = "ee"  # two consecutive errors


@query(
    "events_pattern_journeys",
    oracle=f"""
    WITH paths AS (
      SELECT user_id, CAST(CAST(ts AS DATE) AS TIMESTAMP) AS day,
        CAST(count(*) AS BIGINT) AS n_events,
        string_agg(substr(event_type, 1, 1), '' ORDER BY ts, event_id)
          AS path
      FROM events GROUP BY user_id, CAST(ts AS DATE))
    SELECT user_id, day, n_events, path,
      regexp_matches(path, '{_PAT_CONVERT}') AS converted,
      regexp_matches(path, '{_PAT_ERRBURST}') AS error_burst
    FROM paths
    """,
    tags=("window", "B9", "pattern", "match_recognize"),
)
def events_pattern_journeys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-sequence PATTERN MATCHING per daily user journey — the
    engine's MATCH_RECOGNIZE surrogate (SQL:2016 row pattern
    recognition; Spark has no native operator). Each (user, day)
    journey is rendered as an ordered symbol string (event-type
    initials — distinct across the 5 types) and matched against
    declared regexes: conversion ('v.*c.*p': view→click→purchase with
    anything between) and error-burst ('ee': consecutive errors).
    Symbols-as-string turns arbitrary quantified sequence patterns into
    one regex evaluation per journey — exactly how production
    funnel/alerting rules are declared. (Day, not the 30-min session,
    is the declared window: on this fixture sessions are 1-3 events
    while days run to ~10, which is what gives the patterns power; the
    same plan works over any journey key.)

    Both engines run RE2-compatible patterns (no backrefs), so match
    semantics agree. Scale shape: ONE hash exchange on (user, day)
    builds the ordered path via array_sort over (ts, event_id, sym)
    structs — no window pass at all — and the regex test is a
    codegen'd row-local predicate over |journeys| rows. Journey length
    is bounded by a day's events; at 100 TB, cap symbols per journey
    before the agg if users can run unbounded."""
    ev = load_table(spark, sf_dir, "events")
    paths = (
        ev.select(
            "user_id",
            F.to_date("ts").alias("d"),
            "ts",
            "event_id",
            F.substring("event_type", 1, 1).alias("sym"),
        )
        .groupBy("user_id", "d")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("ts", "event_id", "sym"))
                    ),
                    lambda x: x["sym"],
                ),
                "",
            ).alias("path"),
        )
    )
    return paths.select(
        "user_id",
        F.col("d").cast("timestamp").alias("day"),
        "n_events",
        "path",
        F.col("path").rlike(_PAT_CONVERT).alias("converted"),
        F.col("path").rlike(_PAT_ERRBURST).alias("error_burst"),
    )


# ---------------------------------------------------------------------------
# graph_kcore — k-core decomposition by iterative peeling
# ---------------------------------------------------------------------------

_KCORE_K = 3
_KCORE_MIN_ORDERS = 3
_KCORE_ROUNDS = 8


def _sql_kcore_oracle() -> str:
    chain = f"""
    e0 AS MATERIALIZED (
      SELECT o.o_custkey * 2 AS a, l.l_suppkey * 2 + 1 AS b
      FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
      GROUP BY 1, 2
      HAVING count(DISTINCT o.o_orderkey) >= {_KCORE_MIN_ORDERS})"""
    for i in range(_KCORE_ROUNDS):
        chain += f""",
    d{i} AS MATERIALIZED (
      SELECT node, count(*) AS deg FROM (
        SELECT a AS node FROM e{i} UNION ALL SELECT b FROM e{i})
      GROUP BY node),
    k{i} AS (SELECT node FROM d{i} WHERE deg >= {_KCORE_K}),
    e{i + 1} AS MATERIALIZED (
      SELECT e.a, e.b FROM e{i} e
        JOIN k{i} x ON e.a = x.node
        JOIN k{i} y ON e.b = y.node)"""
    r = _KCORE_ROUNDS
    return f"""
    WITH {chain}
    SELECT node,
      CASE WHEN node % 2 = 0 THEN 'customer' ELSE 'supplier' END AS kind,
      CAST(node // 2 AS BIGINT) AS entity_key,
      CAST(deg AS BIGINT) AS core_deg
    FROM (
      SELECT node, count(*) AS deg FROM (
        SELECT a AS node FROM e{r} UNION ALL SELECT b FROM e{r})
      GROUP BY node)
    """


@query(
    "graph_kcore",
    oracle=_sql_kcore_oracle(),
    tags=("graph", "B6", "B7", "kcore", "iterative"),
)
def graph_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-core decomposition of the repeat-business graph (customer and
    supplier adjacent when they share >=3 distinct orders): iteratively
    peel every node with degree < 3 until the remainder is stable —
    the standard 'dense engaged core' extractor (Seidman 1983) next to
    PageRank's centrality and the triangle counts' local clustering.

    Batch-synchronous peeling, the canonical distributed formulation:
    each round is one degree aggregation (node-sized) plus one
    semi-join of edges against surviving nodes — never anything bigger
    than the CURRENT edge set, which only shrinks. 8 rounds unrolled
    (fixpoint at round 6 on the sf0.01 fixture — asserted in tests;
    rounds scale O(log) in practice, and a driver loop with a
    convergence count per round is the production form). Edges
    localCheckpoint per round to truncate lineage — the dedup_clusters
    device; everything is integer equi-joins, so the whole iteration
    replays in SQL CTE rounds."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    edges = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy(
            (F.col("o_custkey") * 2).alias("a"),
            (F.col("l_suppkey") * 2 + 1).alias("b"),
        )
        .agg(F.countDistinct("o_orderkey").alias("_n"))
        .filter(F.col("_n") >= _KCORE_MIN_ORDERS)
        .select("a", "b")
        .localCheckpoint(eager=True)
    )
    # Both endpoints in ONE pass per round (explode, not a unionAll that
    # reads the checkpointed edge list twice), and an early fixpoint
    # exit: peeling is monotone, so an unchanged edge count means every
    # remaining unrolled round is the identity — the oracle's fixed
    # 8-round CTE chain computes the same fixpoint (asserted stable at
    # round 6 on the fixture in tests). The count is free: the eager
    # checkpoint just materialized the RDD.
    n_edges = edges.count()
    for _ in range(_KCORE_ROUNDS):
        deg = (
            edges.select(F.explode(F.array("a", "b")).alias("node"))
            .groupBy("node")
            .agg(F.count(F.lit(1)).alias("deg"))
        )
        keep = deg.filter(F.col("deg") >= _KCORE_K).select("node")
        edges = (
            edges.join(keep.withColumnRenamed("node", "a"), "a", "leftsemi")
            .join(keep.withColumnRenamed("node", "b"), "b", "leftsemi")
            .select("a", "b")
            .localCheckpoint(eager=True)
        )
        n_next = edges.count()
        if n_next == n_edges:
            break
        n_edges = n_next
    deg = (
        edges.select(F.explode(F.array("a", "b")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    return deg.select(
        "node",
        F.when(F.col("node") % 2 == 0, F.lit("customer"))
        .otherwise(F.lit("supplier"))
        .alias("kind"),
        F.expr("node DIV 2").alias("entity_key"),
        F.col("deg").cast("long").alias("core_deg"),
    )


# ---------------------------------------------------------------------------
# docs_bm25_topk — BM25 relevance scoring with exact rational arithmetic
# ---------------------------------------------------------------------------

_BM25_TERMS = ("join", "hash", "scan")
_BM25_TOPK = 50
# k1 = 1.2 and b = 0.75 (the universal BM25 defaults) enter the formula
# as exact rationals: multiplying numerator and denominator of the
# saturation term through by 10·Σdl (avgdl = Σdl/N) gives
#   sat = 22·tf·Σdl / (10·tf·Σdl + 3·Σdl + 9·dl·N)
# — all int64 (Σdl ≤ 1e13 tokens and tf ≤ 1e3 keep products < 2⁶³).


def _sql_bm25_oracle() -> str:
    terms_list = ", ".join(f"'{t}'" for t in _BM25_TERMS)
    score_cols = ", ".join(
        f"""max(CASE WHEN term = '{t}' THEN score END) AS s_{t}"""
        for t in _BM25_TERMS
    )
    total = " + ".join(f"coalesce(s_{t}, 0.0)" for t in _BM25_TERMS)
    return f"""
    WITH toks AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS word
      FROM documents WHERE length(text) > 0),
    tf0 AS (SELECT doc_id, word FROM toks WHERE word <> ''),
    dl AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS dl
           FROM tf0 GROUP BY doc_id),
    corpus AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
                      CAST(sum(dl) AS BIGINT) AS sum_dl FROM dl),
    tf AS (SELECT doc_id, word AS term, CAST(count(*) AS BIGINT) AS tf
           FROM tf0 WHERE word IN ({terms_list}) GROUP BY doc_id, word),
    df AS (SELECT term, CAST(count(*) AS BIGINT) AS df
           FROM tf GROUP BY term),
    scored AS (
      SELECT tf.doc_id, tf.term,
        (CAST(2 * c.n_docs - 2 * df.df + 1 AS DOUBLE)
           / (2 * df.df + 1))
        * (CAST(22 * tf.tf * c.sum_dl AS DOUBLE)
           / (10 * tf.tf * c.sum_dl + 3 * c.sum_dl + 9 * dl.dl * c.n_docs))
          AS score
      FROM tf JOIN df USING (term) JOIN dl USING (doc_id), corpus c),
    pivoted AS (
      SELECT doc_id, {score_cols} FROM scored GROUP BY doc_id),
    totaled AS (
      SELECT p.doc_id, dl.dl, {total} AS score,
        {", ".join(f"coalesce(s_{t}, 0.0) AS s_{t}" for t in _BM25_TERMS)}
      FROM pivoted p JOIN dl ON p.doc_id = dl.doc_id),
    ranked AS (
      SELECT *, row_number() OVER (ORDER BY score DESC, doc_id) AS rnk
      FROM totaled)
    SELECT doc_id, dl, score, {", ".join("s_" + t for t in _BM25_TERMS)}, rnk
    FROM ranked WHERE rnk <= {_BM25_TOPK}
    """


@query(
    "docs_bm25_topk",
    oracle=_sql_bm25_oracle(),
    tags=("text", "B15", "retrieval", "bm25"),
)
def docs_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-50 document retrieval for the declared query terms
    ('join', 'hash', 'scan') — the lexical-retrieval baseline every RAG/dedup pipeline
    keeps next to its embedding index. Genuine BM25 saturation shape
    (k1 = 1.2, b = 0.75, length-normalized tf), with the one libm-bound
    piece replaced by its exact-rational core: idf is Robertson's
    (N − df + ½)/(df + ½) WITHOUT the log (an engine-specific log()
    could differ in the last ulp and break the value hash — the same
    declared trade as docs_tfidf_topterms), and the saturation term is
    cleared of fractions so both factors are single IEEE divisions of
    exact int64s; their product and the fixed-order 3-term sum are the
    only float ops.

    Scale shape: tokenization filters to the query terms BEFORE any
    aggregation (tf is |docs containing a term| rows, not |tokens|);
    dl/Σdl/N come from one map-side-combinable pass; per-term scores
    pivot to columns (fixed summation order — float sums across rows
    are never reassociated); top-k is a TakeOrdered merge, not a global
    sort. At 100 TB the only corpus-sized shuffle is the dl
    aggregation; everything after is |matching docs|."""
    docs = load_table(spark, sf_dir, "documents").filter(
        F.length("text") > 0
    )
    toks = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("word")
    ).filter(F.col("word") != "")
    dl = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    corpus = dl.agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("dl").alias("sum_dl")
    )
    tf = (
        toks.filter(F.col("word").isin(*_BM25_TERMS))
        .groupBy("doc_id", F.col("word").alias("term"))
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    scored = (
        tf.join(F.broadcast(df), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(corpus))
        .select(
            "doc_id",
            "term",
            (
                (
                    (2 * F.col("n_docs") - 2 * F.col("df") + 1).cast("double")
                    / (2 * F.col("df") + 1)
                )
                * (
                    (22 * F.col("tf") * F.col("sum_dl")).cast("double")
                    / (
                        10 * F.col("tf") * F.col("sum_dl")
                        + 3 * F.col("sum_dl")
                        + 9 * F.col("dl") * F.col("n_docs")
                    )
                )
            ).alias("score"),
        )
    )
    pivoted = scored.groupBy("doc_id").agg(
        *[
            F.max(F.when(F.col("term") == t, F.col("score"))).alias(f"s_{t}")
            for t in _BM25_TERMS
        ]
    )
    total = None
    for t in _BM25_TERMS:
        c = F.coalesce(F.col(f"s_{t}"), F.lit(0.0))
        total = c if total is None else total + c
    totaled = pivoted.join(dl, "doc_id").select(
        "doc_id",
        "dl",
        total.alias("score"),
        *[
            F.coalesce(F.col(f"s_{t}"), F.lit(0.0)).alias(f"s_{t}")
            for t in _BM25_TERMS
        ],
    )
    # Global top-k via ORDER BY + LIMIT (TakeOrderedAndProject: per-
    # partition top-k + merge, no single-partition sort of |docs| rows);
    # the rank window then runs over the ≤K-row bounded result only.
    wr = bounded_window("doc_id", F.desc("score"), F.asc("doc_id"))
    top = totaled.orderBy(F.desc("score"), F.asc("doc_id")).limit(_BM25_TOPK)
    return top.withColumn("rnk", F.row_number().over(wr))


# ---------------------------------------------------------------------------
# multimodal_audio_energy — framed audio-energy extraction (fake decode)
# ---------------------------------------------------------------------------

_FRAME_BYTES = 256
_FRAME_HOP = 128


def _framed_energy(bins, frame_bytes: int, hop: int):
    """Shared Arrow kernel: (doc_id, payload) -> per-frame byte-energy
    rows. One numpy pass per payload (squared bytes, cumsum, reduce by
    frame bounds); the closure is pickled by value so workers need no
    package import."""

    def _energy(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            out_doc, out_idx, out_n, out_e = [], [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                s = np.frombuffer(payload, dtype=np.uint8).astype(np.int64)
                n = len(s)
                sq = s * s
                n_frames = (n - 1) // hop + 1
                starts = np.arange(n_frames) * hop
                ends = np.minimum(starts + frame_bytes, n)
                csum = np.concatenate(([0], np.cumsum(sq)))
                out_doc.extend([doc_id] * n_frames)
                out_idx.extend(range(n_frames))
                out_n.extend((ends - starts).tolist())
                out_e.extend((csum[ends] - csum[starts]).tolist())
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(out_doc, dtype="int64"),
                    "frame_idx": pd.Series(out_idx, dtype="int64"),
                    "n_frame_bytes": pd.Series(out_n, dtype="int64"),
                    "energy": pd.Series(out_e, dtype="int64"),
                }
            )

    return bins.mapInPandas(
        _energy,
        schema="doc_id long, frame_idx long, n_frame_bytes long, energy long",
    )


@query(
    "multimodal_audio_energy",
    oracle=f"""
    WITH src AS (
      SELECT doc_id, text, length(text) AS n
      FROM documents WHERE length(text) > 0),
    frames AS (
      SELECT doc_id, text, n, unnest(range((n - 1) // {_FRAME_HOP} + 1))
        AS frame_idx
      FROM src),
    pos AS (
      SELECT doc_id, frame_idx,
        frame_idx * {_FRAME_HOP} + unnest(range(1, {_FRAME_BYTES} + 1))
          AS p,
        text, n
      FROM frames),
    samples AS (
      SELECT doc_id, frame_idx,
        CAST(unicode(substr(text, CAST(p AS INTEGER), 1)) AS BIGINT) AS s
      FROM pos WHERE p <= n)
    SELECT doc_id, frame_idx,
      CAST(count(*) AS BIGINT) AS n_frame_bytes,
      CAST(sum(s * s) AS BIGINT) AS energy,
      sqrt(CAST(sum(s * s) AS DOUBLE) / count(*)) AS rms
    FROM samples GROUP BY doc_id, frame_idx
    """,
    tags=("multimodal", "B15", "audio", "mapInPandas"),
)
def multimodal_audio_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio-style framed energy extraction over the opaque binary
    payload: 50%-overlapped 256-byte frames (hop 128), per-frame
    sample count, integer energy Σs², and RMS — the exact windowing /
    hop / reduce shape of a real PCM feature extractor (spectral
    pipelines differ only in the per-frame kernel), run on the
    deterministic byte stand-in since no audio codec ships in this
    container (documents are pure ASCII, so byte == codepoint and the
    oracle replays the identical samples; real decode would slot into
    the same kernel behind the NotImplementedError gate in
    operators/multimodal.py).

    Arrow-batched ``mapInPandas`` with a numpy strided-window kernel
    (np.add.reduceat over the squared byte array — one pass per
    payload, no per-sample Python). The kernel is a CLOSURE, pickled by
    value, so workers need no package import. Energy is int64 (255²·256
    per frame ≪ 2⁶³); RMS is one IEEE division + one sqrt, both
    correctly rounded, from exact integers. Frames explode rows ~n/hop
    per doc — partition-preserving, no shuffle at all."""
    from ..operators.multimodal import attach_fake_binary

    docs = load_table(spark, sf_dir, "documents").filter(F.length("text") > 0)
    bins = attach_fake_binary(docs).select("doc_id", "payload")

    framed = _framed_energy(bins, _FRAME_BYTES, _FRAME_HOP)
    return framed.select(
        "doc_id",
        "frame_idx",
        "n_frame_bytes",
        "energy",
        F.sqrt(
            F.col("energy").cast("double") / F.col("n_frame_bytes")
        ).alias("rms"),
    )


# ---------------------------------------------------------------------------
# orders_interpurchase_hazard — discrete-time survival/hazard table
# ---------------------------------------------------------------------------


@query(
    "orders_interpurchase_hazard",
    oracle="""
    WITH od AS (SELECT DISTINCT o_custkey, o_orderdate FROM orders),
    gaps AS (
      SELECT date_diff('day',
               lag(o_orderdate) OVER (PARTITION BY o_custkey
                                      ORDER BY o_orderdate),
               o_orderdate) AS gap
      FROM od),
    d AS (SELECT CAST(gap AS BIGINT) AS k, CAST(count(*) AS BIGINT)
            AS n_events
          FROM gaps WHERE gap IS NOT NULL GROUP BY gap)
    SELECT k, n_events,
      CAST(sum(n_events) OVER (ORDER BY k DESC
                               ROWS UNBOUNDED PRECEDING) AS BIGINT)
        AS n_at_risk,
      CAST(n_events AS DOUBLE)
        / sum(n_events) OVER (ORDER BY k DESC ROWS UNBOUNDED PRECEDING)
        AS hazard
    FROM d
    """,
    tags=("stats", "B7", "B9", "survival"),
)
def orders_interpurchase_hazard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discrete-time hazard table of inter-purchase gaps: for each gap
    length k (days between a customer's consecutive order dates), how
    many gaps ended at exactly k (events) out of those lasting at least
    k (at-risk set), and the hazard d(k)/n(k) — the life-table estimator
    (the Kaplan-Meier complement without the cross-row float product,
    which would be order-dependent; survival curves reconstruct from
    hazards downstream if wanted). This is how retention teams read
    'when do customers come back'.

    Shape: one distinct reduction, one lag window per customer (same
    single hash exchange), then everything collapses to |distinct gap
    lengths| rows — bounded by the date domain (~thousands), so the
    final suffix-sum window over the unpartitioned k-table is a
    deliberately tiny single-partition pass, same class as the other
    k-sized leaderboards. All integers; hazard is the one IEEE division
    of exact counts."""
    o = load_table(spark, sf_dir, "orders")
    od = o.select("o_custkey", "o_orderdate").distinct()
    wl = W.partitionBy("o_custkey").orderBy("o_orderdate")
    gaps = od.select(
        F.datediff(
            F.col("o_orderdate"), F.lag("o_orderdate").over(wl)
        ).alias("gap")
    ).where(F.col("gap").isNotNull())
    d = gaps.groupBy(F.col("gap").cast("long").alias("k")).agg(
        F.count(F.lit(1)).alias("n_events")
    )
    wk = bounded_window("k", F.desc("k")).rowsBetween(W.unboundedPreceding, W.currentRow)
    return d.select(
        "k",
        "n_events",
        F.sum("n_events").over(wk).alias("n_at_risk"),
        (
            F.col("n_events").cast("double") / F.sum("n_events").over(wk)
        ).alias("hazard"),
    )


# ---------------------------------------------------------------------------
# multimodal_shot_boundaries — frame-difference temporal segmentation
# ---------------------------------------------------------------------------

_SHOT_FRAME = 128  # non-overlapping frames: hop == size


@query(
    "multimodal_shot_boundaries",
    oracle=f"""
    WITH src AS (
      SELECT doc_id, text, length(text) AS n
      FROM documents WHERE length(text) > 0),
    frames AS (
      SELECT doc_id, text, n,
        unnest(range((n - 1) // {_SHOT_FRAME} + 1)) AS frame_idx
      FROM src),
    pos AS (
      SELECT doc_id, frame_idx,
        frame_idx * {_SHOT_FRAME} + unnest(range(1, {_SHOT_FRAME} + 1)) AS p,
        text, n
      FROM frames),
    energies AS (
      SELECT doc_id, frame_idx,
        CAST(sum(CAST(unicode(substr(text, CAST(p AS INTEGER), 1)) AS BIGINT)
                 * unicode(substr(text, CAST(p AS INTEGER), 1))) AS BIGINT)
          AS e
      FROM pos WHERE p <= n GROUP BY doc_id, frame_idx),
    flagged AS (
      SELECT doc_id, frame_idx, e,
        lag(e) OVER (PARTITION BY doc_id ORDER BY frame_idx) AS pe
      FROM energies),
    marks AS (
      SELECT doc_id, frame_idx,
        CASE WHEN pe IS NULL THEN 0
             WHEN pe = 0 THEN CASE WHEN e > 0 THEN 1 ELSE 0 END
             WHEN 10 * abs(e - pe) > 3 * pe THEN 1 ELSE 0 END AS is_cut
      FROM flagged)
    SELECT doc_id, CAST(count(*) AS BIGINT) AS n_frames,
      CAST(1 + sum(is_cut) AS BIGINT) AS n_shots,
      min(CASE WHEN is_cut = 1 THEN frame_idx END) AS first_cut
    FROM marks GROUP BY doc_id
    """,
    tags=("multimodal", "B15", "video", "segmentation"),
)
def multimodal_shot_boundaries(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shot-boundary detection over the opaque payload: non-overlapping
    128-byte frames, per-frame energy, and a cut wherever successive
    energies differ by more than 30% (10·|Δ| > 3·e_prev — integer
    inequality, no float threshold) — the frame-difference temporal
    segmentation every video pipeline runs before keyframe extraction,
    on the deterministic byte stand-in (a real decoder would feed pixel
    histograms into the same lag-compare shape).

    Composes the shared ``_framed_energy`` Arrow kernel (one
    mapInPandas pass, partition-preserving) with one per-doc lag window
    and a per-doc aggregate: |frames| rows shuffle once on doc_id.
    Output is per-document: frame count, shot count, first cut index
    (null when a document is a single shot)."""
    from ..operators.multimodal import attach_fake_binary

    docs = load_table(spark, sf_dir, "documents").filter(F.length("text") > 0)
    bins = attach_fake_binary(docs).select("doc_id", "payload")
    framed = _framed_energy(bins, _SHOT_FRAME, _SHOT_FRAME)
    wlag = W.partitionBy("doc_id").orderBy("frame_idx")
    flagged = framed.select(
        "doc_id",
        "frame_idx",
        F.col("energy").alias("e"),
        F.lag("energy").over(wlag).alias("pe"),
    )
    marks = flagged.select(
        "doc_id",
        "frame_idx",
        F.when(F.col("pe").isNull(), F.lit(0))
        .when(
            F.col("pe") == 0,
            F.when(F.col("e") > 0, F.lit(1)).otherwise(F.lit(0)),
        )
        .when(
            10 * F.abs(F.col("e") - F.col("pe")) > 3 * F.col("pe"), F.lit(1)
        )
        .otherwise(F.lit(0))
        .alias("is_cut"),
    )
    return marks.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_frames"),
        (1 + F.sum("is_cut")).alias("n_shots"),
        F.min(
            F.when(F.col("is_cut") == 1, F.col("frame_idx"))
        ).alias("first_cut"),
    )


# ---------------------------------------------------------------------------
# docs_dataset_card — per-(source, lang) corpus summary card
# ---------------------------------------------------------------------------


@query(
    "docs_dataset_card",
    oracle="""
    WITH toks AS (
      SELECT doc_id, source, lang, n_chars,
        CAST(len(list_filter(string_split(text, ' '), w -> w <> ''))
             AS BIGINT) AS n_tokens
      FROM documents),
    per AS (
      SELECT source, lang,
        CAST(count(*) AS BIGINT) AS n_docs,
        CAST(sum(n_chars) AS BIGINT) AS total_chars,
        CAST(sum(n_tokens) AS BIGINT) AS total_tokens
      FROM toks GROUP BY source, lang),
    tot AS (
      SELECT CAST(sum(n_docs) AS BIGINT) AS all_docs,
             CAST(sum(total_tokens) AS BIGINT) AS all_tokens
      FROM per)
    SELECT source, lang, n_docs, total_chars, total_tokens,
      CAST(total_tokens AS DOUBLE) / n_docs AS avg_doc_tokens,
      CAST(n_docs AS DOUBLE) / all_docs AS share_docs,
      CAST(total_tokens AS DOUBLE) / all_tokens AS share_tokens
    FROM per, tot
    """,
    tags=("text", "B15", "corpus-stats", "dataset-card"),
)
def docs_dataset_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dataset card: per (source, language) — document count, total
    characters, total whitespace tokens, average document length, and
    each stratum's share of the corpus by documents and by tokens. The
    one-relation summary a training-data release publishes (and the
    input the mixture/sampling operators consume as weights upstream).

    One corpus scan computes per-doc token counts as a codegen'd
    size(filter(split)) — no explode, no shuffle of token rows — then
    one |strata|-sized aggregation; corpus totals are a 1-row broadcast
    (allowlisted scalar-denominator pattern). Every share is one IEEE
    division of exact int64 aggregates."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "source",
        "lang",
        "n_chars",
        F.size(
            F.filter(F.split("text", " "), lambda w: w != "")
        ).cast("long").alias("n_tokens"),
    )
    per = toks.groupBy("source", "lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        F.sum("n_tokens").alias("total_tokens"),
    )
    tot = per.agg(
        F.sum("n_docs").alias("all_docs"),
        F.sum("total_tokens").alias("all_tokens"),
    )
    return per.crossJoin(F.broadcast(tot)).select(
        "source",
        "lang",
        "n_docs",
        "total_chars",
        "total_tokens",
        (F.col("total_tokens").cast("double") / F.col("n_docs")).alias(
            "avg_doc_tokens"
        ),
        (F.col("n_docs").cast("double") / F.col("all_docs")).alias(
            "share_docs"
        ),
        (F.col("total_tokens").cast("double") / F.col("all_tokens")).alias(
            "share_tokens"
        ),
    )


# ---------------------------------------------------------------------------
# orders_weighted_median — exact weighted median per group
# ---------------------------------------------------------------------------


@query(
    "orders_weighted_median",
    oracle="""
    WITH pts AS (
      SELECT p.p_brand,
        CAST(CAST(l.l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
          AS cents,
        CAST(l.l_quantity AS BIGINT) AS w
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey),
    cum AS (
      SELECT p_brand, cents, w,
        CAST(sum(w) OVER (PARTITION BY p_brand ORDER BY cents, w
                          ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cw,
        CAST(sum(w) OVER (PARTITION BY p_brand) AS BIGINT) AS tw
      FROM pts),
    hit AS (
      SELECT p_brand, cents, cw, tw,
        row_number() OVER (PARTITION BY p_brand ORDER BY cents, w) AS rn
      FROM cum WHERE 2 * cw >= tw)
    SELECT p_brand, CAST(tw AS BIGINT) AS total_weight,
      cents AS median_cents,
      CAST(cents AS DOUBLE) / 100 AS weighted_median_price
    FROM hit WHERE rn = 1
    """,
    tags=("stats", "B7", "B9", "median", "weighted"),
)
def orders_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact WEIGHTED median unit price per brand, weighted by line
    quantity — the robust price statistic percentile aggregates can't
    produce (Spark's percentile takes no weight argument; approximate
    sketches lose exactness). Lower weighted median: the smallest value
    whose cumulative weight reaches half the total, the standard
    definitive tie-break.

    One hash exchange on brand serves both windows (running weight and
    per-group total); the 2·cumw ≥ W frontier is a filter plus one
    row_number — no second shuffle, no self-join. Price is integer
    cents end-to-end; the output dollars column is the single shared
    IEEE division. Per-group data stays a sorted run inside its
    partition — the same memory posture as every other grouped window
    at 100 TB (skewed brands salt like any shuffle key)."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    pts = li.join(p, li.l_partkey == p.p_partkey).select(
        "p_brand",
        (F.col("l_extendedprice").cast("decimal(18,2)") * 100)
        .cast("long")
        .alias("cents"),
        F.col("l_quantity").cast("long").alias("w"),
    )
    wrun = (
        W.partitionBy("p_brand")
        .orderBy("cents", "w")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    wall = W.partitionBy("p_brand")
    cum = pts.select(
        "p_brand",
        "cents",
        "w",
        F.sum("w").over(wrun).alias("cw"),
        F.sum("w").over(wall).alias("tw"),
    )
    hit = cum.where(2 * F.col("cw") >= F.col("tw")).withColumn(
        "rn",
        F.row_number().over(W.partitionBy("p_brand").orderBy("cents", "w")),
    )
    return hit.where(F.col("rn") == 1).select(
        "p_brand",
        F.col("tw").alias("total_weight"),
        F.col("cents").alias("median_cents"),
        (F.col("cents").cast("double") / 100).alias("weighted_median_price"),
    )


# ---------------------------------------------------------------------------
# graph_communities_lpa — synchronous label propagation
# ---------------------------------------------------------------------------

_LPA_ROUNDS = 4
_LPA_MIN_ORDERS = 3  # same repeat-business graph as graph_kcore


def _sql_lpa_oracle() -> str:
    chain = f"""
    e AS MATERIALIZED (
      SELECT o.o_custkey * 2 AS a, l.l_suppkey * 2 + 1 AS b
      FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
      GROUP BY 1, 2
      HAVING count(DISTINCT o.o_orderkey) >= {_LPA_MIN_ORDERS}),
    ed AS MATERIALIZED (
      SELECT a AS u, b AS v FROM e UNION ALL SELECT b, a FROM e),
    l0 AS (SELECT DISTINCT u AS node, u AS lbl FROM ed)"""
    for i in range(_LPA_ROUNDS):
        chain += f""",
    v{i} AS (
      SELECT ed.u AS node, l.lbl, count(*) AS n
      FROM ed JOIN l{i} l ON ed.v = l.node
      GROUP BY ed.u, l.lbl),
    l{i + 1} AS MATERIALIZED (
      SELECT node, lbl FROM (
        SELECT node, lbl,
          row_number() OVER (PARTITION BY node ORDER BY n DESC, lbl) AS rn
        FROM v{i}) WHERE rn = 1)"""
    r = _LPA_ROUNDS
    return f"""
    WITH {chain}
    SELECT lbl AS community, CAST(count(*) AS BIGINT) AS n_nodes,
      CAST(sum(CASE WHEN node % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT)
        AS n_customers,
      CAST(sum(node % 2) AS BIGINT) AS n_suppliers
    FROM l{r} GROUP BY lbl
    """


@query(
    "graph_communities_lpa",
    oracle=_sql_lpa_oracle(),
    tags=("graph", "B6", "B7", "communities", "iterative"),
)
def graph_communities_lpa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Community detection by synchronous label propagation (Raghavan
    2007, the deterministic batch variant) over the same repeat-business
    graph as graph_kcore: labels start as node ids; each round every
    node adopts its neighborhood's most frequent label, ties to the
    smallest — 4 rounds, then community sizes split by side. The third
    member of the graph family: components answer reachability, k-core
    density, LPA affinity grouping.

    Per round: one edge-sized join (labels onto neighbors) + one
    (node, label)-sized count + one row_number argmax — the canonical
    BSP shape whose shuffles are bounded by edges, never by the fact
    data that derived them; labels localCheckpoint per round to
    truncate lineage. Synchronous + deterministic tie-break means the
    result is partitioning-independent and replays exactly in the
    chained-CTE oracle."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    e = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy(
            (F.col("o_custkey") * 2).alias("a"),
            (F.col("l_suppkey") * 2 + 1).alias("b"),
        )
        .agg(F.countDistinct("o_orderkey").alias("_n"))
        .filter(F.col("_n") >= _LPA_MIN_ORDERS)
        .select("a", "b")
    )
    # Both orientations in ONE pass over the edge build (explode) — the
    # unionAll form re-ran the orders⋈lineitem groupBy/HAVING pipeline
    # once per branch before the checkpoint could help.
    ed = (
        e.select(
            F.explode(
                F.array(
                    F.struct(F.col("a").alias("u"), F.col("b").alias("v")),
                    F.struct(F.col("b").alias("u"), F.col("a").alias("v")),
                )
            ).alias("_e")
        )
        .select("_e.u", "_e.v")
        .localCheckpoint(eager=True)
    )
    labels = ed.select(F.col("u").alias("node")).distinct().select(
        "node", F.col("node").alias("lbl")
    )
    warg = W.partitionBy("node").orderBy(F.desc("n"), F.asc("lbl"))
    for _ in range(_LPA_ROUNDS):
        votes = (
            ed.join(
                labels.select(F.col("node").alias("v"), "lbl"), "v"
            )
            .groupBy(F.col("u").alias("node"), "lbl")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        labels = (
            votes.withColumn("rn", F.row_number().over(warg))
            .where(F.col("rn") == 1)
            .select("node", "lbl")
            .localCheckpoint(eager=True)
        )
    return labels.groupBy(F.col("lbl").alias("community")).agg(
        F.count(F.lit(1)).alias("n_nodes"),
        F.sum(F.when(F.col("node") % 2 == 0, 1).otherwise(0)).alias(
            "n_customers"
        ),
        F.sum(F.col("node") % 2).alias("n_suppliers"),
    )


# ---------------------------------------------------------------------------
# orders_benford_digits — first-digit law audit with exact chi-square terms
# ---------------------------------------------------------------------------

# round(log10(1 + 1/d) * 1e6) for d = 1..9 — pinned integer Benford
# probabilities (they sum to exactly 1_000_000), so the expected counts
# and chi-square terms are exact integer arithmetic in BOTH engines and
# no engine-specific log10() ever runs.
_BENFORD_P6 = (301030, 176091, 124939, 96910, 79181, 66947, 57992, 51153, 45757)

_BENFORD_CASE_SQL = "CASE digit " + " ".join(
    f"WHEN {d} THEN {p}" for d, p in enumerate(_BENFORD_P6, start=1)
) + " END"


@query(
    "orders_benford_digits",
    oracle=f"""
    WITH digits AS (
      SELECT CAST(substr(CAST(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                   AS BIGINT) AS VARCHAR), 1, 1) AS BIGINT) AS digit
      FROM orders),
    counted AS (
      SELECT digit, CAST(count(*) AS BIGINT) AS n_obs,
             CAST(sum(count(*)) OVER () AS BIGINT) AS n_total
      FROM digits GROUP BY digit),
    expected AS (
      SELECT digit, n_obs, n_total,
             CAST({_BENFORD_CASE_SQL} AS HUGEINT) AS p6
      FROM counted)
    SELECT digit, n_obs,
      CAST(n_obs AS DOUBLE) / n_total AS frac_observed,
      CAST(p6 AS DOUBLE) / 1000000 AS frac_benford,
      CAST((CAST(n_obs AS HUGEINT) * 1000000 - CAST(n_total AS HUGEINT) * p6)
           * (CAST(n_obs AS HUGEINT) * 1000000 - CAST(n_total AS HUGEINT) * p6)
           AS DOUBLE)
        / CAST(CAST(n_total AS HUGEINT) * p6 * 1000000 AS DOUBLE) AS chi2_term
    FROM expected
    """,
    tags=("agg", "B7", "data-quality", "audit"),
)
def orders_benford_digits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford first-significant-digit audit of order values — the
    classic forensic-accounting data-quality screen (fabricated or
    capped monetary columns flunk it); Deequ/TFDV-style profilers ship
    it next to null/distinct checks. Emits, per leading digit 1-9, the
    observed count, observed fraction, the Benford expectation, and the
    exact chi-square term ((obs - n·p)² / (n·p)) — the driver-side sum
    of chi2_term against the chi-square critical value is the audit
    verdict.

    Exactness: digit extraction is string-prefix of the exact integer
    cents (leading digit is invariant under ×100); Benford
    probabilities are PINNED micro-unit integers (they sum to exactly
    1e6), so expected counts and the chi-square numerator/denominator
    are exact 128-bit integers — each float column is ONE IEEE division
    of exact integers.

    Scale: one map-side-combinable 9-group aggregate over the fact
    table; the window total is a 9-row exchange. Nothing here grows
    with data beyond the single scan."""
    d38 = "decimal(38,0)"
    o = load_table(spark, sf_dir, "orders")
    digit = F.substring(
        (F.col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("long")
        .cast("string"),
        1,
        1,
    ).cast("long")
    counted = (
        o.select(digit.alias("digit"))
        .groupBy("digit")
        .agg(F.count(F.lit(1)).alias("n_obs"))
        .withColumn("n_total", F.sum("n_obs").over(W.partitionBy()))
    )
    p6 = F.coalesce(
        *[
            F.when(F.col("digit") == d, F.lit(p))
            for d, p in enumerate(_BENFORD_P6, start=1)
        ]
    ).cast(d38)
    expected = counted.select(
        "digit", "n_obs", "n_total", p6.alias("p6")
    )
    num = (
        F.col("n_obs").cast(d38) * 1000000
        - F.col("n_total").cast(d38) * F.col("p6")
    )
    return expected.select(
        "digit",
        "n_obs",
        (F.col("n_obs").cast("double") / F.col("n_total")).alias(
            "frac_observed"
        ),
        (F.col("p6").cast("double") / 1000000).alias("frac_benford"),
        (
            (num * num).cast("double")
            / (F.col("n_total").cast(d38) * F.col("p6") * 1000000).cast(
                "double"
            )
        ).alias("chi2_term"),
    )


# ---------------------------------------------------------------------------
# events_mad_anomaly — robust outlier gate via median absolute deviation
# ---------------------------------------------------------------------------

# 3 × 1.4826 (the Gaussian-consistency constant) as the exact rational
# 44478/10000: the anomaly predicate |v − med| > 3·1.4826·MAD becomes the
# INTEGER comparison d·20000 > 44478·mad2d (d = 2|v−med| in cents,
# mad2d = 4·MAD in cents) — no float ever enters the gate, so both
# engines flag exactly the same rows even at the threshold knife-edge.
_MAD_GATE_NUM = 3 * 14826  # 44478


@query(
    "events_mad_anomaly",
    oracle="""
    WITH v AS (
      SELECT event_type, event_id,
        CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS c
      FROM events),
    ranked AS (
      SELECT event_type, c,
        row_number() OVER (PARTITION BY event_type ORDER BY c, event_id)
          AS rn,
        count(*) OVER (PARTITION BY event_type) AS n
      FROM v),
    med AS (
      SELECT event_type, max(n) AS n,
        sum(CASE WHEN rn = (n + 1) // 2 THEN c END)
          + sum(CASE WHEN rn = (n + 2) // 2 THEN c END) AS med2
      FROM ranked GROUP BY event_type),
    dev AS (
      SELECT v.event_type, v.event_id, med.n, med.med2,
        abs(2 * v.c - med.med2) AS d
      FROM v JOIN med USING (event_type)),
    dranked AS (
      SELECT event_type, n, med2, d,
        row_number() OVER (PARTITION BY event_type ORDER BY d, event_id)
          AS rn
      FROM dev),
    mad AS (
      SELECT event_type, max(n) AS n, max(med2) AS med2,
        sum(CASE WHEN rn = (n + 1) // 2 THEN d END)
          + sum(CASE WHEN rn = (n + 2) // 2 THEN d END) AS mad2d
      FROM dranked GROUP BY event_type)
    SELECT dev.event_type,
      CAST(max(mad.n) AS BIGINT) AS n,
      CAST(max(mad.med2) AS DOUBLE) / 200 AS median_value,
      CAST(max(mad.mad2d) AS DOUBLE) / 400 AS mad_value,
      CAST(sum(CASE WHEN dev.d * 20000 > 44478 * mad.mad2d
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_anomalies,
      CAST(sum(CASE WHEN dev.d * 20000 > 44478 * mad.mad2d
                    THEN 1 ELSE 0 END) AS DOUBLE) / max(mad.n)
        AS anomaly_rate
    FROM dev JOIN mad USING (event_type)
    GROUP BY dev.event_type
    """,
    tags=("agg", "B7", "B9", "robust-stats", "anomaly"),
)
def events_mad_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust anomaly gate: flag events whose value deviates from the
    per-type median by more than 3·1.4826·MAD — the
    median-absolute-deviation rule that survives the heavy tails and
    pre-existing outliers that wreck z-scores (events_anomaly_zscore is
    the parametric sibling; this is the robust one monitoring stacks
    reach for when the baseline itself is contaminated).

    EXACT medians by rank arithmetic (the orders_trimmed_mean device):
    rows ranked per type with a deterministic (value, event_id)
    tie-break; med2 = c[(n+1)//2] + c[(n+2)//2] is twice the median for
    odd n and the sum of the two middles for even n — integer either
    way. Deviations d = |2c − med2| stay integer (half-cent scale), a
    second ranked pass yields mad2d = 4·MAD exactly, and the gate
    d·20000 > 44478·mad2d is pure integer comparison (44478 =
    3 × 14826 = the 3σ Gaussian-consistency threshold ×10⁴). The three
    float outputs are each ONE IEEE division of exact integers.

    Scale: two grouped sort windows (parallel across types — the
    standard within-group window sort, no global single partition) and
    two broadcast-sized joins of the per-type stats back onto the
    deviations; the per-type stats relation is |types| rows. The
    heavier-keyed form rides the distributed-selection machinery of
    agg_quantiles_distributed instead of full sorts."""
    ev = load_table(spark, sf_dir, "events")
    # r18 optimization note: checkpointing v and dev was MEASURED SLOWER
    # (min-of-runs 0.84 s → 1.10 s at sf0.1) — the re-derived subtrees
    # are a narrow projected scan and one broadcast join, cheaper than
    # materializing them; the grouped window sorts dominate either way.
    v = ev.select(
        "event_type",
        "event_id",
        (F.col("value").cast("decimal(18,2)") * 100)
        .cast("long")
        .alias("c"),
    )
    wr = W.partitionBy("event_type").orderBy("c", "event_id")
    wn = W.partitionBy("event_type")
    ranked = v.select(
        "event_type",
        "c",
        F.row_number().over(wr).alias("rn"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    mid = lambda col, off: F.sum(  # noqa: E731
        F.when(
            F.col("rn") == ((F.col("n") + off) / 2).cast("long"), F.col(col)
        )
    )
    med = ranked.groupBy("event_type").agg(
        F.max("n").alias("n"),
        (mid("c", F.lit(1)) + mid("c", F.lit(2))).alias("med2"),
    )
    dev = v.join(F.broadcast(med), "event_type").select(
        "event_type",
        "event_id",
        "n",
        "med2",
        F.abs(2 * F.col("c") - F.col("med2")).alias("d"),
    )
    dr = W.partitionBy("event_type").orderBy("d", "event_id")
    dranked = dev.select(
        "event_type",
        "n",
        "med2",
        "d",
        F.row_number().over(dr).alias("rn"),
    )
    mad = dranked.groupBy("event_type").agg(
        F.max("n").alias("n"),
        F.max("med2").alias("med2"),
        (mid("d", F.lit(1)) + mid("d", F.lit(2))).alias("mad2d"),
    )
    flagged = dev.drop("n", "med2").join(F.broadcast(mad), "event_type")
    is_anom = F.when(
        F.col("d") * 20000 > _MAD_GATE_NUM * F.col("mad2d"), 1
    ).otherwise(0)
    return flagged.groupBy("event_type").agg(
        F.max("n").cast("long").alias("n"),
        (F.max("med2").cast("double") / 200).alias("median_value"),
        (F.max("mad2d").cast("double") / 400).alias("mad_value"),
        F.sum(is_anom).cast("long").alias("n_anomalies"),
        (F.sum(is_anom).cast("double") / F.max("n")).alias("anomaly_rate"),
    )


# ---------------------------------------------------------------------------
# orders_seq2_patterns — consecutive-order transition mining (seq-pattern lite)
# ---------------------------------------------------------------------------


@query(
    "orders_seq2_patterns",
    oracle="""
    WITH seq AS (
      SELECT o_custkey, o_orderpriority AS p1,
        lead(o_orderpriority) OVER (PARTITION BY o_custkey
             ORDER BY o_orderdate, o_orderkey) AS p2
      FROM orders),
    pairs AS (SELECT * FROM seq WHERE p2 IS NOT NULL),
    counted AS (
      SELECT p1, p2,
        CAST(count(*) AS BIGINT) AS n_transitions,
        CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_customers,
        CAST(sum(count(*)) OVER () AS BIGINT) AS n_total
      FROM pairs GROUP BY p1, p2)
    SELECT p1, p2, n_transitions, n_customers,
      CAST(n_transitions AS DOUBLE) / n_total AS support
    FROM counted
    """,
    tags=("window", "B9", "B7", "sequence-mining"),
)
def orders_seq2_patterns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequent consecutive-order patterns: for every (priority →
    next priority) transition in a customer's chronological order
    history, the transition count, how many distinct customers exhibit
    it, and its support among all transitions — the length-2 core of
    sequential-pattern mining (PrefixSpan's first level), and the
    transition matrix a next-order-propensity model trains on. The
    per-customer sibling of events_markov_transitions (that one walks
    event streams, this one the order book).

    Exactness: counts are integers; support is ONE IEEE division.

    Scale: one per-customer window (sorts locally within the customer
    hash partitions — no global sort), then a 25-group map-side
    combinable aggregate; the window total is a 25-row exchange. The
    distinct-customer count shuffles (pair, customer) once. Longer
    patterns (length-k) chain the same lead() k−1 times, keeping the
    row count flat — never a self-join blowup."""
    o = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    seq = o.select(
        "o_custkey",
        F.col("o_orderpriority").alias("p1"),
        F.lead("o_orderpriority").over(w).alias("p2"),
    ).filter(F.col("p2").isNotNull())
    counted = seq.groupBy("p1", "p2").agg(
        F.count(F.lit(1)).alias("n_transitions"),
        F.countDistinct("o_custkey").alias("n_customers"),
    ).withColumn("n_total", F.sum("n_transitions").over(W.partitionBy()))
    return counted.select(
        "p1",
        "p2",
        "n_transitions",
        "n_customers",
        (F.col("n_transitions").cast("double") / F.col("n_total")).alias(
            "support"
        ),
    )


# ---------------------------------------------------------------------------
# orders_revenue_bridge — year-over-year mix/rate decomposition per nation
# ---------------------------------------------------------------------------

_BRIDGE_Y1, _BRIDGE_Y2 = 1997, 1998


@query(
    "orders_revenue_bridge",
    oracle=f"""
    WITH per AS (
      SELECT n.n_name AS nation,
        CAST(EXTRACT(year FROM o.o_orderdate) AS BIGINT) AS yr,
        CAST(count(*) AS BIGINT) AS n_orders,
        CAST(sum(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DECIMAL(38,2))
          AS rev
      FROM orders o
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n ON c.c_nationkey = n.n_nationkey
      WHERE EXTRACT(year FROM o.o_orderdate)
            IN ({_BRIDGE_Y1}, {_BRIDGE_Y2})
      GROUP BY n.n_name, EXTRACT(year FROM o.o_orderdate)),
    y1 AS (SELECT nation, n_orders AS n1, rev AS rev1 FROM per
           WHERE yr = {_BRIDGE_Y1}),
    y2 AS (SELECT nation, n_orders AS n2, rev AS rev2 FROM per
           WHERE yr = {_BRIDGE_Y2})
    SELECT nation, n1, n2,
      CAST(rev1 AS DOUBLE) AS rev_y1,
      CAST(rev2 AS DOUBLE) AS rev_y2,
      CAST(rev2 - rev1 AS DOUBLE) AS delta_rev,
      CAST((n2 - n1) * rev1 AS DOUBLE) / n1 AS volume_effect,
      CAST(rev2 AS DOUBLE) - CAST(n2 * rev1 AS DOUBLE) / n1 AS rate_effect
    FROM y1 JOIN y2 USING (nation)
    """,
    tags=("agg", "B6", "B7", "finance", "decomposition"),
)
def orders_revenue_bridge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Year-over-year revenue bridge per nation: decompose Δrevenue into
    a VOLUME effect ((n₂−n₁) orders at year-1 average value) and a RATE
    effect (year-2 volume × change in average order value) — the
    waterfall decomposition every finance/BI review opens with, and an
    exact identity: volume_effect + rate_effect = delta_rev in the
    rationals (both terms share the n₁ denominator).

    Exactness: revenues are exact DECIMAL sums; delta is a DECIMAL
    subtraction cast once; volume_effect is ONE IEEE division of the
    exact DECIMAL product (n₂−n₁)·rev₁ by n₁; rate_effect is one such
    division followed by one IEEE subtraction from an exact value —
    fixed two-op order, bit-identical across engines.

    Scale: the fact table reduces FIRST to a (nation, year) cube (two
    keyed map-side-combinable aggregates after broadcast dimension
    joins — customer→nation is the standard TPC-H broadcast chain);
    the bridge itself joins two 25-row relations. Nothing after the
    first aggregate scales with data."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    yr = F.year("o_orderdate")
    per = (
        o.filter(yr.isin(_BRIDGE_Y1, _BRIDGE_Y2))
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            yr.cast("long").alias("yr"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("decimal(38,2)")
            .alias("rev"),
        )
        # The (nation, year) cube feeds both year slices; materialize it
        # once so the orders⋈customer join + aggregate run once.
        .localCheckpoint(eager=False)
    )
    y1 = per.filter(F.col("yr") == _BRIDGE_Y1).select(
        "nation",
        F.col("n_orders").alias("n1"),
        F.col("rev").alias("rev1"),
    )
    y2 = per.filter(F.col("yr") == _BRIDGE_Y2).select(
        "nation",
        F.col("n_orders").alias("n2"),
        F.col("rev").alias("rev2"),
    )
    j = y1.join(y2, "nation")
    return j.select(
        "nation",
        "n1",
        "n2",
        F.col("rev1").cast("double").alias("rev_y1"),
        F.col("rev2").cast("double").alias("rev_y2"),
        (F.col("rev2") - F.col("rev1")).cast("double").alias("delta_rev"),
        (
            ((F.col("n2") - F.col("n1")) * F.col("rev1")).cast("double")
            / F.col("n1")
        ).alias("volume_effect"),
        (
            F.col("rev2").cast("double")
            - (F.col("n2") * F.col("rev1")).cast("double") / F.col("n1")
        ).alias("rate_effect"),
    )


# ---------------------------------------------------------------------------
# dq_fd_discovery — functional-dependency discovery over orders (TANE level 1)
# ---------------------------------------------------------------------------

_FD_COLS = (
    "o_orderkey",
    "o_custkey",
    "o_orderstatus",
    "o_totalprice",
    "o_orderdate",
    "o_orderpriority",
)


# NULL-as-value convention: coalesce each column to a TYPED out-of-domain
# sentinel (keys are non-negative, prices are finite, dates are modern,
# strings never start with chr(0)), so distinct counting stays on native
# types — a cast-to-string key would widen the 36-way Expand and cost
# ~40% more wall time (measured at sf0.1).
_FD_SENTINELS = {
    "bigint": "CAST(-4611686018427387904 AS BIGINT)",
    "double": "CAST('-infinity' AS DOUBLE)",
    "timestamp": "TIMESTAMP '0001-01-01 00:00:00'",
    "string": "chr(0) || 'NULL'",
}
_FD_COL_TYPES = {
    "o_orderkey": "bigint",
    "o_custkey": "bigint",
    "o_orderstatus": "string",
    "o_totalprice": "double",
    "o_orderdate": "timestamp",
    "o_orderpriority": "string",
}


def _sql_fd_key(col: str) -> str:
    # Mirrored by the engine's _fd_key().
    return f"COALESCE({col}, {_FD_SENTINELS[_FD_COL_TYPES[col]]})"


def _sql_fd_oracle() -> str:
    # Same distinct-count identity as the engine (n_violations(A→B) =
    # |distinct (A,B)| − |distinct A|), over the same NULL-coalesced
    # keys, so the two sides cannot diverge on NULL-bearing columns.
    parts = []
    for a in _FD_COLS:
        ka = _sql_fd_key(a)
        for b in _FD_COLS:
            if b == a:
                continue
            kb = _sql_fd_key(b)
            parts.append(f"""
    SELECT '{a}' AS lhs, '{b}' AS rhs,
      CAST(count(DISTINCT {ka}) AS BIGINT) AS n_groups,
      CAST(count(DISTINCT ({ka}, {kb})) - count(DISTINCT {ka}) AS BIGINT)
        AS n_violations,
      count(DISTINCT ({ka}, {kb})) = count(DISTINCT {ka}) AS holds
    FROM orders""")
    return "\n    UNION ALL".join(parts)


@query(
    "dq_fd_discovery",
    oracle=_sql_fd_oracle(),
    tags=("data-quality", "B7", "profiling", "fd-discovery"),
)
def dq_fd_discovery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Functional-dependency discovery (level 1 of TANE/Metanome-style
    profiling) over the orders schema: for every ordered column pair
    A→B, does each A-value determine a single B-value? Emits the group
    count, the EXACT violation count Σ_groups (|distinct B| − 1), and
    the holds verdict — the dependency map schema-normalization,
    key-detection, and dq-rule mining all start from (o_orderkey → *
    should hold; everything else on this fixture is measured, not
    assumed).

    Exactness: all counts integer; holds is an integer equality.

    Scale: the whole level-1 lattice reduces to the identity
    n_violations(A→B) = Σ_groups (|distinct B| − 1)
                      = |distinct (A,B)| − |distinct A|,
    so the query is ONE scan computing the 6 single-column and 30
    pair distinct-counts in a single aggregate (Catalyst plans the
    multi-distinct as one Expand — a linear 36-way row multiplication
    of the 6 pruned columns, partial-aggregated map-side so the
    shuffle carries only distinct combos), then a ``stack`` unpivot
    fans the 1-row result into the 30 (lhs, rhs) outputs. The earlier
    shape — one keyed aggregate per LHS, 5 one-row selects union'd —
    re-read the table 6× (and before the stack rewrite, 30×: Spark
    shares no subtrees across union branches); at 100 TB the scan is
    the dominant cost, so single-pass wins. Level-k FDs chain the
    same identity over composite keys; the lattice pruning (skip
    supersets of holding FDs) is driver logic over 1-row results,
    exactly as TANE prescribes.

    NULL convention: FD semantics treat NULL as a regular domain value
    (a group of its own, a distinct B-value), but ``countDistinct``
    drops NULLs — so both engine and oracle count over NULL-coalesced
    keys. The sentinel is TYPED and out-of-domain per column
    (``_FD_SENTINELS``) rather than a cast-to-string key: native-type
    hashing keeps the 36-way Expand narrow (a string key costs ~40%
    more wall time, measured at sf0.1). The fixture is NULL-free here;
    the convention makes the identity hold on real profiling inputs
    too."""

    def _fd_key(c: str):
        return F.coalesce(F.col(c), F.expr(_FD_SENTINELS[_FD_COL_TYPES[c]]))

    o = load_table(spark, sf_dir, "orders")
    aggs = [F.countDistinct(_fd_key(a)).alias(f"nd_{a}") for a in _FD_COLS]
    aggs += [
        F.countDistinct(_fd_key(a), _fd_key(b)).alias(f"nd_{a}__{b}")
        for a in _FD_COLS
        for b in _FD_COLS
        if a != b
    ]
    one = o.agg(*aggs)
    stack_args = ", ".join(
        f"'{a}', '{b}', nd_{a}, nd_{a}__{b} - nd_{a}"
        for a in _FD_COLS
        for b in _FD_COLS
        if a != b
    )
    return one.select(
        F.expr(
            f"stack(30, {stack_args}) AS (lhs, rhs, n_groups, n_violations)"
        )
    ).select(
        "lhs",
        "rhs",
        "n_groups",
        "n_violations",
        (F.col("n_violations") == 0).alias("holds"),
    )


# ---------------------------------------------------------------------------
# events_peak_detection — prominent local maxima in the hourly series
# ---------------------------------------------------------------------------


@query(
    "events_peak_detection",
    oracle="""
    WITH hourly AS (
      SELECT event_type,
        CAST(time_bucket(INTERVAL '1 hour', ts) AS TIMESTAMP) AS h,
        CAST(count(*) AS BIGINT) AS c
      FROM events GROUP BY 1, 2),
    ctx AS (
      SELECT event_type, h, c,
        lag(c, 2) OVER w AS m2, lag(c, 1) OVER w AS m1,
        lead(c, 1) OVER w AS p1, lead(c, 2) OVER w AS p2,
        lag(h, 2) OVER w AS hm2, lead(h, 2) OVER w AS hp2
      FROM hourly
      WINDOW w AS (PARTITION BY event_type ORDER BY h)),
    full4 AS (
      SELECT * FROM ctx
      WHERE m2 IS NOT NULL AND p2 IS NOT NULL
        AND hm2 = h - INTERVAL 2 HOUR AND hp2 = h + INTERVAL 2 HOUR)
    SELECT event_type, h, c,
      CAST(m2 + m1 + p1 + p2 AS BIGINT) AS neighbor_sum,
      CAST(c AS DOUBLE) * 4 / (m2 + m1 + p1 + p2) AS prominence
    FROM full4
    WHERE c > m1 AND c > p1 AND c >= m2 AND c >= p2
      AND 16 * c > 5 * (m2 + m1 + p1 + p2)
    """,
    tags=("timeseries", "B7", "B9", "anomaly", "peaks"),
)
def events_peak_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Prominent-peak detection in the hourly event-count series — the
    burst detector monitoring stacks run next to drift and CUSUM: an
    hour is a peak iff it strictly beats its ±1-hour neighbors, weakly
    beats ±2, and clears the ALL-INTEGER prominence gate
    16·c > 5·Σ(4 neighbors) (i.e. c > 1.25 × neighborhood mean — the
    rational 5/4 kept as cross-multiplication so no float ever enters
    the decision). Hours whose ±2 context crosses a series gap are
    excluded by exact timestamp arithmetic, not null-padding guesses.

    Exactness: counts and the gate are integers; prominence (4c/Σ) is
    the one IEEE division, emitted for ranking only.

    Scale: the fact table reduces to (type, hour) counts FIRST (one
    map-side-combinable shuffle, |types|×|hours| rows); the lag/lead
    context is a per-type window over that reduced series — window
    width is constant, state is 5 rows, and the series relation is
    ~10⁴ smaller than the fact table at any SF."""
    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("h")
    ).agg(F.count(F.lit(1)).alias("c"))
    w = W.partitionBy("event_type").orderBy("h")
    ctx = hourly.select(
        "event_type",
        "h",
        "c",
        F.lag("c", 2).over(w).alias("m2"),
        F.lag("c", 1).over(w).alias("m1"),
        F.lead("c", 1).over(w).alias("p1"),
        F.lead("c", 2).over(w).alias("p2"),
        F.lag("h", 2).over(w).alias("hm2"),
        F.lead("h", 2).over(w).alias("hp2"),
    )
    full4 = ctx.filter(
        F.col("m2").isNotNull()
        & F.col("p2").isNotNull()
        & (F.col("hm2") == F.col("h") - F.expr("INTERVAL 2 HOUR"))
        & (F.col("hp2") == F.col("h") + F.expr("INTERVAL 2 HOUR"))
    )
    nsum = F.col("m2") + F.col("m1") + F.col("p1") + F.col("p2")
    return full4.filter(
        (F.col("c") > F.col("m1"))
        & (F.col("c") > F.col("p1"))
        & (F.col("c") >= F.col("m2"))
        & (F.col("c") >= F.col("p2"))
        & (16 * F.col("c") > 5 * nsum)
    ).select(
        "event_type",
        "h",
        "c",
        nsum.alias("neighbor_sum"),
        (F.col("c").cast("double") * 4 / nsum).alias("prominence"),
    )


# ---------------------------------------------------------------------------
# dq_corrupt_record_quarantine — PERMISSIVE typed parse with bad-record audit
# ---------------------------------------------------------------------------


@query(
    "dq_corrupt_record_quarantine",
    oracle="""
    SELECT event_type,
      CAST(count(*) AS BIGINT) AS n_rows,
      CAST(sum(CASE WHEN event_id % 10 <> 0 THEN 1 ELSE 0 END) AS BIGINT)
        AS n_valid,
      CAST(sum(CASE WHEN event_id % 10 = 0 THEN 1 ELSE 0 END) AS BIGINT)
        AS n_quarantined,
      CAST(sum(CASE WHEN event_id % 10 <> 0
               THEN CAST(json_extract_string(COALESCE(props, '{}'), '$.k')
                         AS BIGINT)
               END) AS BIGINT) AS sum_k
    FROM events
    GROUP BY event_type
    """,
    tags=("data-quality", "B12", "B15", "json", "quarantine"),
)
def dq_corrupt_record_quarantine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed parse of a schemaless JSON column with PERMISSIVE
    corrupt-record quarantine — the late-binding contract the reference's
    schemaless records imply (SURVEY.md §1.2-1.3: unknown/odd payloads
    must survive, not kill the pipeline), and the capability any 100 TB
    ingest needs on day one: some fraction of landed JSON is always
    malformed, and the engine must (a) parse the good rows to typed
    columns, (b) quarantine the bad ones WITH their original payload for
    replay, (c) account for both — never silently drop.

    The corruption is staged deterministically (every event_id % 10 = 0
    row gets a leading junk byte, making the JSON invalid — trailing
    junk would NOT do: Spark's parser stops at the end of the first
    object and tolerates it). The parse is one ``from_json`` with
    ``mode=PERMISSIVE`` + ``columnNameOfCorruptRecord``: invalid rows
    yield NULL fields and carry the raw payload in the corrupt column
    (the quarantine), valid rows parse to a typed struct. Everything is
    a JVM JsonToStructs expression inside whole-stage codegen — one
    narrow map, one keyed aggregate, no Python in the path.

    Exactness: all counts and the k-sum are integers.

    NULL convention: a NULL payload is normalized to the empty object
    ``{}`` BEFORE staging (both sides) — otherwise ``concat`` would turn
    a staged NULL into a NULL raw whose ``from_json`` yields a NULL
    struct (counted valid) while the event_id rule says quarantined.
    The fixture has no NULL props; the convention keeps the
    classification rule and the parse outcome aligned on inputs that
    do."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "props"
    )
    payload = F.coalesce(F.col("props"), F.lit("{}"))
    staged = ev.withColumn(
        "raw",
        F.when(
            F.col("event_id") % 10 == 0, F.concat(F.lit("x"), payload)
        ).otherwise(payload),
    )
    parsed = staged.withColumn(
        "p",
        F.from_json(
            "raw",
            "k bigint, _corrupt string",
            {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": "_corrupt"},
        ),
    )
    return parsed.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(
            F.when(F.col("p._corrupt").isNull(), 1).otherwise(0)
        ).alias("n_valid"),
        F.sum(
            F.when(F.col("p._corrupt").isNotNull(), 1).otherwise(0)
        ).alias("n_quarantined"),
        F.sum(F.when(F.col("p._corrupt").isNull(), F.col("p.k"))).alias(
            "sum_k"
        ),
    )


# ---------------------------------------------------------------------------
# events_stl_decompose — classical additive seasonal-trend decomposition
# ---------------------------------------------------------------------------

_STL_HALF = 12  # centered moving-average half-width (25-hour window)
_STL_W = 2 * _STL_HALF + 1


@query(
    "events_stl_decompose",
    oracle=f"""
    WITH hourly AS (
      SELECT event_type,
        CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour_ts,
        CAST(sum(CAST(round(CAST(value AS DECIMAL(18,2)) * 100, 0)
                      AS BIGINT)) AS BIGINT) AS cents
      FROM events GROUP BY 1, 2),
    trended AS (
      SELECT event_type, hour_ts, cents,
        CASE WHEN count(*) OVER w = {_STL_W}
             THEN sum(cents) OVER w END AS t25
      FROM hourly
      WINDOW w AS (PARTITION BY event_type ORDER BY hour_ts
                   ROWS BETWEEN {_STL_HALF} PRECEDING
                            AND {_STL_HALF} FOLLOWING)),
    seasonal AS (
      SELECT event_type, hour(hour_ts) AS hod,
        CAST(sum({_STL_W} * cents - t25) AS BIGINT) AS s_num,
        CAST(count(*) AS BIGINT) AS s_n
      FROM trended WHERE t25 IS NOT NULL
      GROUP BY 1, 2)
    SELECT t.event_type, t.hour_ts,
      CAST(t.cents AS DOUBLE) / 100 AS value,
      CAST(t.t25 AS DOUBLE) / {_STL_W * 100} AS trend,
      CAST(s.s_num AS DOUBLE) / (s.s_n * {_STL_W * 100}) AS seasonal,
      (CAST({_STL_W} * t.cents - t.t25 AS DOUBLE) / {_STL_W * 100})
        - (CAST(s.s_num AS DOUBLE) / (s.s_n * {_STL_W * 100})) AS remainder
    FROM trended t
    JOIN seasonal s
      ON t.event_type = s.event_type AND hour(t.hour_ts) = s.hod
    WHERE t.t25 IS NOT NULL
    """,
    tags=("events", "B9", "timeseries", "decomposition"),
)
def events_stl_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classical additive seasonal-trend decomposition (the
    moving-average STL ancestor: Macaulay 1931, the "classical
    decomposition" of every forecasting text): per event type's hourly
    value series, value = trend + seasonal + remainder, with trend a
    centered 25-hour moving average (NULL at the series edges where
    the window is partial), the daily seasonal the per-hour-of-day
    mean of the detrended series, and the remainder what's left —
    the decomposition behind 'is this spike load growth, time-of-day,
    or an anomaly?'.

    Determinism: the decomposition never averages doubles — the trend
    is carried as the INTEGER window sum t25 (cents × 25), the
    detrended series as the integer 25·cents − t25, and the seasonal
    as an integer-sum/count pair; each output is ONE division of
    exactly-represented integers, bit-identical cross-engine. Window
    semantics are ROWS over the hours PRESENT in each type's series
    (equal to calendar-trailing when the series is dense, as at
    sf0.01+; a sparse series averages over its own observed hours —
    the stated contract, not an accident).

    Scale shape: one scan → hour-grain aggregate (map-side
    combinable), one partitioned 25-row sliding window, one
    domain-sized (type × 24) aggregate joined back broadcast. Per-type
    series length is time-bounded, not data-bounded — at 100 TB the
    hourly aggregate is the only row-scaled stage."""
    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "event_type",
        F.date_trunc("hour", "ts").alias("hour_ts"),
    ).agg(
        F.sum(
            F.round(F.col("value").cast("decimal(18,2)") * 100, 0).cast(
                "long"
            )
        )
        .cast("long")
        .alias("cents")
    )
    w = (
        W.partitionBy("event_type")
        .orderBy("hour_ts")
        .rowsBetween(-_STL_HALF, _STL_HALF)
    )
    trended = hourly.select(
        "event_type",
        "hour_ts",
        "cents",
        F.when(
            F.count(F.lit(1)).over(w) == _STL_W, F.sum("cents").over(w)
        ).alias("t25"),
    ).filter(F.col("t25").isNotNull())
    seasonal = trended.groupBy(
        "event_type", F.hour("hour_ts").alias("hod")
    ).agg(
        F.sum(_STL_W * F.col("cents") - F.col("t25"))
        .cast("long")
        .alias("s_num"),
        F.count(F.lit(1)).cast("long").alias("s_n"),
    )
    seas_col = F.col("s_num").cast("double") / (
        F.col("s_n") * (_STL_W * 100)
    )
    return (
        trended.withColumn("hod", F.hour("hour_ts"))
        .join(F.broadcast(seasonal), ["event_type", "hod"])
        .select(
            "event_type",
            "hour_ts",
            (F.col("cents").cast("double") / 100).alias("value"),
            (F.col("t25").cast("double") / (_STL_W * 100)).alias("trend"),
            seas_col.alias("seasonal"),
            (
                (
                    (_STL_W * F.col("cents") - F.col("t25")).cast("double")
                    / (_STL_W * 100)
                )
                - seas_col
            ).alias("remainder"),
        )
    )


# ---------------------------------------------------------------------------
# orders_feature_standardize — the tabular feature-engineering pipeline
# ---------------------------------------------------------------------------

# Shared solve fragment: z-score and min-max from integer group moments —
# identical expression tree in both engines, so the doubles match bitwise.
_FEAT_PROJ = """
  SELECT o_orderkey, o_orderpriority,
    CAST(cents AS DOUBLE) / 100 AS price,
    (CAST(cents AS DOUBLE) - CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
      / sqrt((CAST(ssq AS DOUBLE) * CAST(n AS DOUBLE)
              - CAST(s AS DOUBLE) * CAST(s AS DOUBLE))
             / (CAST(n AS DOUBLE) * CAST(n - 1 AS DOUBLE))) AS z_price,
    CAST(cents - mn AS DOUBLE) / CAST(mx - mn AS DOUBLE) AS minmax_price,
    ntile_bin AS decile,
    CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS oh_urgent,
    CASE WHEN o_orderpriority = '2-HIGH' THEN 1 ELSE 0 END AS oh_high,
    CASE WHEN o_orderpriority = '3-MEDIUM' THEN 1 ELSE 0 END AS oh_medium
  FROM binned
"""


@query(
    "orders_feature_standardize",
    oracle=f"""
    WITH base AS (
      SELECT o_orderkey, o_orderpriority,
        CAST(round(CAST(o_totalprice AS DECIMAL(18,2)) * 100, 0) AS BIGINT)
          AS cents
      FROM orders WHERE o_orderkey < 8000),
    stats AS (
      SELECT o_orderpriority,
        CAST(count(*) AS BIGINT) AS n,
        CAST(sum(cents) AS BIGINT) AS s,
        CAST(sum(CAST(cents AS DECIMAL(38,0)) * cents) AS DECIMAL(38,0))
          AS ssq,
        CAST(min(cents) AS BIGINT) AS mn, CAST(max(cents) AS BIGINT) AS mx
      FROM base GROUP BY 1),
    binned AS (
      SELECT b.*, st.n, st.s, st.ssq, st.mn, st.mx,
        CAST(ntile(10) OVER (PARTITION BY b.o_orderpriority
                             ORDER BY b.cents, b.o_orderkey) AS INTEGER)
          AS ntile_bin
      FROM base b JOIN stats st USING (o_orderpriority))
    {_FEAT_PROJ}
    """,
    tags=("orders", "B7", "ml-features", "standardization"),
)
def orders_feature_standardize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The tabular feature-engineering pipeline every training-data prep
    ends with — per-row z-score, min-max scaling, decile binning, and
    one-hot encoding, all per feature GROUP (order priority), produced
    in one pass + one window: group moments (n, Σx, Σx², min, max) come
    from an exact integer aggregate (Σx² in DECIMAL(38,0) — cents² at
    fixture prices overflows int64 within ~20k rows; the decimal lift
    is the 100 TB-safe form), are broadcast back, and the scalings are
    a SHARED SQL fragment so both engines evaluate the identical IEEE
    expression tree. Deciles via ntile over (value, key) — the unique
    tie-break makes the bin assignment deterministic under any
    partitioning (plain ntile over a tied sort is not, which is why
    naive featurizers drift between runs). One-hot stays fixed-width
    (the domain is declared, not discovered — discovery belongs to a
    profiling pass like ``profile_orders``).

    Scale shape: one scan, one group-sized moment aggregate broadcast
    back, one partitioned window for deciles. The moments are the same
    mergeable pattern as ``emb_ridge_normal_eq``; z/min-max are pure
    map-side arithmetic after the broadcast."""
    base = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") < 8000)
        .select(
            "o_orderkey",
            "o_orderpriority",
            F.round(F.col("o_totalprice").cast("decimal(18,2)") * 100, 0)
            .cast("long")
            .alias("cents"),
        )
    )
    stats = base.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("cents").cast("long").alias("s"),
        F.sum(F.col("cents").cast("decimal(38,0)") * F.col("cents"))
        .cast("decimal(38,0)")
        .alias("ssq"),
        F.min("cents").cast("long").alias("mn"),
        F.max("cents").cast("long").alias("mx"),
    )
    wb = W.partitionBy("o_orderpriority").orderBy("cents", "o_orderkey")
    binned = base.join(F.broadcast(stats), "o_orderpriority").withColumn(
        "ntile_bin", F.ntile(10).over(wb).cast("int")
    )
    binned.createOrReplaceTempView("binned")
    return spark.sql(_FEAT_PROJ)


# ---------------------------------------------------------------------------
# events_higher_moments — skewness / kurtosis / CV from shared moment sums
# ---------------------------------------------------------------------------

# Shared solve fragment: both engines evaluate the identical expression
# tree over the exact decimal moment sums, so every IEEE operation is
# order-identical. (CAST(DECIMAL(38,0) AS DOUBLE) is correctly rounded in
# both engines — probed bit-identical up to 38 digits.)
_MOM_SOLVE = """
  SELECT event_type, n,
    mu / 100 AS mean_value,
    sqrt(r2 - mu * mu) / 100 AS std_value,
    round((r3 - 3 * mu * r2 + 2 * mu * mu * mu)
      / ((r2 - mu * mu) * sqrt(r2 - mu * mu)), 9) AS skewness,
    round((r4 - 4 * mu * r3 + 6 * mu * mu * r2 - 3 * mu * mu * mu * mu)
      / ((r2 - mu * mu) * (r2 - mu * mu)) - 3, 9) AS kurtosis_excess,
    round(sqrt(r2 - mu * mu) / mu, 9) AS cv
  FROM m
"""

_MOM_M = """
  m AS (
    SELECT event_type, CAST(n AS BIGINT) AS n,
      CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) AS mu,
      CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE) AS r2,
      CAST(s3 AS DOUBLE) / CAST(n AS DOUBLE) AS r3,
      CAST(s4 AS DOUBLE) / CAST(n AS DOUBLE) AS r4
    FROM sums)
"""


@query(
    "events_higher_moments",
    oracle=f"""
    WITH base AS (
      SELECT event_type,
        CAST(round(CAST(value AS DECIMAL(18,2)) * 100, 0) AS DECIMAL(38,0))
          AS c
      FROM events),
    sums AS (
      SELECT event_type, count(*) AS n,
        sum(c) AS s1, sum(c*c) AS s2, sum(c*c*c) AS s3,
        sum(c*c*c*c) AS s4
      FROM base GROUP BY 1),
    {_MOM_M}
    {_MOM_SOLVE}
    """,
    tags=("events", "B7", "statistics", "moments"),
)
def events_higher_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skewness, excess kurtosis, and coefficient of variation per event
    type — the distribution-SHAPE members the stats battery
    (``agg_stats``: mean/stddev/min/max) does not cover, and the ones
    monitoring actually needs (a metric whose mean is flat can still
    fatten its tail — kurtosis sees it first). Built from exact
    DECIMAL(38,0) power sums Σc..Σc⁴ over integer cents (c⁴ overflows
    int64 within ~10⁵ rows at fixture magnitudes — the decimal lift is
    mandatory, not defensive), then ONE shared SQL fragment computes the
    population moments. The multi-term skew/kurtosis numerators proved
    to differ in the final 2 ulps across engines (expression-rewrite
    order inside the optimizers), so the three shape statistics are
    rounded to 9 dp — the ln-rounding precedent of the scalar battery;
    mean and std (single subtract/sqrt/divide chains) stay unrounded
    and bit-exact. The
    built-in ``skewness()``/``kurtosis()`` are deliberately NOT used:
    Spark returns population moments where DuckDB bias-corrects, and a
    cross-engine-checkable pipeline needs one stated definition
    (population, the streaming-mergeable one) rather than whichever the
    engine ships.

    Scale shape: one scan, one map-side-combinable 5-column aggregate
    per type, a |types|-row solve. The same sums merge across
    shards/days — this is the mergeable-moments pattern
    (``emb_ridge_normal_eq``'s argument, one degree higher)."""
    ev = load_table(spark, sf_dir, "events")
    base = ev.select(
        "event_type",
        F.round(F.col("value").cast("decimal(18,2)") * 100, 0)
        .cast("decimal(38,0)")
        .alias("c"),
    )
    sums = base.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("c").alias("s1"),
        F.sum(F.col("c") * F.col("c")).alias("s2"),
        F.sum(F.col("c") * F.col("c") * F.col("c")).alias("s3"),
        F.sum(F.col("c") * F.col("c") * F.col("c") * F.col("c")).alias(
            "s4"
        ),
    )
    sums.createOrReplaceTempView("sums")
    return spark.sql(f"WITH {_MOM_M} {_MOM_SOLVE}")


# ---------------------------------------------------------------------------
# events_sax_motifs — SAX symbolization of the daily value series
# ---------------------------------------------------------------------------

_SAX_SEG_DAYS = 5  # PAA segment width (days)

# Shared z-score + breakpoint CASE: identical expression tree in both
# engines (seg_q and the moment sums are exact integers; the division and
# sqrt are the only IEEE ops and happen in the same order).
_SAX_SYMBOL = """
  CASE WHEN s2 * d = s * s THEN 'c'
       WHEN (CAST(seg_q AS DOUBLE) - CAST(s AS DOUBLE) / CAST(d AS DOUBLE))
            / sqrt(CAST(s2 AS DOUBLE) / CAST(d AS DOUBLE)
                   - (CAST(s AS DOUBLE) / CAST(d AS DOUBLE))
                     * (CAST(s AS DOUBLE) / CAST(d AS DOUBLE)))
            < -0.6745 THEN 'a'
       WHEN (CAST(seg_q AS DOUBLE) - CAST(s AS DOUBLE) / CAST(d AS DOUBLE))
            / sqrt(CAST(s2 AS DOUBLE) / CAST(d AS DOUBLE)
                   - (CAST(s AS DOUBLE) / CAST(d AS DOUBLE))
                     * (CAST(s AS DOUBLE) / CAST(d AS DOUBLE)))
            < 0 THEN 'b'
       WHEN (CAST(seg_q AS DOUBLE) - CAST(s AS DOUBLE) / CAST(d AS DOUBLE))
            / sqrt(CAST(s2 AS DOUBLE) / CAST(d AS DOUBLE)
                   - (CAST(s AS DOUBLE) / CAST(d AS DOUBLE))
                     * (CAST(s AS DOUBLE) / CAST(d AS DOUBLE)))
            < 0.6745 THEN 'c'
       ELSE 'd' END
"""


@query(
    "events_sax_motifs",
    oracle=f"""
    WITH daily AS (
      SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
        CAST(sum(CAST(round(CAST(value AS DECIMAL(18,2)) * 100, 0)
                      AS BIGINT)) AS BIGINT) AS s_cents,
        CAST(count(*) AS BIGINT) AS c
      FROM events GROUP BY 1, 2),
    indexed AS (
      SELECT event_type,
        CAST(round(s_cents * 100.0 / c, 0) AS BIGINT) AS q,
        (row_number() OVER (PARTITION BY event_type ORDER BY day) - 1)
          // {_SAX_SEG_DAYS} AS seg
      FROM daily),
    segs AS (
      SELECT event_type, seg,
        CAST(round(sum(q) * 1.0 / count(*), 0) AS BIGINT) AS seg_q
      FROM indexed GROUP BY 1, 2),
    stats AS (
      SELECT event_type, CAST(count(*) AS BIGINT) AS d,
        CAST(sum(seg_q) AS BIGINT) AS s,
        CAST(sum(CAST(seg_q AS DECIMAL(38,0)) * seg_q) AS DECIMAL(38,0))
          AS s2
      FROM segs GROUP BY 1),
    symbols AS (
      SELECT g.event_type, g.seg, {_SAX_SYMBOL} AS sym
      FROM segs g JOIN stats USING (event_type))
    SELECT event_type,
      CAST(count(*) AS BIGINT) AS n_segments,
      string_agg(sym, '' ORDER BY seg) AS sax_word,
      CAST(count(DISTINCT sym) AS BIGINT) AS n_symbols
    FROM symbols GROUP BY 1
    """,
    tags=("events", "B9", "timeseries", "sax"),
)
def events_sax_motifs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SAX — Symbolic Aggregate approXimation (Lin, Keogh et al. 2003),
    the time-series-mining representation behind motif discovery,
    anomaly grammars, and series indexing: each event type's daily mean
    series is PAA-compressed ({_SAX_SEG_DAYS}-day segment means), then
    z-normalized and quantized against the 4-symbol Gaussian
    breakpoints (±0.6745, 0) into a short WORD — two series with the
    same word are shape-similar regardless of scale, which is what
    makes symbolized matching a pre-filter for expensive similarity
    (the same bucket-then-verify posture as the LSH dedup family, for
    curves instead of documents). Everything before the z-score is
    exact integer (daily means quantized to centi-cents, segment moment
    sums in DECIMAL(38,0)); the z-score + breakpoint CASE is one shared
    SQL fragment, so the symbol boundaries cannot flip between engines;
    a zero-variance series degenerates to all-'c' by an explicit guard,
    not NaN luck.

    Scale shape: raw rows collapse at the day grain in one map-side
    pass; everything after is |types|×|days| rows. The listagg word is
    segment-bounded (6 chars here) — the bounded-listagg contract of
    ``agg_listagg_bitwise``."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("day")
    ).agg(
        F.sum(
            F.round(F.col("value").cast("decimal(18,2)") * 100, 0).cast(
                "long"
            )
        )
        .cast("long")
        .alias("s_cents"),
        F.count(F.lit(1)).cast("long").alias("c"),
    )
    indexed = daily.select(
        "event_type",
        F.round(F.col("s_cents") * 100.0 / F.col("c"), 0)
        .cast("long")
        .alias("q"),
        F.expr(
            f"(row_number() OVER (PARTITION BY event_type ORDER BY day)"
            f" - 1) DIV {_SAX_SEG_DAYS}"
        ).alias("seg"),
    )
    segs = indexed.groupBy("event_type", "seg").agg(
        F.round(F.sum("q") * 1.0 / F.count(F.lit(1)), 0)
        .cast("long")
        .alias("seg_q")
    )
    stats = segs.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("d"),
        F.sum("seg_q").cast("long").alias("s"),
        F.sum(F.col("seg_q").cast("decimal(38,0)") * F.col("seg_q"))
        .cast("decimal(38,0)")
        .alias("s2"),
    )
    segs.join(F.broadcast(stats), "event_type").createOrReplaceTempView(
        "sax_segs"
    )
    return spark.sql(f"""
      WITH symbols AS (
        SELECT event_type, seg, {_SAX_SYMBOL} AS sym FROM sax_segs)
      SELECT event_type,
        CAST(count(*) AS BIGINT) AS n_segments,
        listagg(sym, '') WITHIN GROUP (ORDER BY seg) AS sax_word,
        CAST(count(DISTINCT sym) AS BIGINT) AS n_symbols
      FROM symbols GROUP BY 1
    """)
