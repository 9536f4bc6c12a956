"""Round-13 statistical-inference query surface: corpus-scaling law
fits, classical nonparametric rank tests, smoothed frequency
estimators, and finite-sample (conformal) prediction intervals — the
measurement companions to the drift/quality gates in
``plans/curation.py`` and ``plans/governance.py``.

Same oracle discipline as the rest of the registry: exact integer
arithmetic (counts, cross-multiplied ranks, cents) until a single
shared final IEEE expression, and every global cumulative uses the
two-phase block-prefix device (per-band partials, exclusive prefix
over the tiny band table, band-partitioned within-window) so no
operator ever sorts the full relation in one partition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..catalog import load_table
from ..functions.bounded import bounded_window
from ..functions.hashing import SQL_SHINGLES, SQL_WORDS, md5_mod, shingles, words
from .registry import query

# ---------------------------------------------------------------------------
# docs_good_turing — frequency-of-frequencies and Good-Turing smoothing
# ---------------------------------------------------------------------------

_GT_MAX_R = 10  # report the smoothed head of the count-of-counts table


@query(
    "docs_good_turing",
    oracle=f"""
    WITH ex AS (
      SELECT unnest({SQL_SHINGLES('text', 3)}) AS word FROM documents),
    wc AS (SELECT word, count(*) AS r FROM ex GROUP BY word),
    fof AS (SELECT r, CAST(count(*) AS BIGINT) AS n_r FROM wc GROUP BY r),
    tot AS (
      SELECT CAST(sum(r * n_r) AS BIGINT) AS n_tokens,
             CAST(sum(n_r) AS BIGINT) AS vocab_size
      FROM fof)
    SELECT f.r, f.n_r,
      CAST(coalesce(g.n_r, 0) AS BIGINT) AS n_r_next,
      CAST((f.r + 1) * coalesce(g.n_r, 0) AS DOUBLE) / f.n_r AS r_star,
      t.n_tokens, t.vocab_size,
      CAST((SELECT n_r FROM fof WHERE r = 1) AS DOUBLE) / t.n_tokens
        AS p0_unseen
    FROM fof f LEFT JOIN fof g ON g.r = f.r + 1 CROSS JOIN tot t
    WHERE f.r <= {_GT_MAX_R}
    """,
    tags=("text", "B15", "stats", "language-model"),
)
def docs_good_turing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Good-Turing frequency-of-frequencies table (Good 1953; the
    Katz-backoff building block) over word-trigram events: for each
    trigram count r <= 10, the number of distinct trigrams N_r seen
    exactly r times, the smoothed count r* = (r+1) N_{r+1} / N_r, and
    the leave-one-out unseen-mass estimate p0 = N_1 / N — the standard
    answer to "how much of the language has this corpus NOT seen yet",
    which is the quantity a training-data curator watches while
    deciding whether more crawl is still adding novel text. (Trigrams,
    not unigrams: the fixture's unigram vocabulary is closed — every
    word repeats 26+ times — so the singleton head the estimator feeds
    on only exists at the n-gram level, exactly as in real corpora
    where unigram mass saturates long before n-gram mass.)

    All counts are exact integers from two keyed aggregates
    (trigram-count, then count-of-counts); r* and p0 are each one
    final division. N_1 folds into the SAME 1-row totals aggregate
    (sum of n_r where r = 1) rather than a separate filtered frame —
    a corpus with no singleton trigrams then yields NULL p0_unseen on
    every row, matching the oracle's scalar subquery, instead of an
    empty crossJoin silently dropping the whole result set. Scale
    shape: explode -> groupBy(trigram) -> groupBy(r); the
    count-of-counts table has O(max count) rows, so the self-join for
    N_{r+1} broadcasts a vanishingly small relation. No window, no
    sort, no collect at any size."""
    ex = load_table(spark, sf_dir, "documents").select(
        F.explode(shingles("text", 3)).alias("word")
    )
    wc = ex.groupBy("word").agg(F.count("*").alias("r"))
    # fof feeds three consumers (totals, the shifted N_{r+1} relation,
    # and the report rows); materialize the O(max count)-row table once
    # so the trigram explode + two aggregates derive once, not three
    # times.
    fof = (
        wc.groupBy("r")
        .agg(F.count("*").cast("long").alias("n_r"))
        .localCheckpoint(eager=False)
    )
    tot = fof.agg(
        F.sum(F.col("r") * F.col("n_r")).cast("long").alias("n_tokens"),
        F.sum("n_r").cast("long").alias("vocab_size"),
        F.sum(F.when(F.col("r") == 1, F.col("n_r")))
        .cast("long")
        .alias("_n1"),
    )
    nxt = fof.select(
        (F.col("r") - 1).alias("r"), F.col("n_r").alias("_nr_next")
    )
    return (
        fof.filter(F.col("r") <= _GT_MAX_R)
        .join(F.broadcast(nxt), "r", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "r",
            "n_r",
            F.coalesce(F.col("_nr_next"), F.lit(0)).cast("long").alias("n_r_next"),
            (
                ((F.col("r") + 1) * F.coalesce(F.col("_nr_next"), F.lit(0))).cast(
                    "double"
                )
                / F.col("n_r")
            ).alias("r_star"),
            "n_tokens",
            "vocab_size",
            (F.col("_n1").cast("double") / F.col("n_tokens")).alias("p0_unseen"),
        )
    )


# ---------------------------------------------------------------------------
# docs_heaps_law — vocabulary-growth (Heaps' law) fit V(N) = k * N^beta
# ---------------------------------------------------------------------------

_HEAPS_BLK = 64  # doc_ids per band in the prefix decomposition
_LN_SCALE = 10_000  # 1e-4 quantization of ln keeps sum-of-products in int64


def _ln_q(col):
    """round(round(ln(x), 8) * 1e4) as an exact int64 (x >= 1 everywhere
    here, so the value is non-negative and half-up/half-away agree)."""
    return F.round(F.round(F.log(col.cast("double")), 8) * _LN_SCALE, 0).cast(
        "long"
    )


def _sql_ln_q(expr: str) -> str:
    return (
        f"CAST(round(round(ln(CAST({expr} AS DOUBLE)), 8) * {_LN_SCALE}, 0)"
        f" AS BIGINT)"
    )


@query(
    "docs_heaps_law",
    oracle=f"""
    WITH d AS (SELECT doc_id, {SQL_WORDS('text')} AS w FROM documents),
    tc AS (SELECT doc_id, len(w) AS n_tok FROM d),
    ex AS (SELECT doc_id, unnest(w) AS word FROM d),
    fd AS (SELECT word, min(doc_id) AS fdoc FROM ex GROUP BY word),
    nw AS (SELECT fdoc AS doc_id, count(*) AS nv FROM fd GROUP BY fdoc),
    pd AS (
      SELECT tc.doc_id, tc.n_tok, coalesce(nw.nv, 0) AS nv
      FROM tc LEFT JOIN nw USING (doc_id)),
    cum AS (
      SELECT sum(n_tok) OVER (ORDER BY doc_id) AS cn,
             sum(nv) OVER (ORDER BY doc_id) AS cv
      FROM pd),
    q AS (SELECT {_sql_ln_q('cn')} AS xq, {_sql_ln_q('cv')} AS yq FROM cum),
    s AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
        CAST(sum(xq) AS BIGINT) AS sx, CAST(sum(yq) AS BIGINT) AS sy,
        CAST(sum(xq * xq) AS BIGINT) AS sxx,
        CAST(sum(xq * yq) AS BIGINT) AS sxy,
        CAST(sum(yq * yq) AS BIGINT) AS syy
      FROM q),
    t AS (
      SELECT CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(n_tok) AS BIGINT) AS n_tokens,
             (SELECT CAST(count(*) AS BIGINT) FROM fd) AS vocab_size
      FROM pd),
    fit AS (
      SELECT n_docs, n_tokens, vocab_size,
        (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
          / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx) AS beta,
        CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy AS covn,
        CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx AS varx,
        CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy AS vary,
        CAST(sy AS DOUBLE) AS syd, CAST(sx AS DOUBLE) AS sxd,
        CAST(n AS DOUBLE) AS nd
      FROM s CROSS JOIN t)
    SELECT n_docs, n_tokens, vocab_size,
      beta AS heaps_beta,
      (syd - beta * sxd) / (nd * {_LN_SCALE}) AS heaps_lnk,
      (covn * covn) / (varx * vary) AS fit_r2
    FROM fit
    """,
    tags=("text", "B15", "stats", "scaling-law"),
)
def docs_heaps_law(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps'-law vocabulary-growth fit V(N) ~ k * N^beta (Heaps 1978)
    over the corpus in doc_id order: the scaling-law diagnostic a
    curator fits to decide how much NEW vocabulary each additional
    terabyte of crawl buys (beta well below 1 = vocabulary saturating).

    The cumulative (tokens N, vocabulary V) curve is computed WITHOUT
    re-scanning prefixes via the first-appearance decomposition: V(d)
    = #{words whose min(doc_id) <= d}, so one groupBy(word) -> min,
    one groupBy(first doc) -> count, and a single cumulative sum give
    every checkpoint in one pass. The global cumsum over doc_id is the
    two-phase block-prefix device (64-doc bands, exclusive prefix over
    the tiny band table, band-partitioned within-window) — no
    single-partition sort at any size. The log-log OLS runs on
    1e-4-quantized 8-decimal-rounded logs of exact integers, so every
    moment (sx, sy, sxx, sxy, syy) is an order-independent int64 sum
    (exact to ~1e8 documents); beta / ln k / r^2 are then single
    shared IEEE expressions — bit-equal cross-engine."""
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", words(F.col("text")).alias("w")
    )
    tc = d.select("doc_id", F.size("w").alias("n_tok"))
    ex = d.select("doc_id", F.explode("w").alias("word"))
    fd = ex.groupBy("word").agg(F.min("doc_id").alias("fdoc"))
    nw = fd.groupBy(F.col("fdoc").alias("doc_id")).agg(
        F.count("*").alias("nv")
    )
    pd_ = tc.join(nw, "doc_id", "left").select(
        "doc_id", "n_tok", F.coalesce(F.col("nv"), F.lit(0)).alias("nv")
    )
    b = pd_.withColumn("_blk", (F.col("doc_id") / _HEAPS_BLK).cast("long"))
    blocks = b.groupBy("_blk").agg(
        F.sum("n_tok").alias("_bn"), F.sum("nv").alias("_bv")
    )
    wb = bounded_window("_blk", "_blk").rowsBetween(
        Window.unboundedPreceding, -1
    )
    prior = blocks.select(
        "_blk",
        F.coalesce(F.sum("_bn").over(wb), F.lit(0)).alias("_pn"),
        F.coalesce(F.sum("_bv").over(wb), F.lit(0)).alias("_pv"),
    )
    ww = (
        Window.partitionBy("_blk")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = b.join(F.broadcast(prior), "_blk").select(
        (F.col("_pn") + F.sum("n_tok").over(ww)).alias("cn"),
        (F.col("_pv") + F.sum("nv").over(ww)).alias("cv"),
    )
    q = cum.select(_ln_q(F.col("cn")).alias("xq"), _ln_q(F.col("cv")).alias("yq"))
    s = q.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("xq").cast("long").alias("sx"),
        F.sum("yq").cast("long").alias("sy"),
        F.sum(F.col("xq") * F.col("xq")).cast("long").alias("sxx"),
        F.sum(F.col("xq") * F.col("yq")).cast("long").alias("sxy"),
        F.sum(F.col("yq") * F.col("yq")).cast("long").alias("syy"),
    )
    tot = pd_.agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("n_tok").cast("long").alias("n_tokens"),
    ).crossJoin(
        F.broadcast(fd.agg(F.count("*").cast("long").alias("vocab_size")))
    )
    nd = F.col("n").cast("double")
    sxd = F.col("sx").cast("double")
    syd = F.col("sy").cast("double")
    covn = nd * F.col("sxy").cast("double") - sxd * syd
    varx = nd * F.col("sxx").cast("double") - sxd * sxd
    vary = nd * F.col("syy").cast("double") - syd * syd
    beta = covn / varx
    return (
        s.crossJoin(F.broadcast(tot))
        .select(
            "n_docs",
            "n_tokens",
            "vocab_size",
            beta.alias("heaps_beta"),
            ((syd - beta * sxd) / (nd * _LN_SCALE)).alias("heaps_lnk"),
            ((covn * covn) / (varx * vary)).alias("fit_r2"),
        )
    )


# ---------------------------------------------------------------------------
# events_mannwhitney_value — exact tie-corrected Mann-Whitney U rank test
# ---------------------------------------------------------------------------

_MW_A = "view"
_MW_B = "click"
_MW_BLK = 8.0  # value-band width for the prefix decomposition
_MW_Z95 = 1.96


@query(
    "events_mannwhitney_value",
    oracle=f"""
    WITH v AS (
      SELECT event_type, value AS v FROM events
      WHERE event_type IN ('{_MW_A}', '{_MW_B}')),
    counts AS (
      SELECT v,
        CAST(sum(CASE WHEN event_type = '{_MW_A}' THEN 1 ELSE 0 END)
             AS BIGINT) AS ca,
        CAST(sum(CASE WHEN event_type = '{_MW_B}' THEN 1 ELSE 0 END)
             AS BIGINT) AS cb
      FROM v GROUP BY v),
    cum AS (
      SELECT ca, cb, ca + cb AS t,
        sum(ca + cb) OVER (ORDER BY v) - (ca + cb) AS below
      FROM counts),
    s AS (
      SELECT CAST(sum(ca) AS BIGINT) AS n_a, CAST(sum(cb) AS BIGINT) AS n_b,
        CAST(sum(ca * (2 * below + t + 1)) AS BIGINT) AS ra2,
        CAST(sum(t * t * t - t) AS BIGINT) AS tie_sum
      FROM cum),
    z AS (
      SELECT n_a, n_b, ra2 - n_a * (n_a + 1) AS u2, tie_sum,
        n_a + n_b AS n,
        CAST(n_a AS DOUBLE) * n_b / 12.0
          * ((n_a + n_b + 1)
             - CAST(tie_sum AS DOUBLE)
               / (CAST(n_a + n_b AS DOUBLE) * (n_a + n_b - 1))) AS var_u
      FROM s)
    SELECT n_a, n_b,
      CAST(u2 AS DOUBLE) / 2 AS u_stat,
      tie_sum,
      CAST(u2 - CAST(n_a AS BIGINT) * n_b AS DOUBLE)
        / (2 * sqrt(var_u)) AS z_score,
      abs(CAST(u2 - CAST(n_a AS BIGINT) * n_b AS DOUBLE)
          / (2 * sqrt(var_u))) > {_MW_Z95} AS shift_detected
    FROM z
    """,
    tags=("events", "B7", "stats", "drift"),
)
def events_mannwhitney_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT tie-corrected Mann-Whitney U test (Mann & Whitney 1947)
    between the 'view' and 'click' event-value distributions — the
    rank-based (outlier-robust) complement of docs_ks_drift_by_source's
    CDF-supremum test: KS asks "do the distributions differ anywhere",
    MWU asks "is one stochastically larger".

    Integer-exact throughout: per distinct value the doubled average
    midrank is 2*below + t + 1 (an integer — no /2 per row), so the
    rank-sum 2*R_a, U-numerator 2U - 2*mean = u2 - n_a*n_b, and the
    tie-correction sum(t^3 - t) are all order-independent int64 sums;
    the normal-approximation z with tie-corrected variance is one
    shared IEEE expression at the end (sqrt is correctly rounded in
    both engines).

    Scale shape: one keyed aggregate over distinct values, then the
    global below-count cumsum is the two-phase block-prefix device
    (8.0-wide value bands, exclusive prefix over the tiny band table,
    band-partitioned within-window) — no single-partition sort; the
    final test statistic is a plain aggregate."""
    v = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type").isin(_MW_A, _MW_B))
        .select("event_type", F.col("value").alias("v"))
    )
    counts = v.groupBy("v").agg(
        F.sum(F.when(F.col("event_type") == _MW_A, 1).otherwise(0))
        .cast("long")
        .alias("ca"),
        F.sum(F.when(F.col("event_type") == _MW_B, 1).otherwise(0))
        .cast("long")
        .alias("cb"),
    )
    b = counts.withColumn("_blk", F.floor(F.col("v") / _MW_BLK).cast("long"))
    blocks = b.groupBy("_blk").agg(F.sum(F.col("ca") + F.col("cb")).alias("_bt"))
    wb = bounded_window("_blk", "_blk").rowsBetween(
        Window.unboundedPreceding, -1
    )
    prior = blocks.select(
        "_blk", F.coalesce(F.sum("_bt").over(wb), F.lit(0)).alias("_pt")
    )
    ww = (
        Window.partitionBy("_blk")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    t = F.col("ca") + F.col("cb")
    cum = b.join(F.broadcast(prior), "_blk").select(
        "ca",
        "cb",
        t.alias("t"),
        (F.col("_pt") + F.sum(t).over(ww) - t).alias("below"),
    )
    s = cum.agg(
        F.sum("ca").cast("long").alias("n_a"),
        F.sum("cb").cast("long").alias("n_b"),
        F.sum(F.col("ca") * (2 * F.col("below") + F.col("t") + 1))
        .cast("long")
        .alias("ra2"),
        F.sum(F.col("t") * F.col("t") * F.col("t") - F.col("t"))
        .cast("long")
        .alias("tie_sum"),
    )
    u2 = F.col("ra2") - F.col("n_a") * (F.col("n_a") + 1)
    n_ab = F.col("n_a") + F.col("n_b")
    var_u = (
        F.col("n_a").cast("double")
        * F.col("n_b")
        / 12.0
        * (
            (n_ab + 1)
            - F.col("tie_sum").cast("double")
            / (n_ab.cast("double") * (n_ab - 1))
        )
    )
    z = (u2 - F.col("n_a") * F.col("n_b")).cast("double") / (
        2 * F.sqrt(var_u)
    )
    return s.select(
        "n_a",
        "n_b",
        (u2.cast("double") / 2).alias("u_stat"),
        "tie_sum",
        z.alias("z_score"),
        (F.abs(z) > _MW_Z95).alias("shift_detected"),
    )


# ---------------------------------------------------------------------------
# orders_conformal_interval — Mondrian split-conformal prediction intervals
# ---------------------------------------------------------------------------

_CF_ALPHA_NUM = 9  # 1 - alpha = 9/10 target coverage
_CF_BLK = 1 << 30  # scaled-residual band width for the prefix device


def _register_conformal() -> None:
    from ..functions.exact import dec2
    from ..functions.hashing import SQL_MD5_MOD

    split_sql = f"({SQL_MD5_MOD('CAST(o_orderkey AS VARCHAR)')}) % 10"

    @query(
        "orders_conformal_interval",
        oracle=f"""
        WITH o AS (
          SELECT o_orderpriority,
            CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
              AS cents,
            {split_sql} AS sp
          FROM orders),
        tr AS (
          SELECT o_orderpriority,
            CAST(count(*) AS BIGINT) AS n_tr,
            CAST(sum(cents) AS BIGINT) AS s_tr
          FROM o WHERE sp < 6 GROUP BY o_orderpriority),
        cal AS (
          SELECT o.o_orderpriority,
            abs(o.cents * tr.n_tr - tr.s_tr) AS r
          FROM o JOIN tr USING (o_orderpriority) WHERE sp IN (6, 7)),
        nc AS (
          SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_cal,
            CAST(ceil({_CF_ALPHA_NUM} * (count(*) + 1) / 10.0) AS BIGINT)
              AS k_rank
          FROM cal GROUP BY o_orderpriority),
        rc AS (
          SELECT o_orderpriority, r, count(*) AS cnt FROM cal
          GROUP BY o_orderpriority, r),
        cum AS (
          SELECT o_orderpriority, r,
            sum(cnt) OVER (PARTITION BY o_orderpriority ORDER BY r) AS cr
          FROM rc),
        qh AS (
          SELECT cum.o_orderpriority, min(r) AS qhat
          FROM cum JOIN nc USING (o_orderpriority)
          WHERE cr >= k_rank GROUP BY cum.o_orderpriority),
        te AS (
          SELECT o.o_orderpriority,
            CAST(count(*) AS BIGINT) AS n_test,
            CAST(sum(CASE WHEN abs(o.cents * tr.n_tr - tr.s_tr) <= qh.qhat
                     THEN 1 ELSE 0 END) AS BIGINT) AS covered
          FROM o JOIN tr USING (o_orderpriority)
               JOIN qh ON qh.o_orderpriority = o.o_orderpriority
          WHERE sp >= 8 GROUP BY o.o_orderpriority)
        SELECT te.o_orderpriority, tr.n_tr AS n_train, nc.n_cal, nc.k_rank,
          te.n_test, te.covered,
          CAST(qh.qhat AS DOUBLE) / (100 * tr.n_tr) AS qhat_dollars,
          CAST(te.covered AS DOUBLE) / te.n_test AS coverage,
          CAST(nc.k_rank AS DOUBLE) / (nc.n_cal + 1) AS guarantee_level
        FROM te JOIN tr USING (o_orderpriority)
          JOIN nc USING (o_orderpriority) JOIN qh USING (o_orderpriority)
        """,
        tags=("orders", "B7", "stats", "ml-eval", "conformal"),
    )
    def orders_conformal_interval(
        spark: SparkSession, sf_dir: str
    ) -> DataFrame:
        """Mondrian (per-group) split-conformal prediction intervals
        (Vovk 2005; Lei et al. 2018) for order totals: a deterministic
        60/20/20 md5 hash split trains a per-priority mean model,
        calibrates the absolute-residual quantile q-hat at the exact
        finite-sample rank k = ceil(0.9 (n_cal + 1)), and reports
        held-out empirical coverage of [pred - q, pred + q] — the
        distribution-free interval whose >= 90% coverage guarantee
        holds for ANY model, which is how a pipeline certifies its
        anomaly thresholds without normality assumptions.

        Integer-exact trick: residuals are kept scaled by n_train —
        |cents * n_tr - s_tr| — so the model mean never becomes a
        float; the k-th order statistic, the coverage comparison, and
        every count are pure int64 (exact while cents * n_train <
        2^63, i.e. past 10^10 rows per group); the reported dollars /
        coverage / guarantee are single final divisions.

        Scale shape: split and residuals are map-side; the per-priority
        k-th-smallest residual uses the two-phase block-prefix device
        over 2^30-wide scaled-residual bands (exclusive prefix over the
        tiny (priority, band) table, band-partitioned within-window),
        so the calibration set is never sorted in one partition; the
        5-row model/q-hat tables broadcast to the test scan."""
        # Single-derivation shape: o (scan + md5 split) feeds the train
        # aggregate, the calibration residuals, and the test scan — and
        # the tiny tr/nc/qh relations are each consumed by 2-3 joins.
        # Un-checkpointed, the final 4-way join re-derived the whole
        # chain per branch (82 Exchanges in the before plan).
        o = (
            load_table(spark, sf_dir, "orders")
            .select(
                "o_orderpriority",
                (dec2("o_totalprice") * 100).cast("long").alias("cents"),
                (md5_mod(F.col("o_orderkey").cast("string")) % 10).alias("sp"),
            )
            .localCheckpoint(eager=False)
        )
        tr = (
            o.filter(F.col("sp") < 6)
            .groupBy("o_orderpriority")
            .agg(
                F.count("*").cast("long").alias("n_tr"),
                F.sum("cents").cast("long").alias("s_tr"),
            )
            .localCheckpoint(eager=False)
        )
        cal = (
            o.filter(F.col("sp").isin(6, 7))
            .join(F.broadcast(tr), "o_orderpriority")
            .select(
                "o_orderpriority",
                F.abs(F.col("cents") * F.col("n_tr") - F.col("s_tr")).alias(
                    "r"
                ),
            )
            .localCheckpoint(eager=False)
        )
        nc = cal.groupBy("o_orderpriority").agg(
            F.count("*").cast("long").alias("n_cal"),
            F.ceil(_CF_ALPHA_NUM * (F.count("*") + 1) / 10.0)
            .cast("long")
            .alias("k_rank"),
        ).localCheckpoint(eager=False)
        rc = cal.groupBy("o_orderpriority", "r").agg(
            F.count("*").alias("cnt")
        )
        b = rc.withColumn("_blk", (F.col("r") / _CF_BLK).cast("long"))
        blocks = b.groupBy("o_orderpriority", "_blk").agg(
            F.sum("cnt").alias("_bc")
        )
        wb = (
            Window.partitionBy("o_orderpriority")
            .orderBy("_blk")
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        prior = blocks.select(
            "o_orderpriority",
            "_blk",
            F.coalesce(F.sum("_bc").over(wb), F.lit(0)).alias("_pc"),
        )
        ww = (
            Window.partitionBy("o_orderpriority", "_blk")
            .orderBy("r")
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        cum = b.join(F.broadcast(prior), ["o_orderpriority", "_blk"]).select(
            "o_orderpriority",
            "r",
            (F.col("_pc") + F.sum("cnt").over(ww)).alias("cr"),
        )
        qh = (
            cum.join(F.broadcast(nc), "o_orderpriority")
            .filter(F.col("cr") >= F.col("k_rank"))
            .groupBy("o_orderpriority")
            .agg(F.min("r").alias("qhat"))
            .localCheckpoint(eager=False)
        )
        te = (
            o.filter(F.col("sp") >= 8)
            .join(F.broadcast(tr), "o_orderpriority")
            .join(F.broadcast(qh), "o_orderpriority")
            .groupBy("o_orderpriority")
            .agg(
                F.count("*").cast("long").alias("n_test"),
                F.sum(
                    F.when(
                        F.abs(
                            F.col("cents") * F.col("n_tr") - F.col("s_tr")
                        )
                        <= F.col("qhat"),
                        1,
                    ).otherwise(0)
                )
                .cast("long")
                .alias("covered"),
            )
        )
        return (
            te.join(F.broadcast(tr), "o_orderpriority")
            .join(F.broadcast(nc), "o_orderpriority")
            .join(F.broadcast(qh), "o_orderpriority")
            .select(
                "o_orderpriority",
                F.col("n_tr").alias("n_train"),
                "n_cal",
                "k_rank",
                "n_test",
                "covered",
                (F.col("qhat").cast("double") / (100 * F.col("n_tr"))).alias(
                    "qhat_dollars"
                ),
                (F.col("covered").cast("double") / F.col("n_test")).alias(
                    "coverage"
                ),
                (
                    F.col("k_rank").cast("double") / (F.col("n_cal") + 1)
                ).alias("guarantee_level"),
            )
        )


_register_conformal()


# ---------------------------------------------------------------------------
# events_permutation_test — deterministic hash-relabel permutation test
# ---------------------------------------------------------------------------

_PT_A = "view"
_PT_B = "click"
_PT_B_PERMS = 99  # p-value resolution 1/(B+1) = 0.01


def _register_permutation_test() -> None:
    from ..functions.exact import dec2
    from ..functions.hashing import SQL_MD5_MOD

    asn_sql = SQL_MD5_MOD("CAST(event_id AS VARCHAR) || ':' || CAST(b AS VARCHAR)")

    @query(
        "events_permutation_test",
        oracle=f"""
        WITH ev AS (
          SELECT event_id, event_type,
            CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
          FROM events WHERE event_type IN ('{_PT_A}', '{_PT_B}')),
        obs AS (
          SELECT
            CAST(sum(CASE WHEN event_type = '{_PT_A}' THEN 1 ELSE 0 END)
                 AS BIGINT) AS n_a,
            CAST(sum(CASE WHEN event_type = '{_PT_B}' THEN 1 ELSE 0 END)
                 AS BIGINT) AS n_b,
            CAST(sum(CASE WHEN event_type = '{_PT_A}' THEN cents ELSE 0 END)
                 AS BIGINT) AS s_a,
            CAST(sum(CASE WHEN event_type = '{_PT_B}' THEN cents ELSE 0 END)
                 AS BIGINT) AS s_b
          FROM ev),
        perms AS (
          SELECT b, ({asn_sql}) % 2 AS asn, cents
          FROM ev CROSS JOIN (SELECT unnest(range(1, {_PT_B_PERMS} + 1)) AS b)),
        per_b AS (
          SELECT b,
            CAST(sum(CASE WHEN asn = 0 THEN 1 ELSE 0 END) AS BIGINT) AS na,
            CAST(sum(CASE WHEN asn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS nb,
            CAST(sum(CASE WHEN asn = 0 THEN cents ELSE 0 END) AS BIGINT)
              AS sa,
            CAST(sum(CASE WHEN asn = 1 THEN cents ELSE 0 END) AS BIGINT)
              AS sb
          FROM perms GROUP BY b),
        cmp AS (
          SELECT CAST(count(*) AS BIGINT) AS n_ge
          FROM per_b, obs
          WHERE abs(CAST(sa AS DOUBLE) / na - CAST(sb AS DOUBLE) / nb)
            >= abs(CAST(s_a AS DOUBLE) / n_a - CAST(s_b AS DOUBLE) / n_b))
        SELECT o.n_a, o.n_b,
          (CAST(o.s_a AS DOUBLE) / o.n_a - CAST(o.s_b AS DOUBLE) / o.n_b)
            / 100 AS obs_diff_dollars,
          CAST({_PT_B_PERMS} AS BIGINT) AS n_perms, c.n_ge,
          CAST(1 + c.n_ge AS DOUBLE) / (1 + {_PT_B_PERMS}) AS p_value
        FROM obs o CROSS JOIN cmp c
        """,
        tags=("events", "B7", "stats", "drift"),
    )
    def events_permutation_test(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Deterministic two-sample permutation test (Fisher 1935) on
        the 'view' vs 'click' mean event value: the distribution-free
        companion to events_mannwhitney_value's rank test — MWU asks
        about stochastic ordering, this asks about the MEAN difference
        under the exact null that labels are exchangeable. Instead of
        RNG permutations (irreproducible across engines), each of the
        99 relabelings assigns every event by md5(event_id:b) % 2 —
        a fixed, seedless family both engines replay bit-for-bit, the
        same device as the registry's hash train/test splits; p =
        (1 + #{|perm diff| >= |observed|}) / (B+1), Monte-Carlo-valid
        by the usual add-one correction.

        Exactness: all sums/counts are int64 (cents); each permutation
        statistic is the shared two-division IEEE expression, and the
        >= comparison feeds an integer count — no accumulation of
        floats anywhere. Scale shape: explode x99 is map-side CPU;
        the per-permutation aggregate has map-side partial combine so
        the shuffle carries at most 99 rows per partition; the final
        comparison joins two 1-row broadcasts. No window, no sort."""
        ev = (
            load_table(spark, sf_dir, "events")
            .filter(F.col("event_type").isin(_PT_A, _PT_B))
            .select(
                "event_id",
                "event_type",
                (dec2("value") * 100).cast("long").alias("cents"),
            )
        )
        obs = ev.agg(
            F.sum(F.when(F.col("event_type") == _PT_A, 1).otherwise(0))
            .cast("long")
            .alias("n_a"),
            F.sum(F.when(F.col("event_type") == _PT_B, 1).otherwise(0))
            .cast("long")
            .alias("n_b"),
            F.sum(
                F.when(F.col("event_type") == _PT_A, F.col("cents")).otherwise(0)
            )
            .cast("long")
            .alias("s_a"),
            F.sum(
                F.when(F.col("event_type") == _PT_B, F.col("cents")).otherwise(0)
            )
            .cast("long")
            .alias("s_b"),
        )
        perms = ev.select(
            "event_id",
            "cents",
            F.explode(F.sequence(F.lit(1), F.lit(_PT_B_PERMS))).alias("b"),
        ).select(
            "b",
            "cents",
            (
                md5_mod(
                    F.concat(
                        F.col("event_id").cast("string"),
                        F.lit(":"),
                        F.col("b").cast("string"),
                    )
                )
                % 2
            ).alias("asn"),
        )
        per_b = perms.groupBy("b").agg(
            F.sum(F.when(F.col("asn") == 0, 1).otherwise(0))
            .cast("long")
            .alias("na"),
            F.sum(F.when(F.col("asn") == 1, 1).otherwise(0))
            .cast("long")
            .alias("nb"),
            F.sum(F.when(F.col("asn") == 0, F.col("cents")).otherwise(0))
            .cast("long")
            .alias("sa"),
            F.sum(F.when(F.col("asn") == 1, F.col("cents")).otherwise(0))
            .cast("long")
            .alias("sb"),
        )
        obs_diff = F.col("s_a").cast("double") / F.col("n_a") - F.col(
            "s_b"
        ).cast("double") / F.col("n_b")
        perm_diff = F.col("sa").cast("double") / F.col("na") - F.col(
            "sb"
        ).cast("double") / F.col("nb")
        cmp = (
            per_b.crossJoin(F.broadcast(obs))
            .filter(F.abs(perm_diff) >= F.abs(obs_diff))
            .agg(F.count(F.lit(1)).cast("long").alias("n_ge"))
        )
        return obs.crossJoin(F.broadcast(cmp)).select(
            "n_a",
            "n_b",
            (obs_diff / 100).alias("obs_diff_dollars"),
            F.lit(_PT_B_PERMS).cast("long").alias("n_perms"),
            "n_ge",
            ((1 + F.col("n_ge")).cast("double") / (1 + _PT_B_PERMS)).alias(
                "p_value"
            ),
        )


_register_permutation_test()


# ---------------------------------------------------------------------------
# orders_theil_sen — robust pairwise-median trend of daily revenue
# ---------------------------------------------------------------------------

_TS_EPOCH = "1995-01-01"  # fixture's first order day
_TS_BLK = 256.0  # cents-per-day band width for the prefix device


def _register_theil_sen() -> None:
    from ..functions.exact import dec2

    @query(
        "orders_theil_sen",
        oracle=f"""
        WITH day AS (
          SELECT date_diff('day', DATE '{_TS_EPOCH}',
                           CAST(o_orderdate AS DATE)) AS d,
            CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)) * 100) AS BIGINT)
              AS c
          FROM orders GROUP BY 1),
        pairs AS (
          SELECT (b.c - a.c) / CAST(b.d - a.d AS DOUBLE) AS slope
          FROM day a JOIN day b ON a.d < b.d),
        m AS (
          SELECT CAST(count(*) AS BIGINT) AS n_pairs,
            CAST((count(*) + 1) // 2 AS BIGINT) AS k1,
            CAST(count(*) // 2 + 1 AS BIGINT) AS k2
          FROM pairs),
        sc AS (SELECT slope, count(*) AS cnt FROM pairs GROUP BY slope),
        cum AS (
          SELECT slope, sum(cnt) OVER (ORDER BY slope) AS cr FROM sc),
        med AS (
          SELECT min(CASE WHEN cr >= k1 THEN slope END) AS v1,
                 min(CASE WHEN cr >= k2 THEN slope END) AS v2
          FROM cum, m),
        ols AS (
          SELECT CAST(count(*) AS BIGINT) AS n_days,
            CAST(sum(d) AS BIGINT) AS sd, CAST(sum(c) AS BIGINT) AS sc_,
            CAST(sum(d * d) AS BIGINT) AS sdd,
            CAST(sum(d * c) AS BIGINT) AS sdc
          FROM day)
        SELECT ols.n_days, m.n_pairs,
          (med.v1 + med.v2) / 2 / 100 AS theil_sen_dollars_per_day,
          (CAST(ols.n_days AS DOUBLE) * sdc - CAST(sd AS DOUBLE) * sc_)
            / (CAST(ols.n_days AS DOUBLE) * sdd - CAST(sd AS DOUBLE) * sd)
            / 100 AS ols_dollars_per_day
        FROM med CROSS JOIN m CROSS JOIN ols
        """,
        tags=("orders", "B7", "stats", "timeseries"),
    )
    def orders_theil_sen(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Theil-Sen robust trend estimator (Theil 1950; Sen 1968) of
        daily order revenue: the exact median over ALL pairwise
        day-to-day slopes, reported next to the OLS slope — the
        estimator of choice when a handful of anomalous days (flash
        sales, outages) would drag a least-squares trend, since its
        breakdown point is ~29% vs OLS's 0%.

        Exactness: day revenues are exact cents; each pairwise slope
        is ONE IEEE division of exact integers (bit-equal
        cross-engine, and a valid group-by key for the same reason);
        the median is the exact two-middle-order-statistics selection
        via cumulative counts — (v1 + v2) / 2 is the single shared
        final expression; the OLS contrast comes from int64 moment
        sums. Scale shape: the day table is CALENDAR-bounded (~2.4k
        rows for the fixture's 6.6-year span at ANY data scale — 100
        TB of orders still has the same days), so the O(days^2) pair
        enumeration is a bounded ~3M-row broadcast self-join, not a
        data-scale blowup; the slope-median cumsum runs the block-
        prefix device over 256-cents/day bands; everything upstream
        (the per-day aggregate) is one keyed shuffle of the orders
        table with map-side combine."""
        # Materialize the calendar-bounded day table ONCE (≤ ~2.4k rows):
        # it feeds both sides of the pair self-join AND the OLS moment
        # aggregate — three orders scans + day aggregates in the r18
        # before-plan (guide §2.4/§5).
        day = (
            load_table(spark, sf_dir, "orders")
            .groupBy(
                F.datediff(
                    F.to_date("o_orderdate"), F.lit(_TS_EPOCH).cast("date")
                ).alias("d")
            )
            .agg(F.sum(dec2("o_totalprice") * 100).cast("long").alias("c"))
            .localCheckpoint(eager=False)
        )
        a = day.select(F.col("d").alias("du"), F.col("c").alias("cu"))
        b = day.select(F.col("d").alias("dv"), F.col("c").alias("cv"))
        # try_divide, not /: the optimizer may push this projection into
        # the nested-loop join's row iterator ahead of the du < dv
        # condition check, and ANSI division-by-zero aborts the task on
        # the du = dv pairs the condition is about to drop anyway.
        pairs = (
            a.join(F.broadcast(b), F.col("du") < F.col("dv"))
            .select(
                F.try_divide(
                    F.col("cv") - F.col("cu"),
                    (F.col("dv") - F.col("du")).cast("double"),
                ).alias("slope")
            )
        )
        # ONE pass over the O(days²) pair relation: the slope counts are
        # a sufficient statistic for the order-statistic selection, so
        # the pair total (and the two median ranks) derive from the
        # checkpointed count table instead of a second broadcast
        # nested-loop pass (the r18 before-plan enumerated the ~3M
        # pairs twice — once for m, once for sc).
        sc = (
            pairs.groupBy("slope")
            .agg(F.count(F.lit(1)).alias("cnt"))
            .localCheckpoint(eager=False)
        )
        m = sc.agg(
            F.sum("cnt").cast("long").alias("n_pairs"),
            F.floor((F.sum("cnt") + 1) / 2).cast("long").alias("k1"),
            (F.floor(F.sum("cnt") / 2) + 1).cast("long").alias("k2"),
        )
        blk = sc.withColumn(
            "_blk", F.floor(F.col("slope") / _TS_BLK).cast("long")
        )
        blocks = blk.groupBy("_blk").agg(F.sum("cnt").alias("_bc"))
        wb = bounded_window("_blk", "_blk").rowsBetween(
            Window.unboundedPreceding, -1
        )
        prior = blocks.select(
            "_blk", F.coalesce(F.sum("_bc").over(wb), F.lit(0)).alias("_pc")
        )
        ww = (
            Window.partitionBy("_blk")
            .orderBy("slope")
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        cum = blk.join(F.broadcast(prior), "_blk").select(
            "slope", (F.col("_pc") + F.sum("cnt").over(ww)).alias("cr")
        )
        med = cum.crossJoin(F.broadcast(m)).agg(
            F.min(
                F.when(F.col("cr") >= F.col("k1"), F.col("slope"))
            ).alias("v1"),
            F.min(
                F.when(F.col("cr") >= F.col("k2"), F.col("slope"))
            ).alias("v2"),
        )
        ols = day.agg(
            F.count(F.lit(1)).cast("long").alias("n_days"),
            F.sum("d").cast("long").alias("sd"),
            F.sum("c").cast("long").alias("sc_"),
            F.sum(F.col("d") * F.col("d")).cast("long").alias("sdd"),
            F.sum(F.col("d") * F.col("c")).cast("long").alias("sdc"),
        )
        nd = F.col("n_days").cast("double")
        sdd_ = F.col("sdd").cast("double")
        sdc_ = F.col("sdc").cast("double")
        sd_ = F.col("sd").cast("double")
        sc2 = F.col("sc_").cast("double")
        return (
            med.crossJoin(F.broadcast(m))
            .crossJoin(F.broadcast(ols))
            .select(
                "n_days",
                "n_pairs",
                ((F.col("v1") + F.col("v2")) / 2 / 100).alias(
                    "theil_sen_dollars_per_day"
                ),
                (
                    (nd * sdc_ - sd_ * sc2) / (nd * sdd_ - sd_ * sd_) / 100
                ).alias("ols_dollars_per_day"),
            )
        )


_register_theil_sen()


# ---------------------------------------------------------------------------
# events_kruskal_wallis — exact tie-corrected k-sample rank test
# ---------------------------------------------------------------------------

# chi-square 95th percentile at dof = 4 (the fixture's 5 event types).
_KW_CHI2_95 = 9.487729036781154
_KW_BLK = 8.0


@query(
    "events_kruskal_wallis",
    oracle=f"""
    WITH counts AS (
      SELECT value AS v, event_type, CAST(count(*) AS BIGINT) AS c
      FROM events GROUP BY 1, 2),
    vtot AS (SELECT v, CAST(sum(c) AS BIGINT) AS t FROM counts GROUP BY v),
    cum AS (
      SELECT v, t, sum(t) OVER (ORDER BY v) - t AS below FROM vtot),
    ranked AS (
      SELECT c.event_type,
        CAST(sum(c.c) AS BIGINT) AS n_j,
        CAST(sum(c.c * (2 * m.below + m.t + 1)) AS BIGINT) AS r2
      FROM counts c JOIN cum m ON c.v = m.v
      GROUP BY c.event_type),
    tot AS (
      SELECT CAST(sum(t) AS BIGINT) AS n,
        CAST(sum(t * t * t - t) AS BIGINT) AS tie_sum
      FROM vtot),
    terms AS (
      SELECT CAST(sum(CAST(round(
          CAST(r2 AS DOUBLE) * r2 / n_j, 0) AS BIGINT)) AS BIGINT) AS s,
        CAST(count(*) AS BIGINT) AS k
      FROM ranked),
    h AS (
      SELECT n, tie_sum, k,
        3.0 * s / (CAST(n AS DOUBLE) * (n + 1)) - 3.0 * (n + 1) AS h_stat,
        1 - CAST(tie_sum AS DOUBLE)
          / (CAST(n AS DOUBLE) * n * n - n) AS c_tie
      FROM terms CROSS JOIN tot)
    SELECT r.event_type, r.n_j,
      CAST(r.r2 AS DOUBLE) / (2 * r.n_j) AS mean_rank,
      h.n AS n_total, h.k - 1 AS dof, h.h_stat,
      h.h_stat / h.c_tie AS h_tie_corrected,
      h.h_stat / h.c_tie > {_KW_CHI2_95} AS groups_differ_95
    FROM ranked r CROSS JOIN h
    """,
    tags=("events", "B7", "stats", "drift"),
)
def events_kruskal_wallis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT tie-corrected Kruskal-Wallis H test (Kruskal & Wallis
    1952) across ALL five event types' value distributions — the
    k-sample generalization of events_mannwhitney_value: one omnibus
    rank test answering "do ANY of the k segments differ" before
    pairwise drill-down, against the chi-square(dof=4) 95% critical
    value.

    Integer-exact rank machinery as in the MWU query: per distinct
    value the doubled midrank is 2*below + t + 1 (no per-row /2), so
    each group's doubled rank-sum R2_j and the tie sum(t^3 - t) are
    order-independent int64 sums. The cross-group sum of R2_j^2/n_j
    would be an order-dependent 5-double sum, so each term is rounded
    to the nearest integer first (error <= 0.5/term on a statistic of
    scale n^2 — far below any decision threshold) making the sum exact
    int64 again; H, the tie correction 1 - sum(t^3-t)/(n^3-n), and the
    critical-value comparison are single shared IEEE expressions.

    Scale shape: one (value, type) keyed aggregate, the global
    below-count cumsum via the two-phase block-prefix device (8.0-wide
    value bands), one k-row aggregate, and a k-row x 1-row broadcast —
    no single-partition sort, no collect at any size."""
    counts = (
        load_table(spark, sf_dir, "events")
        .groupBy(F.col("value").alias("v"), "event_type")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    vtot = counts.groupBy("v").agg(F.sum("c").cast("long").alias("t"))
    b = vtot.withColumn("_blk", F.floor(F.col("v") / _KW_BLK).cast("long"))
    blocks = b.groupBy("_blk").agg(F.sum("t").alias("_bt"))
    wb = bounded_window("_blk", "_blk").rowsBetween(
        Window.unboundedPreceding, -1
    )
    prior = blocks.select(
        "_blk", F.coalesce(F.sum("_bt").over(wb), F.lit(0)).alias("_pt")
    )
    ww = (
        Window.partitionBy("_blk")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = b.join(F.broadcast(prior), "_blk").select(
        "v", "t", (F.col("_pt") + F.sum("t").over(ww) - F.col("t")).alias("below")
    )
    ranked = (
        counts.join(cum, "v")
        .groupBy("event_type")
        .agg(
            F.sum("c").cast("long").alias("n_j"),
            F.sum(F.col("c") * (2 * F.col("below") + F.col("t") + 1))
            .cast("long")
            .alias("r2"),
        )
    )
    tot = vtot.agg(
        F.sum("t").cast("long").alias("n"),
        F.sum(F.col("t") * F.col("t") * F.col("t") - F.col("t"))
        .cast("long")
        .alias("tie_sum"),
    )
    terms = ranked.agg(
        F.sum(
            F.round(
                F.col("r2").cast("double") * F.col("r2") / F.col("n_j"), 0
            ).cast("long")
        )
        .cast("long")
        .alias("s"),
        F.count(F.lit(1)).cast("long").alias("k"),
    )
    h = terms.crossJoin(F.broadcast(tot)).select(
        "n",
        "k",
        (
            3.0 * F.col("s") / (F.col("n").cast("double") * (F.col("n") + 1))
            - 3.0 * (F.col("n") + 1)
        ).alias("h_stat"),
        (
            1
            - F.col("tie_sum").cast("double")
            / (
                F.col("n").cast("double") * F.col("n") * F.col("n")
                - F.col("n")
            )
        ).alias("c_tie"),
    )
    return ranked.crossJoin(F.broadcast(h)).select(
        "event_type",
        "n_j",
        (F.col("r2").cast("double") / (2 * F.col("n_j"))).alias("mean_rank"),
        F.col("n").alias("n_total"),
        (F.col("k") - 1).alias("dof"),
        "h_stat",
        (F.col("h_stat") / F.col("c_tie")).alias("h_tie_corrected"),
        (F.col("h_stat") / F.col("c_tie") > _KW_CHI2_95).alias(
            "groups_differ_95"
        ),
    )


# ---------------------------------------------------------------------------
# events_jackknife_variance — delete-one-day grouped jackknife
# ---------------------------------------------------------------------------


@query(
    "events_jackknife_variance",
    oracle="""
    WITH day_stats AS (
      SELECT event_type, day(ts) AS d,
        CAST(sum(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT))
             AS BIGINT) AS s_cents,
        CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2),
    tot AS (
      SELECT event_type, sum(s_cents) AS S, sum(n) AS N,
             count(*) AS g
      FROM day_stats GROUP BY 1),
    theta AS (
      SELECT t.event_type, t.g, t.S, t.N,
        CAST(round((t.S - d.s_cents) / (100.0 * (t.N - d.n)), 6) * 1000000
             AS BIGINT) AS ti
      FROM day_stats d JOIN tot t USING (event_type)),
    acc AS (
      SELECT event_type, any_value(g) AS g, any_value(S) AS S,
        any_value(N) AS N,
        CAST(sum(ti) AS DECIMAL(38,0)) AS sum_t,
        CAST(sum(CAST(ti AS DECIMAL(38,0)) * ti) AS DECIMAL(38,0)) AS sum_t2
      FROM theta GROUP BY event_type)
    SELECT event_type, CAST(g AS BIGINT) AS n_days,
      CAST(round(S / (100.0 * N), 6) AS DOUBLE) AS mean_value,
      CAST(round((CAST(g AS DOUBLE) - 1) / g
          * (CAST(sum_t2 AS DOUBLE) - CAST(sum_t AS DOUBLE)
             * CAST(sum_t AS DOUBLE) / g) / 1e12, 8) AS DOUBLE) AS jk_var,
      CAST(round(sqrt((CAST(g AS DOUBLE) - 1) / g
          * (CAST(sum_t2 AS DOUBLE) - CAST(sum_t AS DOUBLE)
             * CAST(sum_t AS DOUBLE) / g) / 1e12), 6) AS DOUBLE) AS jk_se
    FROM acc ORDER BY event_type
    """,
    tags=("inference", "B15", "resampling", "jackknife"),
)
def events_jackknife_variance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delete-one-GROUP (day) jackknife variance of the per-type mean
    value — the resampling-based standard error that needs no
    distributional assumption and, unlike the bootstrap, no replicate
    randomness at all: leave each day out once, recompute the mean from
    the complement's TOTALS (θ_i = (S − S_i)/(N − n_i) — no second data
    pass), and v = (g−1)/g · Σ(θ_i − θ̄)². The day-grouped form is the
    right one for serially-correlated event streams (deleting single
    rows understates variance when rows within a day co-move).

    Determinism: cents-exact integer day totals; each θ_i is ONE shared
    float expression over exact integers, quantized to 1e-6 micro-units
    and re-accumulated as DECIMAL(38,0) (Σθ and Σθ² exact, no float
    accumulation order anywhere); the variance identity
    Σ(θ−θ̄)² = Σθ² − (Σθ)²/g evaluates as one final IEEE expression.

    Scale shape: one scan → day-keyed partial aggregate (≤31 rows per
    type) → broadcast totals join → 1-row-per-type result. The
    jackknife's classic O(g) recomputation collapses to arithmetic on
    the aggregate table — the formulation that survives 100 TB."""
    ev = load_table(spark, sf_dir, "events")
    cents = (F.col("value").cast("decimal(18,2)") * 100).cast("long")
    day_stats = ev.groupBy(
        "event_type", F.dayofmonth("ts").alias("d")
    ).agg(
        F.sum(cents).alias("s_cents"), F.count(F.lit(1)).alias("n_day")
    )
    tot = day_stats.groupBy("event_type").agg(
        F.sum("s_cents").alias("s_tot"),
        F.sum("n_day").alias("n_tot"),
        F.count(F.lit(1)).alias("g"),
    )
    theta = day_stats.join(F.broadcast(tot), "event_type").select(
        "event_type",
        "g",
        "s_tot",
        "n_tot",
        (
            F.round(
                (F.col("s_tot") - F.col("s_cents"))
                / (100.0 * (F.col("n_tot") - F.col("n_day"))),
                6,
            )
            * 1000000
        )
        .cast("long")
        .alias("ti"),
    )
    acc = theta.groupBy("event_type").agg(
        F.first("g").alias("g"),
        F.first("s_tot").alias("s_tot"),
        F.first("n_tot").alias("n_tot"),
        F.sum(F.col("ti").cast("decimal(38,0)")).alias("sum_t"),
        F.sum(F.col("ti").cast("decimal(38,0)") * F.col("ti")).alias(
            "sum_t2"
        ),
    )
    g = F.col("g").cast("double")
    ss = (
        F.col("sum_t2").cast("double")
        - F.col("sum_t").cast("double") * F.col("sum_t").cast("double") / g
    )
    v = (g - 1) / g * ss / F.lit(1e12)
    return acc.select(
        "event_type",
        F.col("g").cast("long").alias("n_days"),
        F.round(F.col("s_tot") / (100.0 * F.col("n_tot")), 6).alias(
            "mean_value"
        ),
        F.round(v, 8).alias("jk_var"),
        F.round(F.sqrt(v), 6).alias("jk_se"),
    ).orderBy("event_type")


# ---------------------------------------------------------------------------
# events_block_bootstrap_ci — hash-deterministic block bootstrap CI
# ---------------------------------------------------------------------------

_BOOT_R = 200  # bootstrap replicates
_BOOT_D = 30  # day-block slots (the fixture's January)


def _register_block_bootstrap() -> None:
    from ..functions.hashing import SQL_MD5_MOD

    @query(
        "events_block_bootstrap_ci",
        oracle=f"""
        WITH blocks AS (
          SELECT day(ts) AS d,
            CAST(sum(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT))
                 AS BIGINT) AS bs,
            CAST(count(*) AS BIGINT) AS bn
          FROM events GROUP BY 1),
        grid AS (
          SELECT CAST(r.range AS BIGINT) AS r,
            1 + ({SQL_MD5_MOD(
                "'boot:' || CAST(r.range AS VARCHAR) || ':' "
                "|| CAST(s.range AS VARCHAR)")}) % {_BOOT_D} AS chosen
          FROM range({_BOOT_R}) r, range({_BOOT_D}) s),
        reps AS (
          SELECT g.r,
            CAST(round(sum(b.bs) / (100.0 * sum(b.bn)), 6) AS DOUBLE)
              AS rep_mean
          FROM grid g JOIN blocks b ON b.d = g.chosen
          GROUP BY g.r),
        ranked AS (
          SELECT rep_mean, row_number() OVER (ORDER BY rep_mean, r) AS rk
          FROM reps),
        tot AS (
          SELECT CAST(round(sum(bs) / (100.0 * sum(bn)), 6) AS DOUBLE)
            AS mean_value FROM blocks)
        SELECT (SELECT mean_value FROM tot) AS mean_value,
          (SELECT rep_mean FROM ranked WHERE rk = 5) AS ci_lo,
          (SELECT rep_mean FROM ranked WHERE rk = 196) AS ci_hi,
          CAST({_BOOT_R} AS BIGINT) AS n_replicates,
          CAST((SELECT count(*) FROM blocks) AS BIGINT) AS n_blocks
        """,
        tags=("inference", "B15", "resampling", "bootstrap"),
    )
    def events_block_bootstrap_ci(
        spark: SparkSession, sf_dir: str
    ) -> DataFrame:
        """Moving-less BLOCK bootstrap 95% CI for the mean event value,
        with every replicate draw derived from md5 — the repo's no-RNG
        discipline applied to the one classical method people assume
        needs a random generator: replicate r draws day-block slot s as
        1 + md5('boot:r:s') % 30, each replicate's estimate is the
        concatenated-block mean (integer cent sums, one final shared
        division quantized 1e-6), and the CI is a pair of DEFINED order
        statistics (the 5th and 196th of 200 replicate means,
        ties broken by replicate id) — reproducible bit-for-bit on any
        cluster, any partitioning, any engine (the DuckDB oracle
        replays every draw). Day blocks (not single rows) preserve
        intra-day correlation, same argument as the jackknife's.

        Scale shape: one scan → ≤31-row day-block aggregate; the
        6,000-row (replicate, slot) grid is generated driver-free by
        ``spark.range`` arithmetic (no cross join) and joins the
        broadcast block table; everything downstream is grid-sized.
        Resampling at 100 TB costs one aggregate pass, not R passes."""
        ev = load_table(spark, sf_dir, "events")
        cents = (F.col("value").cast("decimal(18,2)") * 100).cast("long")
        blocks = ev.groupBy(F.dayofmonth("ts").alias("d")).agg(
            F.sum(cents).alias("bs"), F.count(F.lit(1)).alias("bn")
        )
        grid = spark.range(_BOOT_R * _BOOT_D).select(
            F.expr(f"id DIV {_BOOT_D}").alias("r"),
            (
                1
                + md5_mod(
                    F.concat(
                        F.lit("boot:"),
                        F.expr(f"id DIV {_BOOT_D}").cast("string"),
                        F.lit(":"),
                        (F.col("id") % _BOOT_D).cast("string"),
                    )
                )
                % _BOOT_D
            ).alias("chosen"),
        )
        reps = (
            grid.join(F.broadcast(blocks), F.col("chosen") == F.col("d"))
            .groupBy("r")
            .agg(
                F.round(
                    F.sum("bs") / (100.0 * F.sum("bn")), 6
                ).alias("rep_mean")
            )
        )
        wb = bounded_window("r", "rep_mean", "r")
        ranked = reps.select(
            "rep_mean", F.row_number().over(wb).alias("rk")
        )
        tot = blocks.agg(
            F.round(F.sum("bs") / (100.0 * F.sum("bn")), 6).alias(
                "mean_value"
            ),
            F.count(F.lit(1)).cast("long").alias("n_blocks"),
        )
        lo = ranked.filter(F.col("rk") == 5).select(
            F.col("rep_mean").alias("ci_lo")
        )
        hi = ranked.filter(F.col("rk") == 196).select(
            F.col("rep_mean").alias("ci_hi")
        )
        return (
            tot.crossJoin(lo)
            .crossJoin(hi)
            .select(
                "mean_value",
                "ci_lo",
                "ci_hi",
                F.lit(_BOOT_R).cast("long").alias("n_replicates"),
                "n_blocks",
            )
        )


_register_block_bootstrap()


# ---------------------------------------------------------------------------
# emb_ridge_normal_eq — closed-form ridge regression from mergeable sums
# ---------------------------------------------------------------------------

_RIDGE_LAM = 1_000  # ridge penalty in quantized-feature units

# The 3x3 normal-equation solve (Cramer's rule on the symmetric matrix
# [[a,b,c],[b,d,e],[c,e,f]] with rhs [p,q,r]) as ONE shared SQL fragment —
# both engines evaluate the IDENTICAL expression tree, so every IEEE
# multiply/divide happens in the same order and the doubles match bitwise.
_RIDGE_SOLVE = """
  SELECT n, lambda_q,
    (p*(d*f - e*e) - b*(q*f - e*r) + c*(q*e - d*r))
      / (a*(d*f - e*e) - b*(b*f - e*c) + c*(b*e - d*c)) AS beta_intercept,
    (a*(q*f - e*r) - p*(b*f - e*c) + c*(b*r - q*c))
      / (a*(d*f - e*e) - b*(b*f - e*c) + c*(b*e - d*c)) AS beta_d0,
    (a*(d*r - q*e) - b*(b*r - q*c) + p*(b*e - d*c))
      / (a*(d*f - e*e) - b*(b*f - e*c) + c*(b*e - d*c)) AS beta_d1
  FROM m
"""

_RIDGE_M = f"""
  m AS (
    SELECT CAST(n AS BIGINT) AS n, CAST({_RIDGE_LAM} AS BIGINT) AS lambda_q,
      CAST(n AS DOUBLE) AS a, CAST(s0 AS DOUBLE) AS b,
      CAST(s1 AS DOUBLE) AS c, CAST(s00 + {_RIDGE_LAM} AS DOUBLE) AS d,
      CAST(s01 AS DOUBLE) AS e, CAST(s11 + {_RIDGE_LAM} AS DOUBLE) AS f,
      CAST(sy AS DOUBLE) AS p, CAST(s0y AS DOUBLE) AS q,
      CAST(s1y AS DOUBLE) AS r
    FROM sums)
"""


@query(
    "emb_ridge_normal_eq",
    oracle=f"""
    WITH feat AS (
      SELECT CAST(round(CAST(embedding[1] AS DOUBLE) * 10000) AS BIGINT)
               AS q0,
             CAST(round(CAST(embedding[2] AS DOUBLE) * 10000) AS BIGINT)
               AS q1,
             CAST(label AS BIGINT) AS y
      FROM embeddings),
    sums AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
        CAST(sum(q0) AS BIGINT) AS s0, CAST(sum(q1) AS BIGINT) AS s1,
        CAST(sum(y) AS BIGINT) AS sy,
        CAST(sum(q0*q0) AS BIGINT) AS s00,
        CAST(sum(q0*q1) AS BIGINT) AS s01,
        CAST(sum(q1*q1) AS BIGINT) AS s11,
        CAST(sum(q0*y) AS BIGINT) AS s0y,
        CAST(sum(q1*y) AS BIGINT) AS s1y
      FROM feat),
    {_RIDGE_M}
    {_RIDGE_SOLVE}
    """,
    tags=("emb", "B15", "regression", "normal-equations"),
)
def emb_ridge_normal_eq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ridge regression by CLOSED-FORM normal equations over mergeable
    integer sums — the distributed-training pattern for low-dimensional
    models (calibration layers, per-segment bias correctors, DSIR-style
    reweighters): one scan accumulates the 9 Gram/moment sums (exact
    int64, map-side combinable — the same mergeable-state argument as
    ``emb_covariance``), and the solve is O(1) driver-free arithmetic
    on a single row. Features are two quantized embedding dimensions
    (QUANT=10000, the corpus-wide convention), target is the label;
    the ridge penalty λ lands on the feature diagonal only (the
    intercept is never penalized — the textbook parameterization,
    Hastie/Tibshirani/Friedman ESL §3.4.1). The 3×3 Cramer solve is a
    SHARED SQL fragment evaluated by both engines, making every IEEE
    operation order-identical — bitwise-equal betas with no tolerance.

    Scale shape: ONE pass, one 9-column partial aggregate, a 1-row
    solve. At 100 TB this is the cheapest trainable model that exists —
    scan-bound, zero shuffle beyond the final 1-row merge. For p
    features the sums are p(p+3)/2+1 columns; past p≈100 switch to the
    Arrow Gram kernel (``operators/similarity.py::covariance_gram``)
    and a driver-side Cholesky on the p×p matrix."""
    emb = load_table(spark, sf_dir, "embeddings")
    emb.select(
        F.round(F.element_at("embedding", 1).cast("double") * 10000)
        .cast("long")
        .alias("q0"),
        F.round(F.element_at("embedding", 2).cast("double") * 10000)
        .cast("long")
        .alias("q1"),
        F.col("label").cast("long").alias("y"),
    ).createOrReplaceTempView("ridge_feat")
    return spark.sql(f"""
      WITH sums AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
          CAST(sum(q0) AS BIGINT) AS s0, CAST(sum(q1) AS BIGINT) AS s1,
          CAST(sum(y) AS BIGINT) AS sy,
          CAST(sum(q0*q0) AS BIGINT) AS s00,
          CAST(sum(q0*q1) AS BIGINT) AS s01,
          CAST(sum(q1*q1) AS BIGINT) AS s11,
          CAST(sum(q0*y) AS BIGINT) AS s0y,
          CAST(sum(q1*y) AS BIGINT) AS s1y
        FROM ridge_feat),
      {_RIDGE_M}
      {_RIDGE_SOLVE}
    """)


# ---------------------------------------------------------------------------
# events_fdr_bh — Benjamini–Hochberg FDR over a battery of Welch tests
# ---------------------------------------------------------------------------

_FDR_Q = 0.05  # controlled false-discovery rate

# Welch z from exact integer moment sums — shared IEEE expression tree.
_FDR_Z = """
  (CAST(sa AS DOUBLE) / CAST(na AS DOUBLE)
   - CAST(sb AS DOUBLE) / CAST(nb AS DOUBLE))
  / sqrt(
      ((CAST(s2a AS DOUBLE) - CAST(sa AS DOUBLE) * CAST(sa AS DOUBLE)
        / CAST(na AS DOUBLE)) / CAST(na - 1 AS DOUBLE))
        / CAST(na AS DOUBLE)
      + ((CAST(s2b AS DOUBLE) - CAST(sb AS DOUBLE) * CAST(sb AS DOUBLE)
          / CAST(nb AS DOUBLE)) / CAST(nb - 1 AS DOUBLE))
        / CAST(nb AS DOUBLE))
"""

# Two-sided normal tail p = erfc(|z|/sqrt(2)) via the Abramowitz–Stegun
# 7.1.26 polynomial (|error| < 1.5e-7), rounded to 8 dp because exp() may
# differ in the last ulp across libm implementations (the ln-rounding
# precedent). Both engines evaluate this identical text.
_FDR_P = """
  round(
    (0.254829592 * (1.0 / (1.0 + 0.3275911 * (abs(z) / sqrt(2.0))))
     - 0.284496736 * pow(1.0 / (1.0 + 0.3275911 * (abs(z) / sqrt(2.0))), 2)
     + 1.421413741 * pow(1.0 / (1.0 + 0.3275911 * (abs(z) / sqrt(2.0))), 3)
     - 1.453152027 * pow(1.0 / (1.0 + 0.3275911 * (abs(z) / sqrt(2.0))), 4)
     + 1.061405429 * pow(1.0 / (1.0 + 0.3275911 * (abs(z) / sqrt(2.0))), 5))
    * exp(-(abs(z) / sqrt(2.0)) * (abs(z) / sqrt(2.0))), 8)
"""


def _fdr_oracle() -> str:
    return f"""
    WITH cells AS (
      SELECT t, bucket,
        CAST(count(*) AS BIGINT) AS n,
        CAST(sum(c) AS BIGINT) AS s,
        CAST(sum(CAST(c AS DECIMAL(38,0)) * c) AS DECIMAL(38,0)) AS s2
      FROM (
        SELECT event_type AS t, user_id % 5 AS bucket,
          CAST(round(CAST(value AS DECIMAL(18,2)) * 100, 0) AS BIGINT)
          + CASE WHEN event_type = 'click' AND user_id % 5 IN (0, 1)
                 THEN 5000 ELSE 0 END AS c
        FROM events)
      GROUP BY 1, 2),
    tests AS (
      SELECT a.t AS type_a, b.t AS type_b, a.bucket,
        a.n AS na, a.s AS sa, a.s2 AS s2a,
        b.n AS nb, b.s AS sb, b.s2 AS s2b
      FROM cells a JOIN cells b ON a.bucket = b.bucket AND a.t < b.t
      WHERE a.n > 1 AND b.n > 1),
    scored AS (
      SELECT type_a, type_b, bucket, z, {_FDR_P} AS p
      FROM (SELECT *, {_FDR_Z} AS z FROM tests)),
    ranked AS (
      SELECT *, row_number() OVER (ORDER BY p, type_a, type_b, bucket)
          AS rn,
        count(*) OVER () AS m
      FROM scored),
    stepped AS (
      SELECT *,
        max(CASE WHEN p * m <= rn * {_FDR_Q} THEN p END)
          OVER () AS p_star
      FROM ranked)
    SELECT type_a, type_b, bucket,
      round(z, 8) AS z, p, CAST(rn AS BIGINT) AS p_rank,
      COALESCE(p <= p_star, FALSE) AS rejected
    FROM stepped
    """


@query(
    "events_fdr_bh",
    oracle=_fdr_oracle(),
    tags=("events", "B15", "inference", "multiple-testing"),
)
def events_fdr_bh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benjamini–Hochberg FDR control (B&H 1995) over a battery of 50
    simultaneous Welch tests — the multiple-testing correction every
    experimentation platform needs once it runs MANY comparisons (at
    q=0.05, ~2.5 of 50 null tests 'succeed' by luck; BH caps the
    EXPECTED false-discovery fraction instead of Bonferroni's
    power-destroying family-wise bound): every event-type pair × user
    bucket is tested for a value-distribution mean shift, p-values come
    from the Abramowitz–Stegun normal tail (shared fragment, rounded
    8 dp — the deterministic-special-function device), and the step-up
    rule rejects everything below the LARGEST p satisfying
    p·m ≤ rank·q. The fixture's value column is
    type-independent (all-null battery), so a deterministic +50.00 shift
    is PLANTED on the click cells of two buckets — the same
    staged-defect discipline as dq_corrupt_record_quarantine — making
    the 8 click-pair tests in those buckets true effects: both the
    rejection and acceptance paths execute for real.

    Degenerate guard: a cell with fewer than 2 observations has no
    sample variance and its tests are excluded (Welch is undefined
    there), so m adapts to the testable battery.

    Determinism: all moments are exact integers (Σc² in DECIMAL(38,0));
    z and p are shared IEEE expression trees; the BH threshold compares
    the SAME rounded p on both engines, so the step-up cutoff cannot
    flip. Ranking tie-breaks on the full test identity.

    Scale shape: one scan → |types×buckets| moment cells (map-side),
    a cell-level self-join (domain-sized), and windows over the 50-row
    test table (bounded_window discipline). The raw data is touched
    exactly once regardless of how many tests the battery grows to."""
    ev = load_table(spark, sf_dir, "events")
    c = F.round(F.col("value").cast("decimal(18,2)") * 100, 0).cast(
        "long"
    ) + F.when(
        (F.col("event_type") == "click") & (F.col("user_id") % 5 < 2),
        F.lit(5000),
    ).otherwise(F.lit(0))
    cells = ev.select(
        F.col("event_type").alias("t"),
        (F.col("user_id") % 5).alias("bucket"),
        c.alias("c"),
    ).groupBy("t", "bucket").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("c").cast("long").alias("s"),
        F.sum(F.col("c").cast("decimal(38,0)") * F.col("c"))
        .cast("decimal(38,0)")
        .alias("s2"),
    )
    a = cells.select(
        F.col("t").alias("type_a"),
        "bucket",
        F.col("n").alias("na"),
        F.col("s").alias("sa"),
        F.col("s2").alias("s2a"),
    )
    b = cells.select(
        F.col("t").alias("type_b"),
        "bucket",
        F.col("n").alias("nb"),
        F.col("s").alias("sb"),
        F.col("s2").alias("s2b"),
    )
    tests = a.join(F.broadcast(b), "bucket").filter(
        (F.col("type_a") < F.col("type_b"))
        & (F.col("na") > 1)
        & (F.col("nb") > 1)
    )
    tests.createOrReplaceTempView("fdr_tests")
    return spark.sql(f"""
      WITH scored AS (
        SELECT type_a, type_b, bucket, z, {_FDR_P} AS p
        FROM (SELECT *, {_FDR_Z} AS z FROM fdr_tests)),
      ranked AS (
        SELECT *,
          row_number() OVER (PARTITION BY pmod(hash(bucket), 1)
                             ORDER BY p, type_a, type_b, bucket) AS rn,
          count(*) OVER (PARTITION BY pmod(hash(bucket), 1)) AS m
        FROM scored),
      stepped AS (
        SELECT *,
          max(CASE WHEN p * m <= rn * {_FDR_Q} THEN p END)
            OVER (PARTITION BY pmod(hash(bucket), 1)) AS p_star
        FROM ranked)
      SELECT type_a, type_b, bucket,
        round(z, 8) AS z, p, CAST(rn AS BIGINT) AS p_rank,
        COALESCE(p <= p_star, FALSE) AS rejected
      FROM stepped
    """)
