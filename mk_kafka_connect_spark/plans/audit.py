"""Round-18 pipeline-audit query surface: the operational reports a
curation pipeline ships alongside its corpus — what dedup actually
removed (per source, with cross-source attribution), how much PII the
scrubber is seeing (prevalence rates, not just redaction), where the
quality classifier's usable operating points are (threshold sweep),
and how much signal the compressed ANN index gave up (SQ8 quantization
distortion). The round-17 evaluation family measures ranking and
agreement; this family audits the pipeline's *decisions*.

Reference parity note: the reference connector (mk-kafka-connect) has
no analytics surface — these queries extend the declared Layer-B15
LLM-pipeline scope (SURVEY.md §2), same as the dedup/similarity/text
families they audit.

Same oracle discipline as the rest of the registry: exact integer
arithmetic (token counts, int64 contingency/error sums, integer-scaled
per-row doubles) until a final single division, so DuckDB reproduces
every value bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.hashing import SQL_WORDS, words
from ..operators.similarity import _intdiv_pos, quantize
from .governance import _NB_SCALE, _nb_scored, _sql_nb_scored_prefix
from .llm import _PII_EMAIL, _PII_IP, _PII_PHONE, _SQL_QUANT, _sql_sq8
from .registry import QUERIES as _Q
from .registry import query


# ---------------------------------------------------------------------------
# docs_dedup_impact_report — what near-dup dedup removes, per source
# ---------------------------------------------------------------------------


def _register_dedup_impact() -> None:
    """Registered via a function so the composed oracle embeds the
    registered cluster operator's oracle SQL verbatim (the
    dedup_lsh_recall_report pattern): the impact accounting is
    certified against the SAME cluster relation the Spark side
    replays."""
    clusters_sql = _Q["dedup_clusters"].oracle

    @query(
        "docs_dedup_impact_report",
        oracle=f"""
        WITH clusters AS ({clusters_sql}),
        docs AS (
          SELECT doc_id, source,
            CAST(len({SQL_WORDS('text')}) AS BIGINT) AS n_tokens
          FROM documents),
        removed AS (
          SELECT d.source, d.n_tokens,
            CASE WHEN k.source <> d.source THEN 1 ELSE 0 END AS cross_src
          FROM clusters c
          JOIN docs d ON d.doc_id = c.id
          JOIN docs k ON k.doc_id = c.cluster_id
          WHERE NOT c.is_canonical),
        tot AS (
          SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
            CAST(sum(n_tokens) AS BIGINT) AS n_tokens
          FROM docs GROUP BY source),
        rem AS (
          SELECT source,
            CAST(count(*) AS BIGINT) AS docs_removed,
            CAST(sum(n_tokens) AS BIGINT) AS tokens_removed,
            CAST(sum(cross_src) AS BIGINT) AS docs_removed_cross_source
          FROM removed GROUP BY source)
        SELECT t.source, t.n_docs, t.n_tokens,
          CAST(coalesce(r.docs_removed, 0) AS BIGINT) AS docs_removed,
          CAST(coalesce(r.tokens_removed, 0) AS BIGINT) AS tokens_removed,
          CAST(coalesce(r.docs_removed_cross_source, 0) AS BIGINT)
            AS docs_removed_cross_source,
          CASE WHEN t.n_tokens = 0 THEN 0.0
               ELSE CAST(coalesce(r.tokens_removed, 0) AS DOUBLE) / t.n_tokens
               END AS pct_tokens_removed
        FROM tot t LEFT JOIN rem r USING (source)
        """,
        tags=("dedup", "B15", "audit", "governance"),
    )
    def docs_dedup_impact_report(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Corpus-level dedup impact accounting: per source, how many
        documents and tokens the MinHash-LSH near-dup pass removes
        (keep-the-cluster-minimum policy, exactly the registered
        ``dedup_clusters`` relation), and how many of those removals
        lose to a keeper in a DIFFERENT source — the number Lee et al.
        2022 ("Deduplicating Training Data Makes Language Models
        Better") report per corpus before anyone trusts a mixture
        weight computed on the raw counts. Cross-source attribution is
        the governance signal: a source whose docs keep losing to
        another source's keepers is being silently drained by dedup
        order, not by its own quality.

        Exactness: doc/token sums are exact int64; the only double is
        the final guarded tokens_removed / n_tokens division.

        Scale shape: the cluster relation is the (already-registered)
        bucketed LSH pass — no new pair enumeration here; the report
        adds one corpus scan with a per-source partial aggregation,
        two doc_id equi-joins sized by |near-dup members| (tiny vs the
        corpus), and a |sources|-row left join. Survives 100 TB
        unchanged."""
        docs = load_table(spark, sf_dir, "documents").select(
            "doc_id",
            "source",
            F.size(words(F.col("text"))).cast("long").alias("n_tokens"),
        )
        clusters = _Q["dedup_clusters"].fn(spark, sf_dir)
        removed = (
            clusters.filter(~F.col("is_canonical"))
            .join(docs.withColumnRenamed("doc_id", "id"), "id")
            .join(
                docs.select(
                    F.col("doc_id").alias("cluster_id"),
                    F.col("source").alias("keeper_source"),
                ),
                "cluster_id",
            )
            .select(
                "source",
                "n_tokens",
                F.when(F.col("keeper_source") != F.col("source"), 1)
                .otherwise(0)
                .alias("cross_src"),
            )
        )
        tot = docs.groupBy("source").agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("n_tokens"),
        )
        rem = removed.groupBy("source").agg(
            F.count(F.lit(1)).cast("long").alias("docs_removed"),
            F.sum("n_tokens").cast("long").alias("tokens_removed"),
            F.sum("cross_src").cast("long").alias("docs_removed_cross_source"),
        )
        return tot.join(rem, "source", "left").select(
            "source",
            "n_docs",
            "n_tokens",
            F.coalesce("docs_removed", F.lit(0)).cast("long").alias("docs_removed"),
            F.coalesce("tokens_removed", F.lit(0))
            .cast("long")
            .alias("tokens_removed"),
            F.coalesce("docs_removed_cross_source", F.lit(0))
            .cast("long")
            .alias("docs_removed_cross_source"),
            F.when(F.col("n_tokens") == 0, F.lit(0.0))
            .otherwise(
                F.coalesce("tokens_removed", F.lit(0)).cast("double")
                / F.col("n_tokens")
            )
            .alias("pct_tokens_removed"),
        )


_register_dedup_impact()


# ---------------------------------------------------------------------------
# docs_pii_prevalence — per-source PII density rates
# ---------------------------------------------------------------------------
@query(
    "docs_pii_prevalence",
    oracle=f"""
    WITH planted AS (
      SELECT doc_id, source,
        CAST(len({SQL_WORDS('text')}) AS BIGINT) AS n_tokens,
        text
          || repeat(' u' || CAST(doc_id AS VARCHAR) || '@example.com',
                    CAST(doc_id % 3 AS INT))
          || repeat(' +1-555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0'),
                    CAST(doc_id % 2 AS INT))
          || CASE WHEN doc_id % 5 = 0
                  THEN ' 10.1.' || CAST(doc_id % 256 AS VARCHAR) || '.9'
                  ELSE '' END AS t
      FROM documents),
    per_doc AS (
      SELECT source, n_tokens,
        CAST(len(regexp_extract_all(t, '{_PII_EMAIL}')) AS BIGINT) AS e,
        CAST(len(regexp_extract_all(t, '{_PII_PHONE}')) AS BIGINT) AS p,
        CAST(len(regexp_extract_all(t, '{_PII_IP}')) AS BIGINT) AS i
      FROM planted)
    SELECT source,
      CAST(count(*) AS BIGINT) AS n_docs,
      CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
      CAST(sum(e) AS BIGINT) AS n_email,
      CAST(sum(p) AS BIGINT) AS n_phone,
      CAST(sum(i) AS BIGINT) AS n_ip,
      CASE WHEN sum(n_tokens) = 0 THEN 0.0
           ELSE CAST(10000 * (sum(e) + sum(p) + sum(i)) AS DOUBLE)
                / sum(n_tokens)
           END AS pii_per_10k_tokens
    FROM per_doc GROUP BY source
    """,
    tags=("text", "B15", "audit", "pii"),
)
def docs_pii_prevalence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII prevalence rates per source — the audit that precedes
    redaction: before a corpus ships, privacy review wants hits per
    10k tokens by source, not just "the scrubber ran". The fixture is
    PII-free by construction (same premise as ``text_pii_redact``), so
    the query plants a deterministic, VARIABLE number of contacts per
    document (doc_id%3 emails, doc_id%2 phones, an IPv4 on every 5th
    doc) and measures the detector against that known ground load —
    prevalence then varies by source composition and the oracle proves
    detection is exact. Patterns are the shared RE2-∩-java.util.regex
    constants from the redaction pass, so prevalence and redaction can
    never disagree on what counts as PII.

    Exactness: integer hit/token counts; one guarded division with the
    10k scaling applied to the exact integer numerator.

    Scale shape: per-row JVM regex (codegen'd, no UDF) + one
    per-source partial aggregation — a map-only pass plus a
    |sources|-key shuffle at any corpus size."""
    d = load_table(spark, sf_dir, "documents")
    planted = d.select(
        "source",
        F.size(words(F.col("text"))).cast("long").alias("n_tokens"),
        F.concat(
            F.col("text"),
            F.repeat(
                F.concat(
                    F.lit(" u"),
                    F.col("doc_id").cast("string"),
                    F.lit("@example.com"),
                ),
                (F.col("doc_id") % 3).cast("int"),
            ),
            F.repeat(
                F.concat(
                    F.lit(" +1-555-"),
                    F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
                ),
                (F.col("doc_id") % 2).cast("int"),
            ),
            F.when(
                F.col("doc_id") % 5 == 0,
                F.concat(
                    F.lit(" 10.1."),
                    (F.col("doc_id") % 256).cast("string"),
                    F.lit(".9"),
                ),
            ).otherwise(F.lit("")),
        ).alias("t"),
    )
    per_doc = planted.select(
        "source",
        "n_tokens",
        F.regexp_count(F.col("t"), F.lit(_PII_EMAIL)).cast("long").alias("e"),
        F.regexp_count(F.col("t"), F.lit(_PII_PHONE)).cast("long").alias("p"),
        F.regexp_count(F.col("t"), F.lit(_PII_IP)).cast("long").alias("i"),
    )
    agg = per_doc.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("n_tokens"),
        F.sum("e").cast("long").alias("n_email"),
        F.sum("p").cast("long").alias("n_phone"),
        F.sum("i").cast("long").alias("n_ip"),
    )
    return agg.select(
        "source",
        "n_docs",
        "n_tokens",
        "n_email",
        "n_phone",
        "n_ip",
        F.when(F.col("n_tokens") == 0, F.lit(0.0))
        .otherwise(
            (
                F.lit(10000)
                * (F.col("n_email") + F.col("n_phone") + F.col("n_ip"))
            ).cast("double")
            / F.col("n_tokens")
        )
        .alias("pii_per_10k_tokens"),
    )


# ---------------------------------------------------------------------------
# docs_nb_threshold_sweep — quality-classifier operating points
# ---------------------------------------------------------------------------
@query(
    "docs_nb_threshold_sweep",
    oracle=f"""{_sql_nb_scored_prefix()},
    thr AS (SELECT CAST(i * {_NB_SCALE} AS BIGINT) AS thr_q
            FROM range(-3, 4) t(i)),
    cells AS (
      SELECT t.thr_q,
        CAST(sum(CASE WHEN s.y AND s.score_q > t.thr_q THEN 1 ELSE 0 END)
          AS BIGINT) AS tp,
        CAST(sum(CASE WHEN NOT s.y AND s.score_q > t.thr_q THEN 1 ELSE 0 END)
          AS BIGINT) AS fp,
        CAST(sum(CASE WHEN s.y AND s.score_q <= t.thr_q THEN 1 ELSE 0 END)
          AS BIGINT) AS fn,
        CAST(sum(CASE WHEN NOT s.y AND s.score_q <= t.thr_q THEN 1 ELSE 0 END)
          AS BIGINT) AS tn
      FROM scored s CROSS JOIN thr t GROUP BY t.thr_q)
    SELECT thr_q, tp, fp, fn, tn,
      CASE WHEN tp + fp = 0 THEN 0.0
           ELSE CAST(tp AS DOUBLE) / (tp + fp) END AS precision_,
      CASE WHEN tp + fn = 0 THEN 0.0
           ELSE CAST(tp AS DOUBLE) / (tp + fn) END AS recall_,
      CASE WHEN 2 * tp + fp + fn = 0 THEN 0.0
           ELSE CAST(2 * tp AS DOUBLE) / (2 * tp + fp + fn) END AS f1
    FROM cells
    """,
    tags=("text", "B15", "audit", "classifier"),
)
def docs_nb_threshold_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Operating-point sweep of the hashed-NB quality classifier: the
    held-out confusion counts and precision / recall / F1 at a ladder
    of seven decision thresholds (log-odds −3…3, in the classifier's
    1e-6-quantized score space) — the table a curation pipeline reads
    to PICK its keep-threshold, sitting between the single operating
    point (``docs_nb_quality_classifier``, threshold 0) and the
    threshold-free ranking summary (``docs_nb_quality_auc``). Scores
    come from the shared ``_nb_scored`` table, so all three reports
    are certified against the same scoring relation.

    Exactness: per-threshold contingency cells are exact int64 counts
    over exact-integer scores against exact-integer thresholds; P/R/F1
    are guarded single divisions.

    Scale shape: the scored table (two corpus scans, 256-bucket model
    fit, broadcast scorer) is the cost; the sweep adds a 7-row
    broadcast nested-loop expansion (deliberate — the ladder is a
    constant) and a 7-key aggregate. Unchanged at 100 TB."""
    scored = _nb_scored(spark, sf_dir)
    thr = spark.range(-3, 4).select(
        (F.col("id") * _NB_SCALE).cast("long").alias("thr_q")
    )
    cells = (
        scored.crossJoin(F.broadcast(thr))
        .groupBy("thr_q")
        .agg(
            F.sum(
                F.when(F.col("y") & (F.col("score_q") > F.col("thr_q")), 1)
                .otherwise(0)
            )
            .cast("long")
            .alias("tp"),
            F.sum(
                F.when(~F.col("y") & (F.col("score_q") > F.col("thr_q")), 1)
                .otherwise(0)
            )
            .cast("long")
            .alias("fp"),
            F.sum(
                F.when(F.col("y") & (F.col("score_q") <= F.col("thr_q")), 1)
                .otherwise(0)
            )
            .cast("long")
            .alias("fn"),
            F.sum(
                F.when(~F.col("y") & (F.col("score_q") <= F.col("thr_q")), 1)
                .otherwise(0)
            )
            .cast("long")
            .alias("tn"),
        )
    )
    tp, fp, fn = F.col("tp"), F.col("fp"), F.col("fn")
    return cells.select(
        "thr_q",
        "tp",
        "fp",
        "fn",
        "tn",
        F.when(tp + fp == 0, F.lit(0.0))
        .otherwise(tp.cast("double") / (tp + fp))
        .alias("precision_"),
        F.when(tp + fn == 0, F.lit(0.0))
        .otherwise(tp.cast("double") / (tp + fn))
        .alias("recall_"),
        F.when(2 * tp + fp + fn == 0, F.lit(0.0))
        .otherwise((2 * tp).cast("double") / (2 * tp + fp + fn))
        .alias("f1"),
    )


# ---------------------------------------------------------------------------
# emb_quantization_error — SQ8 index distortion report
# ---------------------------------------------------------------------------

_COS_SCALE = 1_000_000_000  # int64 quantization of per-row doubles


@query(
    "emb_quantization_error",
    oracle=f"""
    WITH v AS (
      SELECT label, {_SQL_QUANT.format(e='embedding')} AS qv
      FROM embeddings),
    q AS (
      SELECT label, qv,
        greatest(list_max(list_transform(qv, y -> abs(y))), 1) AS m,
        {_sql_sq8('qv')} AS q8
      FROM v),
    per AS (
      SELECT label,
        CAST(list_sum(list_transform(list_zip(qv, q8), p -> p[1] * p[2]))
          AS BIGINT) AS dotvq,
        CAST(list_sum(list_transform(qv, x -> x * x)) AS BIGINT) AS n2v,
        CAST(list_sum(list_transform(q8, x -> x * x)) AS BIGINT) AS n2q,
        CAST(list_sum(list_transform(list_zip(qv, q8),
          p -> (127 * p[1] - p[2] * m) * (127 * p[1] - p[2] * m)))
          AS BIGINT) AS sse
      FROM q),
    rowq AS (
      SELECT label,
        CASE WHEN n2v = 0 OR n2q = 0 THEN CAST(0 AS BIGINT)
             ELSE CAST(round(CAST(dotvq AS DOUBLE)
                    / (sqrt(CAST(n2v AS DOUBLE)) * sqrt(CAST(n2q AS DOUBLE)))
                    * {_COS_SCALE}, 0) AS BIGINT) END AS cos_q,
        CASE WHEN n2v = 0 THEN CAST(0 AS BIGINT)
             ELSE CAST(round(CAST(sse AS DOUBLE) / (16129.0 * n2v)
                    * {_COS_SCALE}, 0) AS BIGINT) END AS relmse_q
      FROM per)
    SELECT CAST(label AS INT) AS label,
      CAST(count(*) AS BIGINT) AS n_vecs,
      CAST(sum(cos_q) AS DOUBLE) / (count(*) * {_COS_SCALE}) AS mean_cos_sq8,
      CAST(sum(relmse_q) AS DOUBLE) / (count(*) * {_COS_SCALE})
        AS mean_rel_mse_sq8
    FROM rowq GROUP BY label
    """,
    tags=("similarity", "B15", "audit", "quantization"),
)
def emb_quantization_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQ8 index distortion report: per label, the mean cosine between
    each full-precision vector and its int8 scalar-quantized code, and
    the mean relative squared reconstruction error — the standard
    vector-index engineering numbers (Jégou et al. 2011 report exactly
    this for PQ) that say how much geometry the 8× bandwidth saving of
    the SQ8 tier (``sim_topk_sq8``/``sim_topk_ivf_sq8``) costs BEFORE
    recall is measured downstream. Quantization is byte-for-byte the
    production ``_sq8_cols`` formula (sign-split integer div, scale
    floored at 1), mirrored by the shared ``_sql_sq8`` oracle fragment.

    Exactness: dot/norm/error terms are exact int64 per row (cosine is
    scale-invariant, so cos(v, q8) IS cos(v, reconstruction); the
    error term 127·v_i − q8_i·m is the exact integer residual of the
    quantization div); each row's two doubles are single IEEE
    divisions quantized to int64 at 1e-9, so the per-label means are
    order-independent integer sums with one final division — and the
    per-row scaling keeps every intermediate < 2^53 at ANY corpus
    size, where a naive sum(sse)/(127²·sum(n2v)) overflows int64 near
    1e5 vectors per label.

    Scale shape: one scan, pure HOF integer arithmetic in codegen (no
    UDF — the pair-cosine Arrow kernel is for materialized pair
    tables; here everything is row-local), one |labels|-key partial
    aggregation. Map-only at 100 TB."""
    emb = load_table(spark, sf_dir, "embeddings")
    v = emb.select(
        F.col("label").cast("int").alias("label"),
        quantize(F.col("embedding")).alias("qv"),
    )
    m = F.greatest(
        F.array_max(F.transform(F.col("qv"), F.abs)), F.lit(1).cast("long")
    )
    q = v.withColumn("m", m).withColumn(
        "q8",
        F.transform(
            F.col("qv"),
            lambda x: F.when(
                x >= 0, _intdiv_pos(x * 127, F.col("m"))
            ).otherwise(-_intdiv_pos((-x) * 127, F.col("m"))),
        ),
    )
    isum = lambda c: F.aggregate(  # noqa: E731  (int64 HOF fold)
        c, F.lit(0).cast("long"), lambda acc, x: acc + x
    )
    per = q.select(
        "label",
        isum(F.zip_with(F.col("qv"), F.col("q8"), lambda a, b: a * b)).alias(
            "dotvq"
        ),
        isum(F.transform(F.col("qv"), lambda x: x * x)).alias("n2v"),
        isum(F.transform(F.col("q8"), lambda x: x * x)).alias("n2q"),
        isum(
            F.zip_with(
                F.col("qv"),
                F.col("q8"),
                lambda a, b: (a * 127 - b * F.col("m"))
                * (a * 127 - b * F.col("m")),
            )
        ).alias("sse"),
    )
    rowq = per.select(
        "label",
        F.when((F.col("n2v") == 0) | (F.col("n2q") == 0), F.lit(0).cast("long"))
        .otherwise(
            F.round(
                F.col("dotvq").cast("double")
                / (
                    F.sqrt(F.col("n2v").cast("double"))
                    * F.sqrt(F.col("n2q").cast("double"))
                )
                * _COS_SCALE,
                0,
            ).cast("long")
        )
        .alias("cos_q"),
        F.when(F.col("n2v") == 0, F.lit(0).cast("long"))
        .otherwise(
            F.round(
                F.col("sse").cast("double")
                / (F.lit(16129.0) * F.col("n2v"))
                * _COS_SCALE,
                0,
            ).cast("long")
        )
        .alias("relmse_q"),
    )
    return rowq.groupBy("label").agg(
        F.count(F.lit(1)).cast("long").alias("n_vecs"),
        (
            F.sum("cos_q").cast("double")
            / (F.count(F.lit(1)) * F.lit(_COS_SCALE))
        ).alias("mean_cos_sq8"),
        (
            F.sum("relmse_q").cast("double")
            / (F.count(F.lit(1)) * F.lit(_COS_SCALE))
        ).alias("mean_rel_mse_sq8"),
    )
