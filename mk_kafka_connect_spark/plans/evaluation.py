"""Round-17 evaluation-metric query surface: retrieval ranking quality
(nDCG@10 / MRR), inter-annotator agreement (Cohen's kappa), corpus
n-gram diversity (distinct-n), and contrastive hard-negative mining —
the measurement half of a training-data pipeline: before a curated
corpus or a retrieval index ships, these are the numbers that gate it.

Reference parity note: the reference connector (mk-kafka-connect) has
no analytics surface — these queries extend the declared Layer-B15
LLM-pipeline scope (SURVEY.md §2), same as the dedup/similarity/text
families they measure.

Same oracle discipline as the rest of the registry: exact integer
arithmetic (quantized embeddings, integer-scaled DCG gains, integer
contingency tables) until a final one-division double, so DuckDB
reproduces every value bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..catalog import load_table
from ..operators import similarity as S
from .llm import (
    _BF_QUERY_CAP,
    _SQL_QUANT,
    _quantized_embeddings,
    _sql_cos,
    _sql_hsig,
)
from .registry import QUERIES as _Q
from .registry import query

# ---------------------------------------------------------------------------
# sim_eval_ndcg_mrr — retrieval ranking-quality metrics over the exact
# top-10, with same-label relevance
# ---------------------------------------------------------------------------

# Integer-scaled DCG gain per rank: g(i) = round(1e6 / log2(i+1)).
# log2 over the small integers 2..11 is the same libm call in the JVM
# and DuckDB, and floor(x + 0.5) of the identical double is the same
# integer — so every gain is a cross-engine-exact BIGINT and the DCG
# sums are order-independent integer sums (< 2^53), leaving nDCG and
# MRR as single divisions of exact operands.
_SQL_GAINS = """
    SELECT i AS rank, CAST(floor(1000000 / log2(i + 1) + 0.5) AS BIGINT) AS g
    FROM range(1, 11) t(i)
"""


def _register_ndcg_report() -> None:
    """Registered via a function so the composed oracle embeds the exact
    brute-force ranking's oracle SQL verbatim (the sim_recall pattern):
    the metric is certified against the SAME ranking relation the Spark
    side replays, end to end."""
    bf_sql = _Q["sim_topk_bruteforce"].oracle

    @query(
        "sim_eval_ndcg_mrr",
        oracle=f"""
        WITH bf AS (SELECT query_id, neighbor_id, rank FROM ({bf_sql}) t),
        lab AS (SELECT vec_id, label FROM embeddings),
        rel AS (
          SELECT b.query_id, b.rank,
            CASE WHEN ql.label = nl.label THEN 1 ELSE 0 END AS rel
          FROM bf b
          JOIN lab ql ON ql.vec_id = b.query_id
          JOIN lab nl ON nl.vec_id = b.neighbor_id),
        gains AS ({_SQL_GAINS}),
        per_q AS (
          SELECT r.query_id,
            CAST(sum(r.rel) AS BIGINT) AS n_rel_at_10,
            CAST(sum(r.rel * g.g) AS BIGINT) AS dcg_scaled,
            min(CASE WHEN r.rel = 1 THEN r.rank END) AS first_rel
          FROM rel r JOIN gains g ON g.rank = r.rank
          GROUP BY r.query_id),
        nrel AS (
          SELECT q.vec_id AS query_id,
            CAST(count(*) AS BIGINT) AS n_relevant
          FROM embeddings q JOIN embeddings c
            ON q.label = c.label AND q.vec_id <> c.vec_id
          WHERE q.vec_id < {_BF_QUERY_CAP}
          GROUP BY q.vec_id),
        idcg AS (
          SELECT n.query_id, CAST(sum(g.g) AS BIGINT) AS idcg_scaled
          FROM nrel n JOIN gains g
            ON g.rank <= least(n.n_relevant, 10)
          GROUP BY n.query_id)
        SELECT p.query_id, p.n_rel_at_10,
          CASE WHEN p.first_rel IS NULL THEN 0.0
               ELSE 1.0 / p.first_rel END AS mrr,
          CASE WHEN i.idcg_scaled IS NULL OR i.idcg_scaled = 0 THEN 0.0
               ELSE CAST(p.dcg_scaled AS DOUBLE) / i.idcg_scaled
               END AS ndcg_at_10
        FROM per_q p LEFT JOIN idcg i ON i.query_id = p.query_id
        """,
        tags=("similarity", "B15", "evaluation", "ranking"),
    )
    def sim_eval_ndcg_mrr(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Retrieval ranking-quality report: per-query nDCG@10 and MRR of
        the exact cosine top-10 against same-label relevance — the
        ranking-metric layer (Järvelin & Kekäläinen 2002) that sits above
        the recall gate (``sim_recall_ivf_vs_exact``): recall says the
        index FOUND the right candidates, nDCG/MRR say it ORDERED them
        usefully. Relevance labels derive from the embeddings table's own
        label column (same-class = relevant), the standard proxy when no
        graded judgments exist.

        Exactness: DCG gains are integer-scaled (round(1e6/log2(rank+1))
        — cross-engine-exact BIGINTs since log2 over 2..11 is the same
        libm bits), so both DCG and IDCG are order-independent integer
        sums and nDCG/MRR are single divisions of exact operands.

        Scale shape: the ranking is the declared exact |Q|x|C| evaluation
        tier this family is always measured on (sim_topk_bruteforce's
        posture — in production the metric runs on a sampled query batch,
        as here with |Q|=100); the metric itself adds two broadcast-sized
        joins (labels are corpus-keyed but join on vec_id; the gain table
        is 10 rows) and one |Q|-row aggregate. IDCG's n_relevant uses a
        label-count aggregate, not a pair join: one corpus scan."""
        emb = load_table(spark, sf_dir, "embeddings")
        lab = emb.select("vec_id", "label")
        bf = _Q["sim_topk_bruteforce"].fn(spark, sf_dir).select(
            "query_id", "neighbor_id", "rank"
        )
        rel = (
            bf.join(lab.withColumnRenamed("vec_id", "query_id").withColumnRenamed("label", "qlabel"), "query_id")
            .join(lab.withColumnRenamed("vec_id", "neighbor_id").withColumnRenamed("label", "nlabel"), "neighbor_id")
            .select(
                "query_id",
                "rank",
                F.when(F.col("qlabel") == F.col("nlabel"), 1).otherwise(0).alias("rel"),
            )
        )
        gains = spark.range(1, 11).select(
            F.col("id").cast("int").alias("grank"),
            F.floor(F.lit(1000000) / F.log2(F.col("id") + 1) + 0.5)
            .cast("long")
            .alias("g"),
        )
        per_q = (
            rel.join(F.broadcast(gains), rel["rank"] == gains["grank"])
            .groupBy("query_id")
            .agg(
                F.sum("rel").cast("long").alias("n_rel_at_10"),
                F.sum(F.col("rel") * F.col("g")).cast("long").alias("dcg_scaled"),
                F.min(F.when(F.col("rel") == 1, F.col("rank"))).alias("first_rel"),
            )
        )
        # |relevant| per query via label counts (corpus-wide aggregate,
        # no pair enumeration): n_relevant = count(label) - 1 (self).
        label_counts = emb.groupBy("label").agg(
            F.count(F.lit(1)).cast("long").alias("n_label")
        )
        nrel = (
            emb.filter(F.col("vec_id") < _BF_QUERY_CAP)
            .join(F.broadcast(label_counts), "label")
            .select(
                F.col("vec_id").alias("query_id"),
                (F.col("n_label") - 1).alias("n_relevant"),
            )
        )
        idcg = (
            nrel.join(
                F.broadcast(gains),
                gains["grank"] <= F.least(nrel["n_relevant"], F.lit(10)),
            )
            .groupBy("query_id")
            .agg(F.sum("g").cast("long").alias("idcg_scaled"))
        )
        return (
            per_q.join(idcg, "query_id", "left")
            .select(
                "query_id",
                "n_rel_at_10",
                F.when(F.col("first_rel").isNull(), F.lit(0.0))
                .otherwise(F.lit(1.0) / F.col("first_rel"))
                .alias("mrr"),
                F.when(
                    F.col("idcg_scaled").isNull() | (F.col("idcg_scaled") == 0),
                    F.lit(0.0),
                )
                .otherwise(
                    F.col("dcg_scaled").cast("double") / F.col("idcg_scaled")
                )
                .alias("ndcg_at_10"),
            )
        )


_register_ndcg_report()


# ---------------------------------------------------------------------------
# docs_annotator_kappa — chance-corrected agreement between two rule
# annotators, per language
# ---------------------------------------------------------------------------
@query(
    "docs_annotator_kappa",
    oracle="""
    WITH flags AS (
      SELECT lang,
        CASE WHEN n_chars >= 600 THEN 1 ELSE 0 END AS a,
        CASE WHEN len(string_split(text, ' ')) >= 100 THEN 1 ELSE 0 END AS b
      FROM documents),
    cnt AS (
      SELECT lang,
        CAST(count(*) AS BIGINT) AS n,
        CAST(sum(a) AS BIGINT) AS a1,
        CAST(sum(b) AS BIGINT) AS b1,
        CAST(sum(CASE WHEN a = b THEN 1 ELSE 0 END) AS BIGINT) AS agree
      FROM flags GROUP BY lang)
    SELECT lang, n AS n_docs, agree AS n_agree,
      CASE WHEN n = 0 THEN 0.0 ELSE CAST(agree AS DOUBLE) / n END AS po,
      CASE WHEN n * n - a1 * b1 - (n - a1) * (n - b1) = 0 THEN 0.0
           ELSE CAST(n * agree - a1 * b1 - (n - a1) * (n - b1) AS DOUBLE)
                / (n * n - a1 * b1 - (n - a1) * (n - b1))
           END AS kappa
    FROM cnt
    """,
    tags=("text", "B15", "evaluation", "annotation"),
)
def docs_annotator_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's kappa (Cohen 1960) per language between two deterministic
    rule 'annotators' — a char-length gate (n_chars >= 600) and a
    word-count gate (>= 100 space tokens): the annotation-QA layer of a
    labeling pipeline, where raw percent agreement (po) overstates
    consensus because both raters say 'keep' for most docs; kappa
    corrects by the agreement two independent raters with these marginals
    would reach by chance.

    Exactness: the whole 2x2 contingency table is integer counts, and
    kappa algebraically reduces to ONE division of exact int64 terms —
    (n*agree - a1*b1 - a0*b0) / (n^2 - a1*b1 - a0*b0) — so the double is
    bit-identical cross-engine (po likewise: one count/count division).

    Scale shape: one document scan, per-language partial aggregation
    (map-side combine), |langs| output rows. No joins, no windows; the
    only shuffle is the |langs|-key groupBy. Unchanged at 100 TB."""
    docs = load_table(spark, sf_dir, "documents")
    flags = docs.select(
        "lang",
        F.when(F.col("n_chars") >= 600, 1).otherwise(0).alias("a"),
        F.when(F.size(F.split("text", " ", -1)) >= 100, 1)
        .otherwise(0)
        .alias("b"),
    )
    cnt = flags.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("a").cast("long").alias("a1"),
        F.sum("b").cast("long").alias("b1"),
        F.sum(F.when(F.col("a") == F.col("b"), 1).otherwise(0))
        .cast("long")
        .alias("agree"),
    )
    n, a1, b1, agree = (F.col(c) for c in ("n", "a1", "b1", "agree"))
    chance = a1 * b1 + (n - a1) * (n - b1)
    denom = n * n - chance
    return cnt.select(
        "lang",
        n.alias("n_docs"),
        agree.alias("n_agree"),
        F.when(n == 0, F.lit(0.0))
        .otherwise(agree.cast("double") / n)
        .alias("po"),
        F.when(denom == 0, F.lit(0.0))
        .otherwise((n * agree - chance).cast("double") / denom)
        .alias("kappa"),
    )


# ---------------------------------------------------------------------------
# docs_distinct_ngrams — corpus diversity (distinct-1 / distinct-2) per
# source
# ---------------------------------------------------------------------------
@query(
    "docs_distinct_ngrams",
    oracle=r"""
    WITH w0 AS (
      SELECT doc_id, source,
        unnest(string_split_regex(text, '\s+')) AS w,
        generate_subscripts(string_split_regex(text, '\s+'), 1) AS pos
      FROM documents),
    w AS (SELECT * FROM w0 WHERE w <> ''),
    bg AS (
      SELECT doc_id, source,
        w || ' ' || lead(w) OVER (PARTITION BY doc_id ORDER BY pos) AS bg
      FROM w),
    uni AS (
      SELECT source,
        CAST(count(*) AS BIGINT) AS n_tokens,
        CAST(count(DISTINCT w) AS BIGINT) AS n_distinct_tokens
      FROM w GROUP BY source),
    bi AS (
      SELECT source,
        CAST(count(bg) AS BIGINT) AS n_bigrams,
        CAST(count(DISTINCT bg) AS BIGINT) AS n_distinct_bigrams
      FROM bg GROUP BY source)
    SELECT u.source, n_tokens, n_distinct_tokens,
      CASE WHEN n_tokens = 0 THEN 0.0
           ELSE CAST(n_distinct_tokens AS DOUBLE) / n_tokens END AS distinct_1,
      n_bigrams, n_distinct_bigrams,
      CASE WHEN n_bigrams = 0 THEN 0.0
           ELSE CAST(n_distinct_bigrams AS DOUBLE) / n_bigrams END AS distinct_2
    FROM uni u JOIN bi USING (source)
    """,
    tags=("text", "B15", "evaluation", "diversity"),
)
def docs_distinct_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-n corpus diversity (Li et al. 2016's distinct-1/-2,
    lifted from generation eval to corpus QA): unique-unigram and
    unique-bigram ratios per source — the degenerate-repetition screen
    that catches a source full of templated or model-generated text
    (low distinct-2) even when per-document repetition filters
    (text_repetition_stats) pass, because the repetition lives ACROSS
    documents, not within them.

    Exactness: integer token/bigram counts, two single divisions.
    Tokenization is the same regex split + empty-filter in both engines;
    bigrams pair each token with its successor WITHIN a document (lead
    over pos, so the last token contributes none and document boundaries
    never leak a cross-doc bigram).

    Scale shape: one scan, explode to tokens, a doc_id-partitioned
    window for the successor pair (data-sized keys — parallel), then
    per-source partial aggregation; count(DISTINCT) plans as the
    standard two-phase expand-aggregate. No broadcast, no driver work;
    survives 100 TB with shuffle volume linear in token count."""
    docs = load_table(spark, sf_dir, "documents")
    w = (
        docs.select(
            "doc_id",
            "source",
            F.posexplode(F.split("text", r"\s+")).alias("pos", "w"),
        )
        .where(F.col("w") != "")
    )
    win = Window.partitionBy("doc_id").orderBy("pos")
    bg = w.select(
        "source",
        F.concat(F.col("w"), F.lit(" "), F.lead("w").over(win)).alias("bg"),
    )
    uni = w.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_tokens"),
        F.countDistinct("w").cast("long").alias("n_distinct_tokens"),
    )
    bi = bg.groupBy("source").agg(
        F.count("bg").cast("long").alias("n_bigrams"),
        F.countDistinct("bg").cast("long").alias("n_distinct_bigrams"),
    )
    return uni.join(bi, "source").select(
        "source",
        "n_tokens",
        "n_distinct_tokens",
        F.when(F.col("n_tokens") == 0, F.lit(0.0))
        .otherwise(F.col("n_distinct_tokens").cast("double") / F.col("n_tokens"))
        .alias("distinct_1"),
        "n_bigrams",
        "n_distinct_bigrams",
        F.when(F.col("n_bigrams") == 0, F.lit(0.0))
        .otherwise(F.col("n_distinct_bigrams").cast("double") / F.col("n_bigrams"))
        .alias("distinct_2"),
    )


# ---------------------------------------------------------------------------
# sim_eval_hard_negatives — in-bucket contrastive hard-negative mining
# ---------------------------------------------------------------------------
@query(
    "sim_eval_hard_negatives",
    oracle=f"""
    WITH v AS (SELECT vec_id AS id, {_SQL_QUANT.format(e='embedding')} AS qv,
                      label
               FROM embeddings),
    s AS (SELECT id, qv, label, {_sql_hsig('qv', 4, 64)} AS sig FROM v),
    pairs AS (
      SELECT a.id, b.id AS nid, a.label AS la, b.label AS lb,
        {_sql_cos('a.qv', 'b.qv')} AS cosine
      FROM s a JOIN s b ON a.sig = b.sig AND a.id <> b.id),
    hn AS (
      SELECT id, nid, cosine,
        row_number() OVER (PARTITION BY id
                           ORDER BY cosine DESC, nid) AS rnk
      FROM pairs WHERE la <> lb),
    pos AS (
      SELECT id, cosine,
        row_number() OVER (PARTITION BY id
                           ORDER BY cosine DESC, nid) AS rnk
      FROM pairs WHERE la = lb)
    SELECT h.id AS vec_id, h.nid AS hard_neg_id, h.cosine AS hn_cosine,
      p.cosine AS pos_cosine, p.cosine - h.cosine AS margin
    FROM (SELECT * FROM hn WHERE rnk = 1) h
    LEFT JOIN (SELECT * FROM pos WHERE rnk = 1) p ON p.id = h.id
    """,
    tags=("similarity", "B15", "evaluation", "contrastive", "lsh"),
)
def sim_eval_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contrastive hard-negative mining, LSH-bucketed: for every vector,
    the highest-cosine DIFFERENT-label neighbor sharing its 4-plane
    hyperplane-LSH bucket (the hard negative a contrastive trainer
    should pair it with), plus the best same-bucket SAME-label neighbor
    and the margin between them — margin <= 0 flags anchors whose
    nearest in-bucket neighbor is a wrong-label vector, exactly the
    pairs that dominate an InfoNCE batch loss.

    This is in-batch mining done corpus-side: bucket = batch. The
    bucket join is a plain sig-equality HASH join (not a ball probe,
    not all-pairs) — candidate volume is sum of squared bucket sizes,
    tuned by plane count (4 planes / 16 buckets at this corpus; planes
    grow with log|corpus| to hold buckets bounded, the same knob as
    every LSH family member). Scoring reuses the quantized-int cosine
    (exact int64 dot/norms, one IEEE sqrt-mul-divide — bit-identical to
    the DuckDB replay); ties break on neighbor id. Anchors whose bucket
    holds no other label are absent (no negative to mine); pos columns
    are NULL when the bucket holds no same-label peer.

    Scale shape: the family's bucket-then-verify discipline
    (embedding_near_dup_lsh's) — the bucket self-join moves (id, label,
    sig) longs only, vectors join back by id AFTER candidate
    generation, and pair scoring is the Arrow-vectorized int-cosine
    kernel (the interpreted HOF fold is ~50x slower on a pair hot
    path); then a single (id, side)-partitioned top-1 window and an
    id-keyed pivot aggregate resolve both sides in one pass over the
    pair relation, so the pair subtree is never re-executed. All keys
    data-sized; no driver work."""
    # One scan+quantize pass shared by the signature stage and both
    # vector join-backs (identical subtrees under different aliases do
    # not share across joins — the before-plan quantized the corpus 3x).
    embq = _quantized_embeddings(spark, sf_dir)
    emb = load_table(spark, sf_dir, "embeddings")
    sl = S.hyperplane_signatures(
        embq, "vec_id", "embedding", num_planes=4, quantized=True
    ).join(emb.select("vec_id", "label"), "vec_id")
    a = sl.select(
        F.col("vec_id").alias("id"), F.col("label").alias("la"), "sig"
    )
    b = sl.select(
        F.col("vec_id").alias("nid"),
        F.col("label").alias("lb"),
        F.col("sig").alias("sig_b"),
    )
    cand = (
        a.join(b, (F.col("sig") == F.col("sig_b")) & (F.col("id") != F.col("nid")))
        .select("id", "nid", (F.col("la") == F.col("lb")).alias("is_pos"))
    )
    v = embq.select(F.col("vec_id"), F.col("embedding").alias("qv"))
    cos = S._pair_cosine_udf()
    pairs = (
        cand.join(v.select(F.col("vec_id").alias("id"), F.col("qv").alias("va")), "id")
        .join(v.select(F.col("vec_id").alias("nid"), F.col("qv").alias("vb")), "nid")
        .select("id", "nid", "is_pos", cos(F.col("va"), F.col("vb")).alias("cosine"))
    )
    win = Window.partitionBy("id", "is_pos").orderBy(
        F.desc("cosine"), F.asc("nid")
    )
    best = (
        pairs.withColumn("rnk", F.row_number().over(win))
        .filter(F.col("rnk") == 1)
    )
    out = best.groupBy("id").agg(
        F.max(F.when(~F.col("is_pos"), F.col("nid"))).alias("hard_neg_id"),
        F.max(F.when(~F.col("is_pos"), F.col("cosine"))).alias("hn_cosine"),
        F.max(F.when(F.col("is_pos"), F.col("cosine"))).alias("pos_cosine"),
    )
    return out.filter(F.col("hard_neg_id").isNotNull()).select(
        F.col("id").alias("vec_id"),
        "hard_neg_id",
        "hn_cosine",
        "pos_cosine",
        (F.col("pos_cosine") - F.col("hn_cosine")).alias("margin"),
    )
