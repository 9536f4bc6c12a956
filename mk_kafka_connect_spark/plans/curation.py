"""Round-12 curation/profiling query surface: corpus-level boilerplate
and novelty screens, embedding outlier detection, and key-discovery
profiling — the data-curation companions to the dedup/similarity
families in ``plans/llm.py``.

Same oracle discipline as the rest of the registry: deterministic
integer hashing (functions/hashing.py) and exact-int arithmetic until a
final one-division double, so DuckDB reproduces every value bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..catalog import load_table
from ..functions.bounded import bounded_window
from ..functions.hashing import (
    SQL_MD5_MOD,
    SQL_SHINGLES,
    SQL_WORDS,
    md5_mod,
    shingles,
    words,
)
from .llm import (
    _SQL_QUANT,
    _sql_bucket,
    _sql_minhash_sig,
    _sql_shingle_cte,
    _sql_split_case,
)
from ..operators.similarity import quantize
from .registry import query

# ---------------------------------------------------------------------------
# docs_boilerplate_fraction — cross-document frequent-shingle gate
# ---------------------------------------------------------------------------

_BOILER_MIN_DF = 5  # a shingle in >= 5 distinct docs is boilerplate


@query(
    "docs_boilerplate_fraction",
    oracle=f"""
    WITH {_sql_shingle_cte()},
    ex AS (SELECT doc_id, unnest(sh) AS h FROM sh),
    dfreq AS (SELECT h, count(DISTINCT doc_id) AS df FROM ex GROUP BY h),
    scored AS (
      SELECT ex.doc_id,
        CAST(count(*) AS BIGINT) AS n_shingles,
        CAST(sum(CASE WHEN dfreq.df >= {_BOILER_MIN_DF} THEN 1 ELSE 0 END)
             AS BIGINT) AS n_boiler
      FROM ex JOIN dfreq USING (h) GROUP BY ex.doc_id)
    SELECT doc_id, n_shingles, n_boiler,
      CAST(n_boiler AS DOUBLE) / n_shingles AS boiler_frac,
      n_boiler * 10 >= 3 * n_shingles AS flagged
    FROM scored
    """,
    tags=("text", "B15", "quality", "boilerplate"),
)
def docs_boilerplate_fraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CROSS-document boilerplate gate (the C4/RefinedWeb "common
    n-gram" filter): the fraction of each document's distinct word
    trigrams that occur in >= 5 other documents — headers, footers,
    navigation chrome, and license blocks score high while original
    prose scores low. The corpus-frequency complement of
    ``text_repetition_stats`` (which measures WITHIN-document
    repetition); a doc is flagged when >= 30% of its shingles are
    corpus-boilerplate (exact integer cross-multiplication, no float
    compare).

    Scale shape: one shingle explode into a map-side-combinable
    document-frequency group-by (|distinct shingles| rows — vocabulary-
    bounded), a hash join back on the shingle hash (both sides already
    partitioned by h from the group-by), and one per-doc aggregate that
    re-uses the scan partitioning. No window, no all-pairs anything —
    the same 100 TB shape as the MinHash signature pass."""
    d = load_table(spark, sf_dir, "documents")
    # Materialize the (doc, shingle-hash) relation ONCE: the document-
    # frequency model and the scoring join both consume it (two scan +
    # explode + md5 passes in the r18 before-plan — guide §2.4/§5).
    ex = d.select(
        "doc_id",
        F.explode(F.array_distinct(shingles("text", 3))).alias("_s"),
    ).select("doc_id", md5_mod(F.col("_s")).alias("h")).localCheckpoint(
        eager=False
    )
    dfreq = ex.groupBy("h").agg(F.countDistinct("doc_id").alias("df"))
    scored = (
        ex.join(dfreq, "h")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.sum(
                F.when(F.col("df") >= _BOILER_MIN_DF, 1).otherwise(0)
            ).alias("n_boiler"),
        )
    )
    return scored.select(
        "doc_id",
        "n_shingles",
        "n_boiler",
        (F.col("n_boiler").cast("double") / F.col("n_shingles")).alias(
            "boiler_frac"
        ),
        (F.col("n_boiler") * 10 >= 3 * F.col("n_shingles")).alias("flagged"),
    )


# ---------------------------------------------------------------------------
# docs_ngram_novelty_curve — novel-content fraction per crawl snapshot
# ---------------------------------------------------------------------------

_NOVELTY_EPOCHS = 8


@query(
    "docs_ngram_novelty_curve",
    oracle=f"""
    WITH {_sql_shingle_cte()},
    eh AS (
      SELECT DISTINCT doc_id % {_NOVELTY_EPOCHS} AS epoch, h
      FROM (SELECT doc_id, unnest(sh) AS h FROM sh)),
    first AS (SELECT h, min(epoch) AS first_epoch FROM eh GROUP BY h)
    SELECT epoch,
      CAST(count(*) AS BIGINT) AS n_hashes,
      CAST(sum(CASE WHEN first.first_epoch = eh.epoch THEN 1 ELSE 0 END)
           AS BIGINT) AS n_novel,
      CAST(sum(CASE WHEN first.first_epoch = eh.epoch THEN 1 ELSE 0 END)
           AS DOUBLE) / count(*) AS novel_frac
    FROM eh JOIN first USING (h)
    GROUP BY epoch
    """,
    tags=("text", "B15", "dedup", "novelty"),
)
def docs_ngram_novelty_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-snapshot content-novelty curve: treating doc_id % 8 as the
    crawl snapshot, the fraction of each snapshot's distinct trigram
    hashes first seen in THAT snapshot (vs inherited from any earlier
    one) — the curve that decides whether re-crawling still yields new
    training content or just re-downloads the same web (the
    dedup-over-time diagnostic next to the pairwise dedup family; cf.
    the reference's incremental-scan watermark semantics,
    Task.java:294-343, which solve the same "what is new since last
    time" problem at the connector tier).

    Scale shape: distinct (epoch, hash) pairs — one explode + one
    distinct shuffle on the hash-dominated key — then a min-epoch
    group-by over |distinct hashes| rows and a join back on the hash
    key both sides are already partitioned by. Output is
    epoch-count-sized (8 rows)."""
    d = load_table(spark, sf_dir, "documents")
    # eh feeds the min-epoch aggregate AND the join-back; materialize the
    # distinct (epoch, hash) relation once so the shingle explode +
    # distinct shuffle run once, not twice.
    eh = (
        d.select(
            (F.col("doc_id") % _NOVELTY_EPOCHS).alias("epoch"),
            F.explode(F.array_distinct(shingles("text", 3))).alias("_s"),
        )
        .select("epoch", md5_mod(F.col("_s")).alias("h"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    first = eh.groupBy("h").agg(F.min("epoch").alias("first_epoch"))
    novel = F.sum(
        F.when(F.col("first_epoch") == F.col("epoch"), 1).otherwise(0)
    )
    return (
        eh.join(first, "h")
        .groupBy("epoch")
        .agg(
            F.count(F.lit(1)).alias("n_hashes"),
            novel.alias("n_novel"),
        )
        .select(
            "epoch",
            "n_hashes",
            "n_novel",
            (F.col("n_novel").cast("double") / F.col("n_hashes")).alias(
                "novel_frac"
            ),
        )
    )


# ---------------------------------------------------------------------------
# emb_outlier_centroid_dist — per-label embedding outlier screen
# ---------------------------------------------------------------------------

_OUTLIER_TOPK = 5


@query(
    "emb_outlier_centroid_dist",
    oracle=f"""
    WITH q AS (
      SELECT vec_id, label,
        unnest({_SQL_QUANT.format(e='embedding')}) AS q,
        generate_subscripts(embedding, 1) AS dim
      FROM embeddings),
    stats AS (
      SELECT label, dim, CAST(sum(q) AS BIGINT) AS s,
        CAST(count(*) AS BIGINT) AS n
      FROM q GROUP BY label, dim),
    per AS (
      SELECT vec_id, q.label,
        CAST(sum((q.q * n - s) * (q.q * n - s)) AS BIGINT) AS dev2,
        max(n) AS n
      FROM q JOIN stats ON q.label = stats.label AND q.dim = stats.dim
      GROUP BY vec_id, q.label),
    r AS (
      SELECT label, vec_id, n AS n_in_label, dev2,
        CAST(dev2 AS DOUBLE) / CAST(n * n * 100000000 AS BIGINT) AS dist2,
        row_number() OVER (PARTITION BY label
                           ORDER BY dev2 DESC, vec_id) AS rnk
      FROM per)
    SELECT label, vec_id, n_in_label, dev2, dist2, rnk
    FROM r WHERE rnk <= {_OUTLIER_TOPK}
    """,
    tags=("similarity", "B15", "embedding", "outlier"),
)
def emb_outlier_centroid_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label embedding OUTLIER screen: the 5 vectors farthest from
    their label centroid, by exact integer arithmetic — the curation
    pass that surfaces mislabeled or corrupt embeddings before they
    poison contrastive training or ANN index statistics (the quality
    companion to ``emb_label_centroids``/``sim_nearest_centroid``).

    Exactness: with quantized components q and per-(label,dim) sums S
    over n members, n²·Σ(q−μ)² = Σ(n·q − S)² is an exact int64
    (|q| <= 6·10³ here: 64·(2·q_max·n)² stays under 2⁶³ for
    n <= ~3·10⁴ rows/label — two orders past the fixtures);
    ranking uses that integer; dist2 (original units) is ONE IEEE
    division by n²·scale². At corpus scales beyond ~10⁶ rows/label the
    same plan runs with double accumulators — the ranking is the
    point, not the 9th decimal.

    Scale shape: posexplode to (label, dim) partial sums — 64·|labels|
    rows, broadcast back onto the exploded relation — then one per-vec
    aggregate and a per-label top-k window (partitioned by label, never
    global). The embedding table shuffles once, on vec_id."""
    e = load_table(spark, sf_dir, "embeddings")
    q = e.select(
        "vec_id",
        "label",
        F.posexplode(quantize(F.col("embedding"))).alias("dim", "q"),
    )
    stats = q.groupBy("label", "dim").agg(
        F.sum("q").alias("s"), F.count(F.lit(1)).alias("n")
    )
    dev = F.col("q") * F.col("n") - F.col("s")
    per = (
        q.join(F.broadcast(stats), ["label", "dim"])
        .groupBy("vec_id", "label")
        .agg(F.sum(dev * dev).alias("dev2"), F.max("n").alias("n"))
    )
    w = Window.partitionBy("label").orderBy(F.desc("dev2"), F.asc("vec_id"))
    return (
        per.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= _OUTLIER_TOPK)
        .select(
            "label",
            "vec_id",
            F.col("n").alias("n_in_label"),
            "dev2",
            (
                F.col("dev2").cast("double")
                / (F.col("n") * F.col("n") * F.lit(100000000)).cast("double")
            ).alias("dist2"),
            "rnk",
        )
    )


# ---------------------------------------------------------------------------
# dq_candidate_keys — uniqueness / candidate-key discovery
# ---------------------------------------------------------------------------


@query(
    "dq_candidate_keys",
    oracle="""
    WITH s AS (
      SELECT CAST(count(*) AS BIGINT) AS n_rows,
        CAST(count(DISTINCT o_orderkey) AS BIGINT) AS d1,
        CAST(count(DISTINCT o_custkey) AS BIGINT) AS d2,
        CAST(count(DISTINCT o_orderdate) AS BIGINT) AS d3,
        CAST(count(DISTINCT (o_custkey, o_orderdate)) AS BIGINT) AS d4,
        CAST(count(DISTINCT (o_custkey, o_orderkey)) AS BIGINT) AS d5
      FROM orders)
    SELECT 'o_orderkey' AS candidate, n_rows, d1 AS n_distinct,
           n_rows = d1 AS is_key FROM s
    UNION ALL SELECT 'o_custkey', n_rows, d2, n_rows = d2 FROM s
    UNION ALL SELECT 'o_orderdate', n_rows, d3, n_rows = d3 FROM s
    UNION ALL SELECT 'o_custkey,o_orderdate', n_rows, d4, n_rows = d4 FROM s
    UNION ALL SELECT 'o_custkey,o_orderkey', n_rows, d5, n_rows = d5 FROM s
    """,
    tags=("dq", "B7", "profiling", "keys"),
)
def dq_candidate_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Candidate-KEY discovery over a declared candidate set — the
    uniqueness half of schema profiling (the column-dependency half is
    ``dq_fd_discovery``): for each candidate column (set), its exact
    distinct count and whether it uniquely identifies every row. The
    check that catches silently-duplicated primary keys after a bad
    backfill, and tells a pipeline which merge keys are actually safe.

    Scale shape: ONE pass — all five exact distinct counts run in a
    single aggregate (Catalyst's Expand: one row per (candidate,
    grouping) behind a partial-aggregable group-by), then a 1-row
    stack() unpivots to the report relation. At 100 TB the same shape
    holds; an approx_count_distinct screen would cheaply pre-filter
    candidates first, with this exact pass confirming the survivors."""
    o = load_table(spark, sf_dir, "orders")
    s = o.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("o_orderkey").alias("d1"),
        F.countDistinct("o_custkey").alias("d2"),
        F.countDistinct("o_orderdate").alias("d3"),
        F.countDistinct("o_custkey", "o_orderdate").alias("d4"),
        F.countDistinct("o_custkey", "o_orderkey").alias("d5"),
    )
    return s.select(
        F.expr(
            "stack(5,"
            " 'o_orderkey', d1,"
            " 'o_custkey', d2,"
            " 'o_orderdate', d3,"
            " 'o_custkey,o_orderdate', d4,"
            " 'o_custkey,o_orderkey', d5) AS (candidate, n_distinct)"
        ),
        "n_rows",
    ).select(
        "candidate",
        "n_rows",
        "n_distinct",
        (F.col("n_rows") == F.col("n_distinct")).alias("is_key"),
    )


# ---------------------------------------------------------------------------
# Composed reports: registered via functions so the oracles can embed the
# component queries' oracle SQL verbatim (the dedup_lsh_recall_report /
# sim_recall_ivf_vs_exact pattern) — the composition cannot drift from
# the certified components.
# ---------------------------------------------------------------------------


def _register_neardup_overlap_matrix() -> None:
    from .registry import QUERIES as _Q

    lsh_sql = _Q["dedup_minhash_lsh"].oracle

    @query(
        "docs_neardup_overlap_matrix",
        oracle=f"""
        WITH pairs AS ({lsh_sql})
        SELECT least(da.source, db.source) AS source_a,
          greatest(da.source, db.source) AS source_b,
          CAST(count(*) AS BIGINT) AS n_pairs,
          sum(est_jaccard) / count(*) AS avg_est_jaccard
        FROM pairs
          JOIN documents da ON pairs.id_a = da.doc_id
          JOIN documents db ON pairs.id_b = db.doc_id
        GROUP BY 1, 2
        """,
        tags=("dedup", "B15", "minhash", "audit"),
    )
    def docs_neardup_overlap_matrix(
        spark: SparkSession, sf_dir: str
    ) -> DataFrame:
        """Crawl-overlap AUDIT matrix: the MinHash-LSH near-dup pairs
        cross-tabulated by (source, source) — which ingestion sources
        duplicate each other, and how strongly. The report that decides
        source-level dedup policy (drop a mirrored crawl wholesale vs
        pay pairwise dedup) before any per-document work; diagonal
        cells measure within-source duplication. Composes the CERTIFIED
        dedup_minhash_lsh operator; the oracle embeds its SQL verbatim.

        Exactness: est_jaccard values are exact multiples of 1/32
        (k equal signature components / 32), so double summation is
        exact in any order and the average is ONE IEEE division.

        Scale shape: pairs are LSH-bucket-bounded (never all-pairs);
        the two document joins are id-keyed hash joins carrying only
        (doc_id, source); the matrix aggregate is |sources|²-bounded."""
        from .registry import QUERIES as _QQ

        d = load_table(spark, sf_dir, "documents")
        pairs = _QQ["dedup_minhash_lsh"].fn(spark, sf_dir)
        da = d.select(
            F.col("doc_id").alias("id_a"), F.col("source").alias("src_a")
        )
        db = d.select(
            F.col("doc_id").alias("id_b"), F.col("source").alias("src_b")
        )
        return (
            pairs.join(da, "id_a")
            .join(db, "id_b")
            .select(
                F.least("src_a", "src_b").alias("source_a"),
                F.greatest("src_a", "src_b").alias("source_b"),
                "est_jaccard",
            )
            .groupBy("source_a", "source_b")
            .agg(
                F.count(F.lit(1)).alias("n_pairs"),
                (F.sum("est_jaccard") / F.count(F.lit(1))).alias(
                    "avg_est_jaccard"
                ),
            )
        )


def _register_bpe_fertility() -> None:
    from .registry import QUERIES as _Q

    per_doc_sql = _Q["docs_bpe_token_counts"].oracle

    @query(
        "bpe_fertility_by_source",
        oracle=f"""
        WITH per AS ({per_doc_sql})
        SELECT d.lang, d.source,
          CAST(count(*) AS BIGINT) AS n_docs,
          CAST(sum(per.n_words) AS BIGINT) AS n_words,
          CAST(sum(per.n_bpe_tokens) AS BIGINT) AS n_bpe_tokens,
          CAST(sum(per.n_bpe_tokens) AS DOUBLE) / sum(per.n_words)
            AS fertility,
          CAST(sum(per.n_chars) AS DOUBLE) / sum(per.n_bpe_tokens)
            AS chars_per_token
        FROM per JOIN documents d USING (doc_id)
        GROUP BY d.lang, d.source
        """,
        tags=("text", "B15", "tokenizer", "bpe", "fairness"),
    )
    def bpe_fertility_by_source(
        spark: SparkSession, sf_dir: str
    ) -> DataFrame:
        """Tokenizer FERTILITY report per (lang, source): BPE tokens per
        whitespace word and chars per token, aggregated from the
        certified per-document encoder (docs_bpe_token_counts) — the
        model-card metric that exposes tokenizer unfairness (a language
        with fertility 2× pays 2× the context budget per word) and
        drives merge-budget allocation across corpus slices.

        Exactness: exact int64 sums from the component query; the two
        ratios are each ONE IEEE division. Scale shape: inherits the
        component's vocabulary-sized encode (the corpus never moves for
        the merge application); this layer adds one id-keyed hash join
        against (doc_id, lang, source) and a |lang×source|-bounded
        aggregate."""
        from .registry import QUERIES as _QQ

        d = load_table(spark, sf_dir, "documents")
        per = _QQ["docs_bpe_token_counts"].fn(spark, sf_dir)
        return (
            per.join(d.select("doc_id", "lang", "source"), "doc_id")
            .groupBy("lang", "source")
            .agg(
                F.count(F.lit(1)).alias("n_docs"),
                F.sum("n_words").alias("n_words"),
                F.sum("n_bpe_tokens").alias("n_bpe_tokens"),
                (
                    F.sum("n_bpe_tokens").cast("double") / F.sum("n_words")
                ).alias("fertility"),
                (
                    F.sum("n_chars").cast("double") / F.sum("n_bpe_tokens")
                ).alias("chars_per_token"),
            )
        )


_register_neardup_overlap_matrix()
_register_bpe_fertility()


# ---------------------------------------------------------------------------
# dq_referential_orphans — schema-wide foreign-key integrity audit
# ---------------------------------------------------------------------------

# (child table, child key, parent table, parent key) — the full FK edge
# set of the TPC-H-ish schema.
_FK_EDGES = (
    ("lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("orders", "o_custkey", "customer", "c_custkey"),
    ("customer", "c_nationkey", "nation", "n_nationkey"),
    ("supplier", "s_nationkey", "nation", "n_nationkey"),
    ("nation", "n_regionkey", "region", "r_regionkey"),
)


def _sql_fk_check(ct: str, ck: str, pt: str, pk: str) -> str:
    label = f"{ct}.{ck}->{pt}.{pk}"
    return f"""
    SELECT '{label}' AS fk,
      CAST(count(*) AS BIGINT) AS n_child_rows,
      CAST(sum(CASE WHEN p.{pk} IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        AS n_orphans,
      sum(CASE WHEN p.{pk} IS NULL THEN 1 ELSE 0 END) = 0 AS ref_intact
    FROM {ct} c LEFT JOIN (SELECT DISTINCT {pk} FROM {pt}) p
      ON c.{ck} = p.{pk}"""


@query(
    "dq_referential_orphans",
    oracle=" UNION ALL ".join(_sql_fk_check(*e) for e in _FK_EDGES),
    tags=("dq", "B6", "B7", "referential-integrity"),
)
def dq_referential_orphans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-WIDE referential-integrity audit: for every foreign-key
    edge of the warehouse (7 edges, lineitem→orders/part/supplier
    through nation→region), the child row count, orphan count (child
    keys with no parent), and an intact flag — the DQ pass that catches
    a partial parent-table load before downstream joins silently drop
    (inner) or null-inflate (outer) the orphans. Completes the DQ
    family: dq_checks_orders = row rules, dq_candidate_keys =
    uniqueness, dq_fd_discovery = dependencies, this = cross-table.

    Scale shape: per edge ONE left hash join child⋈distinct(parent
    keys) feeding a partial-aggregable count/sum — parent key sets
    broadcast when small (nation/region/customer) and hash-join
    otherwise; the 7 audits are independent plan branches unioned into
    a 7-row report."""
    # Fused per CHILD TABLE (was: one scan + join + agg per EDGE — the
    # three lineitem audits each re-read the fact table; 42 Exchanges).
    # All of a child's FK edges ride ONE scan: chained left joins
    # against the (distinct) parent key sets cannot multiply rows, one
    # aggregate emits every edge's orphan count, and an explode unpivots
    # to the same per-edge report rows.
    by_child: dict[str, list[tuple[str, str, str]]] = {}
    for ct, ck, pt, pk in _FK_EDGES:
        by_child.setdefault(ct, []).append((ck, pt, pk))
    out = None
    for ct, edges in by_child.items():
        j = load_table(spark, sf_dir, ct).select(
            *[F.col(ck).alias(f"_ck{i}") for i, (ck, _, _) in enumerate(edges)]
        )
        for i, (_ck, pt, pk) in enumerate(edges):
            parent = load_table(spark, sf_dir, pt).select(
                F.col(pk).alias(f"_pk{i}")
            ).distinct()
            j = j.join(parent, F.col(f"_ck{i}") == F.col(f"_pk{i}"), "left")
        agg = j.agg(
            F.count(F.lit(1)).alias("n_child_rows"),
            *[
                F.sum(F.when(F.col(f"_pk{i}").isNull(), 1).otherwise(0)).alias(
                    f"_orph{i}"
                )
                for i in range(len(edges))
            ],
        )
        rows = agg.select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(f"{ct}.{ck}->{pt}.{pk}").alias("fk"),
                            F.col("n_child_rows"),
                            F.col(f"_orph{i}").alias("n_orphans"),
                        )
                        for i, (ck, pt, pk) in enumerate(edges)
                    ]
                )
            ).alias("e")
        ).select(
            "e.fk",
            "e.n_child_rows",
            "e.n_orphans",
            (F.col("e.n_orphans") == 0).alias("ref_intact"),
        )
        out = rows if out is None else out.unionByName(rows)
    return out


# ---------------------------------------------------------------------------
# cdc_scd2_integrity — temporal-integrity audit of an SCD2 history
# ---------------------------------------------------------------------------


def _register_scd2_integrity() -> None:
    from .registry import QUERIES as _Q

    scd2_sql = _Q["cdc_scd2_history"].oracle

    @query(
        "cdc_scd2_integrity",
        oracle=f"""
        WITH h AS ({scd2_sql}),
        x AS (
          SELECT user_id, valid_from, valid_to, is_current,
            lead(valid_from) OVER (PARTITION BY user_id
                                   ORDER BY valid_from, event_id) AS nxt
          FROM h),
        per AS (
          SELECT user_id,
            CAST(count(*) AS BIGINT) AS n_versions,
            sum(CASE WHEN is_current THEN 1 ELSE 0 END) AS n_current,
            sum(CASE WHEN valid_to IS NOT NULL AND nxt IS NOT NULL
                      AND valid_to > nxt THEN 1 ELSE 0 END) AS n_overlaps,
            sum(CASE WHEN valid_to IS NOT NULL AND nxt IS NOT NULL
                      AND valid_to < nxt THEN 1 ELSE 0 END) AS n_gaps
          FROM x GROUP BY user_id)
        SELECT CAST(count(*) AS BIGINT) AS n_keys,
          CAST(sum(n_versions) AS BIGINT) AS n_versions,
          CAST(sum(CASE WHEN n_current = 1 THEN 1 ELSE 0 END) AS BIGINT)
            AS n_keys_one_current,
          CAST(sum(n_overlaps) AS BIGINT) AS n_overlaps,
          CAST(sum(n_gaps) AS BIGINT) AS n_gaps,
          (count(*) = sum(CASE WHEN n_current = 1 THEN 1 ELSE 0 END)
           AND sum(n_overlaps) = 0 AND sum(n_gaps) = 0) AS scd2_ok
        FROM per
        """,
        tags=("cdc", "dq", "B8", "B9", "scd2", "audit"),
    )
    def cdc_scd2_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Temporal-integrity AUDIT of an SCD2 dimension: over the
        certified cdc_scd2_history output, count per key the open
        (is_current) versions, interval overlaps (valid_to past the
        next version's valid_from), and coverage gaps — then roll up to
        the one-row report with the scd2_ok verdict. The invariant
        check every warehouse runs after an SCD2 merge: exactly one
        open row per key, intervals that tile time with no overlap and
        no gap; a bad backfill breaks as-of joins silently, this
        catches it loudly.

        Scale shape: one per-key ordered window over the history (the
        standard SCD2 partitioning — parallel across keys), one keyed
        aggregate, one global 1-row rollup (partial-aggregable)."""
        from .registry import QUERIES as _QQ

        h = _QQ["cdc_scd2_history"].fn(spark, sf_dir)
        w = Window.partitionBy("user_id").orderBy("valid_from", "event_id")
        x = h.select(
            "user_id",
            "valid_from",
            "valid_to",
            "is_current",
            F.lead("valid_from").over(w).alias("nxt"),
        )
        both = F.col("valid_to").isNotNull() & F.col("nxt").isNotNull()
        per = x.groupBy("user_id").agg(
            F.count(F.lit(1)).alias("n_versions"),
            F.sum(F.when(F.col("is_current"), 1).otherwise(0)).alias(
                "n_current"
            ),
            F.sum(
                F.when(both & (F.col("valid_to") > F.col("nxt")), 1).otherwise(0)
            ).alias("n_overlaps"),
            F.sum(
                F.when(both & (F.col("valid_to") < F.col("nxt")), 1).otherwise(0)
            ).alias("n_gaps"),
        )
        one_current = F.sum(F.when(F.col("n_current") == 1, 1).otherwise(0))
        return per.agg(
            F.count(F.lit(1)).alias("n_keys"),
            F.sum("n_versions").alias("n_versions"),
            one_current.alias("n_keys_one_current"),
            F.sum("n_overlaps").alias("n_overlaps"),
            F.sum("n_gaps").alias("n_gaps"),
        ).select(
            "n_keys",
            "n_versions",
            "n_keys_one_current",
            "n_overlaps",
            "n_gaps",
            (
                (F.col("n_keys") == F.col("n_keys_one_current"))
                & (F.col("n_overlaps") == 0)
                & (F.col("n_gaps") == 0)
            ).alias("scd2_ok"),
        )


_register_scd2_integrity()


# ---------------------------------------------------------------------------
# pipeline_stage_funnel — per-stage survival audit of the prep pipeline
# ---------------------------------------------------------------------------


def _register_stage_funnel() -> None:
    from .llm import (
        _SQL_NORM_TEXT,
        _sql_gopher_passed,
        _sql_minhash_sig,
        _sql_shingle_cte,
    )

    @query(
        "pipeline_stage_funnel",
        oracle=f"""
        WITH passed AS ({_sql_gopher_passed()}),
        canon AS (
          SELECT min(doc_id) AS doc_id FROM passed
          GROUP BY md5({_SQL_NORM_TEXT})),
        dd AS (
          SELECT p.doc_id, p.text FROM passed p
          JOIN canon c ON p.doc_id = c.doc_id),
        {_sql_shingle_cte(table="dd")},
        sigs AS (SELECT doc_id, {_sql_minhash_sig(32)} AS sig FROM sh),
        bands AS (
          SELECT doc_id, b AS band_idx,
            array_to_string(sig[b * 4 + 1 : b * 4 + 4], ',') AS band_key
          FROM sigs, unnest(range(0, 8)) t(b)),
        cands AS (
          SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
          FROM bands a JOIN bands b
            ON a.band_idx = b.band_idx AND a.band_key = b.band_key
           AND a.doc_id < b.doc_id),
        est AS (
          SELECT id_a, id_b,
            CAST(len(list_filter(list_zip(x.sig, y.sig), p -> p[1] = p[2]))
                 AS DOUBLE) / 32 AS est_jaccard
          FROM cands JOIN sigs x ON id_a = x.doc_id
                     JOIN sigs y ON id_b = y.doc_id),
        removed AS (
          SELECT DISTINCT id_b AS doc_id FROM est WHERE est_jaccard >= 0.7),
        near AS (
          SELECT dd.doc_id FROM dd
          ANTI JOIN removed r ON dd.doc_id = r.doc_id),
        u AS (
          SELECT '0_raw' AS stage, CAST(count(*) AS BIGINT) AS n_docs
          FROM documents
          UNION ALL SELECT '1_quality_gate', count(*) FROM passed
          UNION ALL SELECT '2_exact_dedup', count(*) FROM dd
          UNION ALL SELECT '3_near_dedup', count(*) FROM near)
        SELECT stage, n_docs,
          coalesce(lag(n_docs) OVER (ORDER BY stage) - n_docs, 0)
            AS n_removed
        FROM u
        """,
        tags=("pipeline", "B15", "dedup", "audit"),
    )
    def pipeline_stage_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Per-stage SURVIVAL funnel of the training-data prep pipeline:
        raw corpus → Gopher quality gate → exact dedup (normalized-md5,
        keep min id) → MinHash-LSH near-dedup (drop the larger id of
        every >= 0.7-estimated pair), with documents surviving and
        removed at each stage — the observability artifact every
        production corpus build logs next to the dataset itself (the
        audit companion to ``pipeline_training_data``, which emits the
        final dataset; same certified operators, composed for counting).
        Near-dedup here is the one-pass keep-smaller-id policy — cluster
        -canonical selection is ``dedup_clusters``' job.

        Scale shape: inherits each component's posture — map-side gate,
        one dedup shuffle, banded LSH bucket join (never all-pairs) —
        plus four 1-row aggregates; the final lag window orders the
        4-row stage table (bounded, WINDOW_ALLOWED)."""
        from ..operators import dedup as D_ops
        from ..operators.text import fingerprint, gopher_quality_flags

        d = load_table(spark, sf_dir, "documents")
        # Materialize each funnel stage ONCE: the per-stage counting
        # union re-derives every stage's full prefix (the r18
        # before-plan ran the Gopher gate 3× and the fingerprint 2× —
        # 6 documents scans for a 4-row result). Checkpointing the
        # gate survivors and the dedup survivors is the guide §2.4/§5
        # persist-between-superstages discipline; each stage's pipeline
        # now runs exactly once per invocation.
        passed = (
            gopher_quality_flags(d, "text")
            .filter(F.col("pass_gopher"))
            .select("doc_id", "text")
            .localCheckpoint(eager=False)
        )
        fp = fingerprint(passed, "text")
        canon = fp.groupBy("fp_md5").agg(F.min("doc_id").alias("doc_id"))
        dd = (
            fp.join(canon.select("doc_id"), "doc_id", "left_semi")
            .select("doc_id", "text")
            .localCheckpoint(eager=False)
        )
        pairs = D_ops.minhash_near_dups(
            dd, "text", "doc_id", n=3, num_hashes=32, bands=8, threshold=0.7
        )
        removed = pairs.select(F.col("id_b").alias("doc_id")).distinct()
        near = dd.join(removed, "doc_id", "left_anti")
        stages = (
            ("0_raw", d),
            ("1_quality_gate", passed),
            ("2_exact_dedup", dd),
            ("3_near_dedup", near),
        )
        u = None
        for name, df_ in stages:
            row = df_.agg(F.count(F.lit(1)).alias("n_docs")).select(
                F.lit(name).alias("stage"), "n_docs"
            )
            u = row if u is None else u.unionByName(row)
        w = bounded_window("stage", "stage")
        return u.select(
            "stage",
            "n_docs",
            F.coalesce(
                F.lag("n_docs").over(w) - F.col("n_docs"), F.lit(0)
            ).alias("n_removed"),
        )


_register_stage_funnel()


# ---------------------------------------------------------------------------
# docs_sample_exact_budget — exact largest-remainder stratified sampling
# ---------------------------------------------------------------------------

_SAMPLE_BUDGET = 500  # total docs in the sample across all strata
_SAMPLE_BLOCK = 4_000_000  # md5_mod range step -> ~251 ordered hash blocks

_SAMPLE_H = SQL_MD5_MOD("CAST(doc_id AS VARCHAR)")


@query(
    "docs_sample_exact_budget",
    oracle=f"""
    WITH c AS (
      SELECT source, CAST(count(*) AS BIGINT) AS n_docs
      FROM documents GROUP BY source),
    tot AS (SELECT CAST(sum(n_docs) AS BIGINT) AS c_total FROM c),
    q AS (
      SELECT source, n_docs,
        ({_SAMPLE_BUDGET} * n_docs) // c_total AS base,
        ({_SAMPLE_BUDGET} * n_docs) % c_total AS rem
      FROM c, tot),
    leftover AS (
      SELECT CAST({_SAMPLE_BUDGET} - sum(base) AS BIGINT) AS r_extra FROM q),
    alloc AS (
      SELECT source, n_docs,
        CAST(base + CASE WHEN
          row_number() OVER (ORDER BY rem DESC, source) <= r_extra
          THEN 1 ELSE 0 END AS BIGINT) AS alloc
      FROM q, leftover),
    ranked AS (
      SELECT doc_id, source, n_chars,
        row_number() OVER (
          PARTITION BY source ORDER BY {_SAMPLE_H}, doc_id) AS rnk
      FROM documents),
    sel AS (
      SELECT r.source, r.doc_id, r.n_chars
      FROM ranked r JOIN alloc a USING (source) WHERE r.rnk <= a.alloc),
    agg AS (
      SELECT source,
        CAST(count(*) AS BIGINT) AS n_selected,
        CAST(sum(n_chars) AS BIGINT) AS sel_chars,
        CAST(sum(doc_id) AS BIGINT) AS sel_id_sum
      FROM sel GROUP BY source)
    SELECT a.source, a.n_docs, a.alloc,
      CAST(coalesce(g.n_selected, 0) AS BIGINT) AS n_selected,
      CAST(coalesce(g.sel_chars, 0) AS BIGINT) AS sel_chars,
      CAST(coalesce(g.sel_id_sum, 0) AS BIGINT) AS sel_id_sum
    FROM alloc a LEFT JOIN agg g USING (source)
    ORDER BY a.source
    """,
    tags=("pipeline", "B15", "sampling", "curation"),
)
def docs_sample_exact_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic EXACT stratified sample of the corpus (the
    fixed-size complement of ``docs_stratified_sample``, the
    configured-RATE map-side filter — rates can't hit a byte budget
    exactly; this does, at the price of one rank): a fixed budget of
    500 documents apportioned across ``source`` strata by the
    largest-remainder (Hamilton) method — quota_s = floor(N*c_s/C) plus
    one extra for the strata with the largest remainders (N*c_s mod C,
    ties by source name) until the budget is exact — then the first
    alloc_s documents of each stratum in (md5(doc_id), doc_id) order.
    Every training-data pipeline needs this exact operator for eval-set
    carve-outs and mixture rebalancing; hash-ordered selection makes the
    sample reproducible across runs AND engines (no rand()), and
    integer-only apportionment means sum(alloc) == N exactly.

    Scale shape (the reason this is not just ``row_number() PARTITION BY
    source`` — which would sort each multi-TB stratum on ONE task): the
    within-stratum rank uses the two-phase block-prefix device
    (plans/layout.py grouped()): docs hash into ~251 ORDERED md5-range
    blocks; per-(source, block) counts (a map-side-combinable aggregate)
    give each block's exclusive prefix via a window over the k x 251-row
    bounded counts table; and — the pruning step — any block whose prefix
    already meets the stratum's allocation is dropped BEFORE the sort, so
    the only per-doc window runs over the few candidate blocks that can
    still hold selected rows (~alloc + one block per stratum, regardless
    of corpus size). Allocation itself is computed on the k-row stratum
    table under ``bounded_window``. At 100 TB: one documents scan, two
    small aggregates, a broadcast join, and a window over ~O(N) rows."""
    N = F.lit(_SAMPLE_BUDGET).cast("long")
    d = load_table(spark, sf_dir, "documents")
    c = d.groupBy("source").agg(F.count(F.lit(1)).alias("n_docs"))
    wt = bounded_window("source", "source").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    q = c.select(
        "source",
        "n_docs",
        F.sum("n_docs").over(wt).alias("_c_total"),
    ).select(
        "source",
        "n_docs",
        ((N * F.col("n_docs")) / F.col("_c_total"))
        .cast("long")
        .alias("_base"),
        ((N * F.col("n_docs")) % F.col("_c_total")).alias("_rem"),
    )
    wr = bounded_window("source", F.col("_rem").desc(), F.col("source"))
    alloc = q.select(
        "source",
        "n_docs",
        "_base",
        F.row_number().over(wr).cast("long").alias("_rn"),
        F.sum("_base").over(wt).alias("_base_total"),
    ).select(
        "source",
        "n_docs",
        (
            F.col("_base")
            + F.when(F.col("_rn") <= N - F.col("_base_total"), 1).otherwise(0)
        ).alias("alloc"),
    )
    keyed = d.select(
        "doc_id",
        "source",
        "n_chars",
        md5_mod(F.col("doc_id").cast("string")).alias("_h"),
    ).withColumn("_blk", (F.col("_h") / F.lit(_SAMPLE_BLOCK)).cast("long"))
    counts = keyed.groupBy("source", "_blk").agg(
        F.count(F.lit(1)).alias("_bc")
    )
    wb = (
        Window.partitionBy("source")
        .orderBy("_blk")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prior = counts.select(
        "source",
        "_blk",
        F.coalesce(F.sum("_bc").over(wb), F.lit(0).cast("long")).alias(
            "_prior"
        ),
    )
    ww = Window.partitionBy("source", "_blk").orderBy("_h", "doc_id")
    sel = (
        keyed.join(F.broadcast(prior), ["source", "_blk"])
        .join(F.broadcast(alloc.select("source", "alloc")), "source")
        .filter(F.col("_prior") < F.col("alloc"))
        .withColumn(
            "_rnk", F.col("_prior") + F.row_number().over(ww).cast("long")
        )
        .filter(F.col("_rnk") <= F.col("alloc"))
    )
    agg = sel.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_selected"),
        F.sum("n_chars").alias("sel_chars"),
        F.sum("doc_id").alias("sel_id_sum"),
    )
    return (
        alloc.join(agg, "source", "left")
        .select(
            "source",
            "n_docs",
            "alloc",
            F.coalesce("n_selected", F.lit(0).cast("long")).alias(
                "n_selected"
            ),
            F.coalesce("sel_chars", F.lit(0).cast("long")).alias("sel_chars"),
            F.coalesce("sel_id_sum", F.lit(0).cast("long")).alias(
                "sel_id_sum"
            ),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# docs_greedy_pack_stats — no-split example-packing utilization report
# ---------------------------------------------------------------------------

_PACK_BUDGET = 256  # tokens per pack
_PACK_STREAMS = 16  # independent pack streams


@query(
    "docs_greedy_pack_stats",
    oracle=f"""
    WITH RECURSIVE t AS (
      SELECT doc_id,
        least(len(string_split(text, ' ')), {_PACK_BUDGET}) AS tok,
        {SQL_MD5_MOD("CAST(doc_id AS VARCHAR)")} AS h
      FROM documents),
    s AS (
      SELECT doc_id, tok, h, h % {_PACK_STREAMS} AS stream,
        row_number() OVER (
          PARTITION BY h % {_PACK_STREAMS} ORDER BY h, doc_id) AS rn
      FROM t),
    p AS (
      SELECT stream, rn, tok, tok AS fill, CAST(0 AS BIGINT) AS pack_id
      FROM s WHERE rn = 1
      UNION ALL
      SELECT s.stream, s.rn, s.tok,
        CASE WHEN p.fill + s.tok > {_PACK_BUDGET}
             THEN s.tok ELSE p.fill + s.tok END,
        CASE WHEN p.fill + s.tok > {_PACK_BUDGET}
             THEN p.pack_id + 1 ELSE p.pack_id END
      FROM p JOIN s ON s.stream = p.stream AND s.rn = p.rn + 1)
    SELECT stream,
      CAST(count(*) AS BIGINT) AS n_docs,
      CAST(max(pack_id) + 1 AS BIGINT) AS n_packs,
      CAST(sum(tok) AS BIGINT) AS total_tok,
      CAST(max(pack_id) + 1 AS BIGINT) * {_PACK_BUDGET}
        - CAST(sum(tok) AS BIGINT) AS waste,
      CAST(sum(tok) AS DOUBLE)
        / ((max(pack_id) + 1) * {_PACK_BUDGET}) AS util
    FROM p GROUP BY stream ORDER BY stream
    """,
    tags=("pipeline", "B15", "packing", "stateful"),
)
def docs_greedy_pack_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Utilization report of NO-SPLIT greedy example packing: documents
    (truncated to the 256-token budget) greedily fill fixed-budget packs
    in deterministic md5-shuffled order within 16 independent streams; a
    pack closes when the next doc would overflow. Reports per-stream doc
    /pack counts, packed tokens, boundary waste, and fill utilization —
    the number a training pipeline watches to choose between no-split
    packing (keeps document boundaries, wastes pack tails) and
    ``pack_sequences``' concat-then-chunk (zero waste, splits docs).

    The close-on-overflow recurrence is sequential state — the textbook
    non-SQL-expressible custom operator (cf. the reference's stateful
    incremental scan, Task.java:294-343, for the connector-tier analog)
    — yet still fully oracle-checked: the DuckDB side replays the exact
    recurrence as a RECURSIVE CTE advancing all streams in lockstep,
    and both engines agree bit-for-bit on every count (util is one IEEE
    division of exact integers).

    Scale shape: one scan → shuffle by md5-uniform stream → per-stream
    linear Arrow ``applyInPandas`` kernels (operators/pipeline.py
    ``greedy_pack``) → 16-row aggregate. Parallelism = n_streams, the
    knob real packers shard by; no global sort anywhere."""
    from ..operators.pipeline import greedy_pack

    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        F.least(
            F.size(F.split(F.col("text"), " ")), F.lit(_PACK_BUDGET)
        )
        .cast("long")
        .alias("tok"),
    )
    packed = greedy_pack(
        toks, "doc_id", "tok", budget=_PACK_BUDGET, n_streams=_PACK_STREAMS
    )
    return (
        packed.groupBy("stream")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            (F.max("pack_id") + 1).alias("n_packs"),
            F.sum("tok").alias("total_tok"),
        )
        .select(
            "stream",
            "n_docs",
            "n_packs",
            "total_tok",
            (F.col("n_packs") * _PACK_BUDGET - F.col("total_tok")).alias(
                "waste"
            ),
            (
                F.col("total_tok").cast("double")
                / (F.col("n_packs") * _PACK_BUDGET)
            ).alias("util"),
        )
        .orderBy("stream")
    )


# ---------------------------------------------------------------------------
# dedup_split_leakage — near-dup pairs straddling train/valid/test splits
# ---------------------------------------------------------------------------


def _register_split_leakage() -> None:
    _SPLIT_SQL = None  # computed below to keep the f-string readable

    @query(
        "dedup_split_leakage",
        oracle=None,  # patched after definition (needs the split helper)
        tags=("dedup", "B15", "pipeline", "audit"),
    )
    def dedup_split_leakage(spark: SparkSession, sf_dir: str) -> DataFrame:
        """SPLIT-LEAKAGE audit: MinHash-LSH near-dup pairs (est-Jaccard
        >= 0.7, the certified ``dedup_minhash_lsh`` pair set) cross-
        tabulated by the deterministic 8/1/1 train/valid/test assignment
        (``hash_split``). Any pair straddling two different splits is an
        eval-contamination leak — near-identical text in train AND test
        silently inflates held-out metrics, which is why production
        corpus builds near-dedup BEFORE splitting and run exactly this
        audit after. Rows: (split_lo, split_hi, n_pairs,
        avg_est_jaccard, is_leak); est-Jaccard values are multiples of
        1/32 (dyadic), so their sum — and the one-division average — is
        IEEE-exact in any order, hash-identical across engines.

        Scale shape: inherits the LSH banded bucket join (never
        all-pairs) + two broadcast-sized hash joins onto the per-doc
        split assignment (itself a pure map-side md5 bucket), then a
        <= 6-row aggregate. The pair relation is the bottleneck and it
        is the same one every dedup query already certifies."""
        from ..operators import dedup as D_ops
        from ..operators.pipeline import hash_split

        d = load_table(spark, sf_dir, "documents")
        pairs = D_ops.minhash_near_dups(
            d, "text", "doc_id", n=3, num_hashes=32, bands=8, threshold=0.7
        )
        sp = hash_split(d, "doc_id").select("doc_id", "split")
        j = (
            pairs.join(
                sp.select(
                    F.col("doc_id").alias("id_a"),
                    F.col("split").alias("split_a"),
                ),
                "id_a",
            )
            .join(
                sp.select(
                    F.col("doc_id").alias("id_b"),
                    F.col("split").alias("split_b"),
                ),
                "id_b",
            )
            .select(
                F.least("split_a", "split_b").alias("split_lo"),
                F.greatest("split_a", "split_b").alias("split_hi"),
                "est_jaccard",
            )
        )
        return (
            j.groupBy("split_lo", "split_hi")
            .agg(
                F.count(F.lit(1)).alias("n_pairs"),
                (F.sum("est_jaccard") / F.count(F.lit(1))).alias(
                    "avg_est_jaccard"
                ),
            )
            .select(
                "split_lo",
                "split_hi",
                "n_pairs",
                "avg_est_jaccard",
                (F.col("split_lo") != F.col("split_hi")).alias("is_leak"),
            )
            .orderBy("split_lo", "split_hi")
        )


_register_split_leakage()


def _sql_split_leakage_oracle() -> str:
    split = _sql_split_case(_sql_bucket("CAST(doc_id AS VARCHAR)"))
    return f"""
    WITH {_sql_shingle_cte()},
    sigs AS (SELECT doc_id, {_sql_minhash_sig(32)} AS sig FROM sh),
    bands AS (
      SELECT doc_id, b AS band_idx,
        array_to_string(sig[b * 4 + 1 : b * 4 + 4], ',') AS band_key
      FROM sigs, unnest(range(0, 8)) t(b)),
    cands AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM bands a JOIN bands b
        ON a.band_idx = b.band_idx AND a.band_key = b.band_key
       AND a.doc_id < b.doc_id),
    est AS (
      SELECT id_a, id_b,
        CAST(len(list_filter(list_zip(x.sig, y.sig), p -> p[1] = p[2]))
             AS DOUBLE) / 32 AS est_jaccard
      FROM cands JOIN sigs x ON id_a = x.doc_id JOIN sigs y ON id_b = y.doc_id),
    pr AS (SELECT * FROM est WHERE est_jaccard >= 0.7),
    sp AS (SELECT doc_id, {split} AS split FROM documents),
    cl AS (
      SELECT least(sa.split, sb.split) AS split_lo,
        greatest(sa.split, sb.split) AS split_hi, est_jaccard
      FROM pr JOIN sp sa ON pr.id_a = sa.doc_id
              JOIN sp sb ON pr.id_b = sb.doc_id)
    SELECT split_lo, split_hi,
      CAST(count(*) AS BIGINT) AS n_pairs,
      sum(est_jaccard) / count(*) AS avg_est_jaccard,
      split_lo <> split_hi AS is_leak
    FROM cl GROUP BY split_lo, split_hi
    ORDER BY split_lo, split_hi
    """


from .llm import _set_oracle as _patch_oracle  # noqa: E402

_patch_oracle("dedup_split_leakage", _sql_split_leakage_oracle())


# ---------------------------------------------------------------------------
# sim_hybrid_rrf — reciprocal-rank fusion of lexical BM25 + vector top-k
# ---------------------------------------------------------------------------

_RRF_K = 60  # the standard RRF damping constant
_RRF_TOPK = 50  # per-list depth (matches _BM25_TOPK)
_RRF_OUT = 10  # fused results returned


def _register_hybrid_rrf() -> None:
    @query(
        "sim_hybrid_rrf",
        oracle=None,  # patched below (embeds the certified BM25 oracle)
        tags=("similarity", "B15", "retrieval", "fusion"),
    )
    def sim_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
        """HYBRID retrieval by reciprocal-rank fusion (RRF, the standard
        score-free list combiner): the certified BM25 lexical top-50
        (``docs_bm25_topk``'s exact ranking, reused verbatim) fused with
        an exact vector top-50 (integer dot product of the quantized
        embeddings against the vec_id-0 query vector, descending dot,
        id tie-break — fixture ids align doc_id = vec_id) via
        score(d) = 1/(60+r_lex) + 1/(60+r_vec), missing list membership
        contributing 0. Both contributions are single IEEE divisions of
        identical integers and their fixed-order sum is one addition, so
        the fused ordering — and the returned top-10 — hash-matches
        across engines exactly.

        Scale shape: the lexical branch inherits BM25's posture (term
        filter before aggregation, TakeOrdered top-k); the vector branch
        is a 1-row broadcast query vector against a map-side dot product
        + TakeOrdered — the brute-force baseline by design; swap the
        IVF/LSH rankers in for the ANN tier (same fusion works on any
        two rank lists). The fusion itself joins two <= 50-row relations
        — driver-trivial at any corpus size."""
        from ..operators.similarity import _dot

        from .analysis import docs_bm25_topk

        lex = docs_bm25_topk(spark, sf_dir).select(
            F.col("doc_id").alias("id"),
            F.col("rnk").cast("long").alias("rank_lex"),
        )
        emb = load_table(spark, sf_dir, "embeddings").select(
            "vec_id", quantize(F.col("embedding")).alias("q")
        )
        qv = emb.filter(F.col("vec_id") == 0).select(F.col("q").alias("qq"))
        scored = emb.crossJoin(F.broadcast(qv)).select(
            "vec_id", _dot(F.col("q"), F.col("qq")).alias("dot")
        )
        topv = scored.orderBy(F.desc("dot"), F.asc("vec_id")).limit(_RRF_TOPK)
        wv = bounded_window("vec_id", F.desc("dot"), F.asc("vec_id"))
        vec = topv.withColumn(
            "rank_vec", F.row_number().over(wv).cast("long")
        ).select(F.col("vec_id").alias("id"), "rank_vec")
        fused = lex.join(vec, "id", "full_outer").select(
            F.col("id").alias("doc_id"),
            "rank_lex",
            "rank_vec",
            (
                F.coalesce(
                    F.lit(1.0) / (F.lit(_RRF_K) + F.col("rank_lex")),
                    F.lit(0.0),
                )
                + F.coalesce(
                    F.lit(1.0) / (F.lit(_RRF_K) + F.col("rank_vec")),
                    F.lit(0.0),
                )
            ).alias("rrf_score"),
        )
        wr = bounded_window("doc_id", F.desc("rrf_score"), F.asc("doc_id"))
        return (
            fused.orderBy(F.desc("rrf_score"), F.asc("doc_id"))
            .limit(_RRF_OUT)
            .withColumn("rrf_rank", F.row_number().over(wr).cast("long"))
        )


_register_hybrid_rrf()


def _sql_hybrid_rrf_oracle() -> str:
    from .registry import QUERIES as _QQ

    bm25 = _QQ["docs_bm25_topk"].oracle
    quant = _SQL_QUANT.format(e="embedding")
    return f"""
    WITH lex AS (
      SELECT doc_id AS id, CAST(rnk AS BIGINT) AS rank_lex
      FROM ({bm25})),
    emb AS (SELECT vec_id, {quant} AS q FROM embeddings),
    qv AS (SELECT q AS qq FROM emb WHERE vec_id = 0),
    scored AS (
      SELECT vec_id,
        list_sum(list_transform(list_zip(q, qq), p -> p[1] * p[2])) AS dot
      FROM emb, qv),
    topv AS (
      SELECT vec_id,
        row_number() OVER (ORDER BY dot DESC, vec_id) AS rank_vec
      FROM scored ORDER BY dot DESC, vec_id LIMIT {_RRF_TOPK}),
    vec AS (SELECT vec_id AS id, CAST(rank_vec AS BIGINT) AS rank_vec
            FROM topv),
    fused AS (
      SELECT coalesce(l.id, v.id) AS doc_id, l.rank_lex, v.rank_vec,
        coalesce(CAST(1 AS DOUBLE) / ({_RRF_K} + l.rank_lex), 0.0)
        + coalesce(CAST(1 AS DOUBLE) / ({_RRF_K} + v.rank_vec), 0.0)
          AS rrf_score
      FROM lex l FULL JOIN vec v ON l.id = v.id)
    SELECT doc_id, rank_lex, rank_vec, rrf_score,
      CAST(row_number() OVER (ORDER BY rrf_score DESC, doc_id) AS BIGINT)
        AS rrf_rank
    FROM fused ORDER BY rrf_score DESC, doc_id LIMIT {_RRF_OUT}
    """


_patch_oracle("sim_hybrid_rrf", _sql_hybrid_rrf_oracle())


# ---------------------------------------------------------------------------
# docs_dsir_importance — hashed-ngram importance resampling (DSIR)
# ---------------------------------------------------------------------------

_DSIR_B = 512  # hashed feature buckets
_DSIR_TARGET = "src0"  # in-domain proxy source
_DSIR_OUT = 20  # selected documents returned
_DSIR_SCALE = 1_000_000  # fixed-point quantization of the log-ratio


def _lnq(col):
    """round(ln(x), 8) — the repo's certified cross-engine log pattern
    (plans/scalar.py:145); every argument here is >= 1 so the value is
    non-negative and half-up/half-away rounding agree."""
    return F.round(F.log(col), 8)


def _register_dsir() -> None:
    @query(
        "docs_dsir_importance",
        oracle=None,  # patched below
        tags=("text", "B15", "sampling", "selection", "dsir"),
    )
    def docs_dsir_importance(spark: SparkSession, sf_dir: str) -> DataFrame:
        """DSIR-style data selection (Xie et al. 2023, "Data Selection
        for Language Models via Importance Resampling"): fit hashed
        bag-of-ngram (unigram+bigram, md5 -> 512 buckets) class models
        for the target domain (source = src0) and the raw pool
        (everything else), score every raw document by the importance
        log-ratio  sum_b f_b * [ln p_target(b) - ln p_raw(b)]  with
        Laplace(+1) smoothing, and return the top-20 selected documents.

        Determinism: each per-bucket log-ratio is composed of four
        8-decimal-rounded lns of exact integers and quantized to an
        int64 at 1e-6 resolution, so the per-document score is an exact
        INTEGER sum — order-independent across partitions and bit-equal
        in DuckDB; the one final division back to double is shared.

        Scale shape: the model fit is a groupBy over 512 buckets
        (map-side partial agg emits <= 512 rows per task); the totals
        are a 1-row broadcast; scoring is explode -> broadcast hash
        join against the 512-row model -> integer groupBy(doc_id);
        selection is TakeOrderedAndProject. No global window, no
        all-pairs anything — the corpus is touched exactly twice."""
        docs = load_table(spark, sf_dir, "documents").select(
            "doc_id", "source", "text"
        )
        grams = docs.select(
            "doc_id",
            "source",
            F.explode(
                F.concat(words(F.col("text")), shingles("text", 2))
            ).alias("g"),
        )
        # Materialize the hashed feature relation ONCE: the class-model
        # fit and the scoring pass both consumed it before (two
        # explode + md5 passes over the corpus in the r18 before-plan).
        feats = grams.select(
            "doc_id", "source", (md5_mod(F.col("g")) % _DSIR_B).alias("b")
        ).localCheckpoint(eager=False)
        is_t = F.col("source") == _DSIR_TARGET
        model = feats.groupBy("b").agg(
            F.sum(F.when(is_t, 1).otherwise(0)).alias("ct"),
            F.sum(F.when(~is_t, 1).otherwise(0)).alias("cr"),
        )
        tot = model.agg(
            F.sum("ct").alias("t_tot"), F.sum("cr").alias("r_tot")
        )
        lr = model.crossJoin(F.broadcast(tot)).select(
            "b",
            F.round(
                (
                    _lnq(F.col("ct") + 1)
                    - _lnq(F.col("t_tot") + _DSIR_B)
                    - _lnq(F.col("cr") + 1)
                    + _lnq(F.col("r_tot") + _DSIR_B)
                )
                * _DSIR_SCALE,
                0,
            )
            .cast("long")
            .alias("lr_q"),
        )
        scored = (
            feats.filter(~is_t)
            .join(F.broadcast(lr), "b")
            .groupBy("doc_id", "source")
            .agg(
                F.count(F.lit(1)).alias("n_feats"),
                F.sum("lr_q").alias("score_q"),
            )
        )
        wr = bounded_window("doc_id", F.desc("score_q"), F.asc("doc_id"))
        return (
            scored.orderBy(F.desc("score_q"), F.asc("doc_id"))
            .limit(_DSIR_OUT)
            .select(
                "doc_id",
                "source",
                "n_feats",
                (F.col("score_q").cast("double") / _DSIR_SCALE).alias(
                    "dsir_score"
                ),
                F.row_number().over(wr).cast("long").alias("sel_rank"),
            )
        )


_register_dsir()


def _sql_dsir_oracle() -> str:
    lnq = "round(ln(CAST({x} AS DOUBLE)), 8)"
    return f"""
    WITH grams AS (
      SELECT doc_id, source,
        unnest(list_concat({SQL_WORDS('text')}, {SQL_SHINGLES('text', 2)}))
          AS g
      FROM documents),
    feats AS (
      SELECT doc_id, source, ({SQL_MD5_MOD('g')}) % {_DSIR_B} AS b
      FROM grams),
    model AS (
      SELECT b,
        sum(CASE WHEN source = '{_DSIR_TARGET}' THEN 1 ELSE 0 END) AS ct,
        sum(CASE WHEN source <> '{_DSIR_TARGET}' THEN 1 ELSE 0 END) AS cr
      FROM feats GROUP BY b),
    tot AS (SELECT sum(ct) AS t_tot, sum(cr) AS r_tot FROM model),
    lr AS (
      SELECT b,
        CAST(round((
            {lnq.format(x='ct + 1')}
          - {lnq.format(x='t_tot + ' + str(_DSIR_B))}
          - {lnq.format(x='cr + 1')}
          + {lnq.format(x='r_tot + ' + str(_DSIR_B))}
        ) * {_DSIR_SCALE}, 0) AS BIGINT) AS lr_q
      FROM model, tot),
    scored AS (
      SELECT f.doc_id, f.source,
        CAST(count(*) AS BIGINT) AS n_feats,
        CAST(sum(lr.lr_q) AS BIGINT) AS score_q
      FROM feats f JOIN lr USING (b)
      WHERE f.source <> '{_DSIR_TARGET}'
      GROUP BY f.doc_id, f.source)
    SELECT doc_id, source, n_feats,
      CAST(score_q AS DOUBLE) / {_DSIR_SCALE} AS dsir_score,
      CAST(row_number() OVER (ORDER BY score_q DESC, doc_id) AS BIGINT)
        AS sel_rank
    FROM scored ORDER BY score_q DESC, doc_id LIMIT {_DSIR_OUT}
    """


_patch_oracle("docs_dsir_importance", _sql_dsir_oracle())


# ---------------------------------------------------------------------------
# emb_matryoshka_recall — prefix-dimension truncation recall gate
# ---------------------------------------------------------------------------

_MRL_DIMS = (8, 16, 32, 64)  # prefix budgets; 64 = full dimension
_MRL_NQ = 25  # query batch size (vec_id < 25)
_MRL_K = 10  # recall@k


def _register_matryoshka() -> None:
    @query(
        "emb_matryoshka_recall",
        oracle=None,  # patched below
        tags=("similarity", "B15", "evaluation", "recall", "matryoshka"),
    )
    def emb_matryoshka_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
        """MATRYOSHKA dimension-budget gate (Kusupati et al. 2022): for
        each prefix budget d in (8, 16, 32, 64), the exact top-10 by
        integer dot product over the FIRST d embedding dimensions for a
        25-query batch, scored as recall@10 against the full-dimension
        exact ranking — the measurement that decides how far embeddings
        can be truncated (4x-8x index shrink) before ANN quality pays.
        The d=64 row is the self-recall anchor (exactly 1.0 by
        construction). Quantized integer dots with id tie-break, so
        every ranking — and the recall fractions — are bit-equal in
        DuckDB.

        Scale shape: the query batch is a 25-row broadcast against one
        corpus scan per budget (the declared brute-force evaluation
        tier, same posture as sim_topk_bruteforce); per-query rankings
        are windows PARTITIONED by (query, budget); the recall join runs
        on |Q| x k x |budgets| rows. In production this runs on a
        sampled query batch exactly as here."""
        from ..operators.similarity import _dot, quantize

        # Single-derivation restructure (was: one corpus quantize +
        # crossJoin PER budget, and the 4-branch union then re-derived
        # for the recall join-back — 8 corpus passes, 28 Exchanges).
        # Now: quantize once (checkpoint), ONE crossJoin computing the
        # four prefix dots as exact int64 SEGMENT sums (dot over the
        # first 16 dims = dot over dims 1-8 + dot over dims 9-16 —
        # integer addition is associative, so the budget dots are
        # bit-identical to the sliced form), explode to (budget, dot)
        # rows, one window. tops (|Q|·k·|budgets| rows) checkpoints so
        # the self-recall join does not replay the ranking.
        v = load_table(spark, sf_dir, "embeddings").select(
            "vec_id", quantize(F.col("embedding")).alias("v")
        )
        q = v.filter(F.col("vec_id") < _MRL_NQ).select(
            F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
        )
        pairs = v.crossJoin(F.broadcast(q)).filter(
            F.col("vec_id") != F.col("query_id")
        )
        seg_cols, prev = [], 0
        for i, d in enumerate(_MRL_DIMS):
            seg_cols.append(
                _dot(
                    F.slice(F.col("qv"), prev + 1, d - prev),
                    F.slice(F.col("v"), prev + 1, d - prev),
                ).alias(f"_s{i}")
            )
            prev = d
        segs = pairs.select(
            "query_id", F.col("vec_id").alias("neighbor_id"), *seg_cols
        )
        budget_structs = []
        for i, d in enumerate(_MRL_DIMS):
            dot_d = F.col("_s0")
            for j in range(1, i + 1):
                dot_d = dot_d + F.col(f"_s{j}")
            budget_structs.append(
                F.struct(
                    F.lit(d).alias("dim_budget"), dot_d.alias("dot")
                )
            )
        scored = segs.select(
            "query_id",
            "neighbor_id",
            F.explode(F.array(*budget_structs)).alias("bd"),
        ).select(
            F.col("bd.dim_budget").alias("dim_budget"),
            "query_id",
            "neighbor_id",
            F.col("bd.dot").alias("dot"),
        )
        w = Window.partitionBy("query_id", "dim_budget").orderBy(
            F.desc("dot"), F.asc("neighbor_id")
        )
        tops = (
            scored.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= _MRL_K)
            .localCheckpoint(eager=False)
        )
        base = tops.filter(F.col("dim_budget") == max(_MRL_DIMS)).select(
            "query_id", "neighbor_id", F.lit(1).alias("_hit")
        )
        return (
            tops.join(base, ["query_id", "neighbor_id"], "left")
            .groupBy("dim_budget")
            .agg(F.count("_hit").alias("n_match"))
            .select(
                "dim_budget",
                "n_match",
                (
                    F.col("n_match").cast("double") / (_MRL_NQ * _MRL_K)
                ).alias("recall_at_10"),
            )
            .orderBy("dim_budget")
        )


_register_matryoshka()


def _sql_matryoshka_oracle() -> str:
    quant = _SQL_QUANT.format(e="embedding")

    def branch(d: int) -> str:
        return f"""
      SELECT {d} AS dim_budget, query_id, neighbor_id FROM (
        SELECT query_id, neighbor_id,
          row_number() OVER (PARTITION BY query_id
                             ORDER BY dot DESC, neighbor_id) AS rn
        FROM (
          SELECT q.query_id, c.vec_id AS neighbor_id,
            list_sum(list_transform(
              list_zip(q.qv[1:{d}], c.v[1:{d}]), p -> p[1] * p[2])) AS dot
          FROM q, v c WHERE c.vec_id <> q.query_id))
      WHERE rn <= {_MRL_K}"""

    branches = " UNION ALL ".join(branch(d) for d in _MRL_DIMS)
    return f"""
    WITH v AS (SELECT vec_id, {quant} AS v FROM embeddings),
    q AS (SELECT vec_id AS query_id, v AS qv FROM v
          WHERE vec_id < {_MRL_NQ}),
    tops AS ({branches}),
    base AS (SELECT query_id, neighbor_id FROM tops
             WHERE dim_budget = {max(_MRL_DIMS)})
    SELECT t.dim_budget,
      CAST(count(b.neighbor_id) AS BIGINT) AS n_match,
      CAST(count(b.neighbor_id) AS DOUBLE) / {_MRL_NQ * _MRL_K}
        AS recall_at_10
    FROM tops t LEFT JOIN base b
      ON t.query_id = b.query_id AND t.neighbor_id = b.neighbor_id
    GROUP BY t.dim_budget ORDER BY t.dim_budget
    """


_patch_oracle("emb_matryoshka_recall", _sql_matryoshka_oracle())


# ---------------------------------------------------------------------------
# sim_mutual_knn — reciprocal-nearest-neighbor pairs over LSH candidates
# ---------------------------------------------------------------------------


def _register_mutual_knn() -> None:
    @query(
        "sim_mutual_knn",
        oracle=None,  # patched below (embeds the certified LSH oracle)
        tags=("similarity", "B15", "dedup", "rnn"),
    )
    def sim_mutual_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
        """RECIPROCAL nearest neighbors over the certified LSH
        candidate set: symmetrize ``dedup_embedding_lsh``'s verified
        pairs, pick each node's single best neighbor (max cosine, id
        tie-break), and keep exactly the pairs where the choice is
        MUTUAL — the standard high-precision filter between "near-dup
        candidates" and "delete one of them" (one-sided neighbors are
        usually hub artifacts; mutual choice is the classic RNN
        dedup/matching criterion). Composes the registered operator, so
        the oracle replays candidate generation, per-node argmax, and
        the reciprocity join end to end; cosines are bit-identical
        cross-engine (exact integer dot/norms, one IEEE divide), so the
        argmax — and the returned pair set — hash-match exactly.

        Scale shape: candidates are LSH-bucket-bounded (never all
        pairs); per-node best is a rank-1 window that Spark rewrites to
        WindowGroupLimit (bounded per-partition state); reciprocity is
        an equi-join of two best-edge relations on the (src, dst) key.
        Everything is candidate-set-sized — 100 TB-safe whenever the
        banding is."""
        from .registry import QUERIES as _QQ

        # Materialize the verified pair set ONCE: it feeds both
        # orientations of the symmetrization, and each orientation would
        # otherwise re-run the entire LSH candidate + Arrow-cosine
        # pipeline (Spark shares no subtrees across union branches) —
        # the r18 before-plan showed the embeddings scan + kernel ×4.
        pairs = _QQ["dedup_embedding_lsh"].fn(spark, sf_dir).localCheckpoint(
            eager=False
        )
        sym = pairs.select(
            F.col("id_a").alias("src"),
            F.col("id_b").alias("dst"),
            "cosine",
        ).unionByName(
            pairs.select(
                F.col("id_b").alias("src"),
                F.col("id_a").alias("dst"),
                "cosine",
            )
        )
        w = Window.partitionBy("src").orderBy(
            F.desc("cosine"), F.asc("dst")
        )
        # best feeds both sides of the reciprocity join — checkpoint the
        # node-sized best-edge relation so the argmax window runs once.
        best = (
            sym.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("src", "dst", "cosine")
            .localCheckpoint(eager=False)
        )
        other = best.select(
            F.col("src").alias("_osrc"), F.col("dst").alias("_odst")
        )
        return (
            best.join(
                other,
                (F.col("src") == F.col("_odst"))
                & (F.col("dst") == F.col("_osrc")),
            )
            .filter(F.col("src") < F.col("dst"))
            .select(
                F.col("src").alias("id_a"),
                F.col("dst").alias("id_b"),
                "cosine",
            )
        )


_register_mutual_knn()


def _sql_mutual_knn_oracle() -> str:
    from .registry import QUERIES as _QQ

    lsh = _QQ["dedup_embedding_lsh"].oracle
    return f"""
    WITH p AS ({lsh}),
    sym AS (
      SELECT id_a AS src, id_b AS dst, cosine FROM p
      UNION ALL
      SELECT id_b AS src, id_a AS dst, cosine FROM p),
    best AS (
      SELECT src, dst, cosine FROM (
        SELECT src, dst, cosine,
          row_number() OVER (PARTITION BY src
                             ORDER BY cosine DESC, dst) AS rn
        FROM sym) WHERE rn = 1)
    SELECT a.src AS id_a, a.dst AS id_b, a.cosine AS cosine
    FROM best a JOIN best b ON a.src = b.dst AND a.dst = b.src
    WHERE a.src < a.dst
    """


_patch_oracle("sim_mutual_knn", _sql_mutual_knn_oracle())


# ---------------------------------------------------------------------------
# docs_ks_drift_by_source — exact two-sample Kolmogorov–Smirnov test
# ---------------------------------------------------------------------------

_KS_A = "src0"
_KS_B = "src1"
_KS_BLK = 64  # length-band width for the parallel-prefix decomposition
_KS_C95 = 1.358  # c(alpha) at alpha = 0.05


def _register_ks_drift() -> None:
    @query(
        "docs_ks_drift_by_source",
        oracle=f"""
        WITH lens AS (
          SELECT source, n_chars AS v FROM documents
          WHERE source IN ('{_KS_A}', '{_KS_B}')),
        counts AS (
          SELECT v,
            sum(CASE WHEN source = '{_KS_A}' THEN 1 ELSE 0 END) AS ca,
            sum(CASE WHEN source = '{_KS_B}' THEN 1 ELSE 0 END) AS cb
          FROM lens GROUP BY v),
        cum AS (
          SELECT v,
            sum(ca) OVER (ORDER BY v) AS fa,
            sum(cb) OVER (ORDER BY v) AS fb
          FROM counts),
        tot AS (
          SELECT CAST(sum(ca) AS BIGINT) AS n_a,
                 CAST(sum(cb) AS BIGINT) AS n_b
          FROM counts)
        SELECT n_a, n_b,
          CAST(max(abs(fa * n_b - fb * n_a)) AS BIGINT) AS d_num,
          CAST(max(abs(fa * n_b - fb * n_a)) AS DOUBLE) / (n_a * n_b)
            AS d_stat,
          {_KS_C95} * sqrt(CAST(n_a + n_b AS DOUBLE) / (n_a * n_b))
            AS ks_critical_95,
          CAST(max(abs(fa * n_b - fb * n_a)) AS DOUBLE) / (n_a * n_b)
            > {_KS_C95} * sqrt(CAST(n_a + n_b AS DOUBLE) / (n_a * n_b))
            AS drift_detected
        FROM cum, tot GROUP BY n_a, n_b
        """,
        tags=("text", "B15", "quality", "drift", "stats"),
    )
    def docs_ks_drift_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
        """EXACT two-sample Kolmogorov-Smirnov test between the src0 and
        src1 document-length distributions — the classic distribution-
        drift gate between corpus snapshots/sources (the CDF-supremum
        complement of events_histogram_drift's binned PSI shape). The
        statistic is computed in pure integers: D_num = max over
        observed lengths of |F_a(v)*n_b - F_b(v)*n_a| (cross-multiplied
        empirical CDFs, no per-step division), with d_stat =
        D_num/(n_a*n_b) and the alpha=0.05 critical value
        1.358*sqrt((n_a+n_b)/(n_a*n_b)) each one shared IEEE
        expression — bit-equal cross-engine (sqrt is correctly rounded
        in both).

        Scale shape: one keyed aggregate over distinct length values,
        then the global CDF cumsum is the two-phase block-prefix
        decomposition (per-64-char-band partials, exclusive prefix over
        the tiny band table, band-partitioned within-window) — no
        single-partition sort at any size; the final max is a plain
        aggregate with a 1-row totals broadcast."""
        lens = (
            load_table(spark, sf_dir, "documents")
            .filter(F.col("source").isin(_KS_A, _KS_B))
            .select("source", F.col("n_chars").alias("v"))
        )
        counts = lens.groupBy("v").agg(
            F.sum(F.when(F.col("source") == _KS_A, 1).otherwise(0)).alias("ca"),
            F.sum(F.when(F.col("source") == _KS_B, 1).otherwise(0)).alias("cb"),
        )
        b = counts.withColumn("_blk", (F.col("v") / _KS_BLK).cast("long"))
        blocks = b.groupBy("_blk").agg(
            F.sum("ca").alias("_bca"), F.sum("cb").alias("_bcb")
        )
        wb = bounded_window("_blk", "_blk").rowsBetween(
            Window.unboundedPreceding, -1
        )
        prior = blocks.select(
            "_blk",
            F.coalesce(F.sum("_bca").over(wb), F.lit(0)).alias("_pa"),
            F.coalesce(F.sum("_bcb").over(wb), F.lit(0)).alias("_pb"),
        )
        ww = (
            Window.partitionBy("_blk")
            .orderBy("v")
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        cum = b.join(F.broadcast(prior), "_blk").select(
            "v",
            (F.col("_pa") + F.sum("ca").over(ww)).alias("fa"),
            (F.col("_pb") + F.sum("cb").over(ww)).alias("fb"),
        )
        tot = counts.agg(
            F.sum("ca").cast("long").alias("n_a"),
            F.sum("cb").cast("long").alias("n_b"),
        )
        d = (
            cum.crossJoin(F.broadcast(tot))
            .groupBy("n_a", "n_b")
            .agg(
                F.max(
                    F.abs(F.col("fa") * F.col("n_b") - F.col("fb") * F.col("n_a"))
                )
                .cast("long")
                .alias("d_num")
            )
        )
        crit = F.lit(_KS_C95) * F.sqrt(
            (F.col("n_a") + F.col("n_b")).cast("double")
            / (F.col("n_a") * F.col("n_b"))
        )
        stat = F.col("d_num").cast("double") / (F.col("n_a") * F.col("n_b"))
        return d.select(
            "n_a",
            "n_b",
            "d_num",
            stat.alias("d_stat"),
            crit.alias("ks_critical_95"),
            (stat > crit).alias("drift_detected"),
        )


_register_ks_drift()


# ---------------------------------------------------------------------------
# orders_gini_coefficient — exact revenue-inequality statistic
# ---------------------------------------------------------------------------

_GINI_BLK = 1_000_000  # cents per revenue band (~$10k) for the prefix device


def _register_gini() -> None:
    from ..functions.exact import dec2

    @query(
        "orders_gini_coefficient",
        oracle=f"""
        WITH rev AS (
          SELECT o_custkey,
            CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT)
              AS cents
          FROM orders GROUP BY o_custkey),
        ranked AS (
          SELECT cents,
            row_number() OVER (ORDER BY cents, o_custkey) AS rnk
          FROM rev)
        SELECT CAST(count(*) AS BIGINT) AS n_customers,
          CAST(sum(cents) AS DOUBLE) / 100 AS total_revenue,
          CAST(2 * sum(rnk * cents) - (count(*) + 1) * sum(cents)
               AS DOUBLE) / (count(*) * sum(cents)) AS gini
        FROM ranked
        """,
        tags=("agg", "B7", "stats", "inequality"),
    )
    def orders_gini_coefficient(spark: SparkSession, sf_dir: str) -> DataFrame:
        """EXACT Gini coefficient of per-customer revenue — the standard
        inequality summary next to orders_pareto_customers' cumulative-
        share curve: G = (2*sum(i*x_i) - (n+1)*sum(x)) / (n*sum(x)) over
        ascending-sorted revenues. All arithmetic is integer cents until
        ONE final division (the rank-weighted sum is invariant under
        permuting tied revenues, so the (cents, custkey) tie-break
        changes nothing), making the statistic bit-equal in DuckDB.

        Scale shape: the per-customer rollup is partial-aggregable; the
        global ascending rank is the two-phase block-prefix
        decomposition (per-$10k-band counts, exclusive prefix over the
        tiny band table, band-partitioned row_number) — no single-
        partition sort; the weighted sums are one plain aggregate. For
        beyond-int64 corpora the two sums upgrade to decimal(38,0)
        unchanged."""
        o = load_table(spark, sf_dir, "orders")
        rev = o.groupBy("o_custkey").agg(
            (F.sum(dec2("o_totalprice")) * 100).cast("long").alias("cents")
        )
        b = rev.withColumn(
            "_blk", (F.col("cents") / _GINI_BLK).cast("long")
        )
        blocks = b.groupBy("_blk").agg(F.count(F.lit(1)).alias("_c"))
        wb = bounded_window("_blk", "_blk").rowsBetween(
            Window.unboundedPreceding, -1
        )
        prior = blocks.select(
            "_blk",
            F.coalesce(F.sum("_c").over(wb), F.lit(0)).alias("_prior_n"),
        )
        ww = Window.partitionBy("_blk").orderBy(
            F.asc("cents"), F.asc("o_custkey")
        )
        ranked = b.join(F.broadcast(prior), "_blk").select(
            "cents",
            (F.col("_prior_n") + F.row_number().over(ww)).alias("rnk"),
        )
        return ranked.agg(
            F.count(F.lit(1)).cast("long").alias("n_customers"),
            (F.sum("cents").cast("double") / 100).alias("total_revenue"),
            (
                (
                    2 * F.sum(F.col("rnk") * F.col("cents"))
                    - (F.count(F.lit(1)) + 1) * F.sum("cents")
                ).cast("double")
                / (F.count(F.lit(1)) * F.sum("cents"))
            ).alias("gini"),
        )


_register_gini()


# ---------------------------------------------------------------------------
# events_acf_hourly — exact autocorrelation of the hourly volume series
# ---------------------------------------------------------------------------

_ACF_MAX_LAG = 6


def _register_acf() -> None:
    @query(
        "events_acf_hourly",
        oracle=f"""
        WITH series AS (
          SELECT epoch_us(ts) // 3600000000 AS h,
            CAST(count(*) AS BIGINT) AS c
          FROM events GROUP BY 1),
        st AS (SELECT CAST(count(*) AS HUGEINT) AS n,
                      CAST(sum(c) AS HUGEINT) AS s FROM series),
        dev AS (SELECT h, n * c - s AS d FROM series, st),
        den AS (SELECT sum(d * d) AS denom FROM dev),
        lags AS (SELECT unnest(range(1, {_ACF_MAX_LAG + 1})) AS lag),
        pairs AS (
          SELECT l.lag, CAST(count(*) AS BIGINT) AS n_pairs,
            sum(a.d * b.d) AS num
          FROM lags l
          JOIN dev a ON TRUE
          JOIN dev b ON b.h = a.h + l.lag
          GROUP BY l.lag)
        SELECT CAST(lag AS BIGINT) AS lag, n_pairs,
          CAST(num AS DOUBLE) / CAST(denom AS DOUBLE) AS acf
        FROM pairs, den ORDER BY lag
        """,
        tags=("timeseries", "stats", "B7", "autocorrelation"),
    )
    def events_acf_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Sample AUTOCORRELATION function of the hourly event-volume
        series at lags 1..6 — the periodicity diagnostic missing between
        events_ols_trend (linear drift), events_seasonal_backtest
        (assumed daily cycle), and events_cusum_changepoint (level
        shifts): a daily rhythm shows as the lag structure directly.
        Exact arithmetic throughout: with dev_t = n*x_t - S (the
        n-scaled mean deviation, integer), r_k = sum(dev_t * dev_(t+k))
        / sum(dev_t^2) — the n^2 scale factors cancel exactly, so each
        r_k is ONE division of exact decimal(38,0)/HUGEINT integers.
        Computed over the hours present (the fixture series is dense);
        n_pairs reports the overlap length per lag.

        Scale shape: the raw stream reduces 10^4-fold to the hourly
        relation in one map-side-combinable aggregate; lag alignment is
        an EQUI-join on h = h + k (no window, no sort) with the 6 lags
        exploded on the probe side; the two scalar stats are 1-row
        broadcasts."""
        d38 = "decimal(38,0)"
        ev = load_table(spark, sf_dir, "events")
        series = ev.groupBy(
            (F.unix_micros("ts") / F.lit(3600000000))
            .cast("long")
            .alias("h")
        ).agg(F.count(F.lit(1)).alias("c"))
        st = series.agg(
            F.count(F.lit(1)).cast(d38).alias("n"),
            F.sum("c").cast(d38).alias("s"),
        )
        # The deviation relation feeds THREE consumers (denominator,
        # join build side, exploded probe); Spark would otherwise replay
        # the raw-events scan + aggregate for each. The series is
        # 10^4x-reduced and calendar-bounded, so pinning it is KBs.
        dev = (
            series.crossJoin(F.broadcast(st))
            .select("h", (F.col("n") * F.col("c") - F.col("s")).alias("d"))
            .localCheckpoint(eager=True)
        )
        den = dev.agg(F.sum(F.col("d") * F.col("d")).alias("denom"))
        probe = dev.select(
            F.explode(
                F.array(*[F.lit(k) for k in range(1, _ACF_MAX_LAG + 1)])
            ).alias("lag"),
            (F.col("h") - F.col("lag")).alias("h0"),
            F.col("d").alias("d_b"),
        )
        pairs = (
            dev.join(probe, dev.h == probe.h0)
            .groupBy("lag")
            .agg(
                F.count(F.lit(1)).alias("n_pairs"),
                F.sum(F.col("d") * F.col("d_b")).alias("num"),
            )
        )
        return (
            pairs.crossJoin(F.broadcast(den))
            .select(
                F.col("lag").cast("long").alias("lag"),
                "n_pairs",
                (
                    F.col("num").cast("double")
                    / F.col("denom").cast("double")
                ).alias("acf"),
            )
            .orderBy("lag")
        )


_register_acf()
