"""Round-10 text-statistics operators: readability scoring, collocation
mining, and character-LM rarity — the corpus-quality family a training
data pipeline runs between language-ID and quality gating (SURVEY.md
§2.B B15; reference scope: the Connect pipeline ships text fields
verbatim — mk-kafka-connect `Task.java` — so these are engine-side
extensions, not ports).

Exactness contract (registry-wide): every float output is ONE IEEE
operation over exact integer aggregates, or a pinned-order chain of
IEEE ops on bit-identical inputs; the PMI family is ranked and emitted
as its LOG-FREE monotone rational (the docs_bm25_topk device) so no
engine-specific transcendental ever runs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.bounded import bounded_window
from .registry import query

# ---------------------------------------------------------------------------
# docs_readability — Flesch reading-ease profile per language
# ---------------------------------------------------------------------------


@query(
    "docs_readability",
    oracle="""
    WITH per_doc AS (
      SELECT lang,
        CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
        CAST(length(regexp_replace(regexp_replace(text, '[aeiouy]+', 'V',
                                                  'g'), '[^V]', '', 'g'))
          AS BIGINT) AS n_syllables
      FROM documents),
    agg AS (
      SELECT lang,
        CAST(count(*) AS BIGINT) AS n_docs,
        CAST(sum(n_words) AS BIGINT) AS n_words,
        CAST(sum(n_syllables) AS BIGINT) AS n_syllables
      FROM per_doc GROUP BY lang)
    SELECT lang, n_docs, n_words, n_syllables,
      CAST(n_words AS DOUBLE) / n_docs AS words_per_doc,
      CAST(n_syllables AS DOUBLE) / n_words AS syllables_per_word,
      CAST(206.835 AS DOUBLE)
        - CAST(1.015 AS DOUBLE) * (CAST(n_words AS DOUBLE) / n_docs)
        - CAST(84.6 AS DOUBLE) * (CAST(n_syllables AS DOUBLE) / n_words)
        AS fk_ease
    FROM agg
    """,
    tags=("text", "B15", "quality", "readability"),
)
def docs_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flesch reading-ease profile per language — the readability gate
    corpus-quality pipelines (C4, Gopher rules) run next to stopword
    and repetition filters. Syllables are approximated as VOWEL RUNS
    ([aeiouy]+ maximal groups — the standard dictionary-free heuristic)
    counted by collapsing each run to one sentinel and counting
    sentinels; the fixture's documents carry no sentence punctuation,
    so the document is the utterance unit (sentences := docs), making
    words_per_doc the sentence-length term.

    Exactness: word/syllable/doc counts are exact integers; the two
    ratios are each ONE IEEE division, and fk_ease applies the pinned
    Flesch constants in a FIXED two-multiply/two-subtract order over
    those bit-identical ratios — deterministic IEEE, no transcendental.

    Scale: pure codegen regexp counting per row (no token explode, no
    Python), then a 5-group map-side-combinable aggregate. The per-doc
    relation never shuffles wider than (lang, two longs)."""
    d = load_table(spark, sf_dir, "documents")
    runs = F.regexp_replace(F.col("text"), r"[aeiouy]+", "V")
    per = d.select(
        "lang",
        F.size(F.split(F.col("text"), " ")).cast("long").alias("n_words"),
        F.length(F.regexp_replace(runs, r"[^V]", "")).cast("long").alias(
            "n_syllables"
        ),
    )
    agg = per.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_words").alias("n_words"),
        F.sum("n_syllables").alias("n_syllables"),
    )
    wpd = F.col("n_words").cast("double") / F.col("n_docs")
    spw = F.col("n_syllables").cast("double") / F.col("n_words")
    return agg.select(
        "lang",
        "n_docs",
        "n_words",
        "n_syllables",
        wpd.alias("words_per_doc"),
        spw.alias("syllables_per_word"),
        (
            F.lit(206.835).cast("double")
            - F.lit(1.015).cast("double") * wpd
            - F.lit(84.6).cast("double") * spw
        ).alias("fk_ease"),
    )


# ---------------------------------------------------------------------------
# docs_collocations_lift — PMI-ranked word-bigram collocations, log-free
# ---------------------------------------------------------------------------

_COLL_TOPK = 30
_COLL_MIN_COUNT = 5


@query(
    "docs_collocations_lift",
    oracle=f"""
    WITH w AS (SELECT string_split(text, ' ') AS w FROM documents),
    uni AS (
      SELECT unnest(w) AS word FROM w),
    uc AS (SELECT word, CAST(count(*) AS BIGINT) AS c FROM uni
           GROUP BY word),
    un AS (SELECT CAST(sum(c) AS HUGEINT) AS n_uni FROM uc),
    bi AS (
      SELECT unnest(list_transform(range(1, len(w)),
                    i -> w[i] || ' ' || w[i+1])) AS bigram
      FROM w),
    bc AS (SELECT bigram, CAST(count(*) AS BIGINT) AS c_ab FROM bi
           GROUP BY bigram),
    bn AS (SELECT CAST(sum(c_ab) AS HUGEINT) AS n_bi FROM bc),
    scored AS (
      SELECT bc.bigram, bc.c_ab, a.c AS c_a, b.c AS c_b,
        CAST(CAST(bc.c_ab AS HUGEINT) * un.n_uni * un.n_uni AS DOUBLE)
          / CAST(bn.n_bi * CAST(a.c AS HUGEINT) * b.c AS DOUBLE) AS lift
      FROM bc, un, bn
      JOIN uc a ON a.word = string_split(bc.bigram, ' ')[1]
      JOIN uc b ON b.word = string_split(bc.bigram, ' ')[2]
      WHERE bc.c_ab >= {_COLL_MIN_COUNT}),
    ranked AS (
      SELECT *, row_number() OVER (ORDER BY lift DESC, c_ab DESC, bigram)
        AS rnk
      FROM scored)
    SELECT bigram, c_ab, c_a, c_b, lift, rnk
    FROM ranked WHERE rnk <= {_COLL_TOPK}
    """,
    tags=("text", "B15", "collocations", "pmi"),
)
def docs_collocations_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top collocations by pointwise-mutual-information LIFT: for every
    adjacent word pair, p(ab)/(p(a)·p(b)) — the association measure
    phrase-mining and tokenizer-vocabulary pipelines rank candidate
    multi-word units with. Emitted LOG-FREE (the docs_bm25_topk
    device): PMI = log(lift) is monotone in lift, so ranking by the
    exact rational c_ab·N_uni² / (N_bi·c_a·c_b) is ranking by PMI with
    no engine-specific log() — lift itself is ONE IEEE division of
    exact 128-bit products.

    Scale: one word explode feeding two map-side-combinable counts
    (unigrams, adjacent bigrams), then the bigram relation joins the
    unigram counts twice on its two member words — hash equi-joins
    keyed by word; the corpus totals are 1-row broadcast scalars. The
    min-count floor prunes the hapax tail BEFORE the joins. Global
    top-k is a TakeOrdered over the surviving candidates, never a full
    sort."""
    d = load_table(spark, sf_dir, "documents")
    # Single-derivation shape: words (scan + split) feeds the unigram
    # AND bigram explodes; uc feeds the total and both member-word join
    # sides; the grouped bigram counts feed the candidate set and the
    # corpus bigram total (sum of group counts == pre-filter row count,
    # exactly). Un-checkpointed, the corpus was re-split five times.
    words = d.select(F.split(F.col("text"), " ").alias("w")).localCheckpoint(
        eager=False
    )
    uni = words.select(F.explode("w").alias("word"))
    uc = uni.groupBy("word").agg(F.count(F.lit(1)).alias("c")).localCheckpoint(
        eager=False
    )
    bi = words.select(
        F.explode(
            F.expr(
                "transform(sequence(0, size(w) - 2),"
                " i -> concat(w[i], ' ', w[i+1]))"
            )
        ).alias("bigram")
    )
    bc_all = bi.groupBy("bigram").agg(
        F.count(F.lit(1)).alias("c_ab")
    ).localCheckpoint(eager=False)
    bc = bc_all.filter(F.col("c_ab") >= _COLL_MIN_COUNT)
    d38 = "decimal(38,0)"
    n_uni = uc.agg(F.sum("c").cast(d38).alias("n_uni"))
    n_bi = bc_all.agg(F.sum("c_ab").cast(d38).alias("n_bi"))
    a = uc.select(F.col("word").alias("_wa"), F.col("c").alias("c_a"))
    b = uc.select(F.col("word").alias("_wb"), F.col("c").alias("c_b"))
    scored = (
        bc.withColumn("_wa", F.split(F.col("bigram"), " ")[0])
        .withColumn("_wb", F.split(F.col("bigram"), " ")[1])
        .join(a, "_wa")
        .join(b, "_wb")
        .crossJoin(F.broadcast(n_uni))
        .crossJoin(F.broadcast(n_bi))
        .select(
            "bigram",
            "c_ab",
            "c_a",
            "c_b",
            (
                (
                    F.col("c_ab").cast(d38)
                    * F.col("n_uni")
                    * F.col("n_uni")
                ).cast("double")
                / (
                    F.col("n_bi")
                    * F.col("c_a").cast(d38)
                    * F.col("c_b")
                ).cast("double")
            ).alias("lift"),
        )
    )
    # Global top-k WITHOUT a single-partition sort: ORDER BY + LIMIT
    # compiles to TakeOrderedAndProject (per-partition top-k + merge);
    # the row_number window then runs over the ≤K-row bounded result,
    # so no WindowExec ever sees the unbounded bigram-vocab relation.
    top = scored.orderBy(
        F.desc("lift"), F.desc("c_ab"), F.asc("bigram")
    ).limit(_COLL_TOPK)
    return top.withColumn(
        "rnk",
        F.row_number().over(
            bounded_window("bigram", F.desc("lift"), F.desc("c_ab"), F.asc("bigram"))
        ),
    )


# ---------------------------------------------------------------------------
# docs_char_bigram_rarity — character-LM rarity scoring without logs
# ---------------------------------------------------------------------------

_RARITY_TOPK = 50


@query(
    "docs_char_bigram_rarity",
    oracle=f"""
    WITH bg AS (
      SELECT doc_id,
        unnest(list_transform(range(1, length(text)),
                              i -> text[i:i+1])) AS b
      FROM documents),
    model AS (
      SELECT b, CAST(count(*) AS BIGINT) AS c FROM bg GROUP BY b),
    n AS (SELECT CAST(sum(c) AS BIGINT) AS n_total FROM model),
    scored AS (
      SELECT bg.doc_id,
        CAST(count(*) AS BIGINT) AS n_bigrams,
        CAST(count(DISTINCT bg.b) AS BIGINT) AS n_distinct,
        CAST(sum(CASE WHEN model.c * 10000 < n.n_total THEN 1 ELSE 0 END)
          AS BIGINT) AS n_rare,
        CAST(sum(n.n_total // model.c) AS BIGINT) AS rarity_score
      FROM bg JOIN model USING (b) CROSS JOIN n
      GROUP BY bg.doc_id),
    ranked AS (
      SELECT doc_id, n_bigrams, n_distinct, n_rare, rarity_score,
        CAST(n_rare AS DOUBLE) / n_bigrams AS rare_rate,
        CAST(rarity_score AS DOUBLE) / n_bigrams AS avg_rarity,
        row_number() OVER (ORDER BY rarity_score * 1000000 // n_bigrams DESC,
                           doc_id) AS rnk
      FROM scored)
    SELECT doc_id, n_bigrams, n_distinct, n_rare, rarity_score,
           rare_rate, avg_rarity, rnk
    FROM ranked WHERE rnk <= {_RARITY_TOPK}
    """,
    tags=("text", "B15", "quality", "language-model"),
)
def docs_char_bigram_rarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-bigram language-model rarity scoring — the
    perplexity-shaped gibberish detector (KenLM-filter shape) with the
    transcendental removed: train the char-bigram frequency model on
    the corpus itself (one pass), then score each document by
    inverse-frequency sums — rarity_score = Σ ⌊N/c(b)⌋ over its bigram
    occurrences (the integer surrogate of Σ 1/p, monotone with
    perplexity for the gating purpose), the rare-bigram rate
    (c(b)/N < 10⁻⁴, an all-integer predicate), and distinct coverage.
    Top-50 most-anomalous documents emitted — the review queue.

    Exactness: model counts and both scores are exact integers
    (including the ⌊N/c⌋ integer division); rare_rate and avg_rarity
    are each ONE IEEE division; the ranking key is the exact integer
    rarity_score·10⁶ ÷ n_bigrams (integer division both engines).

    Scale: the bigram explode is the only row amplification (×avg doc
    length); both the model (≤|charset|² rows — KBs) and the 1-row
    total broadcast onto the scoring join, so the per-doc aggregate is
    one map-side-combinable pass over the exploded relation. The
    explode never shuffles: model join is broadcast, and the doc_id
    grouping re-uses the scan partitioning."""
    d = load_table(spark, sf_dir, "documents")
    bg = d.select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(1, length(text) - 1),"
                " i -> substring(text, i, 2))"
            )
        ).alias("b"),
    )
    # Pre-aggregate the bigram occurrences to per-(doc, bigram) counts
    # and materialize that ONCE: the model fit and the scoring join both
    # consumed the raw explode before (two scan + substring-transform
    # passes in the r18 before-plan), and every per-doc aggregate below
    # is a weighted sum over the (doc, bigram) relation — same exact
    # integers, one explode, and the scoring join input shrinks from
    # per-occurrence to per-distinct-bigram rows (guide §2.3: aggregate
    # before you shuffle; §2.4/§5: materialize the shared diamond).
    bgc = (
        bg.groupBy("doc_id", "b")
        .agg(F.count(F.lit(1)).alias("c_db"))
        .localCheckpoint(eager=False)
    )
    model = bgc.groupBy("b").agg(F.sum("c_db").alias("c"))
    n = model.agg(F.sum("c").alias("n_total"))
    scored = (
        bgc.join(F.broadcast(model), "b")
        .crossJoin(F.broadcast(n))
        .groupBy("doc_id")
        .agg(
            F.sum("c_db").alias("n_bigrams"),
            F.count(F.lit(1)).alias("n_distinct"),
            F.sum(
                F.when(
                    F.col("c") * 10000 < F.col("n_total"), F.col("c_db")
                ).otherwise(0)
            ).alias("n_rare"),
            F.sum(
                (F.col("n_total") / F.col("c")).cast("long") * F.col("c_db")
            ).alias("rarity_score"),
        )
    )
    # Exact integer ranking key (div = int64 division, matching the
    # oracle's // — NOT double-divide-then-truncate, which would drift
    # from the oracle on a precision collision) and global top-k via
    # ORDER BY + LIMIT (TakeOrderedAndProject); the row_number window
    # only ever sees the ≤K-row bounded result.
    key = F.expr("div(rarity_score * 1000000, n_bigrams)")
    top = scored.orderBy(key.desc(), F.asc("doc_id")).limit(_RARITY_TOPK)
    ranked = top.withColumn(
        "rnk",
        F.row_number().over(bounded_window("doc_id", key.desc(), F.asc("doc_id"))),
    )
    return ranked.select(
        "doc_id",
        "n_bigrams",
        "n_distinct",
        "n_rare",
        "rarity_score",
        (F.col("n_rare").cast("double") / F.col("n_bigrams")).alias(
            "rare_rate"
        ),
        (F.col("rarity_score").cast("double") / F.col("n_bigrams")).alias(
            "avg_rarity"
        ),
        "rnk",
    )


# ---------------------------------------------------------------------------
# docs_zipf_fit — rank-size law diagnostic over the corpus vocabulary
# ---------------------------------------------------------------------------

_ZIPF_TOPK = 100


@query(
    "docs_zipf_fit",
    oracle=f"""
    WITH w AS (
      SELECT unnest(string_split(text, ' ')) AS word FROM documents),
    c AS (SELECT word, CAST(count(*) AS BIGINT) AS freq FROM w
          WHERE word <> '' GROUP BY word),
    n AS (SELECT CAST(sum(freq) AS BIGINT) AS total FROM c),
    r AS (
      SELECT word, freq,
        row_number() OVER (ORDER BY freq DESC, word) AS rnk
      FROM c)
    SELECT r.word, r.freq, CAST(r.rnk AS BIGINT) AS rnk,
      CAST(r.rnk * r.freq AS BIGINT) AS rank_freq_product,
      CAST(r.freq AS DOUBLE) / n.total AS rel_freq,
      CAST(r.rnk * r.freq AS DOUBLE) / n.total AS zipf_c
    FROM r CROSS JOIN n
    WHERE r.rnk <= {_ZIPF_TOPK}
    """,
    tags=("text", "B15", "corpus-stats", "zipf"),
)
def docs_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf rank-size diagnostic over the corpus vocabulary: the top-100
    words with rank, frequency, and the rank×frequency product — under
    Zipf's law that product is ~constant (zipf_c ≈ the law's C), and
    systematic drift in it is the standard screen for synthetic,
    templated, or boilerplate-heavy corpora (natural text tracks C
    within a band; generated word soup goes flat). LOG-FREE: the
    classical log-log slope fit is replaced by the exact integer
    product the slope would estimate, so no engine transcendental runs.

    Exactness: counts, ranks, and the product are integers; rel_freq
    and zipf_c are each ONE IEEE division by the exact corpus total.

    Scale: one word explode into a map-side-combinable vocabulary
    count, a 1-row total broadcast, and a top-k over the vocabulary
    relation (TakeOrdered, no full sort); the corpus never shuffles."""
    d = load_table(spark, sf_dir, "documents")
    c = (
        d.select(F.explode(F.split(F.col("text"), " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    n = c.agg(F.sum("freq").alias("total"))
    # ORDER BY + LIMIT → TakeOrderedAndProject; the rank window runs
    # over the ≤K-row result, never the unbounded vocabulary.
    top = c.orderBy(F.desc("freq"), F.asc("word")).limit(_ZIPF_TOPK)
    r = top.withColumn(
        "rnk",
        F.row_number().over(bounded_window("word", F.desc("freq"), F.asc("word"))),
    )
    return r.crossJoin(F.broadcast(n)).select(
        "word",
        "freq",
        F.col("rnk").cast("long").alias("rnk"),
        (F.col("rnk") * F.col("freq")).cast("long").alias(
            "rank_freq_product"
        ),
        (F.col("freq").cast("double") / F.col("total")).alias("rel_freq"),
        (
            (F.col("rnk") * F.col("freq")).cast("double") / F.col("total")
        ).alias("zipf_c"),
    )
