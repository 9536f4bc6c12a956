"""Distributed BPE (byte-pair-encoding) vocabulary training.

The tokenizer-training step of an LLM data pipeline: learn the
``n_merges`` most frequent adjacent-symbol merges over a corpus. The
classic formulation (and GPT-2's actual trainer) never iterates over
raw text after the first pass — it works on the WORD-FREQUENCY table,
which is |distinct words| rows regardless of corpus size. That is the
scale shape here:

- one corpus pass builds (word, freq) — the only event-count-sized job;
- each merge iteration is one pair-count aggregation over the vocab
  table (explode adjacent pairs weighted by freq, map-side partial
  sums) + one Arrow-vectorized symbol rewrite — vocab-sized work, and
  the argmax collect is ONE row (model extraction);
- determinism: ties break on the pair's lexicographic order, and merge
  application scans left-to-right non-overlapping (the standard rule),
  so the learned merge list is bit-identical across partitionings —
  pinned against a pure-Python reference implementation in
  ``tests/test_r7_batch2.py``.

Lineage grows one rewrite per merge, so the vocab table is
localCheckpoint'd periodically (same device as the connected-components
loop in ``dedup.py``).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

__all__ = ["word_frequencies", "train_bpe"]


def word_frequencies(df: DataFrame, text_col: str) -> DataFrame:
    """(word, freq) over whitespace-split tokens — the one
    corpus-sized pass; everything after works on this table."""
    return (
        df.select(F.explode(F.split(F.col(text_col), r"\s+")).alias("word"))
        .where(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def _merge_pair_udf(a: str, b: str):
    merged = a + b

    @pandas_udf("array<string>")
    def _merge(syms: pd.Series) -> pd.Series:
        out = []
        for s in syms:
            i, n, res = 0, len(s), []
            while i < n:
                if i + 1 < n and s[i] == a and s[i + 1] == b:
                    res.append(merged)
                    i += 2
                else:
                    res.append(s[i])
                    i += 1
            out.append(res)
        return pd.Series(out)

    return _merge


def _train_bpe_local(
    word_freqs: list[tuple[str, int]], n_merges: int
) -> list[tuple[str, str]]:
    """The merge loop on a COLLECTED word-frequency table — identical
    semantics to the distributed loop (pair counts weighted by freq,
    argmax with (count desc, a asc, b asc) tie-break, left-to-right
    non-overlapping rewrite), pinned equal by
    tests/test_r7_batch2.py::test_bpe_local_path_equals_distributed."""
    vocab: dict[tuple[str, ...], int] = {}
    for word, freq in word_freqs:
        syms = tuple(word)
        vocab[syms] = vocab.get(syms, 0) + freq
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        counts: dict[tuple[str, str], int] = {}
        for syms, freq in vocab.items():
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                counts[p] = counts.get(p, 0) + freq
        if not counts:
            break
        (a, b) = min(counts, key=lambda p: (-counts[p], p))
        merges.append((a, b))
        merged = a + b
        new_vocab: dict[tuple[str, ...], int] = {}
        for syms, freq in vocab.items():
            i, n, res = 0, len(syms), []
            while i < n:
                if i + 1 < n and syms[i] == a and syms[i + 1] == b:
                    res.append(merged)
                    i += 2
                else:
                    res.append(syms[i])
                    i += 1
            key = tuple(res)
            new_vocab[key] = new_vocab.get(key, 0) + freq
        vocab = new_vocab
    return merges


def train_bpe(
    df: DataFrame,
    text_col: str,
    n_merges: int = 50,
    checkpoint_every: int = 10,
    local_threshold: int | None = None,
) -> list[tuple[str, str]]:
    """Learn ``n_merges`` BPE merges; returns them in order.

    Each iteration: count adjacent symbol pairs across the vocab
    (weighted by word frequency), take the most frequent (ties to the
    lexicographically smallest pair), rewrite every word's symbol
    sequence left-to-right non-overlapping. Words collapsed to a single
    symbol stop contributing pairs and are filtered from the working
    set.

    ``local_threshold``: the production hybrid. The corpus-sized work is
    the ONE word-frequency pass; the merge loop itself runs on the
    |distinct words| table, which for natural language is orders of
    magnitude smaller than the corpus (GPT-2's trainer is single-node
    for exactly this reason). When the distinct-word count is at or
    under the threshold, the table is collected once and the loop runs
    in-process — removing ~n_merges of per-iteration job latency — with
    bit-identical output (same counts, same tie-breaks, pinned by
    pytest). None (default) always takes the distributed loop, which
    remains the path for vocabularies too large to collect."""
    wf = word_frequencies(df, text_col)
    if local_threshold is not None and wf.count() <= local_threshold:
        return _train_bpe_local(
            [(r["word"], r["freq"]) for r in wf.collect()], n_merges
        )
    vocab = wf.withColumn(
        "syms", F.split(F.col("word"), "")
    ).select("syms", "freq")
    merges: list[tuple[str, str]] = []
    for it in range(n_merges):
        pairs = (
            vocab.where(F.size("syms") >= 2)
            .select(
                "freq",
                F.explode(
                    F.zip_with(
                        F.slice("syms", 1, F.size("syms") - 1),
                        F.slice("syms", 2, F.size("syms") - 1),
                        lambda x, y: F.struct(x.alias("a"), y.alias("b")),
                    )
                ).alias("p"),
            )
            .groupBy("p.a", "p.b")
            .agg(F.sum("freq").alias("n"))
        )
        best = pairs.orderBy(F.desc("n"), "a", "b").limit(1).collect()
        if not best:
            break
        a, b = best[0]["a"], best[0]["b"]
        merges.append((a, b))
        vocab = vocab.withColumn("syms", _merge_pair_udf(a, b)(F.col("syms")))
        if (it + 1) % checkpoint_every == 0:
            vocab = vocab.localCheckpoint(eager=True)
    return merges
