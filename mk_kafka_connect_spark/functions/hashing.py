"""Cross-engine deterministic hashing primitives for dedup / fingerprinting.

Spark's built-in ``hash``/``xxhash64`` and DuckDB's ``hash`` use different
algorithms, so anything built on them can't be oracle-checked. These
primitives use explicit integer arithmetic (polynomial character fold,
affine permutations mod a prime) that both engines evaluate exactly, making
MinHash/SimHash signatures — and therefore LSH candidate sets — bit-equal
across engines. Each helper returns a Spark Column builder AND the
equivalent DuckDB SQL fragment from one parameter set, so the two sides
cannot drift.

Scale note: everything here is per-row array arithmetic (no shuffle, no
UDF, whole-stage codegen'd). Cost is O(tokens × hashes) per document —
embarrassingly parallel, the right shape for 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "MERSENNE_P",
    "poly_hash",
    "SQL_POLY_HASH",
    "words",
    "SQL_WORDS",
    "shingles",
    "SQL_SHINGLES",
    "minhash_params",
]

# Large prime modulus — fits comfortably so (a*h+b) stays within int64.
MERSENNE_P = 1_000_000_007


def poly_hash(col: Column) -> Column:
    """Polynomial rolling hash of a string: fold(chars, acc*31 + ascii) mod P.

    Exact integer arithmetic → identical in Spark and DuckDB."""
    chars = F.transform(F.split(col, ""), lambda c: F.ascii(c).cast("long"))
    return F.aggregate(
        chars,
        F.lit(0).cast("long"),
        lambda acc, x: (acc * 31 + x) % MERSENNE_P,
    )


def SQL_POLY_HASH(expr: str) -> str:
    return (
        f"list_reduce(list_prepend(CAST(0 AS BIGINT), "
        f"list_transform(string_split({expr}, ''), c -> CAST(ascii(c) AS BIGINT))), "
        f"(acc, x) -> (acc * 31 + x) % {MERSENNE_P})"
    )


def words(col: Column) -> Column:
    """Whitespace tokenization (single-space; documents are pre-normalized)."""
    return F.split(col, " ")


def SQL_WORDS(expr: str) -> str:
    return f"string_split({expr}, ' ')"


def shingles(col_name: str, n: int = 3) -> Column:
    """Word n-gram shingles as an array of strings (empty when < n words).

    Takes a column NAME (used inside a SQL lambda); 1-based ``element_at``
    matches DuckDB's 1-based list indexing so both engines enumerate the
    same shingle sequence."""
    elems = ", ".join(f"element_at(split({col_name}, ' '), i + {k})" for k in range(n))
    return F.expr(
        f"CASE WHEN size(split({col_name}, ' ')) >= {n} THEN "
        f"transform(sequence(1, size(split({col_name}, ' ')) - {n - 1}), "
        f"i -> concat_ws(' ', {elems})) ELSE array() END"
    )


def SQL_SHINGLES(expr: str, n: int = 3) -> str:
    parts = " || ' ' || ".join(f"w[i + {k}]" for k in range(n))
    return (
        f"(SELECT CASE WHEN len(w) >= {n} THEN "
        f"list_transform(range(1, len(w) - {n - 2}), i -> {parts}) "
        f"ELSE [] END FROM (SELECT {SQL_WORDS(expr)} AS w) _w)"
    )


def minhash_params(num_hashes: int) -> list[tuple[int, int]]:
    """Deterministic affine-permutation parameters (a_j, b_j) for MinHash:
    h_j(x) = (a_j * x + b_j) mod P, a_j odd so the map is a bijection-ish
    spread; identical constants are embedded in both engines' expressions."""
    return [(2 * j + 3, (7919 * (j + 1)) % MERSENNE_P) for j in range(num_hashes)]
