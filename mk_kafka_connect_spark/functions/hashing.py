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
    "md5_mod",
    "SQL_MD5_MOD",
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


def md5_mod(col: Column) -> Column:
    """String → int64 in [0, P): the first 60 bits of md5, mod P.

    The Spark side is ONE codegen'd native call chain (md5 → substring →
    conv → cast) — ~20× the throughput of the interpreted per-character
    fold on shingle-sized strings, which made the char fold ~50% of the
    whole minhash pipeline. md5 hex output is identical in Spark and
    DuckDB, so the value is still exactly reproducible cross-engine
    (DuckDB parses the same 15 hex chars with a list fold — slower, but
    the oracle only runs at toy scale). 15 hex chars = 60 bits keeps the
    conv result inside a signed int64 for both engines."""
    return (
        F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long") % MERSENNE_P
    )


def SQL_MD5_MOD(expr: str) -> str:
    return (
        f"list_reduce(list_prepend(CAST(0 AS BIGINT), "
        f"list_transform(string_split(substr(md5({expr}), 1, 15), ''), "
        f"c -> CAST(strpos('0123456789abcdef', c) AS BIGINT) - 1)), "
        f"(acc, x) -> acc * 16 + x) % {MERSENNE_P}"
    )


def words(col: Column) -> Column:
    """Whitespace tokenization (single-space; documents are pre-normalized)."""
    return F.split(col, " ")


def SQL_WORDS(expr: str) -> str:
    return f"string_split({expr}, ' ')"


def shingles(col_name: str, n: int = 3) -> Column:
    """Word n-gram shingles as an array of strings (empty when < n words).

    slice-and-zip formulation: ``arrays_zip(slice(w,1,m), …, slice(w,n,m))``
    then one concat per shingle. The index-lambda form
    (``transform(sequence(...), i -> element_at(split(text), i+k))``)
    re-evaluates the split per element after projection collapse —
    O(words²) per document, measured 8× slower on the documents table.
    Here each slice is O(words) and the split is CSE'd once per row."""
    w = f"split({col_name}, ' ')"
    m = f"size({w}) - {n - 1}"
    zips = ", ".join(f"slice({w}, {k + 1}, {m})" for k in range(n))
    fields = ", ".join(f"s['{k}']" for k in range(n))
    return F.expr(
        f"CASE WHEN size({w}) >= {n} THEN "
        f"transform(arrays_zip({zips}), s -> concat_ws(' ', {fields})) "
        f"ELSE array() END"
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
