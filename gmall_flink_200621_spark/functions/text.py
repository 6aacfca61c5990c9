"""Text-analysis column builders (training-data pipeline surface).

Everything here is built-in-function-only (JVM-side, codegen'd) and is
specified to be *bit-identical* to a plain-SQL re-implementation, so every
operator built on these has an exact DuckDB oracle:

- tokens: single-space split (the corpus is space-joined words)
- h60(): 60-bit hash = first 15 hex chars of md5, radix-converted —
  the one deterministic 64-bit-safe hash both Spark (`conv`) and ANSI-ish
  SQL (`('0x'||…)::BIGINT`) compute identically
- minhash permutations: universal hashing (a*h+b) mod p, p=2^31-1, with h
  pre-reduced mod p so every product stays < 2^62 (no int64 overflow)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

MERSENNE31 = 2_147_483_647  # 2^31-1, prime
FNV_A = 2_654_435_761  # Knuth multiplicative constants for permutation params
FNV_B = 40_503


def tokens(text: str | Column = "text") -> Column:
    c = F.col(text) if isinstance(text, str) else text
    return F.split(c, " ")


def h60(c: Column) -> Column:
    """Deterministic 60-bit hash of a string, identical in Spark and DuckDB."""
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


def shingles(toks: Column, n: int = 3) -> Column:
    """Word n-gram shingles as an array of strings (array-native — explode
    stays with the caller, after `array_distinct`).

    Guarded for short docs: Spark's `sequence(0, size-n)` would generate a
    *descending* sequence when size<n, so emit an empty array instead."""

    def mk(i: Column) -> Column:
        return F.concat_ws(" ", *[F.element_at(toks, i + j + 1) for j in range(n)])

    return F.when(
        F.size(toks) >= n, F.transform(F.sequence(F.lit(0), F.size(toks) - n), mk)
    ).otherwise(F.array().cast("array<string>"))


def minhash_sig(hash_col: Column, perm: int) -> Column:
    """One minhash permutation value for a (doc, shingle-hash) row:
    (a_i * (h mod p) + b_i) mod p. Aggregate with min() per doc."""
    a = (perm * FNV_A + 1) % MERSENNE31
    b = (perm * FNV_B + 7) % MERSENNE31
    return (F.lit(a) * (hash_col % MERSENNE31) + F.lit(b)) % MERSENNE31


def minhash_sig_sql(hash_expr: str, perm: int) -> str:
    """The DuckDB-side twin of `minhash_sig` — kept adjacent so the two
    formulas can never drift apart."""
    a = (perm * FNV_A + 1) % MERSENNE31
    b = (perm * FNV_B + 7) % MERSENNE31
    return f"({a} * (({hash_expr}) % {MERSENNE31}) + {b}) % {MERSENNE31}"
