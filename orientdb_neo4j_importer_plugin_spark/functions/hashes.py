"""Portable deterministic hash/text primitives.

Every primitive here has an exact DuckDB SQL twin (same md5-based arithmetic),
so each operator built on them can be verified value-for-value against an
independent engine — the reference's deep-equality oracle discipline
(``OFunctionsHandler.java:65-109``) applied to hashing.

Reference analogue for the hashing itself: the UNIQUE_HASH_INDEX the importer
builds on its idempotency keys (``ONeo4jImporterVerticesAndEdgesMigrator.java:363-370``).

All column expressions are Spark built-ins (JVM codegen, zero Python on the
hot path).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# 60-bit hash from md5 hex — portable: DuckDB `('0x' || substr(md5(s),1,15))::BIGINT`
H64_HEX_CHARS = 15

# Carter-Wegman family modulus/multipliers for MinHash: arithmetic stays
# below 2^62 so both engines evaluate in exact int64.
MINHASH_PRIME = 2_147_483_647  # 2^31 - 1


def h64(col: Column | str) -> Column:
    """Deterministic 60-bit integer hash of a string (md5-derived)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), 1, H64_HEX_CHARS), 16, 10).cast("long")


def h64_sql(expr: str) -> str:
    """DuckDB twin of ``h64``."""
    return f"CAST(('0x' || substr(md5({expr}), 1, {H64_HEX_CHARS})) AS BIGINT)"


def minhash_params(k: int) -> list[tuple[int, int]]:
    """k deterministic (a, b) pairs for h_i(x) = (a*x + b) mod p.

    Derived from small primes — fixed constants, not RNG, so Spark and the
    SQL oracle share them verbatim.
    """
    a_seed, b_seed = 1_103_515_245, 12_345
    params = []
    for i in range(k):
        a = (a_seed * (2 * i + 1) + 7) % MINHASH_PRIME
        b = (b_seed * (i + 1) + 3) % MINHASH_PRIME
        params.append((a if a > 0 else 1, b))
    return params


def minhash_apply(token_hash: Column, a: int, b: int) -> Column:
    """(a * (x mod p) + b) mod p — exact in int64."""
    return (F.lit(a) * (token_hash % MINHASH_PRIME) + F.lit(b)) % MINHASH_PRIME


def minhash_apply_sql(x_expr: str, a: int, b: int) -> str:
    return f"(({a} * ({x_expr} % {MINHASH_PRIME})) + {b}) % {MINHASH_PRIME}"


def tokens(text_col: Column | str) -> Column:
    """Lowercased whitespace tokens, empties removed.

    DuckDB twin: ``list_filter(regexp_split_to_array(lower(t), '\\s+'), x -> len(x) > 0)``.
    """
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.filter(F.split(F.lower(c), r"\s+"), lambda x: F.length(x) > 0)


def tokens_sql(expr: str) -> str:
    return (
        f"list_filter(regexp_split_to_array(lower({expr}), '\\s+'), x -> len(x) > 0)"
    )


def word_shingles(tokens_col: Column, n: int = 3) -> Column:
    """Word n-gram shingles (space-joined), [] if fewer than n tokens.

    DuckDB twin (1-indexed slices): see ``word_shingles_sql``.
    """
    return F.when(
        F.size(tokens_col) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(tokens_col) - (n - 1)),
            lambda i: F.concat_ws(" ", F.slice(tokens_col, i, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))


def word_shingles_sql(tokens_expr: str, n: int = 3) -> str:
    return (
        f"CASE WHEN len({tokens_expr}) >= {n} THEN "
        f"[array_to_string(({tokens_expr})[i:i+{n - 1}], ' ') "
        f"FOR i IN range(1, len({tokens_expr}) - {n - 2})] "
        f"ELSE [] END"
    )
