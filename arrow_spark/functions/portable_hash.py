"""Portable seeded 60-bit hash — identical in Spark and DuckDB.

The engine's sketch and LSH families default to ``xxhash64`` (one JVM
codegen'd instruction stream, the fast path — the reference's own
hashing utilities live in cpp/src/arrow/util/hashing.h and key the same
way: fast non-cryptographic hash, fixed seed per slot). But xxhash64 has
no DuckDB twin, which left every hash-fed operator (MinHash-LSH, SimHash,
Count-Min, Bloom, HLL) verifiable only by rows-only checks.

This module defines a second hash family with a cross-engine contract:

    portable_hash64(x, seed) = int(md5(str(seed) + ":" + x)[:15], 16)

md5 is bit-identical everywhere; 15 hex chars = 60 bits, so the value is
a non-negative BIGINT on both sides (no sign/overflow divergence, and
``%`` ≡ ``pmod`` because the operand is never negative). The Spark
Column and the DuckDB SQL snippet below are the SAME function, so a
DuckDB oracle can replay a Spark LSH/sketch pipeline hash-for-hash —
turning "hash-infeasible" checks into exact value-hash comparisons.

Cost: one md5 per (value, seed) — heavier than xxhash64 but still a
single JVM whole-stage-codegen expression (no UDF); use it when
cross-engine reproducibility matters (verification, multi-engine
pipelines), keep the xxhash64 default for raw throughput.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Upper bound (exclusive) of the hash range: 60 bits.
PORTABLE_HASH_BITS = 60
PORTABLE_HASH_MAX = 1 << PORTABLE_HASH_BITS


def portable_hash64(col: Column, seed: int = 0) -> Column:
    """Seeded 60-bit hash of a STRING column (Spark side).

    Non-negative BIGINT in [0, 2**60). The input must already be a
    string — hash semantics for other types would depend on engine cast
    formatting, so callers cast explicitly and identically on both sides.
    """
    return F.conv(
        F.substring(F.md5(F.concat(F.lit(f"{seed}:"), col)), 1, 15), 16, 10
    ).cast("long")


def portable_hash64_sql(expr: str, seed: int = 0) -> str:
    """The identical hash as a DuckDB SQL fragment (oracle side)."""
    return f"('0x' || substr(md5('{seed}:' || {expr}), 1, 15))::BIGINT"
