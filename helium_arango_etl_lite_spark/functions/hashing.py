"""Cross-engine deterministic hashing primitives.

The LLM-dedup operators (MinHash, SimHash, LSH) need hash functions that are
(a) computable JVM-side with built-in expressions (no Python in the hot
path) and (b) reproducible in ANSI SQL so the DuckDB oracle can verify them.

The shared base hash is the top 60 bits of ``md5``:

* Spark : ``conv(substr(md5(s), 1, 15), 16, 10)`` cast to long
* DuckDB: ``('0x' || substr(md5(s), 1, 15))::BIGINT``

15 hex digits = 60 bits, always non-negative, fits a signed 64-bit long in
both engines. MinHash's K permutations are the classic universal family
``h_i(x) = (a_i * x + b_i) mod P`` with a Mersenne prime P = 2^61 - 1;
(a_i, b_i) are generated from a seeded PRNG so Spark and the generated
oracle SQL agree exactly. All arithmetic stays below 2^63 overflow because
x < 2^60 and a,b < 2^31... NOT true for a*x — so the multiply is done in
DECIMAL(38,0) then mod, which both engines evaluate exactly.
"""

from __future__ import annotations

import random

from pyspark.sql import Column
from pyspark.sql import functions as F

MERSENNE_61 = (1 << 61) - 1


def hash64(col: Column | str) -> Column:
    """Deterministic 60-bit non-negative hash of a string column (JVM-side)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


def hash64_oracle_sql(expr: str) -> str:
    """DuckDB SQL rendering of :func:`hash64` over SQL expression ``expr``."""
    return f"(('0x' || substr(md5({expr}), 1, 15))::BIGINT)"


def minhash_params(num_hashes: int, seed: int = 42) -> list[tuple[int, int]]:
    """Seeded (a, b) pairs for the universal hash family (shared with oracle)."""
    rng = random.Random(seed)
    return [(rng.randrange(1, MERSENNE_61), rng.randrange(0, MERSENNE_61)) for _ in range(num_hashes)]


def permuted_hash(base: Column, a: int, b: int) -> Column:
    """``(a * base + b) mod (2^61 - 1)`` evaluated exactly via DECIMAL(38,0).

    base < 2^60 and a < 2^61 would overflow long multiplication; DECIMAL(38,0)
    holds the 121-bit product exactly and ``pmod`` brings it back to a long.
    """
    prod = base.cast("decimal(38,0)") * F.lit(a).cast("decimal(38,0)") + F.lit(b).cast(
        "decimal(38,0)"
    )
    return (prod % F.lit(MERSENNE_61).cast("decimal(38,0)")).cast("long")


def permuted_hash_oracle_sql(base_expr: str, a: int, b: int) -> str:
    """DuckDB rendering of :func:`permuted_hash` (HUGEINT is 128-bit exact)."""
    return (
        f"((({base_expr})::HUGEINT * {a}::HUGEINT + {b}::HUGEINT) % {MERSENNE_61}::HUGEINT)::BIGINT"
    )


def minhash_signature(token_array: Column, num_hashes: int, seed: int = 42) -> Column:
    """MinHash signature: array of ``min over tokens of h_i(hash64(token))``.

    Built entirely from JVM expressions: transform + aggregate over the token
    array — no shuffle, no UDF. Empty arrays produce a signature of
    MERSENNE_61 (matches the oracle's coalesced min).
    """
    base = F.transform(token_array, lambda t: F.conv(F.substring(F.md5(t), 1, 15), 16, 10).cast("long"))
    sigs = []
    for a, b in minhash_params(num_hashes, seed):
        hashed = F.transform(base, _permuted_lambda(a, b))
        sigs.append(
            F.coalesce(F.array_min(hashed), F.lit(MERSENNE_61).cast("long"))
        )
    return F.array(*sigs)


def _permuted_lambda(a: int, b: int):
    """Single-arg lambda factory: PySpark infers HOF arity from the Python
    signature, so (a, b) must be closed over, not defaulted parameters."""
    return lambda x: permuted_hash(x, a, b)
