"""Vectorized XXH64 (public xxHash spec, 4- and 8-byte paths) in
numpy uint64 arithmetic, matching Spark SQL's ``xxhash64`` over INT
and LONG fields bit-for-bit (seed 42, per-field seed chaining) — the
building block that lets Arrow-batched operators reuse hash values
computed JVM-side and vice versa.

Spark hashes a multi-field call ``xxhash64(a, b, ...)`` by folding:
the hash of field k seeds field k+1 (initial seed 42). An INT field
runs the 4-byte finalization path, a LONG field the 8-byte path —
both are fixed sequences of wrapping uint64 multiply/rotate/xor, so
a numpy array of longs hashes in ~12 elementwise ops.

Equality with Spark is asserted by tests over random values
(tests/test_dedup_similarity.py) and transitively by every
Arrow-vs-HOF bit-identity test built on top.
"""

from __future__ import annotations

import numpy as np

PRIME64_1 = np.uint64(0x9E3779B185EBCA87)
PRIME64_2 = np.uint64(0xC2B2AE3D27D4EB4F)
PRIME64_3 = np.uint64(0x165667B19E3779F9)
PRIME64_4 = np.uint64(0x85EBCA77C2B2AE63)
PRIME64_5 = np.uint64(0x27D4EB2F165667C5)

SPARK_SEED = np.uint64(42)


def _rotl(x: np.ndarray, r: int) -> np.ndarray:
    r = np.uint64(r)
    return (x << r) | (x >> (np.uint64(64) - r))


def xxh64_long(x: np.ndarray, seed: np.uint64) -> np.ndarray:
    """XXH64 of each 8-byte long in ``x`` (uint64 view), one fixed
    finalization path — equals Spark ``xxhash64(<long col>)`` when
    ``seed`` is 42 (or a chained field seed). Wrapping overflow is the
    spec; callers should run under ``np.errstate(over='ignore')``."""
    h = seed + PRIME64_5 + np.uint64(8)
    k1 = x * PRIME64_2
    k1 = _rotl(k1, 31)
    k1 = k1 * PRIME64_1
    h = h ^ k1
    h = _rotl(h, 27) * PRIME64_1 + PRIME64_4
    h ^= h >> np.uint64(33)
    h *= PRIME64_2
    h ^= h >> np.uint64(29)
    h *= PRIME64_3
    h ^= h >> np.uint64(32)
    return h


def xxh64_int(i: int | np.ndarray, seed: np.uint64) -> np.uint64 | np.ndarray:
    """XXH64 of a 4-byte int (zero-extended low 32 bits, per the
    spec's 4-byte tail step) — equals Spark ``xxhash64(<int col>)``,
    including NEGATIVE ints (masked to their two's-complement 32-bit
    pattern first — ``np.uint32(<negative python int>)`` raises on
    NumPy 2.x)."""
    low32 = (np.asarray(i).astype(np.int64) & np.int64(0xFFFFFFFF)).astype(np.uint64)
    if np.ndim(i) == 0:
        low32 = np.uint64(low32)
    h = np.uint64(seed) + PRIME64_5 + np.uint64(4)
    h = h ^ (low32 * PRIME64_1)
    h = _rotl(h, 23) * PRIME64_2 + PRIME64_3
    h ^= h >> np.uint64(33)
    h *= PRIME64_2
    h ^= h >> np.uint64(29)
    h *= PRIME64_3
    h ^= h >> np.uint64(32)
    return h
