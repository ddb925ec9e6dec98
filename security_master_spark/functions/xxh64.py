"""Pure-Python reimplementation of Spark's ``xxhash64`` expression for
int-typed inputs — bit-exact with ``F.xxhash64(int_col, ...)``.

Why: the sign-LSH hyperplanes (operators/similarity.py) are pure
constants derived from ``xxhash64(seed, plane, component)``. Evaluating
them used to take a driver-side Spark job (createDataFrame + collect,
~1.5 s of fixed latency before the first ANN query); computing the same
values in-process is free and keeps the literal hyperplanes identical
to what the inline JVM expression form produces
(tests/test_operators.py pins equality against ``F.xxhash64``).

Algorithm: xxHash64 as specialized by Spark's
``sql/catalyst/.../XXH64.java`` (public Apache Spark source) —
``hashInt`` for 4-byte values with seed chaining across columns,
starting from Spark's default seed 42. All arithmetic is wrapped to 64
bits; results are returned as Java-style *signed* longs.
"""

from __future__ import annotations

_MASK64 = (1 << 64) - 1
_PRIME64_1 = 0x9E3779B185EBCA87
_PRIME64_2 = 0xC2B2AE3D27D4EB4F
_PRIME64_3 = 0x165667B19E3779F9
_PRIME64_5 = 0x27D4EB2F165667C5

DEFAULT_SEED = 42


def _rotl64(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _MASK64


def _fmix(h: int) -> int:
    h ^= h >> 33
    h = (h * _PRIME64_2) & _MASK64
    h ^= h >> 29
    h = (h * _PRIME64_3) & _MASK64
    h ^= h >> 32
    return h


def _hash_int(i: int, seed: int) -> int:
    """XXH64.hashInt: one 4-byte block (int is hashed as its unsigned
    32-bit pattern, matching the JVM's ``i & 0xFFFFFFFFL``)."""
    h = (seed + _PRIME64_5 + 4) & _MASK64
    h ^= ((i & 0xFFFFFFFF) * _PRIME64_1) & _MASK64
    h = (_rotl64(h, 23) * _PRIME64_2 + _PRIME64_3) & _MASK64
    return _fmix(h)


def _to_signed(u: int) -> int:
    return u - (1 << 64) if u >= (1 << 63) else u


def xxhash64_ints(*values: int, seed: int = DEFAULT_SEED) -> int:
    """``F.xxhash64(c1, c2, ...)`` over int-typed columns: seed-chained
    ``hashInt`` per column, returned as a signed 64-bit long."""
    h = seed & _MASK64
    for v in values:
        h = _hash_int(v, h)
    return _to_signed(h)
