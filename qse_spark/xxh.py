"""Pure-Python XXH64 — bit-exact twin of Spark's `xxhash64` expression.

Spark's `F.xxhash64(c1, c2, ...)` folds columns left-to-right: the running
hash (initial seed 42) seeds the XXH64 of the next column's bytes — UTF-8
bytes for strings, 8-byte little-endian for longs (Spark
`XXH64.hashUnsafeBytes` / `XXH64.hashLong`). This module reimplements the
public XXH64 algorithm (Yann Collet, xxhash.c, BSD-2) from its spec so the
DuckDB-side gold generators can reproduce minhash band keys and simhash
signatures WITHOUT running Spark — the independence the correctness gate
needs. Verified bit-exact against Spark in tests/test_training_gold.py.
"""

from __future__ import annotations

import struct

_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5
_M = 0xFFFFFFFFFFFFFFFF

SPARK_SEED = 42


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M


def _round(acc: int, inp: int) -> int:
    return (_rotl((acc + inp * _P2) & _M, 31) * _P1) & _M


def _merge(h: int, v: int) -> int:
    return ((h ^ _round(0, v)) * _P1 + _P4) & _M


def _fmix(h: int) -> int:
    h ^= h >> 33
    h = (h * _P2) & _M
    h ^= h >> 29
    h = (h * _P3) & _M
    h ^= h >> 32
    return h


def xxh64(data: bytes, seed: int) -> int:
    """XXH64 of raw bytes (unsigned 64-bit result)."""
    seed &= _M
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M
        v2 = (seed + _P2) & _M
        v3 = seed
        v4 = (seed - _P1) & _M
        while i <= n - 32:
            x1, x2, x3, x4 = struct.unpack_from("<QQQQ", data, i)
            v1 = _round(v1, x1)
            v2 = _round(v2, x2)
            v3 = _round(v3, x3)
            v4 = _round(v4, x4)
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _M
        h = _merge(h, v1)
        h = _merge(h, v2)
        h = _merge(h, v3)
        h = _merge(h, v4)
    else:
        h = (seed + _P5) & _M
    h = (h + n) & _M
    while i <= n - 8:
        (k1,) = struct.unpack_from("<Q", data, i)
        h = ((_rotl(h ^ _round(0, k1), 27) * _P1) + _P4) & _M
        i += 8
    if i <= n - 4:
        (k1,) = struct.unpack_from("<I", data, i)
        h = ((_rotl(h ^ ((k1 * _P1) & _M), 23) * _P2) + _P3) & _M
        i += 4
    while i < n:
        h = (_rotl(h ^ ((data[i] * _P5) & _M), 11) * _P1) & _M
        i += 1
    return _fmix(h)


def _signed(u: int) -> int:
    return u - (1 << 64) if u >= (1 << 63) else u


def _unsigned(s: int) -> int:
    return s & _M


def hash_long(value: int, seed: int) -> int:
    """Spark XXH64.hashLong: the 8-byte little-endian specialization."""
    return xxh64(struct.pack("<q", _signed(_unsigned(value))), seed)


def hash_int(value: int, seed: int) -> int:
    """Spark XXH64.hashInt — the 4-byte specialization. NOTE this is NOT
    xxh64 of 4 LE bytes: Spark widens the int to a long-sized lane
    ((input & 0xFFFFFFFFL) * PRIME64_1) instead of the reference tail's
    *PRIME64_1-then-rotl23 on a 32-bit read. PySpark `F.lit(i)` literals
    are IntegerType, so xxhash64(col, lit(i)) folds through THIS path."""
    h = (seed + _P5 + 4) & _M
    h ^= ((value & 0xFFFFFFFF) * _P1) & _M
    h = ((_rotl(h, 23) * _P2) + _P3) & _M
    return _fmix(h)


class IntOperand:
    """Marks a spark_xxhash64 operand as IntegerType (Spark's hashInt
    path) — the type `F.lit(i)` has, as opposed to a LongType column."""
    __slots__ = ("value",)

    def __init__(self, value: int):
        self.value = value


def spark_xxhash64(*cols, seed: int = SPARK_SEED) -> int:
    """Replicates Spark's xxhash64(c1, c2, ...) SIGNED long result for
    LongType/string operands, folding left-to-right with the running hash
    as the next seed — `org.apache.spark.sql.catalyst.expressions
    .XxHash64`.

    TYPE CAVEAT (review finding): a bare Python int is hashed as a
    LONG (hash_long). Spark hashes an IntegerType operand — which is
    what `F.lit(i)` produces — through the DIFFERENT hashInt
    specialization, so for `xxhash64(col, F.lit(i))` parity wrap the
    int as IntOperand(i) (or call hash_int directly, as
    goldgen.gold_minhash_dedup does). Trusting the long path for a lit()
    int produces silently wrong gold and a spurious oracle mismatch.
    """
    h = seed & _M
    for c in cols:
        if isinstance(c, str):
            h = xxh64(c.encode("utf-8"), h)
        elif isinstance(c, IntOperand):
            h = hash_int(c.value, h)
        elif isinstance(c, int):
            h = hash_long(c, h)
        else:
            raise TypeError(f"unsupported operand type {type(c)}")
    return _signed(h)
