"""Pure-Python twin of Spark's ``xxhash64`` SQL function for long and
int inputs — lets the replay oracles (linkgraph/oracle/literal.py)
reproduce the chunked partitioners' hash-defined chunk/task/order keys
WITHOUT a Spark session.

The algorithm is the public XXH64 specification as Spark applies it:
``xxhash64(c1, c2, …)`` starts from seed 42 and folds each column in
with the fixed-width primitive hash (8-byte block for LongType, 4-byte
for IntegerType), the result of one column becoming the seed of the
next. Verified bit-exact against Spark in
tests/test_literal_oracle.py::test_xxhash64_port.
"""

from __future__ import annotations

MASK = (1 << 64) - 1
P1 = 0x9E3779B185EBCA87
P2 = 0xC2B2AE3D27D4EB4F
P3 = 0x165667B19E3779F9
P4 = 0x85EBCA77C2B2AE63
P5 = 0x27D4EB2F165667C5


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & MASK


def _fmix(h: int) -> int:
    h ^= h >> 33
    h = (h * P2) & MASK
    h ^= h >> 29
    h = (h * P3) & MASK
    h ^= h >> 32
    return h


def _hash_long(value: int, seed: int) -> int:
    h = (seed + P5 + 8) & MASK
    k1 = (value & MASK) * P2 & MASK
    k1 = _rotl(k1, 31)
    k1 = (k1 * P1) & MASK
    h ^= k1
    h = (_rotl(h, 27) * P1 + P4) & MASK
    return _fmix(h)


def _hash_int(value: int, seed: int) -> int:
    h = (seed + P5 + 4) & MASK
    h ^= ((value & 0xFFFFFFFF) * P1) & MASK
    h = (_rotl(h, 23) * P2 + P3) & MASK
    return _fmix(h)


def xxhash64(*cols: int, seed: int = 42, widths: tuple[str, ...] | None = None) -> int:
    """Spark-equivalent ``xxhash64`` over integer columns, returned as
    a SIGNED 64-bit value (like the SQL function). ``widths`` marks
    each column 'long' (default) or 'int' — Spark hashes a 4-byte
    IntegerType literal differently from an 8-byte LongType column."""
    h = seed
    for i, v in enumerate(cols):
        w = widths[i] if widths else "long"
        h = _hash_int(v, h) if w == "int" else _hash_long(v, h)
    return h - (1 << 64) if h >= (1 << 63) else h


def pmod_xxhash64(n: int, *cols: int, widths: tuple[str, ...] | None = None) -> int:
    """``pmod(xxhash64(cols…), n)`` with Spark's non-negative pmod."""
    return xxhash64(*cols, widths=widths) % n
