"""Vectorized numpy port of Spark's ``xxhash64`` expression semantics
(XXH64, Bo-Persson/Collet spec constants; seed chaining and the
zero-extended 32-bit int form exactly as Catalyst evaluates multi-column
``xxhash64`` — validated bit-for-bit against Spark in
tests/test_operators.py::test_minhash_signatures_arrow_matches_catalyst
and the standalone primitive check in BENCH/ROUND6_NOTES.md).

Spark hashes a column list left-to-right, each column's hash becoming
the next column's seed (start seed 42): LongType via ``hash_long``,
IntegerType via ``hash_int`` (value zero-extended to 32 bits). A NULL
column/element leaves the running seed unchanged.

All arithmetic is wrapping-uint64; callers hold ``np.errstate(over=
"ignore")`` or rely on numpy's default wraparound for unsigned types.
"""

from __future__ import annotations

import numpy as np

_P1 = np.uint64(0x9E3779B185EBCA87)
_P2 = np.uint64(0xC2B2AE3D27D4EB4F)
_P3 = np.uint64(0x165667B19E3779F9)
_P4 = np.uint64(0x85EBCA77C2B2AE63)
_P5 = np.uint64(0x27D4EB2F165667C5)

SEED = np.uint64(42)  # Spark's xxhash64 default seed


def _rotl(x: np.ndarray, c: int) -> np.ndarray:
    c = np.uint64(c)
    return (x << c) | (x >> (np.uint64(64) - c))


def _fmix(h: np.ndarray) -> np.ndarray:
    h = h ^ (h >> np.uint64(33))
    h = h * _P2
    h = h ^ (h >> np.uint64(29))
    h = h * _P3
    return h ^ (h >> np.uint64(32))


def hash_long(value: np.ndarray, seed) -> np.ndarray:
    """XXH64 of one 8-byte value (Spark LongType column semantics).
    ``value`` any 64-bit array (viewed as uint64); ``seed`` scalar or
    array."""
    v = np.asarray(value)
    if v.dtype != np.uint64:
        v = v.astype(np.int64, copy=False).view(np.uint64)
    with np.errstate(over="ignore"):
        h = np.asarray(seed, dtype=np.uint64) + (_P5 + np.uint64(8))
        k1 = _rotl(v * _P2, 31) * _P1
        h = h ^ k1
        h = _rotl(h, 27) * _P1 + _P4
        return _fmix(h)


def hash_int(value, seed) -> np.ndarray:
    """XXH64 of one 4-byte value, zero-extended (Spark IntegerType
    column semantics). ``value`` int array or scalar; ``seed`` scalar or
    array."""
    v = np.asarray(value)
    if v.dtype == np.int32:
        v = v.view(np.uint32).astype(np.uint64)
    else:
        v = (v.astype(np.int64, copy=False)
             & np.int64(0xFFFFFFFF)).view(np.uint64)
    with np.errstate(over="ignore"):
        h = np.asarray(seed, dtype=np.uint64) + (_P5 + np.uint64(4))
        h = h ^ (v * _P1)
        h = _rotl(h, 23) * _P2 + _P3
        return _fmix(h)
