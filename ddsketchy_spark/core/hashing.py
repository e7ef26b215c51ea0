"""Vectorized 64-bit hashing for the companion sketches.

All sketch hashing (HLL, Count-Min, Bloom, MinHash) goes through these
functions so estimates are deterministic and identical on driver and
executors. Integer keys use the splitmix64 finalizer (Steele et al. 2014,
public domain — the standard avalanche mixer); strings/bytes/objects use
pandas' vectorized SipHash (``pd.util.hash_array``), seeded per sketch.

Everything is NumPy-vectorized; no per-row Python.
"""

from __future__ import annotations

import numpy as np

_U64 = np.uint64
_MASK = _U64(0xFFFFFFFFFFFFFFFF)


def splitmix64(x: np.ndarray, seed: int = 0) -> np.ndarray:
    """Vectorized splitmix64 finalizer over an int array -> uint64 hashes.

    All arithmetic is intentional mod-2^64 wraparound."""
    offset = _U64((0x9E3779B97F4A7C15 * (seed + 1)) & 0xFFFFFFFFFFFFFFFF)
    with np.errstate(over="ignore"):
        z = x.astype(np.int64).view(_U64) + offset
        z = (z ^ (z >> _U64(30))) * _U64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> _U64(27))) * _U64(0x94D049BB133111EB)
        return z ^ (z >> _U64(31))


def hash64(values, seed: int = 0) -> np.ndarray:
    """uint64 hashes for an arbitrary 1-D array (ints fast path, else pandas
    SipHash with a seed-derived key)."""
    arr = np.asarray(values)
    if arr.dtype.kind in ("i", "u"):
        return splitmix64(arr, seed)
    if arr.dtype.kind == "f":
        return splitmix64(arr.astype(np.float64).view(np.int64), seed)
    import pandas as pd

    # exactly-16-byte hash key for any seed (negative/huge seeds included)
    key = f"{seed & 0xFFFFFFFFFFFFFFFF:016x}"
    h = pd.util.hash_array(arr if arr.dtype == object else arr.astype(object),
                           hash_key=key, categorize=False)
    return h.astype(_U64)


def double_hash(values, seed: int = 0) -> tuple[np.ndarray, np.ndarray]:
    """Two independent uint64 hash streams (Kirsch-Mitzenmacher double
    hashing: h_i = h1 + i*h2 gives k independent-enough hash functions)."""
    h1 = hash64(values, seed)
    h2 = splitmix64(h1.view(np.int64), seed + 0x5851F42D)
    # h2 must be odd so strides hit all slots of power-of-two tables
    return h1, h2 | _U64(1)


# ---------------------------------------------------------------------------
# Spark-compatible xxHash64 (bit-identical to F.xxhash64, seed 42)
#
# Vectorized NumPy ports of the XXH64 short-input paths Spark uses for
# IntegerType (4-byte) and LongType (8-byte) values, plus the multi-argument
# chaining rule (each argument hashed with the previous hash as seed). These
# let a sketch hash values in the JVM (native engine) and in NumPy (arrow
# engine / driver estimators) and land on identical registers/counters.
# ---------------------------------------------------------------------------

_XP1 = _U64(0x9E3779B185EBCA87)
_XP2 = _U64(0xC2B2AE3D27D4EB4F)
_XP3 = _U64(0x165667B19E3779F9)
_XP4 = _U64(0x85EBCA77C2B2AE63)
_XP5 = _U64(0x27D4EB2F165667C5)
SPARK_HASH_SEED = 42


def _rotl(x: np.ndarray, r: int) -> np.ndarray:
    return (x << _U64(r)) | (x >> _U64(64 - r))


def _xxh_fmix(h: np.ndarray) -> np.ndarray:
    h = h ^ (h >> _U64(33))
    h = h * _XP2
    h = h ^ (h >> _U64(29))
    h = h * _XP3
    return h ^ (h >> _U64(32))


def spark_xxhash64_int32(x: np.ndarray, seed=SPARK_HASH_SEED) -> np.ndarray:
    """xxhash64 of an int32 column, == F.xxhash64(col INT). ``seed`` may be
    a scalar or a uint64 array (for chaining)."""
    x = np.asarray(x).astype(np.int64)
    seed = np.asarray(seed, dtype=_U64)
    with np.errstate(over="ignore"):
        h = seed + _XP5 + _U64(4)
        h = h ^ ((x.view(_U64) & _U64(0xFFFFFFFF)) * _XP1)
        h = _rotl(h, 23) * _XP2 + _XP3
        return _xxh_fmix(h)


def spark_xxhash64_int64(x: np.ndarray, seed=SPARK_HASH_SEED) -> np.ndarray:
    """xxhash64 of an int64 column, == F.xxhash64(col BIGINT)."""
    x = np.asarray(x).astype(np.int64)
    seed = np.asarray(seed, dtype=_U64)
    with np.errstate(over="ignore"):
        h = seed + _XP5 + _U64(8)
        h = h ^ (_rotl(x.view(_U64) * _XP2, 31) * _XP1)
        h = _rotl(h, 27) * _XP1 + _XP4
        return _xxh_fmix(h)


def spark_xxhash64(values, int_literals: tuple[int, ...] = ()) -> np.ndarray:
    """== F.xxhash64(col, lit(i1), lit(i2), ...) for an integer column.

    The chain rule: each later argument is hashed with the running hash as
    its seed (int literals are IntegerType -> the 4-byte path)."""
    arr = np.asarray(values)
    if arr.dtype.kind not in ("i", "u"):
        raise TypeError(f"spark_xxhash64 requires an integer array, got {arr.dtype}")
    if arr.dtype.itemsize <= 4:
        h = spark_xxhash64_int32(arr)
    else:
        h = spark_xxhash64_int64(arr)
    for lit in int_literals:
        h = spark_xxhash64_int32(np.full(len(arr), lit, dtype=np.int64), h)
    return h


def bit_length_u64(x: np.ndarray, width: int = 64) -> np.ndarray:
    """Vectorized bit length (position of highest set bit; 0 for x==0)."""
    x = x.astype(_U64, copy=True)
    out = np.zeros(len(x), dtype=np.int64)
    for s in (32, 16, 8, 4, 2, 1):
        if s >= width:
            continue
        hi = x >> _U64(s)
        m = hi != 0
        out[m] += s
        x = np.where(m, hi, x)
    out += (x != 0).astype(np.int64)
    return out
