"""Bloom filter (Bloom 1970) — mergeable membership sketch.

State: a power-of-two bit array held as uint64 words; k hash positions per
key via Kirsch-Mitzenmacher double hashing. Merge is bitwise OR, exactly
associative/commutative/idempotent, so distributed merges are
order-independent bit-for-bit. Guarantee: NO false negatives; false-positive
rate ~ (1 - e^{-kn/m})^k.
"""

from __future__ import annotations

import math
import struct

import numpy as np

from .hashing import double_hash, spark_xxhash64


class BloomFilter:
    """hash_kind="generic": Kirsch-Mitzenmacher double hashing (any keys).
    hash_kind="spark": probe i uses pmod(xxhash64(key, lit(i)), n_bits) —
    bit-identical to the native JVM engine (integer keys, seed 0)."""

    __slots__ = ("n_bits", "n_hashes", "seed", "hash_kind", "words", "n_added")

    _MAGIC = b"BLM2"
    _HDR = struct.Struct("<QIIBq")  # n_bits, n_hashes, seed, hash_kind, n_added
    _KINDS = ("generic", "spark")

    def __init__(self, n_bits: int = 1 << 20, n_hashes: int = 7, seed: int = 0,
                 hash_kind: str = "generic") -> None:
        if n_bits & (n_bits - 1):
            raise ValueError("n_bits must be a power of two")
        if hash_kind not in self._KINDS:
            raise ValueError(f"hash_kind must be one of {self._KINDS}")
        if not 0 <= seed < 2**32:
            raise ValueError(f"seed must be in [0, 2^32), got {seed}")
        if hash_kind == "spark" and seed != 0:
            raise ValueError("hash_kind='spark' requires seed=0")
        self.n_bits = n_bits
        self.n_hashes = n_hashes
        self.seed = seed
        self.hash_kind = hash_kind
        self.words = np.zeros(n_bits // 64, dtype=np.uint64)
        self.n_added = 0

    def _positions(self, values) -> "np.ndarray":
        """(n_hashes, n) bit positions."""
        if self.hash_kind == "spark":
            m = np.int64(self.n_bits)
            return np.stack([
                (spark_xxhash64(values, (i,)).view(np.int64) % m).view(np.uint64)
                for i in range(self.n_hashes)
            ])
        h1, h2 = double_hash(values, self.seed)
        mask = np.uint64(self.n_bits - 1)
        return np.stack([(h1 + np.uint64(i) * h2) & mask for i in range(self.n_hashes)])

    @staticmethod
    def params_for_capacity(n: int, fpr: float = 0.01) -> tuple[int, int]:
        """(n_bits, n_hashes) for ~n keys at the target false-positive rate
        — arithmetic only, no bit-array allocation."""
        m = max(64, int(-n * math.log(fpr) / (math.log(2) ** 2)))
        m = 1 << (m - 1).bit_length()  # round up to power of two
        k = max(1, round(m / max(n, 1) * math.log(2)))
        return m, min(k, 16)

    @classmethod
    def for_capacity(cls, n: int, fpr: float = 0.01, seed: int = 0) -> "BloomFilter":
        """Size for ~n keys at the target false-positive rate."""
        m, k = cls.params_for_capacity(n, fpr)
        return cls(m, k, seed)

    def add_batch(self, values) -> None:
        pos = self._positions(values)
        for idx in pos:
            np.bitwise_or.at(self.words, (idx >> np.uint64(6)).astype(np.int64),
                             np.uint64(1) << (idx & np.uint64(63)))
        self.n_added += pos.shape[1]

    def contains_batch(self, values) -> np.ndarray:
        pos = self._positions(values)
        out = np.ones(pos.shape[1], dtype=bool)
        for idx in pos:
            bit = (self.words[(idx >> np.uint64(6)).astype(np.int64)]
                   >> (idx & np.uint64(63))) & np.uint64(1)
            out &= bit.astype(bool)
        return out

    def merge(self, other: "BloomFilter") -> "BloomFilter":
        if (self.n_bits, self.n_hashes, self.seed, self.hash_kind) != (
                other.n_bits, other.n_hashes, other.seed, other.hash_kind):
            raise ValueError("bloom config mismatch")
        np.bitwise_or(self.words, other.words, out=self.words)
        self.n_added += other.n_added
        return self

    @property
    def fill_ratio(self) -> float:
        return float(np.unpackbits(self.words.view(np.uint8)).sum()) / self.n_bits

    def estimated_fpr(self) -> float:
        return self.fill_ratio ** self.n_hashes

    def to_bytes(self) -> bytes:
        return (self._MAGIC
                + self._HDR.pack(self.n_bits, self.n_hashes, self.seed,
                                 self._KINDS.index(self.hash_kind), self.n_added)
                + self.words.astype("<u8", copy=False).tobytes())

    @classmethod
    def from_bytes(cls, buf: bytes) -> "BloomFilter":
        if buf[:4] != cls._MAGIC:
            raise ValueError("not a BloomFilter blob")
        n_bits, k, seed, kind, n_added = cls._HDR.unpack_from(buf, 4)
        bf = cls(n_bits, k, seed, cls._KINDS[kind])
        bf.n_added = n_added
        bf.words = np.frombuffer(buf, dtype="<u8", offset=4 + cls._HDR.size,
                                 count=n_bits // 64).copy()
        return bf

    def __eq__(self, other) -> bool:
        if not isinstance(other, BloomFilter):
            return NotImplemented
        return (self.n_bits == other.n_bits and self.n_hashes == other.n_hashes
                and self.seed == other.seed and self.hash_kind == other.hash_kind
                and np.array_equal(self.words, other.words))
