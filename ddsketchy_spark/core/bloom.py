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

from .hashing import double_hash


class BloomFilter:
    __slots__ = ("n_bits", "n_hashes", "seed", "words", "n_added")

    _MAGIC = b"BLM1"
    _HDR = struct.Struct("<QIIq")  # n_bits, n_hashes, seed, n_added

    def __init__(self, n_bits: int = 1 << 20, n_hashes: int = 7, seed: int = 0) -> None:
        if n_bits & (n_bits - 1):
            raise ValueError("n_bits must be a power of two")
        self.n_bits = n_bits
        self.n_hashes = n_hashes
        self.seed = seed
        self.words = np.zeros(n_bits // 64, dtype=np.uint64)
        self.n_added = 0

    @classmethod
    def for_capacity(cls, n: int, fpr: float = 0.01, seed: int = 0) -> "BloomFilter":
        """Size for ~n keys at the target false-positive rate."""
        m = max(64, int(-n * math.log(fpr) / (math.log(2) ** 2)))
        m = 1 << (m - 1).bit_length()  # round up to power of two
        k = max(1, round(m / max(n, 1) * math.log(2)))
        return cls(m, min(k, 16), seed)

    def add_batch(self, values) -> None:
        h1, h2 = double_hash(values, self.seed)
        mask = np.uint64(self.n_bits - 1)
        for i in range(self.n_hashes):
            idx = (h1 + np.uint64(i) * h2) & mask
            np.bitwise_or.at(self.words, (idx >> np.uint64(6)).astype(np.int64),
                             np.uint64(1) << (idx & np.uint64(63)))
        self.n_added += len(h1)

    def contains_batch(self, values) -> np.ndarray:
        h1, h2 = double_hash(values, self.seed)
        mask = np.uint64(self.n_bits - 1)
        out = np.ones(len(h1), dtype=bool)
        for i in range(self.n_hashes):
            idx = (h1 + np.uint64(i) * h2) & mask
            bit = (self.words[(idx >> np.uint64(6)).astype(np.int64)]
                   >> (idx & np.uint64(63))) & np.uint64(1)
            out &= bit.astype(bool)
        return out

    def merge(self, other: "BloomFilter") -> "BloomFilter":
        if (self.n_bits, self.n_hashes, self.seed) != (other.n_bits, other.n_hashes, other.seed):
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
                + self._HDR.pack(self.n_bits, self.n_hashes, self.seed, self.n_added)
                + self.words.astype("<u8", copy=False).tobytes())

    @classmethod
    def from_bytes(cls, buf: bytes) -> "BloomFilter":
        if buf[:4] != cls._MAGIC:
            raise ValueError("not a BloomFilter blob")
        n_bits, k, seed, n_added = cls._HDR.unpack_from(buf, 4)
        bf = cls(n_bits, k, seed)
        bf.n_added = n_added
        bf.words = np.frombuffer(buf, dtype="<u8", offset=4 + cls._HDR.size,
                                 count=n_bits // 64).copy()
        return bf

    def __eq__(self, other) -> bool:
        if not isinstance(other, BloomFilter):
            return NotImplemented
        return (self.n_bits == other.n_bits and self.n_hashes == other.n_hashes
                and self.seed == other.seed and np.array_equal(self.words, other.words))
