"""HyperLogLog (Flajolet et al. 2007) — mergeable distinct-count sketch.

State: 2^p uint8 registers. Each key's 64-bit hash splits into a register
index (top p bits) and rho = 1 + leading zeros of the remaining 64-p bits.
Merge is elementwise max — exactly associative/commutative/idempotent, so
distributed merges are order-independent bit-for-bit. Estimator: harmonic
mean with the small-range linear-counting correction (with a 64-bit hash the
32-bit large-range correction is unnecessary). Relative error ~1.04/sqrt(2^p).
"""

from __future__ import annotations

import math
import struct

import numpy as np

from .hashing import bit_length_u64, hash64, spark_xxhash64


class HyperLogLog:
    """hash_kind="generic": splitmix64/SipHash (any key type, seedable).
    hash_kind="spark": bit-identical to F.xxhash64 (integer keys only, seed
    must be 0) — lets the native JVM engine and NumPy land on identical
    registers."""

    __slots__ = ("p", "m", "seed", "hash_kind", "registers")

    _MAGIC = b"HLL2"
    _HDR = struct.Struct("<IIIB")  # p, m, seed, hash_kind

    _KINDS = ("generic", "spark")

    def __init__(self, p: int = 14, seed: int = 0, hash_kind: str = "generic") -> None:
        if not 4 <= p <= 18:
            raise ValueError(f"precision p must be in [4, 18], got {p}")
        if hash_kind not in self._KINDS:
            raise ValueError(f"hash_kind must be one of {self._KINDS}")
        if not 0 <= seed < 2**32:
            raise ValueError(f"seed must be in [0, 2^32), got {seed}")
        if hash_kind == "spark" and seed != 0:
            raise ValueError("hash_kind='spark' requires seed=0 (F.xxhash64 has a fixed seed)")
        self.p = p
        self.m = 1 << p
        self.seed = seed
        self.hash_kind = hash_kind
        self.registers = np.zeros(self.m, dtype=np.uint8)

    def add_batch(self, values) -> None:
        if self.hash_kind == "spark":
            h = spark_xxhash64(values)
        else:
            h = hash64(values, self.seed)
        if len(h) == 0:
            return
        idx = (h >> np.uint64(64 - self.p)).astype(np.int64)
        rest = h << np.uint64(self.p)  # low 64-p bits shifted to the top
        # rho = leading zeros of `rest` + 1, capped at 64-p+1 (an all-zero
        # remainder must not claim more zeros than it has bits)
        rho = np.minimum(64 - bit_length_u64(rest) + 1,
                         64 - self.p + 1).astype(np.uint8)
        np.maximum.at(self.registers, idx, rho)

    def merge(self, other: "HyperLogLog") -> "HyperLogLog":
        if (self.p, self.seed, self.hash_kind) != (other.p, other.seed, other.hash_kind):
            raise ValueError("hll config mismatch")
        np.maximum(self.registers, other.registers, out=self.registers)
        return self

    @staticmethod
    def _alpha(m: int) -> float:
        if m == 16:
            return 0.673
        if m == 32:
            return 0.697
        if m == 64:
            return 0.709
        return 0.7213 / (1.0 + 1.079 / m)

    def estimate(self) -> float:
        regs = self.registers.astype(np.float64)
        e = self._alpha(self.m) * self.m * self.m / np.sum(np.exp2(-regs))
        zeros = int(np.count_nonzero(self.registers == 0))
        if e <= 2.5 * self.m and zeros > 0:
            return self.m * math.log(self.m / zeros)  # linear counting
        return float(e)

    def cardinality(self) -> int:
        return int(round(self.estimate()))

    def to_bytes(self) -> bytes:
        return (self._MAGIC
                + self._HDR.pack(self.p, self.m, self.seed,
                                 self._KINDS.index(self.hash_kind))
                + self.registers.tobytes())

    @classmethod
    def from_bytes(cls, buf: bytes) -> "HyperLogLog":
        if buf[:4] != cls._MAGIC:
            raise ValueError("not a HyperLogLog blob")
        p, m, seed, kind = cls._HDR.unpack_from(buf, 4)
        h = cls(p, seed, cls._KINDS[kind])
        h.registers = np.frombuffer(buf, dtype=np.uint8, offset=4 + cls._HDR.size,
                                    count=m).copy()
        return h

    def __eq__(self, other) -> bool:
        if not isinstance(other, HyperLogLog):
            return NotImplemented
        return (self.p == other.p and self.seed == other.seed
                and self.hash_kind == other.hash_kind
                and np.array_equal(self.registers, other.registers))
