"""Count-Min sketch (Cormode & Muthukrishnan 2005) — mergeable frequency
sketch.

State: int64 counts[depth][width]; row i uses hash h1 + i*h2 (double
hashing). Merge is elementwise add — exactly associative/commutative, so
distributed merges are order-independent bit-for-bit. Point query = min over
rows: never underestimates; overestimates by <= eps*N with prob >= 1-delta
for width = ceil(e/eps), depth = ceil(ln(1/delta)).
"""

from __future__ import annotations

import math
import struct

import numpy as np

from .hashing import double_hash, spark_xxhash64


class CountMinSketch:
    """hash_kind="generic": double hashing (any key type, seedable).
    hash_kind="spark": row i uses pmod(xxhash64(key, lit(i)), width) —
    bit-identical to the native JVM engine (integer keys, seed 0)."""

    __slots__ = ("depth", "width", "seed", "hash_kind", "counts", "total")

    _MAGIC = b"CMS2"
    _HDR = struct.Struct("<IIIBq")  # depth, width, seed, hash_kind, total
    _KINDS = ("generic", "spark")

    def __init__(self, depth: int = 5, width: int = 1 << 14, seed: int = 0,
                 hash_kind: str = "generic") -> None:
        if width & (width - 1):
            raise ValueError("width must be a power of two")
        if hash_kind not in self._KINDS:
            raise ValueError(f"hash_kind must be one of {self._KINDS}")
        if not 0 <= seed < 2**32:
            raise ValueError(f"seed must be in [0, 2^32), got {seed}")
        if hash_kind == "spark" and seed != 0:
            raise ValueError("hash_kind='spark' requires seed=0")
        self.depth = depth
        self.width = width
        self.seed = seed
        self.hash_kind = hash_kind
        self.counts = np.zeros((depth, width), dtype=np.int64)
        self.total = 0

    @classmethod
    def for_error(cls, eps: float = 1e-4, delta: float = 0.01, seed: int = 0) -> "CountMinSketch":
        w = 1 << max(1, (int(math.e / eps) - 1).bit_length())
        d = max(1, math.ceil(math.log(1.0 / delta)))
        return cls(d, w, seed)

    def _indices(self, values) -> np.ndarray:
        if self.hash_kind == "spark":
            w = np.int64(self.width)
            return np.stack(
                [spark_xxhash64(values, (i,)).view(np.int64) % w
                 for i in range(self.depth)]
            )
        h1, h2 = double_hash(values, self.seed)
        mask = np.uint64(self.width - 1)
        return np.stack(
            [((h1 + np.uint64(i) * h2) & mask).astype(np.int64) for i in range(self.depth)]
        )

    def add_batch(self, values, counts=None) -> None:
        values = np.asarray(values)
        if len(values) == 0:
            return
        if counts is None:
            counts = np.ones(len(values), dtype=np.int64)
        idx = self._indices(values)
        for i in range(self.depth):
            np.add.at(self.counts[i], idx[i], counts)
        self.total += int(np.sum(counts))

    def query_batch(self, values) -> np.ndarray:
        """Estimated frequency per value (min over rows)."""
        values = np.asarray(values)
        if len(values) == 0:
            return np.zeros(0, dtype=np.int64)
        idx = self._indices(values)
        est = self.counts[0][idx[0]]
        for i in range(1, self.depth):
            est = np.minimum(est, self.counts[i][idx[i]])
        return est

    def merge(self, other: "CountMinSketch") -> "CountMinSketch":
        if (self.depth, self.width, self.seed, self.hash_kind) != (
                other.depth, other.width, other.seed, other.hash_kind):
            raise ValueError("count-min config mismatch")
        self.counts += other.counts
        self.total += other.total
        return self

    def to_bytes(self) -> bytes:
        return (self._MAGIC
                + self._HDR.pack(self.depth, self.width, self.seed,
                                 self._KINDS.index(self.hash_kind), self.total)
                + self.counts.astype("<i8", copy=False).tobytes())

    @classmethod
    def from_bytes(cls, buf: bytes) -> "CountMinSketch":
        if buf[:4] != cls._MAGIC:
            raise ValueError("not a CountMinSketch blob")
        d, w, seed, kind, total = cls._HDR.unpack_from(buf, 4)
        cm = cls(d, w, seed, cls._KINDS[kind])
        cm.total = total
        cm.counts = np.frombuffer(buf, dtype="<i8", offset=4 + cls._HDR.size,
                                  count=d * w).reshape(d, w).copy()
        return cm

    def __eq__(self, other) -> bool:
        if not isinstance(other, CountMinSketch):
            return NotImplemented
        return (self.depth == other.depth and self.width == other.width
                and self.seed == other.seed and self.hash_kind == other.hash_kind
                and self.total == other.total
                and np.array_equal(self.counts, other.counts))
