"""Theta sketch (KMV, k-minimum-values) — mergeable distinct counting WITH
set algebra: union / intersection / difference cardinality estimation.

Public spec: the Theta Sketch Framework (Dasgupta, Lang, Rhodes, Thaler,
"A Framework for Estimating Stream Expression Cardinalities", 2016) and the
classic KMV estimator (Bar-Yossef et al. 2002; Beyer et al. 2007). This is
what HLL cannot do: HLL unions but never intersects; a theta sketch keeps
an actual uniform hash sample of the distinct items, so any set expression
over sketches has an estimator with known error.

State: ``theta`` (exclusive uint64 threshold, starts at 2^64 = keep all)
plus a sorted uint64 array of at most ``k`` retained distinct hashes, all
< theta. Ingest/merge rule: pool distinct hashes below min(theta), and if
more than k survive, keep the k smallest and set theta to the (k+1)-th.
The retained set is therefore a pure function of the SET of hashed items —
merges are associative, commutative, idempotent, and bit-for-bit
order-independent (the same law as the reference's merge contract,
`/root/reference/src/ddsketchy.rs:286-306`, extended to set algebra).

Estimator: |entries| / (theta / 2^64); exact while theta == 2^64 (fewer
than k distinct seen). Relative standard error ~= 1/sqrt(k-1) in
estimation mode.
"""

from __future__ import annotations

import math
import struct

import numpy as np

from .hashing import hash64, spark_xxhash64

_FULL = 1 << 64  # theta domain is (0, 2^64]; 2^64 means "keep everything"


class ThetaSketch:
    """hash_kind="generic": splitmix64/SipHash (any key type, seedable).
    hash_kind="spark": bit-identical to F.xxhash64 (integer keys, seed 0) —
    lets a JVM-side native build land on identical retained hashes."""

    __slots__ = ("k", "seed", "hash_kind", "theta", "entries")

    _MAGIC = b"THT1"
    _HDR = struct.Struct("<IIBIQ")  # k, seed, hash_kind, n_entries, theta-1

    _KINDS = ("generic", "spark")

    def __init__(self, k: int = 4096, seed: int = 0, hash_kind: str = "generic") -> None:
        if not 16 <= k <= (1 << 26):
            raise ValueError(f"nominal entries k must be in [16, 2^26], got {k}")
        if hash_kind not in self._KINDS:
            raise ValueError(f"hash_kind must be one of {self._KINDS}")
        if not 0 <= seed < 2**32:
            raise ValueError(f"seed must be in [0, 2^32), got {seed}")
        if hash_kind == "spark" and seed != 0:
            raise ValueError("hash_kind='spark' requires seed=0 (F.xxhash64 has a fixed seed)")
        self.k = k
        self.seed = seed
        self.hash_kind = hash_kind
        self.theta = _FULL
        self.entries = np.empty(0, dtype=np.uint64)

    # -- ingest --------------------------------------------------------------

    def add_batch(self, values) -> None:
        if self.hash_kind == "spark":
            h = spark_xxhash64(values)
        else:
            h = hash64(values, self.seed)
        if len(h) == 0:
            return
        self._absorb(np.unique(h))

    def add_hashes(self, hashes: np.ndarray) -> None:
        """Ingest precomputed uint64 hashes (native-engine assembly path)."""
        h = np.asarray(hashes, dtype=np.uint64)
        if len(h):
            self._absorb(np.unique(h))

    def _absorb(self, h_sorted: np.ndarray) -> None:
        if self.theta < _FULL:
            h_sorted = h_sorted[h_sorted < np.uint64(self.theta)]
        if len(h_sorted) == 0:
            return
        self.entries = np.union1d(self.entries, h_sorted)
        self._trim()

    def _trim(self) -> None:
        if len(self.entries) > self.k:
            self.theta = int(self.entries[self.k])
            self.entries = self.entries[: self.k]

    # -- merge / set algebra ---------------------------------------------------

    def _check_compat(self, other: "ThetaSketch") -> None:
        if (self.k, self.seed, self.hash_kind) != (other.k, other.seed, other.hash_kind):
            raise ValueError("theta sketch config mismatch")

    def merge(self, other: "ThetaSketch") -> "ThetaSketch":
        """Union (in place). Associative/commutative/idempotent; retained
        (theta, entries) depend only on the set of items ever added."""
        self._check_compat(other)
        self.theta = min(self.theta, other.theta)
        t = np.uint64(self.theta) if self.theta < _FULL else None
        mine = self.entries if t is None else self.entries[self.entries < t]
        theirs = other.entries if t is None else other.entries[other.entries < t]
        self.entries = np.union1d(mine, theirs)
        self._trim()
        return self

    def intersect(self, other: "ThetaSketch") -> "ThetaSketch":
        """New sketch estimating |A intersect B| (not re-mergeable as a
        uniform sample of the intersection beyond its own theta)."""
        self._check_compat(other)
        out = ThetaSketch(self.k, self.seed, self.hash_kind)
        out.theta = min(self.theta, other.theta)
        common = np.intersect1d(self.entries, other.entries)
        if out.theta < _FULL:
            common = common[common < np.uint64(out.theta)]
        out.entries = common
        return out

    def a_not_b(self, other: "ThetaSketch") -> "ThetaSketch":
        """New sketch estimating |A \\ B|."""
        self._check_compat(other)
        out = ThetaSketch(self.k, self.seed, self.hash_kind)
        out.theta = min(self.theta, other.theta)
        mine = self.entries
        if out.theta < _FULL:
            mine = mine[mine < np.uint64(out.theta)]
        out.entries = np.setdiff1d(mine, other.entries)
        return out

    @staticmethod
    def jaccard(a: "ThetaSketch", b: "ThetaSketch") -> float:
        """Estimated Jaccard similarity |A&B| / |A|B|."""
        union = ThetaSketch(a.k, a.seed, a.hash_kind).merge(a).merge(b)
        inter = a.intersect(b)
        u = union.estimate()
        return (inter.estimate() / u) if u > 0 else 0.0

    # -- estimation --------------------------------------------------------------

    def estimate(self) -> float:
        """Estimated distinct count: |entries| / (theta/2^64). Exact while
        theta == 2^64 (never trimmed)."""
        if self.theta == _FULL:
            return float(len(self.entries))
        return len(self.entries) * (float(_FULL) / float(self.theta))

    def rse(self) -> float:
        """Relative standard error in estimation mode: ~1/sqrt(|entries|-1)."""
        n = len(self.entries)
        return 1.0 / math.sqrt(n - 1) if n > 1 else 1.0

    def is_estimation_mode(self) -> bool:
        return self.theta < _FULL

    def __len__(self) -> int:
        return len(self.entries)

    def __repr__(self) -> str:
        return (
            f"ThetaSketch(k={self.k}, retained={len(self.entries)}, "
            f"theta={self.theta / _FULL:.6g}, estimate={self.estimate():.1f})"
        )

    # -- serialization -------------------------------------------------------

    def to_bytes(self) -> bytes:
        kind = self._KINDS.index(self.hash_kind)
        hdr = self._HDR.pack(self.k, self.seed, kind, len(self.entries), self.theta - 1)
        return self._MAGIC + hdr + self.entries.tobytes()

    @classmethod
    def from_bytes(cls, data: bytes) -> "ThetaSketch":
        if data[:4] != cls._MAGIC:
            raise ValueError("not a ThetaSketch blob")
        k, seed, kind, n, theta_m1 = cls._HDR.unpack_from(data, 4)
        sk = cls(k, seed, cls._KINDS[kind])
        sk.theta = theta_m1 + 1
        off = 4 + cls._HDR.size
        sk.entries = np.frombuffer(data, dtype=np.uint64, count=n, offset=off).copy()
        return sk
