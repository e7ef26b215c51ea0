"""KLL sketch (Karnin, Lang & Liberty 2016; deterministic variant per the
KLL± line of work) — mergeable rank/quantile sketch with additive rank error
O(n/k).

State: compactor levels; items at level l carry weight 2^l. Level capacities
shrink geometrically from the top: cap(l) = max(ceil(k * c^(H-1-l)), 8) with
c = 2/3. Compaction keeps every other item of the sorted level; the starting
offset alternates deterministically via a per-level compaction counter
(derandomized KLL — deterministic, permutation-independent merges when
counters are summed), trading the randomized guarantee for exact
reproducibility as the north rule demands.
"""

from __future__ import annotations

import math
import struct

import numpy as np

_C = 2.0 / 3.0


class KLLSketch:
    __slots__ = ("k", "levels", "offsets", "n", "_min", "_max")

    _MAGIC = b"KLL1"
    _HDR = struct.Struct("<IqddI")  # k, n, min, max, n_levels

    def __init__(self, k: int = 200) -> None:
        if k < 8:
            raise ValueError("k must be >= 8")
        self.k = int(k)
        self.levels: list[np.ndarray] = [np.zeros(0, dtype=np.float64)]
        self.offsets: list[int] = [0]  # per-level compaction counters
        self.n = 0
        self._min = math.inf
        self._max = -math.inf

    # -- capacities --------------------------------------------------------

    def _capacity(self, level: int) -> int:
        height = len(self.levels)
        return max(int(math.ceil(self.k * (_C ** (height - 1 - level)))), 8)

    # -- ingestion ---------------------------------------------------------

    def add_batch(self, values) -> None:
        v = np.asarray(values, dtype=np.float64).ravel()
        v = v[np.isfinite(v)]
        if len(v) == 0:
            return
        v = v + 0.0  # normalize -0.0 -> +0.0: negative zeros sort equal but
        # serialize differently, which would break merge bit-identity
        self._min = min(self._min, float(v.min()))
        self._max = max(self._max, float(v.max()))
        self.n += len(v)
        self.levels[0] = np.concatenate([self.levels[0], v])
        self._compact_all()

    def _compact_all(self) -> None:
        # fixed point: appending a new top level shrinks every lower level's
        # capacity, so re-scan until nothing is over budget
        changed = True
        while changed:
            changed = False
            for level in range(len(self.levels)):
                if len(self.levels[level]) > self._capacity(level):
                    self._compact(level)
                    changed = True

    def _compact(self, level: int) -> None:
        items = np.sort(self.levels[level])
        if level + 1 >= len(self.levels):
            self.levels.append(np.zeros(0, dtype=np.float64))
            self.offsets.append(0)
        start = self.offsets[level] & 1
        self.offsets[level] += 1
        promoted = items[start::2]
        # odd leftover item (when start==0 and len odd, one extra promoted;
        # the complementary half is discarded — weights stay consistent
        # because promoted items double their weight)
        keep = np.zeros(0, dtype=np.float64)
        if len(items) % 2 == 1:
            # keep the unpaired item at its level to preserve total weight
            if start == 0:
                promoted, keep = promoted[:-1], items[-1:]
            else:
                keep = items[:1]
        self.levels[level] = keep
        self.levels[level + 1] = np.concatenate([self.levels[level + 1], promoted])

    # -- merge -------------------------------------------------------------

    def merge(self, other: "KLLSketch") -> "KLLSketch":
        if self.k != other.k:
            raise ValueError("kll k mismatch")
        if other.n == 0:
            return self
        while len(self.levels) < len(other.levels):
            self.levels.append(np.zeros(0, dtype=np.float64))
            self.offsets.append(0)
        for l, items in enumerate(other.levels):
            if len(items):
                self.levels[l] = np.sort(np.concatenate([self.levels[l], items]))
        for l, off in enumerate(other.offsets):
            self.offsets[l] += off
        self.n += other.n
        self._min = min(self._min, other._min)
        self._max = max(self._max, other._max)
        self._compact_all()
        return self

    @classmethod
    def merge_all(cls, sketches: list["KLLSketch"]) -> "KLLSketch":
        """Permutation-independent n-way merge: concat+sort every level
        across all inputs, sum counters, then compact once."""
        if not sketches:
            return cls()
        out = cls(sketches[0].k)
        height = max(len(s.levels) for s in sketches)
        out.levels = []
        out.offsets = []
        for l in range(height):
            parts = [s.levels[l] for s in sketches if l < len(s.levels) and len(s.levels[l])]
            out.levels.append(np.sort(np.concatenate(parts)) if parts
                              else np.zeros(0, dtype=np.float64))
            out.offsets.append(sum(s.offsets[l] for s in sketches if l < len(s.offsets)))
        out.n = sum(s.n for s in sketches)
        out._min = min((s._min for s in sketches), default=math.inf)
        out._max = max((s._max for s in sketches), default=-math.inf)
        out._compact_all()
        return out

    # -- quantiles ---------------------------------------------------------

    def _weighted_items(self):
        vals = []
        wts = []
        for l, items in enumerate(self.levels):
            if len(items):
                vals.append(items)
                wts.append(np.full(len(items), 1 << l, dtype=np.int64))
        if not vals:
            return np.zeros(0), np.zeros(0, dtype=np.int64)
        v = np.concatenate(vals)
        w = np.concatenate(wts)
        order = np.argsort(v, kind="stable")
        return v[order], w[order]

    def quantile(self, q: float) -> float:
        if not 0.0 <= q <= 1.0:
            raise ValueError(f"quantile must be in [0, 1], got {q!r}")
        if self.n == 0:
            return 0.0
        if q == 0.0:
            return self._min
        if q == 1.0:
            return self._max
        v, w = self._weighted_items()
        total = w.sum()
        rank = int(q * (total - 1))  # lower-quantile convention, like DDSketch
        cum = np.cumsum(w)
        i = int(np.searchsorted(cum, rank, side="right"))
        return float(v[min(i, len(v) - 1)])

    def quantiles(self, qs) -> list[float]:
        return [self.quantile(q) for q in qs]

    def rank(self, value: float) -> float:
        """Estimated fraction of items <= value."""
        if self.n == 0:
            return 0.0
        v, w = self._weighted_items()
        i = int(np.searchsorted(v, value, side="right"))
        return float(w[:i].sum()) / float(w.sum())

    # -- codec -------------------------------------------------------------

    def to_bytes(self) -> bytes:
        parts = [self._MAGIC,
                 self._HDR.pack(self.k, self.n, self._min, self._max, len(self.levels))]
        for items, off in zip(self.levels, self.offsets):
            parts.append(struct.pack("<Iq", len(items), off))
            parts.append(items.astype("<f8", copy=False).tobytes())
        return b"".join(parts)

    @classmethod
    def from_bytes(cls, buf: bytes) -> "KLLSketch":
        if buf[:4] != cls._MAGIC:
            raise ValueError("not a KLLSketch blob")
        k, n, mn, mx, n_levels = cls._HDR.unpack_from(buf, 4)
        sk = cls(k)
        sk.n = n
        sk._min, sk._max = mn, mx
        sk.levels = []
        sk.offsets = []
        pos = 4 + cls._HDR.size
        for _ in range(n_levels):
            cnt, off = struct.unpack_from("<Iq", buf, pos)
            pos += 12
            sk.levels.append(np.frombuffer(buf, dtype="<f8", offset=pos, count=cnt).copy())
            sk.offsets.append(off)
            pos += 8 * cnt
        return sk

    def __eq__(self, other) -> bool:
        if not isinstance(other, KLLSketch):
            return NotImplemented
        return (self.k == other.k and self.n == other.n
                and self._min == other._min and self._max == other._max
                and len(self.levels) == len(other.levels)
                and all(np.array_equal(a, b) for a, b in zip(self.levels, other.levels)))
