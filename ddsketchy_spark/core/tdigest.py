"""t-digest (Dunning & Ertl 2019, merging variant) — mergeable quantile
sketch with accuracy concentrated at the tails.

State: centroids (mean float64, weight float64) sorted by mean, compression
parameter delta. Compression uses the k1 scale function
k(q) = delta/(2*pi) * asin(2q - 1), greedily clustering sorted centroids so
each cluster spans <= 1 k-unit. Compaction is DETERMINISTIC: centroids are
lexsorted by (mean, weight) before every compress, so merging a set of
states in any order through a single n-way merge yields bit-identical
results (the north-rule order-independence; pairwise tree merges are
deterministic for a fixed tree and estimate-stable across trees).
"""

from __future__ import annotations

import math
import struct

import numpy as np


class TDigest:
    __slots__ = ("delta", "means", "weights", "_min", "_max")

    _MAGIC = b"TDG1"
    _HDR = struct.Struct("<dddI")  # delta, min, max, n_centroids

    def __init__(self, delta: float = 200.0) -> None:
        if delta < 10:
            raise ValueError("delta must be >= 10")
        self.delta = float(delta)
        self.means = np.zeros(0, dtype=np.float64)
        self.weights = np.zeros(0, dtype=np.float64)
        self._min = math.inf
        self._max = -math.inf

    # -- scale function ----------------------------------------------------

    def _k(self, q: np.ndarray) -> np.ndarray:
        return self.delta / (2.0 * math.pi) * np.arcsin(2.0 * q - 1.0)

    def _k_inv(self, k: np.ndarray) -> np.ndarray:
        return (np.sin(k * (2.0 * math.pi) / self.delta) + 1.0) / 2.0

    # -- ingestion ---------------------------------------------------------

    @property
    def count(self) -> float:
        return float(self.weights.sum())

    def add_batch(self, values) -> None:
        v = np.asarray(values, dtype=np.float64).ravel()
        v = v[np.isfinite(v)]
        if len(v) == 0:
            return
        v = v + 0.0  # normalize -0.0 -> +0.0: negative zeros sort equal but
        # serialize differently, which would break merge bit-identity
        self._min = min(self._min, float(v.min()))
        self._max = max(self._max, float(v.max()))
        self._absorb(v, np.ones(len(v), dtype=np.float64))

    def add_weighted_batch(self, values, weights) -> None:
        """``values[i]`` carries ``weights[i]`` mass. Unlike the counting
        sketches (DDSketch/CMS/MG, whose expansion law needs integral
        occurrence counts), a t-digest ingests (mean, weight) centroids
        NATIVELY — fractional weights are legitimate importance weights
        here, so any finite weight >= 0 is accepted (zero-weight and
        non-finite-value pairs contribute nothing; negatives raise).
        With integral weights the quantile estimates agree with the
        expanded stream within the sketch's accuracy (the compressor may
        split an expanded run across centroids where a single weighted
        point cannot — count, min and max are exact either way)."""
        v = np.asarray(values, dtype=np.float64).ravel()
        w = np.asarray(weights, dtype=np.float64).ravel()
        if len(v) != len(w):
            raise ValueError(f"{len(v)} values but {len(w)} weights")
        if len(v) == 0:
            return
        if not np.isfinite(w).all():
            raise ValueError("weights must be finite")
        if (w < 0).any():
            raise ValueError(f"weights must be >= 0, got {float(w.min())}")
        live = np.isfinite(v) & (w > 0)
        v, w = v[live], w[live]
        if len(v) == 0:
            return
        v = v + 0.0  # -0.0 -> +0.0, as in add_batch
        self._min = min(self._min, float(v.min()))
        self._max = max(self._max, float(v.max()))
        self._absorb(v, w)

    def _absorb(self, means: np.ndarray, weights: np.ndarray) -> None:
        all_means = np.concatenate([self.means, means])
        all_weights = np.concatenate([self.weights, weights])
        order = np.lexsort((all_weights, all_means))
        self.means, self.weights = self._compress(all_means[order], all_weights[order])

    def _compress(self, means: np.ndarray, weights: np.ndarray):
        """Greedy k1-bounded clustering of (sorted) centroids.

        O(#clusters) Python loop (~2*delta iterations) with vectorized
        searchsorted per cluster — batch size does not appear in the loop.
        """
        total = weights.sum()
        if total == 0:
            return means[:0], weights[:0]
        cumw = np.cumsum(weights)
        cw_means = np.cumsum(weights * means)
        out_means: list[float] = []
        out_weights: list[float] = []
        i = 0
        n = len(means)
        while i < n:
            w_before = cumw[i - 1] if i > 0 else 0.0
            q0 = w_before / total
            k_limit = self._k(np.asarray([q0]))[0] + 1.0
            q_limit = float(self._k_inv(np.asarray([k_limit]))[0])
            w_limit = q_limit * total
            # furthest j with cumw[j] <= w_limit, at least i itself
            j = int(np.searchsorted(cumw, w_limit, side="right")) - 1
            j = max(j, i)
            w = cumw[j] - w_before
            s = cw_means[j] - (cw_means[i - 1] if i > 0 else 0.0)
            out_means.append(s / w)
            out_weights.append(w)
            i = j + 1
        return np.asarray(out_means), np.asarray(out_weights)

    # -- merge -------------------------------------------------------------

    def merge(self, other: "TDigest") -> "TDigest":
        if self.delta != other.delta:
            raise ValueError("tdigest delta mismatch")
        if other.count == 0:
            return self
        self._min = min(self._min, other._min)
        self._max = max(self._max, other._max)
        self._absorb(other.means, other.weights)
        return self

    @classmethod
    def merge_all(cls, digests: list["TDigest"]) -> "TDigest":
        """n-way merge with a single final compress — bit-identical for any
        permutation of ``digests``."""
        if not digests:
            return cls()
        out = cls(digests[0].delta)
        means = np.concatenate([d.means for d in digests])
        weights = np.concatenate([d.weights for d in digests])
        out._min = min(d._min for d in digests)
        out._max = max(d._max for d in digests)
        order = np.lexsort((weights, means))
        out.means, out.weights = out._compress(means[order], weights[order])
        return out

    # -- quantiles ---------------------------------------------------------

    def quantile(self, q: float) -> float:
        if not 0.0 <= q <= 1.0:
            raise ValueError(f"quantile must be in [0, 1], got {q!r}")
        n = len(self.means)
        if n == 0:
            return 0.0
        total = self.weights.sum()
        if n == 1 or total == 1:
            return float(self.means[0]) if total > 1 else self._min
        if q == 0.0:
            return self._min
        if q == 1.0:
            return self._max
        target = q * total
        # cumulative weight at centroid midpoints
        cumw = np.cumsum(self.weights)
        mid = cumw - self.weights / 2.0
        i = int(np.searchsorted(mid, target))
        if i == 0:
            # between min and first centroid
            lo_w, hi_w = 0.0, mid[0]
            lo_v, hi_v = self._min, self.means[0]
        elif i >= n:
            lo_w, hi_w = mid[-1], total
            lo_v, hi_v = self.means[-1], self._max
        else:
            lo_w, hi_w = mid[i - 1], mid[i]
            lo_v, hi_v = self.means[i - 1], self.means[i]
        if hi_w == lo_w:
            return float(hi_v)
        frac = (target - lo_w) / (hi_w - lo_w)
        return float(lo_v + frac * (hi_v - lo_v))

    def quantiles(self, qs) -> list[float]:
        return [self.quantile(q) for q in qs]

    # -- codec -------------------------------------------------------------

    def to_bytes(self) -> bytes:
        return (self._MAGIC
                + self._HDR.pack(self.delta, self._min, self._max, len(self.means))
                + self.means.astype("<f8", copy=False).tobytes()
                + self.weights.astype("<f8", copy=False).tobytes())

    @classmethod
    def from_bytes(cls, buf: bytes) -> "TDigest":
        if buf[:4] != cls._MAGIC:
            raise ValueError("not a TDigest blob")
        delta, mn, mx, n = cls._HDR.unpack_from(buf, 4)
        td = cls(delta)
        td._min, td._max = mn, mx
        off = 4 + cls._HDR.size
        td.means = np.frombuffer(buf, dtype="<f8", offset=off, count=n).copy()
        td.weights = np.frombuffer(buf, dtype="<f8", offset=off + 8 * n, count=n).copy()
        return td

    def __eq__(self, other) -> bool:
        if not isinstance(other, TDigest):
            return NotImplemented
        return (self.delta == other.delta
                and np.array_equal(self.means, other.means)
                and np.array_equal(self.weights, other.weights)
                and self._min == other._min and self._max == other._max)
