"""Misra-Gries heavy-hitters summary (Misra & Gries 1982; mergeable-summary
merge rule from Agarwal et al., "Mergeable Summaries", PODS 2012).

State: at most k (key -> counter) pairs plus the total stream length n.
Guarantees, for every key x with true count f(x):

    est(x) <= f(x) <= est(x) + err_bound      (err_bound <= n/(k+1))
    every x with f(x) > n/(k+1) is IN the summary (no heavy hitter missed)

Merge: add counters pointwise, then subtract the (k+1)-th largest counter
from all and drop non-positives — associative at the guarantee level and
deterministic given the counter multiset. The summary also tracks the exact
total decremented mass (err_bound) so estimates carry their own error bar.

Vectorized ingestion: np.unique pre-aggregates the batch, the counter table
lives in a dict only between batches (k entries, not per-row work).
"""

from __future__ import annotations

import struct

import numpy as np


class MisraGries:
    __slots__ = ("k", "counters", "n", "decremented", "key_kind")

    _MAGIC = b"MGS1"
    _HDR = struct.Struct("<IqqBI")  # k, n, decremented, key_kind, n_entries

    _KINDS = ("int", "str")

    def __init__(self, k: int = 256, key_kind: str = "int") -> None:
        if k < 1:
            raise ValueError("k must be >= 1")
        if key_kind not in self._KINDS:
            raise ValueError(f"key_kind must be one of {self._KINDS}")
        self.k = int(k)
        self.key_kind = key_kind
        self.counters: dict = {}
        self.n = 0
        self.decremented = 0

    def add_batch(self, values, counts=None) -> None:
        values = np.asarray(values)
        if len(values) == 0:
            return
        if counts is None:
            uniq, cnt = np.unique(values, return_counts=True)
        else:
            uniq, inv = np.unique(values, return_inverse=True)
            cnt = np.bincount(inv, weights=np.asarray(counts, dtype=np.float64)).astype(np.int64)
        self.n += int(cnt.sum())
        for key, c in zip(uniq.tolist(), cnt.tolist()):
            self.counters[key] = self.counters.get(key, 0) + int(c)
        self._shrink()

    def _shrink(self) -> None:
        if len(self.counters) <= self.k:
            return
        vals = np.fromiter(self.counters.values(), dtype=np.int64)
        # subtract the (k+1)-th largest so at most k survive
        cut = int(np.partition(vals, len(vals) - self.k - 1)[len(vals) - self.k - 1])
        survivors = {key: c - cut for key, c in self.counters.items() if c > cut}
        dropped_mass = int(vals.sum()) - sum(survivors.values())
        self.decremented += dropped_mass
        self.counters = survivors

    def merge(self, other: "MisraGries") -> "MisraGries":
        if self.k != other.k or self.key_kind != other.key_kind:
            raise ValueError("misra-gries config mismatch")
        for key, c in other.counters.items():
            self.counters[key] = self.counters.get(key, 0) + c
        self.n += other.n
        self.decremented += other.decremented
        self._shrink()
        return self

    # -- queries -------------------------------------------------------------

    @property
    def err_bound(self) -> int:
        """Max underestimate of any counter (total decremented mass is an
        upper bound; the classic analytic bound is n/(k+1))."""
        return min(self.decremented, self.n // (self.k + 1))

    def estimate(self, key) -> int:
        return self.counters.get(key, 0)

    def heavy_hitters(self, phi: float) -> dict:
        """Keys that MAY have frequency > phi*n: est + err_bound > phi*n.
        Since f(x) <= est(x) + err_bound, every key with true frequency
        > phi*n is guaranteed included."""
        thresh = phi * self.n
        return {key: c for key, c in self.counters.items() if c + self.err_bound > thresh}

    def top_items(self, m: int = 20) -> list:
        return sorted(self.counters.items(), key=lambda kv: (-kv[1], str(kv[0])))[:m]

    # -- codec ----------------------------------------------------------------

    def to_bytes(self) -> bytes:
        entries = sorted(self.counters.items(), key=lambda kv: str(kv[0]))
        parts = [self._MAGIC,
                 self._HDR.pack(self.k, self.n, self.decremented,
                                self._KINDS.index(self.key_kind), len(entries))]
        for key, c in entries:
            if self.key_kind == "int":
                parts.append(struct.pack("<qq", int(key), c))
            else:
                kb = str(key).encode()
                parts.append(struct.pack("<Iq", len(kb), c) + kb)
        return b"".join(parts)

    @classmethod
    def from_bytes(cls, buf: bytes) -> "MisraGries":
        if buf[:4] != cls._MAGIC:
            raise ValueError("not a MisraGries blob")
        k, n, dec, kind, cnt = cls._HDR.unpack_from(buf, 4)
        mg = cls(k, cls._KINDS[kind])
        mg.n = n
        mg.decremented = dec
        pos = 4 + cls._HDR.size
        for _ in range(cnt):
            if mg.key_kind == "int":
                key, c = struct.unpack_from("<qq", buf, pos)
                pos += 16
            else:
                klen, c = struct.unpack_from("<Iq", buf, pos)
                pos += 12
                key = buf[pos:pos + klen].decode()
                pos += klen
            mg.counters[key] = c
        return mg

    def __eq__(self, other) -> bool:
        if not isinstance(other, MisraGries):
            return NotImplemented
        return (self.k == other.k and self.key_kind == other.key_kind
                and self.n == other.n and self.decremented == other.decremented
                and self.counters == other.counters)
