"""Mergeable bottom-k samples: uniform distinct sample (KMV-with-payload)
and weighted-without-replacement sample (Efraimidis-Spirakis exponential
ranks).

Public spec: KMV / bottom-k sketches (Bar-Yossef et al. 2002; Beyer et al.
2007 "On synopses for distinct-value estimation") retain the k smallest
hash values of the distinct items — keeping the ORIGINAL keys alongside
the hashes turns the estimator into a uniform random sample of the
distinct keys that merges associatively (union the pairs, keep the k
smallest). Weighted sampling uses Efraimidis & Spirakis 2006 ("Weighted
random sampling with a reservoir"): item i gets rank -ln(u_i)/w_i for a
per-item uniform u_i, and the k SMALLEST ranks are a weighted sample
without replacement; ranks are pure functions of (key, seed, weight), so
the bottom-k rank set is mergeable the same way.

Hash law (``hash_kind="md5"``): u = first 13 hex chars of
``md5("<key>:<seed>")`` as a 52-bit integer — exactly the repo's
cross-engine uniform (`pipeline/mix.py` ``unit_uniform``), so a JVM-native
Spark build (md5 -> conv -> cast, pure codegen) and a DuckDB oracle land
on the IDENTICAL sample, bit for bit. Keys are canonicalized to their
string rendering at ingest (the law hashes the string form; int renderings
agree across Spark / DuckDB / Python). ``hash_kind="spark"`` swaps in
xxhash64 for speed on integer keys (parity with ``F.xxhash64``, not with
DuckDB, which lacks xxhash64 — CLAUDE.md convention).

Unlike the Theta sketch (`core/theta.py`, distinct-count + set algebra over
retained HASHES), the payload here is the keys themselves — profiling
seeds, eval-set picks, stratification anchors over a 10^12-row table where
``ORDER BY random() LIMIT k`` is not a plan.

Merge law: union of entries, dedup by key, keep the k smallest by
(rank, key). Associative, commutative, idempotent — the retained set is a
pure function of the SET of ingested keys (same contract as the
reference's merge tests, /root/reference/src/ddsketchy.rs:286-306).
"""

from __future__ import annotations

import hashlib
import math
import struct

import numpy as np

from .hashing import spark_xxhash64

_U_HEX_CHARS = 13
_U_DENOM = float(16**_U_HEX_CHARS)


def md5_u52(key: str, seed: int = 0) -> int:
    """The cross-engine 52-bit uniform integer of ``"<key>:<seed>"``
    (identical to pipeline/mix.py's Spark expression and the DuckDB
    ``CAST(('0x' || substring(md5(..), 1, 13)) AS BIGINT)`` parse)."""
    return int(hashlib.md5(f"{key}:{seed}".encode()).hexdigest()[:_U_HEX_CHARS], 16)


def _canon_keys(values) -> list[str]:
    """Canonical string rendering shared by Python / Spark / DuckDB for the
    key types the samplers accept (ints and strings; floats are rejected —
    their renderings diverge across engines)."""
    out = []
    for v in values:
        if v is None:
            continue
        if isinstance(v, float):
            raise TypeError(
                "float keys are not supported: their string renderings "
                "diverge across Spark/DuckDB/Python, breaking the md5 law "
                "— cast to string or int upstream")
        if isinstance(v, (bool, np.bool_)):
            raise TypeError("bool keys are ambiguous (true vs True) — cast "
                            "to string upstream")
        if isinstance(v, (np.integer,)):
            v = int(v)
        out.append(v if isinstance(v, str) else str(v))
    return out


class KMVSample:
    """Uniform sample of up to ``k`` distinct keys, mergeable bottom-k by
    hash. Also a KMV distinct-count estimator ((k-1)/u_k normalized) for
    free, though `core/theta.py` is the dedicated estimator."""

    __slots__ = ("k", "seed", "hash_kind", "entries")

    _MAGIC = b"KMS1"
    _HDR = struct.Struct("<IIBI")  # k, seed, hash_kind, n_entries
    _KINDS = ("md5", "spark")

    def __init__(self, k: int = 64, seed: int = 0, hash_kind: str = "md5") -> None:
        if not 1 <= k <= (1 << 22):
            raise ValueError(f"sample size k must be in [1, 2^22], got {k}")
        if hash_kind not in self._KINDS:
            raise ValueError(f"hash_kind must be one of {self._KINDS}")
        if not 0 <= seed < 2**32:
            raise ValueError(f"seed must be in [0, 2^32), got {seed}")
        if hash_kind == "spark" and seed != 0:
            raise ValueError(
                "hash_kind='spark' requires seed=0 (F.xxhash64 has a fixed "
                "seed, so a nonzero seed would be silently ignored)")
        self.k = k
        self.seed = seed
        self.hash_kind = hash_kind
        # sorted list of (u, key): the k smallest seen, u ascending
        self.entries: list[tuple[int, str]] = []

    # -- ingest ---------------------------------------------------------------

    def add(self, value) -> None:
        self.add_batch([value])

    def add_batch(self, values) -> None:
        keys = _canon_keys(values)
        if not keys:
            return
        if self.hash_kind == "md5":
            pairs = {(md5_u52(s, self.seed), s) for s in set(keys)}
        else:
            ks = sorted(set(keys))
            try:
                ints = [int(s) for s in ks]
            except ValueError:
                raise TypeError(
                    "hash_kind='spark' hashes keys as BIGINT (the "
                    "F.xxhash64 law) — non-integer keys need "
                    "hash_kind='md5'") from None
            h = spark_xxhash64(np.asarray(ints, dtype=np.int64))
            pairs = {(int(u), s) for u, s in zip(h, ks)}
        self._absorb(pairs)

    def add_hashed(self, pairs) -> None:
        """Ingest precomputed (u, key) pairs (native-engine assembly)."""
        self._absorb({(int(u), str(s)) for u, s in pairs})

    def _absorb(self, pairs: set[tuple[int, str]]) -> None:
        merged = sorted(set(self.entries) | pairs)
        # dedup by key keeping its smallest (u, key) — a key's u is a pure
        # function of (key, seed) so duplicates are exact, but xxhash64 of
        # differently-typed renderings could in principle diverge; keep-min
        # makes the law total either way
        seen: set[str] = set()
        out: list[tuple[int, str]] = []
        for u, s in merged:
            if s not in seen:
                seen.add(s)
                out.append((u, s))
            if len(out) == self.k:
                break
        self.entries = out

    # -- merge ----------------------------------------------------------------

    def _check_compat(self, other: "KMVSample") -> None:
        if (self.k, self.seed, self.hash_kind) != (other.k, other.seed, other.hash_kind):
            raise ValueError("KMV sample config mismatch")

    def merge(self, other: "KMVSample") -> "KMVSample":
        self._check_compat(other)
        self._absorb(set(other.entries))
        return self

    # -- accessors ------------------------------------------------------------

    def keys(self) -> list[str]:
        """Sampled keys in hash order (the canonical order of the sample)."""
        return [s for _, s in self.entries]

    def __len__(self) -> int:
        return len(self.entries)

    def distinct_estimate(self) -> float:
        """KMV estimator: exact below k, else (k-1) / u_k (Beyer et al.)."""
        if len(self.entries) < self.k:
            return float(len(self.entries))
        u_k = self.entries[-1][0]  # entries hold UNSIGNED values, both kinds
        denom = (_U_DENOM if self.hash_kind == "md5" else float(2**64))
        return (self.k - 1) / (u_k / denom) if u_k else float(self.k)

    # -- serde ----------------------------------------------------------------

    def to_bytes(self) -> bytes:
        parts = [self._MAGIC,
                 self._HDR.pack(self.k, self.seed,
                                self._KINDS.index(self.hash_kind),
                                len(self.entries))]
        for u, s in self.entries:
            b = s.encode()
            parts.append(struct.pack("<qI", _to_i64(u), len(b)))
            parts.append(b)
        return b"".join(parts)

    @classmethod
    def from_bytes(cls, blob: bytes) -> "KMVSample":
        if blob[:4] != cls._MAGIC:
            raise ValueError("not a KMVSample blob")
        k, seed, kind, n = cls._HDR.unpack_from(blob, 4)
        sk = cls(k, seed, cls._KINDS[kind])
        off = 4 + cls._HDR.size
        entries = []
        for _ in range(n):
            u, ln = struct.unpack_from("<qI", blob, off)
            off += 12
            entries.append((_from_i64(u, sk.hash_kind), blob[off:off + ln].decode()))
            off += ln
        sk.entries = entries
        return sk


def _to_i64(u: int) -> int:
    return u - (1 << 64) if u >= (1 << 63) else u


def _from_i64(u: int, hash_kind: str) -> int:
    # entries hold UNSIGNED comparison keys (md5 u52 < 2^52; spark kind is
    # uint64-viewed xxhash64, same convention as core/theta.py) — undo the
    # signed struct packing
    return u + (1 << 64) if u < 0 else u


class WeightedSample:
    """Weighted-without-replacement sample of up to ``k`` distinct keys
    (Efraimidis-Spirakis): rank = -ln(u)/w with u the md5 52-bit uniform
    of (key, seed) mapped to (0, 1); keep the k smallest ranks.

    Ranks are pure functions of (key, seed, weight): merges and
    re-partitionings land on the identical sample. A key ingested with
    several weights keeps its smallest (rank, weight) entry — weights are
    expected consistent per key (sample ITEMS; for row sampling use a
    unique row id as the key)."""

    __slots__ = ("k", "seed", "entries")

    _MAGIC = b"WES1"
    _HDR = struct.Struct("<III")  # k, seed, n_entries

    def __init__(self, k: int = 64, seed: int = 0) -> None:
        if not 1 <= k <= (1 << 22):
            raise ValueError(f"sample size k must be in [1, 2^22], got {k}")
        if not 0 <= seed < 2**32:
            raise ValueError(f"seed must be in [0, 2^32), got {seed}")
        self.k = k
        self.seed = seed
        # sorted list of (rank, key, weight), rank ascending
        self.entries: list[tuple[float, str, float]] = []

    @staticmethod
    def rank_of(key: str, weight: float, seed: int = 0) -> float:
        """-ln(u)/w, u = (u52 + 0.5) / 16^13 in (0, 1) — the +0.5 keeps u
        off both endpoints so the log is always finite; the same closed
        form is one Spark/DuckDB expression for the native engine and the
        oracle."""
        if not (weight > 0) or math.isinf(weight):
            raise ValueError(f"weights must be finite and > 0, got {weight}")
        u = (md5_u52(key, seed) + 0.5) / _U_DENOM
        return -math.log(u) / weight

    def add(self, value, weight: float) -> None:
        self.add_batch([value], [weight])

    def add_batch(self, values, weights) -> None:
        keys = []
        ws = []
        for v, w in zip(values, weights):
            if v is None or w is None:
                continue
            keys.append(v)
            ws.append(float(w))
        keys = _canon_keys(keys)
        pairs = {(self.rank_of(s, w, self.seed), s, w)
                 for s, w in zip(keys, ws)}
        self._absorb(pairs)

    def _absorb(self, triples: set[tuple[float, str, float]]) -> None:
        merged = sorted(set(self.entries) | triples)
        seen: set[str] = set()
        out: list[tuple[float, str, float]] = []
        for r, s, w in merged:
            if s not in seen:
                seen.add(s)
                out.append((r, s, w))
            if len(out) == self.k:
                break
        self.entries = out

    def merge(self, other: "WeightedSample") -> "WeightedSample":
        if (self.k, self.seed) != (other.k, other.seed):
            raise ValueError("weighted sample config mismatch")
        self._absorb(set(other.entries))
        return self

    def keys(self) -> list[str]:
        return [s for _, s, _ in self.entries]

    def __len__(self) -> int:
        return len(self.entries)

    def to_bytes(self) -> bytes:
        parts = [self._MAGIC, self._HDR.pack(self.k, self.seed, len(self.entries))]
        for r, s, w in self.entries:
            b = s.encode()
            parts.append(struct.pack("<ddI", r, w, len(b)))
            parts.append(b)
        return b"".join(parts)

    @classmethod
    def from_bytes(cls, blob: bytes) -> "WeightedSample":
        if blob[:4] != cls._MAGIC:
            raise ValueError("not a WeightedSample blob")
        k, seed, n = cls._HDR.unpack_from(blob, 4)
        sk = cls(k, seed)
        off = 4 + cls._HDR.size
        entries = []
        for _ in range(n):
            r, w, ln = struct.unpack_from("<ddI", blob, off)
            off += 20
            entries.append((r, blob[off:off + ln].decode(), w))
            off += ln
        sk.entries = entries
        return sk
