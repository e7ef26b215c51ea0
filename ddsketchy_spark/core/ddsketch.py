"""Pure-Python/NumPy DDSketch with exact reference semantics.

The quantile math, dual-store + zero-bucket routing, merge law, and
empty/singleton edge cases replicate the reference implementation
(`/root/reference/src/ddsketchy.rs:163-700`, `/root/reference/src/python.rs:14-123`):

- values |v| <  min_indexable_value (incl. exact 0, subnormals) -> zero bucket;
  boundary is strict `<` — exactly min_indexable_value goes positive
  (`/root/reference/tests/min_indexable_value.rs:9-53`)
- non-finite inputs silently ignored (`/root/reference/src/ddsketchy.rs:242-244`)
- quantile(q): empty -> 0.0; singleton -> the raw value; otherwise
  rank = trunc(q*(count-1)) and a three-region rank walk
  (negative store reversed, zero bucket, positive store)
  (`/root/reference/src/ddsketchy.rs:518-556`)
- min()/max() are *reconstructed* (quantile(0)/quantile(1)), +/-inf on empty
  (`/root/reference/src/ddsketchy.rs:441-469`)
- merge requires |gamma_a - gamma_b| <= 1e-10, is a no-op for an empty other,
  and is associative & commutative (`/root/reference/src/ddsketchy.rs:286-306`)

This one class serves both the driver-side API and the vectorized
per-Arrow-batch path inside Spark UDFs (``add_batch`` is pure NumPy).
"""

from __future__ import annotations

import json
import math
import struct
from typing import Iterable, Optional

import numpy as np

from .mapping import LogMapping
from .store import Store

DEFAULT_ALPHA = 0.01
DEFAULT_MAX_BINS = 4096


class DDSketch:
    """Relative-error quantile sketch (DataDog dual-store semantics)."""

    __slots__ = (
        "_m",
        "positive_store",
        "negative_store",
        "zero_count",
        "_sum",
        "_raw_min",
        "_raw_max",
        "max_bins",
    )

    def __init__(self, alpha: float = DEFAULT_ALPHA, max_bins: int = DEFAULT_MAX_BINS) -> None:
        self._m = LogMapping(alpha)  # raises ValueError for invalid alpha
        if max_bins < 1:
            raise ValueError(f"max_bins must be >= 1, got {max_bins}")
        self.max_bins = int(max_bins)
        self.positive_store = Store(self.max_bins)
        self.negative_store = Store(self.max_bins)
        self.zero_count = 0
        self._sum = 0.0
        self._raw_min = math.inf
        self._raw_max = -math.inf

    # -- construction sugar ------------------------------------------------

    @classmethod
    def from_values(
        cls, values: Iterable[float], alpha: float = DEFAULT_ALPHA, max_bins: int = DEFAULT_MAX_BINS
    ) -> "DDSketch":
        sk = cls(alpha, max_bins)
        sk.add_batch(values)
        return sk

    @classmethod
    def builder(cls, alpha: float = DEFAULT_ALPHA) -> "DDSketchBuilder":
        """Builder-pattern constructor mirroring the reference's
        ``DDSketch::builder(alpha).max_bins(n).build()``
        (`/root/reference/src/ddsketchy.rs:714-786`)."""
        return DDSketchBuilder(alpha)

    @classmethod
    def with_max_bins(cls, alpha: float, max_bins: int) -> "DDSketch":
        """Convenience constructor (`/root/reference/src/ddsketchy.rs:795-797`)."""
        return cls(alpha, max_bins)

    # -- ingestion ---------------------------------------------------------

    def add(self, value: float) -> None:
        """Add one value. Non-finite values are silently ignored."""
        value = float(value)
        if not math.isfinite(value):
            return
        miv = self._m.min_indexable_value
        if value >= miv:
            self.positive_store.add(self._m.key(value))
        elif value <= -miv:
            self.negative_store.add(self._m.key(-value))
        else:
            self.zero_count += 1
        self._sum += value
        if value < self._raw_min:
            self._raw_min = value
        if value > self._raw_max:
            self._raw_max = value

    # Chunk size for add_batch: bounds peak temporary allocations to ~tens of
    # MB per call so executor Python workers reuse allocator arenas instead of
    # page-faulting GBs of fresh memory on their first big Arrow batch (the
    # first-touch cost measured 20-30s on a 17M-element batch; chunked, <1s).
    _BATCH_CHUNK = 1 << 21

    # Integer fast path: counting distinct values needs a dense count
    # array of (max - min + 1) int64 slots; beyond this span the array
    # itself would dominate (and fault in fresh pages per call), so wider
    # spans fall back to the generic float path.
    _INT_FAST_SPAN = 1 << 18

    def add_batch(self, values: Iterable[float] | np.ndarray) -> None:
        """Vectorized batch add — the hot path inside Arrow-batch UDFs."""
        if not isinstance(values, (np.ndarray, list, tuple)):
            values = list(values)  # generators / arbitrary iterables
        v = np.asarray(values)
        if v.ndim != 1:
            v = v.ravel()
        # Narrow-integer fast path (token ids, counts, enum codes): one
        # bincount over the raw ints + one weighted add over the distinct
        # values replaces the per-element log/ceil chain. Identical to the
        # float path: the f64 cast is monotone (same keys/min/max) and
        # every partial sum of <= 2^21 values of magnitude < 2^31 stays
        # under 2^53, so the float sum is exact either way.
        if (v.size and v.dtype.kind in "iu" and v.dtype.itemsize <= 4
                and not (v.dtype.kind == "u" and v.dtype.itemsize == 4)
                and self._add_int_batch(v)):
            return
        v = np.asarray(v, dtype=np.float64)
        n = len(v)
        for start in range(0, n, self._BATCH_CHUNK):
            self._add_chunk(v[start:start + self._BATCH_CHUNK])

    def _add_int_batch(self, v: np.ndarray) -> bool:
        """Count distinct integer values with chunked bincount, then fold
        them in as one exact weighted add. Returns False when the value
        span is too wide for a dense count array (caller falls back)."""
        vmin = int(v.min())
        span = int(v.max()) - vmin + 1
        if span > self._INT_FAST_SPAN:
            return False
        counts = np.zeros(span, dtype=np.int64)
        buf = np.empty(min(len(v), self._BATCH_CHUNK), dtype=np.int64)
        for start in range(0, len(v), self._BATCH_CHUNK):
            chunk = v[start:start + self._BATCH_CHUNK]
            m = len(chunk)
            np.subtract(chunk, vmin, out=buf[:m], casting="unsafe")
            counts += np.bincount(buf[:m], minlength=span)
        nz = np.flatnonzero(counts)
        self._add_weighted_chunk((nz + vmin).astype(np.float64), counts[nz])
        return True

    def _add_chunk(self, v: np.ndarray) -> None:
        finite = np.isfinite(v)
        if not finite.all():
            v = v[finite]
            if len(v) == 0:
                return
        miv = self._m.min_indexable_value
        lo = float(v.min())
        hi = float(v.max())
        if lo >= miv:
            # all-positive fast path (the token-table common case): no mask
            # copies, values feed the mapping directly
            n_pos, n_neg = len(v), 0
            self._store_keys(self.positive_store, v)
        elif hi <= -miv:
            n_pos, n_neg = 0, len(v)
            self._store_keys(self.negative_store, -v)
        else:
            pos = v >= miv
            neg = v <= -miv
            n_pos = int(pos.sum())
            n_neg = int(neg.sum())
            if n_pos:
                self._store_keys(self.positive_store, v[pos])
            if n_neg:
                self._store_keys(self.negative_store, -v[neg])
        self.zero_count += len(v) - n_pos - n_neg
        with np.errstate(over="ignore"):  # fp accumulation may reach +/-inf,
            self._sum += float(v.sum())   # same as the reference's f64 sum
        if lo < self._raw_min:
            self._raw_min = lo
        if hi > self._raw_max:
            self._raw_max = hi

    def _store_keys(self, store, magnitudes: np.ndarray) -> None:
        """Bucket a magnitude array into a store: O(n) bincount when the key
        span is small (always true for realistic alpha), sort-based unique as
        the fallback for pathologically tiny alpha."""
        keys = self._m.keys_for(magnitudes)
        kmin = int(keys.min())
        span = int(keys.max()) - kmin + 1
        if span <= max(1 << 16, 4 * len(keys)):
            counts = np.bincount(keys.astype(np.int64) - kmin, minlength=span)
            nz = np.nonzero(counts)[0]
            store.add_keys((nz + kmin).astype(np.int32), counts[nz].astype(np.int64))
        else:
            uk, counts = np.unique(keys, return_counts=True)
            store.add_keys(uk, counts.astype(np.int64))

    def extend(self, values: Iterable[float]) -> None:
        self.add_batch(values)

    def add_weighted(self, value: float, count: int) -> None:
        """Add ``value`` as if it occurred ``count`` times (count >= 0,
        integral). The weighted-ingest law: the resulting sketch is
        IDENTICAL to calling ``add(value)`` count times — which is what
        makes sketching a pre-aggregated (value, count) table exact."""
        self.add_weighted_batch([value], [count])

    def add_weighted_batch(self, values, counts) -> None:
        """Vectorized weighted add: ``values[i]`` occurs ``counts[i]``
        times. Weights must be integral and >= 0 (ValueError otherwise);
        zero-count and non-finite-value pairs contribute nothing.
        Equivalent to expanding each value ``counts[i]`` times through
        ``add_batch``: bucket counts, total count, zero bucket, min/max
        and every quantile are IDENTICAL; only the running float ``sum``
        may differ in final ulps (``dot(v, c)`` associates differently
        than repeated adds — the same order-dependence the reference's
        f64 sum has). The scale path for inputs that arrive already
        grouped (e.g. a token-frequency table: O(distinct values) rows
        instead of O(total occurrences))."""
        v = np.asarray(values, dtype=np.float64).ravel()
        c_raw = np.asarray(counts, dtype=np.float64).ravel()
        if len(v) != len(c_raw):
            raise ValueError(
                f"{len(v)} values but {len(c_raw)} counts")
        if len(v) == 0:
            return
        if not np.isfinite(c_raw).all():
            raise ValueError("weights must be finite")
        if (c_raw < 0).any():
            raise ValueError("weights must be >= 0, got "
                             f"{float(c_raw.min())}")
        c = c_raw.astype(np.int64)
        if (c != c_raw).any():
            raise ValueError("weights must be integral (a fractional "
                             "occurrence count has no expansion law)")
        n = len(v)
        for start in range(0, n, self._BATCH_CHUNK):
            self._add_weighted_chunk(v[start:start + self._BATCH_CHUNK],
                                     c[start:start + self._BATCH_CHUNK])

    def _add_weighted_chunk(self, v: np.ndarray, c: np.ndarray) -> None:
        live = np.isfinite(v) & (c > 0)
        if not live.all():
            v, c = v[live], c[live]
            if len(v) == 0:
                return
        miv = self._m.min_indexable_value
        lo = float(v.min())
        hi = float(v.max())
        if lo >= miv:
            w_pos, w_neg = int(c.sum()), 0
            self._store_keys_weighted(self.positive_store, v, c)
        elif hi <= -miv:
            w_pos, w_neg = 0, int(c.sum())
            self._store_keys_weighted(self.negative_store, -v, c)
        else:
            pos = v >= miv
            neg = v <= -miv
            w_pos = int(c[pos].sum())
            w_neg = int(c[neg].sum())
            if w_pos:
                self._store_keys_weighted(self.positive_store, v[pos], c[pos])
            if w_neg:
                self._store_keys_weighted(self.negative_store, -v[neg], c[neg])
        self.zero_count += int(c.sum()) - w_pos - w_neg
        with np.errstate(over="ignore"):
            self._sum += float(np.dot(v, c))
        if lo < self._raw_min:
            self._raw_min = lo
        if hi > self._raw_max:
            self._raw_max = hi

    def _store_keys_weighted(self, store, magnitudes: np.ndarray,
                             c: np.ndarray) -> None:
        """Weighted twin of ``_store_keys``: per-bucket totals accumulate
        the int64 weights (np.add.at, never float bincount weights — the
        counts stay exact past 2^53)."""
        keys = self._m.keys_for(magnitudes)
        kmin = int(keys.min())
        span = int(keys.max()) - kmin + 1
        if span <= max(1 << 16, 4 * len(keys)):
            counts = np.zeros(span, dtype=np.int64)
            np.add.at(counts, keys.astype(np.int64) - kmin, c)
            nz = np.nonzero(counts)[0]
            store.add_keys((nz + kmin).astype(np.int32), counts[nz])
        else:
            uk, inv = np.unique(keys, return_inverse=True)
            counts = np.zeros(len(uk), dtype=np.int64)
            np.add.at(counts, inv, c)
            store.add_keys(uk, counts)

    # -- merge -------------------------------------------------------------

    def merge(self, other: "DDSketch") -> "DDSketch":
        """Merge ``other`` into ``self``; returns self for chaining.

        Like the reference, only gamma is validated — max_bins is NOT
        (the reference declares BinCountMismatch but never raises it,
        `/root/reference/src/ddsketchy.rs:11-38`), and merging into an
        empty sketch inherits the other store's bin_limit
        (`/root/reference/src/store.rs:219-227`). Keep max_bins uniform
        across sketches you intend to merge."""
        if abs(self._m.gamma - other._m.gamma) > 1e-10:
            raise ValueError(
                f"alpha mismatch: cannot merge sketches with alpha "
                f"{self.alpha!r} and {other.alpha!r}"
            )
        if other.count == 0:
            return self
        self.positive_store.merge(other.positive_store)
        self.negative_store.merge(other.negative_store)
        self.zero_count += other.zero_count
        self._sum += other._sum
        self._raw_min = min(self._raw_min, other._raw_min)
        self._raw_max = max(self._raw_max, other._raw_max)
        return self

    # -- statistics --------------------------------------------------------

    @property
    def count(self) -> int:
        return self.positive_store.count + self.negative_store.count + self.zero_count

    def __len__(self) -> int:
        return self.count

    def is_empty(self) -> bool:
        # a METHOD, not a property: the reference binding exposes count/
        # sum/mean/min/max/alpha as getters but is_empty as a plain
        # method (reference src/python.rs:62-99) — a property here would
        # break `sk.is_empty()` for users switching from the reference
        return self.count == 0

    @property
    def sum(self) -> float:
        return self._sum

    @property
    def mean(self) -> float:
        c = self.count
        return 0.0 if c == 0 else self._sum / c

    @property
    def min(self) -> float:
        """Reconstructed minimum == quantile(0.0); +inf when empty."""
        if self.count == 0:
            return math.inf
        return self.quantile(0.0)

    @property
    def max(self) -> float:
        """Reconstructed maximum == quantile(1.0); -inf when empty."""
        if self.count == 0:
            return -math.inf
        return self.quantile(1.0)

    @property
    def raw_min(self) -> float:
        return self._raw_min

    @property
    def raw_max(self) -> float:
        return self._raw_max

    @property
    def alpha(self) -> float:
        return LogMapping.alpha_from_gamma(self._m.gamma)

    @property
    def gamma(self) -> float:
        return self._m.gamma

    def min_possible(self) -> float:
        return self._m.min_indexable_value

    def key(self, value: float) -> int:
        return self._m.key(value)

    def value(self, key: int) -> float:
        return self._m.value(key)

    # introspection (reference debug accessors, /root/reference/src/ddsketchy.rs:579-602)
    def positive_store_count(self) -> int:
        return self.positive_store.count

    def negative_store_count(self) -> int:
        return self.negative_store.count

    def get_zero_count(self) -> int:
        return self.zero_count

    def positive_key_at_rank(self, rank: int) -> int:
        return self.positive_store.key_at_rank(rank)

    def clear(self) -> None:
        """Reset data, keep alpha/max_bins configuration."""
        self.positive_store = Store(self.max_bins)
        self.negative_store = Store(self.max_bins)
        self.zero_count = 0
        self._sum = 0.0
        self._raw_min = math.inf
        self._raw_max = -math.inf

    # -- quantiles ---------------------------------------------------------

    def quantile(self, q: float) -> float:
        """Estimate the q-quantile; 0.0 for an empty sketch."""
        if not (isinstance(q, (int, float)) and 0.0 <= q <= 1.0):
            raise ValueError(f"quantile must be in [0, 1], got {q!r}")
        total = self.count
        if total == 0:
            return 0.0
        if total == 1:
            return self._raw_min  # singleton: exact raw value
        rank = int(q * (total - 1.0))  # truncation -> lower quantile
        neg = self.negative_store.count
        zero = self.zero_count
        if rank < neg:
            key = self.negative_store.key_at_rank(neg - 1 - rank)
            return -self._m.value(key)
        elif rank < neg + zero:
            return 0.0
        else:
            key = self.positive_store.key_at_rank(rank - zero - neg)
            return self._m.value(key)

    def quantile_opt(self, q: float) -> Optional[float]:
        if not (isinstance(q, (int, float)) and 0.0 <= q <= 1.0):
            raise ValueError(f"quantile must be in [0, 1], got {q!r}")
        if self.count == 0:
            return None
        return self.quantile(q)

    def quantiles(self, qs: Iterable[float]) -> list[float]:
        return [self.quantile(q) for q in qs]

    def rank(self, x: float) -> int:
        """Estimated count of added values <= ``x`` — the inverse query
        of ``quantile``, by the same bucket law: the ENTIRE bucket
        containing x is counted (a step function, exact at bucket
        boundaries; the within-bucket error is at most that bucket's
        count, and every value in x's bucket is within the alpha
        guarantee of x). Region walk matches ``quantile``'s ordering:
        negative store (descending key), zero bucket (counts as exactly
        0), positive store (ascending key). Exactly re-derivable in SQL
        from the key law — the ``dds_cdf_events`` oracle does.
        Non-finite x raises."""
        x = float(x)
        if not math.isfinite(x):
            raise ValueError(f"rank requires a finite value, got {x!r}")
        miv = self._m.min_indexable_value
        neg = self.negative_store.count
        if x >= miv:
            return neg + self.zero_count + \
                self.positive_store.count_leq_key(self._m.key(x))
        if x >= 0:
            return neg + self.zero_count
        if x > -miv:
            return neg
        # x <= -miv: negatives with |v| >= |x| <=> key(|v|) >= key(-x)
        return neg - self.negative_store.count_leq_key(self._m.key(-x) - 1)

    def cdf(self, x: float) -> float:
        """``rank(x) / count``; 0.0 for an empty sketch."""
        total = self.count
        return self.rank(x) / total if total else 0.0

    def percentiles(self) -> Optional[tuple[float, float, float, float]]:
        """(P50, P90, P95, P99), or None when empty."""
        if self.count == 0:
            return None
        return (
            self.quantile(0.50),
            self.quantile(0.90),
            self.quantile(0.95),
            self.quantile(0.99),
        )

    # -- codec -------------------------------------------------------------

    _MAGIC = b"DDS1"
    _HDR = struct.Struct("<dqdddI")  # alpha, zero_count, sum, raw_min, raw_max, max_bins

    def to_bytes(self) -> bytes:
        """Versioned little-endian state blob (shuffle / checkpoint format).

        raw_min/raw_max are zero-normalized (+0.0): min(0.0, -0.0) keeps
        whichever argument came first, so without this the blob's sign bit
        would depend on merge order even though the estimates are equal."""
        return (
            self._MAGIC
            + self._HDR.pack(
                self._m.alpha, self.zero_count, self._sum,
                self._raw_min + 0.0, self._raw_max + 0.0,
                self.max_bins,
            )
            + self.positive_store.to_bytes()
            + self.negative_store.to_bytes()
        )

    @classmethod
    def from_bytes(cls, buf: bytes) -> "DDSketch":
        if buf[:4] != cls._MAGIC:
            raise ValueError("not a DDSketch state blob")
        alpha, zero_count, s, rmin, rmax, max_bins = cls._HDR.unpack_from(buf, 4)
        sk = cls(alpha, max_bins)
        sk.zero_count = zero_count
        sk._sum = s
        sk._raw_min = rmin
        sk._raw_max = rmax
        pos = 4 + cls._HDR.size
        sk.positive_store, pos = Store.from_bytes_at(buf, pos)
        sk.negative_store, pos = Store.from_bytes_at(buf, pos)
        return sk

    def to_json(self) -> str:
        """JSON form mirroring the reference serde shape: min/max of +/-inf
        encode as null (`/root/reference/src/serde_tests.rs:233-263`)."""
        def _enc(x: float) -> Optional[float]:
            return None if math.isinf(x) else x

        def _store(s: Store) -> dict:
            return {
                "bins": s.bins.tolist(),
                "count": s.count,
                "min_key": s.min_key,
                "max_key": s.max_key,
                "offset": s.offset,
                "bin_limit": s.bin_limit,
                "is_collapsed": s.is_collapsed,
            }

        return json.dumps(
            {
                "alpha": self._m.alpha,
                "gamma": self._m.gamma,
                "count": self.count,
                "sum": self._sum,
                "min": _enc(self._raw_min),
                "max": _enc(self._raw_max),
                "zero_count": self.zero_count,
                "max_bins": self.max_bins,
                "positive_store": _store(self.positive_store),
                "negative_store": _store(self.negative_store),
            }
        )

    _JSON_FIELDS = frozenset(
        {"alpha", "gamma", "count", "sum", "min", "max", "zero_count",
         "max_bins", "positive_store", "negative_store"}
    )

    @classmethod
    def from_json(cls, s: str) -> "DDSketch":
        d = json.loads(s)
        unknown = set(d) - cls._JSON_FIELDS
        if unknown:  # reference serde is deny_unknown_fields
            raise ValueError(f"unknown fields in DDSketch JSON: {sorted(unknown)}")
        sk = cls(d["alpha"], d["max_bins"])
        sk.zero_count = d["zero_count"]
        sk._sum = d["sum"]
        sk._raw_min = math.inf if d["min"] is None else d["min"]
        sk._raw_max = -math.inf if d["max"] is None else d["max"]
        for name in ("positive_store", "negative_store"):
            sd = d[name]
            st = Store(sd["bin_limit"])
            st.bins = np.asarray(sd["bins"], dtype=np.int64)
            st.count = sd["count"]
            st.min_key = sd["min_key"]
            st.max_key = sd["max_key"]
            st.offset = sd["offset"]
            st.is_collapsed = sd["is_collapsed"]
            setattr(sk, name, st)
        return sk

    # -- dunder ------------------------------------------------------------

    def __eq__(self, other: object) -> bool:
        if not isinstance(other, DDSketch):
            return NotImplemented
        return (
            self._m.alpha == other._m.alpha
            and self.max_bins == other.max_bins
            and self.zero_count == other.zero_count
            and self._sum == other._sum
            and self._raw_min == other._raw_min
            and self._raw_max == other._raw_max
            and self.positive_store == other.positive_store
            and self.negative_store == other.negative_store
        )

    def __repr__(self) -> str:
        # the reference's exact Display format incl. the {:.3} float
        # precision (reference src/ddsketchy.rs:668-680; Rust prints
        # inf as "inf", matching Python's f"{:.3f}")
        return (
            f"DDSketch(count={self.count}, alpha={self.alpha:.3f}, "
            f"min={self._raw_min:.3f}, max={self._raw_max:.3f}, "
            f"mean={self.mean:.3f})"
        )

    __str__ = __repr__


class DDSketchBuilder:
    """``DDSketch.builder(alpha).max_bins(n).build()``."""

    def __init__(self, alpha: float = DEFAULT_ALPHA) -> None:
        self._alpha = alpha
        self._max_bins = DEFAULT_MAX_BINS

    def alpha(self, alpha: float) -> "DDSketchBuilder":
        self._alpha = alpha
        return self

    def max_bins(self, n: int) -> "DDSketchBuilder":
        self._max_bins = n
        return self

    def build(self) -> DDSketch:
        return DDSketch(self._alpha, self._max_bins)
