"""Dense collapsing bucket store for DDSketch.

Behavioural contract mirrors the reference store
(`/root/reference/src/store.rs:9-227`): a contiguous int64 bin array with an
`offset` (the key of ``bins[0]``), chunked growth (128), a hard per-store
``bin_limit`` cap, and **collapse-lowest** semantics — when the key span
exceeds the cap, the lowest bins are summed into the new floor bin and the
store is marked collapsed; subsequent adds below the floor land in ``bins[0]``.
High keys (high quantiles) are always preserved.

Unlike the reference's per-value ``add``, ingestion here is batch-only:
``add_keys(keys, counts)`` extends the range once for the whole batch (the
same range-extension the reference performs in ``Store::merge``,
`/root/reference/src/store.rs:186-188`) and then scatter-adds with
``np.add.at``. Per-key counts are identical to a sequential add whenever no
collapse occurs mid-batch; under collapse, the batch behaves like merging a
pre-built store, which is the reference's canonical distributed path.
"""

from __future__ import annotations

import struct

import numpy as np

CHUNK_SIZE = 128
_I32_MAX = 2**31 - 1
_I32_MIN = -(2**31)


def _div_ceil(dividend: int, divisor: int) -> int:
    return (dividend + divisor - 1) // divisor


class Store:
    __slots__ = ("bins", "count", "min_key", "max_key", "offset", "bin_limit", "is_collapsed")

    def __init__(self, bin_limit: int = 4096) -> None:
        self.bins: np.ndarray = np.zeros(0, dtype=np.int64)
        self.count: int = 0
        self.min_key: int = _I32_MAX
        self.max_key: int = _I32_MIN
        self.offset: int = 0
        self.bin_limit: int = int(bin_limit)
        self.is_collapsed: bool = False

    # -- basic accessors ---------------------------------------------------

    @property
    def length(self) -> int:
        return len(self.bins)

    def is_empty(self) -> bool:
        return len(self.bins) == 0

    # -- ingestion ---------------------------------------------------------

    def add(self, key: int) -> None:
        """Single-key add (scalar path; tests and driver-side use)."""
        self.add_keys(np.asarray([key], dtype=np.int64))

    def add_keys(self, keys: np.ndarray, counts: np.ndarray | None = None) -> None:
        """Vectorized scatter-add of (key, count) pairs."""
        if len(keys) == 0:
            return
        keys = np.asarray(keys, dtype=np.int64)
        if counts is None:
            counts = np.ones(len(keys), dtype=np.int64)
        kmin = int(keys.min())
        kmax = int(keys.max())

        if self.is_empty():
            self._extend_range(kmin, kmax)
        else:
            lo = kmin if (kmin < self.min_key and not self.is_collapsed) else self.min_key
            hi = kmax if kmax > self.max_key else self.max_key
            if lo < self.min_key or hi > self.max_key:
                self._extend_range(lo, hi)

        # After extension the store may (still) be collapsed: keys below the
        # floor go to bins[0]  (/root/reference/src/store.rs:47-55).
        idx = keys - self.offset
        if self.is_collapsed:
            below = keys < self.min_key
            if below.any():
                idx = np.where(below, 0, idx)
        np.add.at(self.bins, idx, counts)
        self.count += int(counts.sum())

    # -- range management --------------------------------------------------

    def _extend_range(self, key: int, second_key: int | None = None) -> None:
        if second_key is None:
            second_key = key
        new_min_key = min(key, second_key, self.min_key)
        new_max_key = max(key, second_key, self.max_key)

        if self.is_empty():
            new_len = self._get_new_length(new_min_key, new_max_key)
            self.bins = np.zeros(new_len, dtype=np.int64)
            self.offset = new_min_key
            self._adjust(new_min_key, new_max_key)
        elif new_min_key >= self.min_key and new_max_key < self.offset + self.length:
            self.min_key = new_min_key
            self.max_key = new_max_key
        else:
            new_length = self._get_new_length(new_min_key, new_max_key)
            if new_length > self.length:
                self.bins = np.concatenate(
                    [self.bins, np.zeros(new_length - self.length, dtype=np.int64)]
                )
            self._adjust(new_min_key, new_max_key)

    def _get_new_length(self, new_min_key: int, new_max_key: int) -> int:
        desired = new_max_key - new_min_key + 1
        return min(CHUNK_SIZE * _div_ceil(desired, CHUNK_SIZE), self.bin_limit)

    def _adjust(self, new_min_key: int, new_max_key: int) -> None:
        if new_max_key - new_min_key + 1 > self.length:
            # Span exceeds capacity: raise the floor and collapse the lowest bins.
            new_min_key = new_max_key - self.length + 1
            if new_min_key >= self.max_key:
                # Everything currently stored falls below the new floor.
                self.offset = new_min_key
                self.min_key = new_min_key
                self.bins[:] = 0
                self.bins[0] = self.count
            else:
                shift = self.offset - new_min_key
                if shift < 0:
                    start = self.min_key - self.offset
                    end = new_min_key - self.offset
                    collapsed = int(self.bins[start:end].sum())
                    self.bins[start:end] = 0
                    self.bins[end] += collapsed
                self.min_key = new_min_key
                self._shift_bins(shift)
            self.max_key = new_max_key
            self.is_collapsed = True
        else:
            self._center_bins(new_min_key, new_max_key)
            self.min_key = new_min_key
            self.max_key = new_max_key

    def _shift_bins(self, shift: int) -> None:
        n = len(self.bins)
        if shift > 0:
            if shift < n:
                self.bins[shift:] = self.bins[: n - shift]
                self.bins[:shift] = 0
            else:
                self.bins[:] = 0
        elif shift < 0:
            s = -shift
            if s < n:
                self.bins[: n - s] = self.bins[s:]
                self.bins[n - s :] = 0
            else:
                self.bins[:] = 0
        self.offset -= shift

    def _center_bins(self, new_min_key: int, new_max_key: int) -> None:
        middle_key = new_min_key + (new_max_key - new_min_key + 1) // 2
        self._shift_bins(self.offset + self.length // 2 - middle_key)

    # -- queries -----------------------------------------------------------

    def key_at_rank(self, rank: int) -> int:
        """First key whose cumulative count strictly exceeds ``rank``."""
        cum = np.cumsum(self.bins)
        i = int(np.searchsorted(cum, rank, side="right"))
        if i < len(self.bins):
            return i + self.offset
        return self.max_key

    def count_leq_key(self, key: int) -> int:
        """Total count in bins with key' <= ``key`` (0 below the store's
        range, the full count at/above the top) — the rank/CDF primitive,
        the cumulative inverse of ``key_at_rank``."""
        if len(self.bins) == 0 or key < self.offset:
            return 0
        i = key - self.offset + 1
        if i >= len(self.bins):
            return self.count
        return int(self.bins[:i].sum())

    def nonzero_items(self) -> tuple[np.ndarray, np.ndarray]:
        """(keys, counts) of the non-empty bins, ascending by key."""
        nz = np.nonzero(self.bins)[0]
        return nz + self.offset, self.bins[nz]

    # -- merge -------------------------------------------------------------

    def merge(self, other: "Store") -> None:
        """Associative merge; replicates the reference's below-floor collapse
        rule so collapsed stores merge identically
        (`/root/reference/src/store.rs:176-217`)."""
        if other.count == 0:
            return
        if self.count == 0:
            self._copy_from(other)
            return

        if other.min_key < self.min_key or other.max_key > self.max_key:
            self._extend_range(other.min_key, other.max_key)

        # Bins of `other` that fall below our (possibly collapsed) floor are
        # summed into our first bin.
        collapse_start = other.min_key - other.offset
        collapse_end = min(self.min_key, other.max_key + 1) - other.offset
        if collapse_end > collapse_start:
            self.bins[0] += int(other.bins[collapse_start:collapse_end].sum())
        else:
            collapse_end = collapse_start

        start_key = collapse_end + other.offset
        n = other.max_key + 1 - start_key
        if n > 0:
            ds = start_key - self.offset
            os_ = start_key - other.offset
            self.bins[ds : ds + n] += other.bins[os_ : os_ + n]

        self.count += other.count

    def _copy_from(self, o: "Store") -> None:
        self.bins = o.bins.copy()
        self.count = o.count
        self.min_key = o.min_key
        self.max_key = o.max_key
        self.offset = o.offset
        self.bin_limit = o.bin_limit
        self.is_collapsed = o.is_collapsed

    # -- codec -------------------------------------------------------------

    _HDR = struct.Struct("<qiiiIBI")  # count, min_key, max_key, offset, bin_limit, collapsed, nbins

    def to_bytes(self) -> bytes:
        """CANONICAL serialization: only the occupied span [min_key,
        max_key] is written, with offset == min_key. Physical layout
        (capacity, centering) depends on growth/merge history, so
        serializing it would make blob bytes merge-order-dependent; the
        canonical form is a pure function of the logical content — and
        smaller on the shuffle wire."""
        if self.count == 0 and self.min_key > self.max_key:
            span = self.bins[:0]
            offset = 0
        else:
            lo = self.min_key - self.offset
            hi = self.max_key - self.offset + 1
            span = self.bins[lo:hi]
            offset = self.min_key
        return (
            self._HDR.pack(
                self.count,
                self.min_key,
                self.max_key,
                offset,
                self.bin_limit,
                1 if self._canonical_collapsed() else 0,
                len(span),
            )
            + span.astype("<i8", copy=False).tobytes()
        )

    def _canonical_collapsed(self) -> bool:
        """is_collapsed, canonicalized: a full-span store (span ==
        bin_limit) behaves identically whether or not the flag is set —
        the next out-of-range add collapses to the same floor — but the
        raw flag depends on merge ORDER (merging a collapsed store into a
        non-collapsed one whose union still fits leaves it unset). Using
        the canonical form keeps serialized state a pure function of
        content."""
        if self.is_collapsed:
            return True
        return (self.min_key <= self.max_key
                and self.max_key - self.min_key + 1 >= self.bin_limit)

    @classmethod
    def from_bytes_at(cls, buf: bytes, pos: int) -> tuple["Store", int]:
        count, min_key, max_key, offset, bin_limit, collapsed, nbins = cls._HDR.unpack_from(
            buf, pos
        )
        pos += cls._HDR.size
        s = cls(bin_limit)
        s.count = count
        s.min_key = min_key
        s.max_key = max_key
        s.offset = offset
        s.is_collapsed = bool(collapsed)
        s.bins = np.frombuffer(buf, dtype="<i8", count=nbins, offset=pos).astype(np.int64)
        pos += nbins * 8
        return s, pos

    def __eq__(self, other: object) -> bool:
        """LOGICAL equality: same content regardless of physical layout
        (capacity/centering differ by growth history; canonical
        serialization already erases them)."""
        if not isinstance(other, Store):
            return NotImplemented
        ka, ca = self.nonzero_items()
        kb, cb = other.nonzero_items()
        return (
            self.count == other.count
            and self.min_key == other.min_key
            and self.max_key == other.max_key
            and self.bin_limit == other.bin_limit
            and self._canonical_collapsed() == other._canonical_collapsed()
            and np.array_equal(ka, kb)
            and np.array_equal(ca, cb)
        )
