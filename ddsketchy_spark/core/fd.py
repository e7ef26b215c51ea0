"""Frequent Directions — a mergeable matrix sketch of a tall data
matrix A (n x d), maintaining an ell x d sketch B with the guarantee

    0  <=  x^T (A^T A - B^T B) x  <=  ||A||_F^2 / ell     for unit x,

i.e. ``||A^T A - B^T B||_2 <= delta_total <= ||A||_F^2 / ell`` where
``delta_total`` is the sum of shrink offsets actually applied — the
sketch carries it, so the bound is *certified per instance*, not just
worst-case. (Liberty 2013, "Simple and Deterministic Matrix Sketching";
mergeability: Ghashami, Liberty, Phillips, Woodruff 2016, SIAM J.
Comput. — the merge below is their "stack then shrink once" scheme,
which preserves the same ell-based bound under arbitrary merge trees.)

Role in this repo: the EMBEDDING-table companion sketch. Covariance
spectrum / PCA energy of a 100-TB ``array<float>`` column without ever
materializing the Gram matrix or shuffling vectors — each partition
folds its rows into an ell x d buffer (O(ell*d) memory), partials merge
associatively like every other sketch here, and the finalized spectrum
calibrates downstream choices (PQ subspace count, IVF nlist, JL target
dim) and spectral drift between crawl snapshots.

Pure deterministic NumPy: same input order -> bit-identical sketch; the
aggregation harness feeds partition-ordered batches, so distributed
builds are deterministic per partitioning (like t-digest/KLL, the
finalize values are within-guarantee rather than partitioning-invariant
— the certified bound IS the contract, and rides in the output).
"""

from __future__ import annotations

import struct

import numpy as np

_MAGIC = b"FDSK"
_VERSION = 1


class FrequentDirections:
    """ell x d Frequent Directions sketch with certified error bound.

    Internally buffers up to ``2*ell`` rows and shrinks with one SVD
    when full (amortized O(d*ell) per row). ``delta_total`` accumulates
    the applied shrink offsets; ``frob_sq`` the total squared Frobenius
    mass ingested. Invariant: ``delta_total <= frob_sq / ell``.
    """

    __slots__ = ("dim", "ell", "_buf", "_n_buf", "n_rows", "frob_sq",
                 "delta_total")

    def __init__(self, dim: int, ell: int = 64) -> None:
        if dim < 1:
            raise ValueError(f"dim must be >= 1, got {dim}")
        if ell < 1:
            raise ValueError(f"ell must be >= 1, got {ell}")
        self.dim = int(dim)
        self.ell = int(ell)
        self._buf = np.zeros((2 * self.ell, self.dim), dtype=np.float64)
        self._n_buf = 0
        self.n_rows = 0
        self.frob_sq = 0.0
        self.delta_total = 0.0

    # -- ingest ------------------------------------------------------------

    def add_batch(self, rows: np.ndarray) -> None:
        """Fold an (m, dim) float batch into the sketch."""
        rows = np.asarray(rows, dtype=np.float64)
        if rows.ndim != 2 or rows.shape[1] != self.dim:
            raise ValueError(
                f"expected (m, {self.dim}) rows, got {rows.shape}")
        if not np.isfinite(rows).all():
            raise ValueError("rows must be finite")
        m = rows.shape[0]
        self.n_rows += m
        self.frob_sq += float(np.einsum("ij,ij->", rows, rows))
        pos = 0
        cap = self._buf.shape[0]
        while pos < m:
            take = min(cap - self._n_buf, m - pos)
            self._buf[self._n_buf:self._n_buf + take] = rows[pos:pos + take]
            self._n_buf += take
            pos += take
            if self._n_buf == cap:
                self._shrink()

    def _shrink(self) -> None:
        """SVD the buffer, subtract sigma_ell^2 from every squared
        singular value, keep the (at most ell-1 nonzero) survivors."""
        s, vt = np.linalg.svd(self._buf[: self._n_buf],
                              full_matrices=False)[1:]
        s2 = s * s
        if len(s2) > self.ell - 1:
            delta = float(s2[self.ell - 1])
        else:
            delta = 0.0
        if delta > 0.0:
            self.delta_total += delta
        kept = np.sqrt(np.maximum(s2 - delta, 0.0))
        nz = int(np.count_nonzero(kept > 0.0))
        self._buf[:] = 0.0
        if nz:
            self._buf[:nz] = kept[:nz, None] * vt[:nz]
        self._n_buf = nz

    # -- merge -------------------------------------------------------------

    def merge(self, other: "FrequentDirections") -> None:
        """Stack the other sketch's rows into this one (one shrink if the
        union overflows). Associative and bound-preserving."""
        if other.dim != self.dim or other.ell != self.ell:
            raise ValueError(
                f"cannot merge FD(dim={other.dim}, ell={other.ell}) into "
                f"FD(dim={self.dim}, ell={self.ell})")
        self.n_rows += other.n_rows
        self.frob_sq += other.frob_sq
        self.delta_total += other.delta_total
        rows = other._buf[: other._n_buf]
        pos = 0
        cap = self._buf.shape[0]
        while pos < len(rows):
            take = min(cap - self._n_buf, len(rows) - pos)
            self._buf[self._n_buf:self._n_buf + take] = rows[pos:pos + take]
            self._n_buf += take
            pos += take
            if self._n_buf == cap:
                self._shrink()

    # -- queries -----------------------------------------------------------

    def sketch_matrix(self) -> np.ndarray:
        """The current (<= 2*ell, dim) sketch rows (copy)."""
        return self._buf[: self._n_buf].copy()

    def singular_values(self, k: int | None = None) -> np.ndarray:
        """Top-k singular-value ESTIMATES of A (descending). Each
        sigma_i(B) satisfies sigma_i(A)^2 - delta_total <= sigma_i(B)^2
        <= sigma_i(A)^2 (Weyl on the PSD difference)."""
        if self._n_buf == 0:
            s = np.zeros(0)
        else:
            s = np.linalg.svd(self._buf[: self._n_buf],
                              compute_uv=False)
        if k is not None:
            out = np.zeros(k)
            out[: min(k, len(s))] = s[:k]
            return out
        return s

    def cov_error_bound(self) -> float:
        """Certified ``||A^T A - B^T B||_2`` upper bound for THIS instance
        (sum of applied shrink offsets; always <= frob_sq / ell)."""
        return float(self.delta_total)

    def is_empty(self) -> bool:
        return self.n_rows == 0

    # -- serialization -----------------------------------------------------

    def to_bytes(self) -> bytes:
        head = struct.pack(
            "<4sBiiqqdd", _MAGIC, _VERSION, self.dim, self.ell,
            self.n_rows, self._n_buf, self.frob_sq, self.delta_total)
        return head + np.ascontiguousarray(
            self._buf[: self._n_buf]).tobytes()

    @classmethod
    def from_bytes(cls, blob: bytes) -> "FrequentDirections":
        hsize = struct.calcsize("<4sBiiqqdd")
        if len(blob) < hsize or blob[:4] != _MAGIC:
            raise ValueError("not a FrequentDirections blob")
        _magic, ver, dim, ell, n_rows, n_buf, frob_sq, delta = struct.unpack(
            "<4sBiiqqdd", blob[:hsize])
        if ver != _VERSION:
            raise ValueError(f"unsupported FD blob version {ver}")
        sk = cls(dim, ell)
        if n_buf:
            rows = np.frombuffer(
                blob[hsize:hsize + n_buf * dim * 8], dtype=np.float64
            ).reshape(n_buf, dim)
            sk._buf[:n_buf] = rows
        sk._n_buf = n_buf
        sk.n_rows = n_rows
        sk.frob_sq = frob_sq
        sk.delta_total = delta
        return sk
