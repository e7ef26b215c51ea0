"""Matrix-sketch aggregation: Frequent Directions over an embedding
column, through the same two-phase harness as every other sketch.

``FDAggregator`` plugs ``core.fd.FrequentDirections`` into
``spark.agg.sketch_aggregate`` / ``sketch_rollup`` / the streaming
paths: each input partition folds its vectors into one ell x d state
(O(ell*d) executor memory, no shuffle of vectors — partials are KB-scale
blobs), partials merge associatively, and the finalized row carries the
top-k singular-value estimates of the WHOLE table plus the certified
spectral error bound (``||A^T A - B^T B||_2 <= err_bound``, an instance
certificate, not a worst case).

``exact_gram`` is the verification companion: the exact d x d Gram
matrix computed distributively (one (d*d)-double partial per partition,
summed driver-side) — usable even at 100 TB since the driver sees
O(partitions * d^2) doubles, never the vectors.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator

import numpy as np
import pyarrow as pa

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import DoubleType, LongType, StructField

from ..core.fd import FrequentDirections
from .agg import SketchAggregator


def _vectors_from_arrow(col: pa.ChunkedArray | pa.Array,
                        dim: int) -> np.ndarray:
    """(n_valid, dim) float64 matrix from a list<float> arrow column;
    NULL entries dropped, ragged rows rejected."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    col = col.drop_null()
    n = len(col)
    if n == 0:
        return np.zeros((0, dim), dtype=np.float64)
    flat = col.flatten().to_numpy(zero_copy_only=False)
    if flat.size != n * dim:
        raise ValueError(
            f"expected {n} vectors of dim {dim}, got {flat.size} values")
    return np.asarray(flat, dtype=np.float64).reshape(n, dim)


class FDAggregator(SketchAggregator):
    """Frequent-Directions spectrum per group.

    Output: ``n_rows``, ``frob_sq`` (total squared Frobenius mass),
    ``err_bound`` (certified ||A^T A - B^T B||_2), and ``sv_1..sv_k``
    singular-value estimates (descending; zero-padded when rank < k).

    ``weight_col``: each row's outer product counts ``weight`` times —
    the row scales by sqrt(weight), which makes the sketched Gram
    EXACTLY the weighted Gram sum(w * x x^T) for any non-negative
    weight (fractional importance weights included, the t-digest
    convention), and the certificate holds against that weighted Gram
    with frob_sq = sum(w * ||x||^2). NULL and zero weights contribute
    nothing; a negative weight fails the job with a clear error.
    ``n_rows`` counts ingested physical rows, not weight mass.
    """

    def __init__(self, vec_col: str, dim: int, ell: int = 64,
                 k_out: int = 8, weight_col: str | None = None) -> None:
        if k_out < 1:
            raise ValueError(f"k_out must be >= 1, got {k_out}")
        self.value_cols = ([vec_col] + ([weight_col] if weight_col else []))
        self.vec_col = vec_col
        self.weight_col = weight_col
        self.dim = int(dim)
        self.ell = int(ell)
        self.k_out = int(k_out)

    def make(self) -> FrequentDirections:
        return FrequentDirections(self.dim, self.ell)

    def add_arrow(self, state: FrequentDirections, table: pa.Table) -> None:
        if self.weight_col is None:
            rows = _vectors_from_arrow(table.column(self.vec_col), self.dim)
            if len(rows):
                state.add_batch(rows)
            return
        vec = table.column(self.vec_col)
        if isinstance(vec, pa.ChunkedArray):
            vec = vec.combine_chunks()
        wcol = table.column(self.weight_col)
        if isinstance(wcol, pa.ChunkedArray):
            wcol = wcol.combine_chunks()
        # arrow-native NULL -> NaN -> 0 (never to_pandas: pulls the pandas
        # import into every fresh worker, CLAUDE.md)
        w = np.nan_to_num(
            wcol.to_numpy(zero_copy_only=False).astype(np.float64),
            nan=0.0)
        if np.any(w < 0):
            raise ValueError(
                f"weights must be >= 0, found {float(w.min())}")
        valid = ~np.asarray(vec.is_null()) & (w != 0)
        if not valid.any():
            return
        idx = np.flatnonzero(valid)
        rows = _vectors_from_arrow(
            vec.take(pa.array(idx, type=pa.int64())), self.dim)
        # not in-place: _vectors_from_arrow may be a read-only arrow view
        state.add_batch(rows * np.sqrt(w[idx])[:, None])

    def merge_blobs(self, blobs: Iterable[bytes]) -> bytes:
        it = iter(blobs)
        acc = FrequentDirections.from_bytes(next(it))
        for b in it:
            acc.merge(FrequentDirections.from_bytes(b))
        return acc.to_bytes()

    def finalize(self, blob: bytes) -> dict[str, Any]:
        sk = FrequentDirections.from_bytes(blob)
        svs = sk.singular_values(self.k_out)
        out: dict[str, Any] = {
            "n_rows": int(sk.n_rows),
            "frob_sq": float(sk.frob_sq),
            "err_bound": sk.cov_error_bound(),
        }
        for i in range(self.k_out):
            out[f"sv_{i + 1}"] = float(svs[i])
        return out

    def output_fields(self) -> list[StructField]:
        return ([StructField("n_rows", LongType()),
                 StructField("frob_sq", DoubleType()),
                 StructField("err_bound", DoubleType())]
                + [StructField(f"sv_{i + 1}", DoubleType())
                   for i in range(self.k_out)])


def exact_gram(df: DataFrame, vec_col: str, dim: int) -> tuple[np.ndarray, int]:
    """Exact (dim, dim) Gram matrix A^T A and row count, distributively:
    one X^T X partial per partition (a single BLAS syrk-shaped matmul
    over the Arrow batch), driver sums O(partitions) small matrices."""
    v = df.where(F.col(vec_col).isNotNull()).select(vec_col)
    schema = "n long, gram binary"

    def partial(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        g = np.zeros((dim, dim), dtype=np.float64)
        n = 0
        for batch in batches:
            rows = _vectors_from_arrow(batch.column(0), dim)
            if len(rows):
                g += rows.T @ rows
                n += len(rows)
        if n:
            yield pa.RecordBatch.from_arrays(
                [pa.array([n], type=pa.int64()),
                 pa.array([g.tobytes()], type=pa.binary())],
                names=["n", "gram"])

    parts = v.mapInArrow(partial, schema).collect()
    total = np.zeros((dim, dim), dtype=np.float64)
    n = 0
    for row in parts:
        total += np.frombuffer(row["gram"], dtype=np.float64).reshape(dim, dim)
        n += row["n"]
    return total, n


def exact_singular_values(gram: np.ndarray, k: int) -> np.ndarray:
    """Top-k singular values of A from its exact Gram (sqrt of the top
    eigenvalues, clamped at 0 for numerical dust)."""
    ev = np.linalg.eigvalsh(gram)[::-1]
    out = np.zeros(k)
    m = min(k, len(ev))
    out[:m] = np.sqrt(np.maximum(ev[:m], 0.0))
    return out
