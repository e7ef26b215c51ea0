"""Companion sketches as two-phase Spark aggregates.

Same harness as DDSketch (`agg.py`): mapInArrow partial states, associative
blob merge, estimator outputs. HLL/CMS/Bloom merges are exactly
order-independent (max / add / or); t-digest and KLL use deterministic n-way
merges (concat + lexsort + single compress/compact), bit-identical under any
permutation of the input states.
"""

from __future__ import annotations

from typing import Any, Sequence

import numpy as np
import pyarrow as pa

from pyspark.sql import DataFrame
from pyspark.sql.types import DoubleType, LongType, StructField

from ..core.bloom import BloomFilter
from ..core.cms import CountMinSketch
from ..core.hll import HyperLogLog
from ..core.kll import KLLSketch
from ..core.tdigest import TDigest
from .agg import SketchAggregator, numeric_values, raw_column, sketch_aggregate
from .ddsketch_agg import quantile_label


def _keys_from_arrow(col: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """Hashable key array from an Arrow column (int fast path, else objects).
    List columns are flattened (e.g. distinct tokens)."""
    arr = raw_column(col)
    if pa.types.is_list(arr.type) or pa.types.is_large_list(arr.type):
        arr = arr.flatten()
    if arr.null_count:
        arr = arr.drop_null()
    if pa.types.is_integer(arr.type):
        return arr.to_numpy(zero_copy_only=False)
    return np.asarray(arr.to_pylist(), dtype=object)


class HLLAggregator(SketchAggregator):
    """Distinct-count per group via HyperLogLog."""

    def __init__(self, value_col: str, p: int = 14, seed: int = 0) -> None:
        self.value_cols = [value_col]
        self.value_col = value_col
        self.p = p
        self.seed = seed

    def make(self) -> HyperLogLog:
        return HyperLogLog(self.p, self.seed)

    def add_arrow(self, state: HyperLogLog, table: pa.Table) -> None:
        state.add_batch(_keys_from_arrow(table.column(self.value_col)))

    def merge_blobs(self, blobs) -> bytes:
        it = iter(blobs)
        acc = HyperLogLog.from_bytes(next(it))
        for b in it:
            acc.merge(HyperLogLog.from_bytes(b))
        return acc.to_bytes()

    def finalize(self, blob: bytes) -> dict[str, Any]:
        h = HyperLogLog.from_bytes(blob)
        return {"distinct_est": h.cardinality()}

    def output_fields(self) -> list[StructField]:
        return [StructField("distinct_est", LongType())]


class CMSAggregator(SketchAggregator):
    """Frequency sketch per group via Count-Min."""

    def __init__(self, value_col: str, depth: int = 5, width: int = 1 << 14,
                 seed: int = 0) -> None:
        self.value_cols = [value_col]
        self.value_col = value_col
        self.depth = depth
        self.width = width
        self.seed = seed

    def make(self) -> CountMinSketch:
        return CountMinSketch(self.depth, self.width, self.seed)

    def add_arrow(self, state: CountMinSketch, table: pa.Table) -> None:
        state.add_batch(_keys_from_arrow(table.column(self.value_col)))

    def merge_blobs(self, blobs) -> bytes:
        it = iter(blobs)
        acc = CountMinSketch.from_bytes(next(it))
        for b in it:
            acc.merge(CountMinSketch.from_bytes(b))
        return acc.to_bytes()

    def finalize(self, blob: bytes) -> dict[str, Any]:
        cm = CountMinSketch.from_bytes(blob)
        return {"total": cm.total}

    def output_fields(self) -> list[StructField]:
        return [StructField("total", LongType())]


class BloomAggregator(SketchAggregator):
    """Membership filter per group via Bloom."""

    def __init__(self, value_col: str, n_bits: int = 1 << 20, n_hashes: int = 7,
                 seed: int = 0) -> None:
        self.value_cols = [value_col]
        self.value_col = value_col
        self.n_bits = n_bits
        self.n_hashes = n_hashes
        self.seed = seed

    def make(self) -> BloomFilter:
        return BloomFilter(self.n_bits, self.n_hashes, self.seed)

    def add_arrow(self, state: BloomFilter, table: pa.Table) -> None:
        state.add_batch(_keys_from_arrow(table.column(self.value_col)))

    def merge_blobs(self, blobs) -> bytes:
        it = iter(blobs)
        acc = BloomFilter.from_bytes(next(it))
        for b in it:
            acc.merge(BloomFilter.from_bytes(b))
        return acc.to_bytes()

    def finalize(self, blob: bytes) -> dict[str, Any]:
        bf = BloomFilter.from_bytes(blob)
        return {"n_added": bf.n_added, "fill_ratio": bf.fill_ratio}

    def output_fields(self) -> list[StructField]:
        return [StructField("n_added", LongType()), StructField("fill_ratio", DoubleType())]


class _QuantileCompanionAggregator(SketchAggregator):
    quantiles: Sequence[float]

    def finalize(self, blob: bytes) -> dict[str, Any]:
        sk = self._from_bytes(blob)
        out: dict[str, Any] = {"count": int(self._count(sk))}
        for q in self.quantiles:
            out[quantile_label(q)] = sk.quantile(q) if out["count"] else None
        return out

    def output_fields(self) -> list[StructField]:
        return [StructField("count", LongType())] + [
            StructField(quantile_label(q), DoubleType()) for q in self.quantiles
        ]


class TDigestAggregator(_QuantileCompanionAggregator):
    def __init__(self, value_col: str, delta: float = 200.0,
                 quantiles: Sequence[float] = (0.5, 0.9, 0.99, 0.999)) -> None:
        self.value_cols = [value_col]
        self.value_col = value_col
        self.delta = delta
        self.quantiles = list(quantiles)

    def make(self) -> TDigest:
        return TDigest(self.delta)

    def add_arrow(self, state: TDigest, table: pa.Table) -> None:
        state.add_batch(numeric_values(table.column(self.value_col)))

    def merge_blobs(self, blobs) -> bytes:
        return TDigest.merge_all([TDigest.from_bytes(b) for b in blobs]).to_bytes()

    _from_bytes = staticmethod(TDigest.from_bytes)

    @staticmethod
    def _count(sk: TDigest) -> float:
        return sk.count


class KLLAggregator(_QuantileCompanionAggregator):
    def __init__(self, value_col: str, k: int = 200,
                 quantiles: Sequence[float] = (0.5, 0.9, 0.99, 0.999)) -> None:
        self.value_cols = [value_col]
        self.value_col = value_col
        self.k = k
        self.quantiles = list(quantiles)

    def make(self) -> KLLSketch:
        return KLLSketch(self.k)

    def add_arrow(self, state: KLLSketch, table: pa.Table) -> None:
        state.add_batch(numeric_values(table.column(self.value_col)))

    def merge_blobs(self, blobs) -> bytes:
        return KLLSketch.merge_all([KLLSketch.from_bytes(b) for b in blobs]).to_bytes()

    _from_bytes = staticmethod(KLLSketch.from_bytes)

    @staticmethod
    def _count(sk: KLLSketch) -> int:
        return sk.n


# -- convenience entry points -------------------------------------------------


def hll_distinct(df: DataFrame, value_col: str, by: Sequence[str] | None = None,
                 p: int = 14, seed: int = 0, **kw):
    return sketch_aggregate(df, HLLAggregator(value_col, p, seed), by=by, **kw)


def cms_state(df: DataFrame, value_col: str, by: Sequence[str] | None = None,
              depth: int = 5, width: int = 1 << 14, seed: int = 0, **kw):
    kw.setdefault("keep_state", True)
    return sketch_aggregate(df, CMSAggregator(value_col, depth, width, seed), by=by, **kw)


def bloom_state(df: DataFrame, value_col: str, by: Sequence[str] | None = None,
                n_bits: int = 1 << 20, n_hashes: int = 7, seed: int = 0, **kw):
    kw.setdefault("keep_state", True)
    return sketch_aggregate(df, BloomAggregator(value_col, n_bits, n_hashes, seed), by=by, **kw)


def tdigest_quantiles(df: DataFrame, value_col: str, by: Sequence[str] | None = None,
                      delta: float = 200.0,
                      quantiles: Sequence[float] = (0.5, 0.9, 0.99, 0.999), **kw):
    return sketch_aggregate(df, TDigestAggregator(value_col, delta, quantiles), by=by, **kw)


def kll_quantiles(df: DataFrame, value_col: str, by: Sequence[str] | None = None,
                  k: int = 200,
                  quantiles: Sequence[float] = (0.5, 0.9, 0.99, 0.999), **kw):
    return sketch_aggregate(df, KLLAggregator(value_col, k, quantiles), by=by, **kw)
