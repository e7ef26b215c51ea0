"""DDSketch as a two-phase Spark aggregate.

The distributed analogue of the reference's `add* -> merge -> quantile`
lifecycle (`/root/reference/src/ddsketchy.rs:241-306,518-556`): vectorized
per-Arrow-batch ``add_batch`` builds per-partition states, an associative
blob merge combines them, and the estimator emits count/sum/mean/min/max
plus the requested quantiles.
"""

from __future__ import annotations

import math
from typing import Any, Sequence

import pyarrow as pa

from pyspark.sql import DataFrame
from pyspark.sql.types import DoubleType, LongType, StructField

from ..core.ddsketch import DDSketch
from .agg import SketchAggregator, numeric_values, sketch_aggregate


def quantile_label(q: float) -> str:
    """0.5 -> p50, 0.99 -> p99, 0.999 -> p999, 0.25 -> p25, 0.025 -> p2_5."""
    s = f"{q * 100:.6f}".rstrip("0").rstrip(".")
    return "p" + s.replace(".", "_")


class DDSketchAggregator(SketchAggregator):
    def __init__(
        self,
        value_col: str,
        alpha: float = 0.01,
        max_bins: int = 4096,
        quantiles: Sequence[float] = (0.5, 0.9, 0.99, 0.999),
    ) -> None:
        self.value_cols = [value_col]
        self.value_col = value_col
        self.alpha = alpha
        self.max_bins = max_bins
        self.quantiles = list(quantiles)

    def make(self) -> DDSketch:
        return DDSketch(self.alpha, self.max_bins)

    def add_arrow(self, state: DDSketch, table: pa.Table) -> None:
        vals = numeric_values(table.column(self.value_col))
        state.add_batch(vals)

    def merge_blobs(self, blobs) -> bytes:
        it = iter(blobs)
        acc = DDSketch.from_bytes(next(it))
        for b in it:
            acc.merge(DDSketch.from_bytes(b))
        return acc.to_bytes()

    def finalize(self, blob: bytes) -> dict[str, Any]:
        sk = DDSketch.from_bytes(blob)
        out: dict[str, Any] = {
            "count": sk.count,
            "sum": sk.sum,
            "mean": sk.mean,
            "min": None if math.isinf(sk.min) else sk.min,
            "max": None if math.isinf(sk.max) else sk.max,
        }
        for q in self.quantiles:
            out[quantile_label(q)] = sk.quantile_opt(q)
        return out

    def output_fields(self) -> list[StructField]:
        fields = [
            StructField("count", LongType()),
            StructField("sum", DoubleType()),
            StructField("mean", DoubleType()),
            StructField("min", DoubleType()),
            StructField("max", DoubleType()),
        ]
        fields += [StructField(quantile_label(q), DoubleType()) for q in self.quantiles]
        return fields


def ddsketch_quantiles(
    df: DataFrame,
    value_col: str,
    by: Sequence[str] | None = None,
    alpha: float = 0.01,
    max_bins: int = 4096,
    quantiles: Sequence[float] = (0.5, 0.9, 0.99, 0.999),
    merge_rounds: int = 1,
    fanout: int = 64,
    keep_state: bool = False,
):
    """Quantile summary of ``value_col`` (scalar or array column).

    Grouped: DataFrame [by..., count, sum, mean, min, max, pXX...].
    Global (by=None): a plain dict with the same keys.
    """
    agg = DDSketchAggregator(value_col, alpha=alpha, max_bins=max_bins, quantiles=quantiles)
    return sketch_aggregate(df, agg, by=by, merge_rounds=merge_rounds, fanout=fanout,
                            keep_state=keep_state)


def ddsketch_state(
    df: DataFrame,
    value_col: str,
    by: Sequence[str] | None = None,
    alpha: float = 0.01,
    max_bins: int = 4096,
    merge_rounds: int = 1,
    fanout: int = 64,
):
    """Return the merged sketch itself (driver-side DDSketch for global, or
    a DataFrame with a ``state`` blob column per key)."""
    agg = DDSketchAggregator(value_col, alpha=alpha, max_bins=max_bins, quantiles=())
    if by:
        return sketch_aggregate(df, agg, by=by, merge_rounds=merge_rounds, fanout=fanout,
                                keep_state=True)
    out = sketch_aggregate(df, agg, by=None, fanout=fanout, keep_state=True)
    return DDSketch.from_bytes(out["state"])
