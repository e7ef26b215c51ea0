"""Distributed bottom-k samples: uniform distinct sample (KMV-with-payload)
and weighted-without-replacement sample (Efraimidis-Spirakis), each as BOTH
a mergeable blob aggregator (the two-phase `agg.py` harness, for
checkpoint/rollup pipelines) and a pure-SQL native engine (codegen
end-to-end, the fast path and the DuckDB-oracleable law).

Native law (cross-engine exact, CLAUDE.md md5-52-bit convention):
  u    = CAST(conv(substring(md5(key || ':' || seed), 1, 13), 16, 10) AS LONG)
  KMV sample      = bottom-k distinct keys by (u, key)
  E-S rank        = -ln((u + 0.5) / 16^13) / weight
  weighted sample = bottom-k keys by (rank, key)
Keys are canonicalized to strings (int renderings agree across
Spark/DuckDB/Python); ranks are pure functions of (key, seed, weight), so
any partitioning, any merge order, and the DuckDB oracle land on the
IDENTICAL sample.

Scale shape: the native engines shuffle O(distinct keys) — a map-side
partial ``distinct`` precedes the exchange; global bottom-k compiles to
TakeOrderedAndProject (per-partition top-k, driver merges k rows — never a
full sort); grouped bottom-k is one hash shuffle on the group key plus a
window over pre-reduced distinct rows. The blob aggregators ship at most k
(hash, key) pairs per partition — ``sample_by_group`` (`spark/skew.py`)
remains the exact-count per-STRATUM row sampler; these sample distinct
KEYS under a budget k that a 10^12-row table cannot move for.
"""

from __future__ import annotations

import math
from typing import Any, Sequence

import pyarrow as pa

from pyspark.sql import DataFrame, Window, functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    StringType,
    StructField,
)

from ..core.sampling import _U_DENOM, _U_HEX_CHARS, KMVSample, WeightedSample
from .agg import SketchAggregator, sketch_aggregate


def _str_keys_from_arrow(col: pa.ChunkedArray | pa.Array) -> list[str]:
    from .agg import raw_column

    arr = raw_column(col)
    if pa.types.is_list(arr.type) or pa.types.is_large_list(arr.type):
        arr = arr.flatten()
    if arr.null_count:
        arr = arr.drop_null()
    if pa.types.is_floating(arr.type) or pa.types.is_boolean(arr.type):
        raise TypeError(
            f"{arr.type} keys are not supported (renderings diverge across "
            "engines) — cast to string or int upstream")
    if pa.types.is_string(arr.type) or pa.types.is_large_string(arr.type):
        return arr.to_pylist()
    return [str(v) for v in arr.to_pylist()]


class KMVSampleAggregator(SketchAggregator):
    """Uniform sample of up to k distinct keys per group, mergeable."""

    def __init__(self, value_col: str, k: int = 64, seed: int = 0) -> None:
        self.value_cols = [value_col]
        self.value_col = value_col
        self.k = k
        self.seed = seed

    def make(self) -> KMVSample:
        return KMVSample(self.k, self.seed, "md5")

    def add_arrow(self, state: KMVSample, table: pa.Table) -> None:
        state.add_batch(_str_keys_from_arrow(table.column(self.value_col)))

    def merge_blobs(self, blobs) -> bytes:
        it = iter(blobs)
        acc = KMVSample.from_bytes(next(it))
        for b in it:
            acc.merge(KMVSample.from_bytes(b))
        return acc.to_bytes()

    def finalize(self, blob: bytes) -> dict[str, Any]:
        sk = KMVSample.from_bytes(blob)
        return {"sample": sk.keys(), "n_retained": len(sk),
                "distinct_est": sk.distinct_estimate()}

    def output_fields(self) -> list[StructField]:
        return [StructField("sample", ArrayType(StringType())),
                StructField("n_retained", LongType()),
                StructField("distinct_est", DoubleType())]


class WeightedSampleAggregator(SketchAggregator):
    """Efraimidis-Spirakis weighted sample of up to k keys per group."""

    def __init__(self, key_col: str, weight_col: str, k: int = 64,
                 seed: int = 0) -> None:
        self.value_cols = [key_col, weight_col]
        self.key_col = key_col
        self.weight_col = weight_col
        self.k = k
        self.seed = seed

    def make(self) -> WeightedSample:
        return WeightedSample(self.k, self.seed)

    def add_arrow(self, state: WeightedSample, table: pa.Table) -> None:
        from .agg import raw_column

        keys = raw_column(table.column(self.key_col)).to_pylist()
        ws = raw_column(table.column(self.weight_col)).to_pylist()
        pairs = [(s, w) for s, w in zip(keys, ws)
                 if s is not None and w is not None
                 and w > 0 and math.isfinite(w)]
        if pairs:
            state.add_batch([p[0] for p in pairs], [p[1] for p in pairs])

    def merge_blobs(self, blobs) -> bytes:
        it = iter(blobs)
        acc = WeightedSample.from_bytes(next(it))
        for b in it:
            acc.merge(WeightedSample.from_bytes(b))
        return acc.to_bytes()

    def finalize(self, blob: bytes) -> dict[str, Any]:
        sk = WeightedSample.from_bytes(blob)
        return {"sample": sk.keys(), "n_retained": len(sk)}

    def output_fields(self) -> list[StructField]:
        return [StructField("sample", ArrayType(StringType())),
                StructField("n_retained", LongType())]


def kmv_sample_state(df: DataFrame, value_col: str,
                     by: Sequence[str] | None = None,
                     k: int = 64, seed: int = 0, **kw):
    """Blob-engine build (grouped DataFrame or global finalize dict)."""
    return sketch_aggregate(df, KMVSampleAggregator(value_col, k, seed),
                            by=by, **kw)


def weighted_sample_state(df: DataFrame, key_col: str, weight_col: str,
                          by: Sequence[str] | None = None,
                          k: int = 64, seed: int = 0, **kw):
    return sketch_aggregate(
        df, WeightedSampleAggregator(key_col, weight_col, k, seed),
        by=by, **kw)


# ---------------------------------------------------------------------------
# Native (pure-SQL) engines — the md5-52-bit law, codegen end-to-end
# ---------------------------------------------------------------------------


def _u52(key_col, seed: int):
    key = F.concat_ws(":", key_col, F.lit(str(seed)))
    return F.conv(F.substring(F.md5(key), 1, _U_HEX_CHARS), 16, 10).cast("long")


def _bottom_k(scored: DataFrame, by: list[str], k: int,
              order_cols: list[str]) -> DataFrame:
    if not by:
        # TakeOrderedAndProject: per-partition top-k, driver merges k rows
        return scored.orderBy(*order_cols).limit(k)
    w = Window.partitionBy(*by).orderBy(*order_cols)
    return (scored.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") <= k).drop("_rn"))


def kmv_sample_native(df: DataFrame, value_col: str,
                      by: Sequence[str] | None = None,
                      k: int = 64, seed: int = 0) -> DataFrame:
    """Uniform sample of k distinct keys as rows (by..., key, u) — the
    EXACT sample `KMVSampleAggregator` retains (shared md5 law; pinned by
    test_sampling's native==blob parity). ``distinct`` runs with a
    map-side partial aggregate, so the exchange moves distinct keys only."""
    by = list(by or [])
    key = F.col(value_col).cast("string")
    dedup = (df.where(F.col(value_col).isNotNull())
             .select(*by, key.alias("key")).distinct())
    scored = dedup.withColumn("u", _u52(F.col("key"), seed))
    return _bottom_k(scored, by, k, ["u", "key"]).select(*by, "key", "u")


def weighted_sample_native(df: DataFrame, key_col: str, weight_col: str,
                           by: Sequence[str] | None = None,
                           k: int = 64, seed: int = 0) -> DataFrame:
    """Efraimidis-Spirakis bottom-k by rank = -ln(u01)/w as rows
    (by..., key, weight, rank). A key seen with several weights keeps its
    max weight (== the core's min-rank law: rank is decreasing in w).
    Rows with NULL, non-positive, or non-finite weight never sample
    (matching the aggregator's ingest filter: a +inf weight would pin
    rank 0 here while the core raises — excluded on both engines, the
    package's non-finite-ignore law)."""
    by = list(by or [])
    key = F.col(key_col).cast("string")
    w_d = F.col(weight_col).cast("double")
    base = (df.where(F.col(key_col).isNotNull()
                     & F.col(weight_col).isNotNull()
                     & (w_d > 0) & ~F.isnan(w_d)
                     & (w_d < F.lit(float("inf"))))
            .select(*by, key.alias("key"),
                    F.col(weight_col).cast("double").alias("weight")))
    dedup = base.groupBy(*by, "key").agg(F.max("weight").alias("weight"))
    u01 = (_u52(F.col("key"), seed).cast("double") + F.lit(0.5)) / F.lit(_U_DENOM)
    scored = dedup.withColumn("rank", -F.log(u01) / F.col("weight"))
    return (_bottom_k(scored, by, k, ["rank", "key"])
            .select(*by, "key", "weight", "rank"))
