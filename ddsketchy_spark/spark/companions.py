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
from ..core.theta import ThetaSketch
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


def _valid_mask(arr: pa.Array) -> np.ndarray:
    """Row-validity bools from the Arrow validity bitmap — no
    pyarrow.compute import (it drags pandas into fresh workers, cf. the
    CLAUDE.md worker-start note)."""
    n = len(arr)
    if not arr.null_count:
        return np.ones(n, dtype=bool)
    bits = np.unpackbits(np.frombuffer(arr.buffers()[0], dtype=np.uint8),
                         bitorder="little")
    return bits[arr.offset:arr.offset + n].astype(bool)


def _weighted_pairs(table: pa.Table, value_col: str, weight_col: str):
    """Aligned (keys, int64 counts) for weighted frequency ingestion.

    NULL-value, NULL-weight and zero-weight rows drop TOGETHER (the
    flatten-then-drop_null shortcuts in ``_keys_from_arrow`` would
    misalign the pair); negative or fractional weights raise. Scalar
    value columns only — an array value with a row weight is an
    explode-shaped op, which the native engines express in SQL."""
    varr = raw_column(table.column(value_col))
    if pa.types.is_list(varr.type) or pa.types.is_large_list(varr.type):
        raise ValueError(
            "weight_col requires a scalar value column (for array "
            "columns use engine='native', where the row weight applies "
            "to every element)")
    warr = raw_column(table.column(weight_col))
    w = warr.to_numpy(zero_copy_only=False).astype(np.float64, copy=False)
    mask = _valid_mask(varr) & _valid_mask(warr) \
        & ~np.isnan(w) & (w != 0)
    if not mask.all():
        varr = varr.take(pa.array(np.nonzero(mask)[0]))
        w = w[mask]
    if len(w) and float(w.min()) < 0:
        raise ValueError(f"weights must be >= 0, found {float(w.min())}")
    c = w.astype(np.int64)
    if (c != w).any():
        raise ValueError("weights must be integral occurrence counts "
                         "(a fractional weight has no expansion law)")
    keys = (varr.to_numpy(zero_copy_only=False)
            if pa.types.is_integer(varr.type)
            else np.asarray(varr.to_pylist(), dtype=object))
    return keys, c


def _weighted_numeric_pairs(table: pa.Table, value_col: str,
                            weight_col: str):
    """Aligned (float64 values, float64 weights) for weighted numeric
    ingestion (t-digest): NULL-value/NULL-weight/zero-weight rows drop
    together; negative weights raise; FRACTIONAL weights are allowed —
    they are native importance weights for a centroid sketch, not
    occurrence counts."""
    varr = raw_column(table.column(value_col))
    if pa.types.is_list(varr.type) or pa.types.is_large_list(varr.type):
        raise ValueError("weight_col requires a scalar value column")
    warr = raw_column(table.column(weight_col))
    v = varr.to_numpy(zero_copy_only=False).astype(np.float64, copy=False)
    w = warr.to_numpy(zero_copy_only=False).astype(np.float64, copy=False)
    mask = _valid_mask(varr) & _valid_mask(warr) & ~np.isnan(w) & (w != 0)
    v, w = v[mask], w[mask]
    if len(w) and float(w.min()) < 0:
        raise ValueError(f"weights must be >= 0, found {float(w.min())}")
    return v, w


class HLLAggregator(SketchAggregator):
    """Distinct-count per group via HyperLogLog."""

    def __init__(self, value_col: str, p: int = 14, seed: int = 0,
                 hash_kind: str = "generic") -> None:
        self.value_cols = [value_col]
        self.value_col = value_col
        self.p = p
        self.seed = seed
        self.hash_kind = hash_kind

    def make(self) -> HyperLogLog:
        return HyperLogLog(self.p, self.seed, self.hash_kind)

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
    """Frequency sketch per group via Count-Min. ``weight_col``: each
    row's key counts ``weight`` times (integer adds — bit-identical to
    the expanded stream; the weighted-frequency-table law)."""

    def __init__(self, value_col: str, depth: int = 5, width: int = 1 << 14,
                 seed: int = 0, hash_kind: str = "generic",
                 weight_col: str | None = None) -> None:
        self.value_cols = [value_col] + ([weight_col] if weight_col else [])
        self.value_col = value_col
        self.depth = depth
        self.width = width
        self.seed = seed
        self.hash_kind = hash_kind
        self.weight_col = weight_col

    def make(self) -> CountMinSketch:
        return CountMinSketch(self.depth, self.width, self.seed, self.hash_kind)

    def add_arrow(self, state: CountMinSketch, table: pa.Table) -> None:
        if self.weight_col:
            keys, c = _weighted_pairs(table, self.value_col, self.weight_col)
            state.add_batch(keys, counts=c)
        else:
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
                 seed: int = 0, hash_kind: str = "generic") -> None:
        self.value_cols = [value_col]
        self.value_col = value_col
        self.n_bits = n_bits
        self.n_hashes = n_hashes
        self.seed = seed
        self.hash_kind = hash_kind

    def make(self) -> BloomFilter:
        return BloomFilter(self.n_bits, self.n_hashes, self.seed, self.hash_kind)

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


class MisraGriesAggregator(SketchAggregator):
    """Heavy-hitters summary per group via Misra-Gries. ``weight_col``:
    each row's key counts ``weight`` times — within a batch the core
    folds uniques identically either way, so the summary equals the
    expanded stream's at the same batching."""

    def __init__(self, value_col: str, k: int = 256, key_kind: str = "int",
                 weight_col: str | None = None) -> None:
        self.value_cols = [value_col] + ([weight_col] if weight_col else [])
        self.value_col = value_col
        self.k = k
        self.key_kind = key_kind
        self.weight_col = weight_col

    def make(self):
        from ..core.misra_gries import MisraGries

        return MisraGries(self.k, self.key_kind)

    def add_arrow(self, state, table: pa.Table) -> None:
        if self.weight_col:
            keys, c = _weighted_pairs(table, self.value_col, self.weight_col)
            state.add_batch(keys, counts=c)
        else:
            state.add_batch(_keys_from_arrow(table.column(self.value_col)))

    def merge_blobs(self, blobs) -> bytes:
        from ..core.misra_gries import MisraGries

        it = iter(blobs)
        acc = MisraGries.from_bytes(next(it))
        for b in it:
            acc.merge(MisraGries.from_bytes(b))
        return acc.to_bytes()

    def finalize(self, blob: bytes) -> dict[str, Any]:
        from ..core.misra_gries import MisraGries

        mg = MisraGries.from_bytes(blob)
        return {"total": mg.n, "err_bound": mg.err_bound}

    def output_fields(self) -> list[StructField]:
        return [StructField("total", LongType()), StructField("err_bound", LongType())]


def misra_gries_state(df: DataFrame, value_col: str, by: Sequence[str] | None = None,
                      k: int = 256, key_kind: str = "int",
                      weight_col: str | None = None, **kw):
    kw.setdefault("keep_state", True)
    return sketch_aggregate(df, MisraGriesAggregator(value_col, k, key_kind,
                                                     weight_col=weight_col),
                            by=by, **kw)


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
    """``weight_col``: each value carries that weight — fractional
    importance weights welcome (centroids are weight-native)."""

    def __init__(self, value_col: str, delta: float = 200.0,
                 quantiles: Sequence[float] = (0.5, 0.9, 0.99, 0.999),
                 weight_col: str | None = None) -> None:
        self.value_cols = [value_col] + ([weight_col] if weight_col else [])
        self.value_col = value_col
        self.delta = delta
        self.quantiles = list(quantiles)
        self.weight_col = weight_col

    def make(self) -> TDigest:
        return TDigest(self.delta)

    def add_arrow(self, state: TDigest, table: pa.Table) -> None:
        if self.weight_col:
            v, w = _weighted_numeric_pairs(table, self.value_col,
                                           self.weight_col)
            state.add_weighted_batch(v, w)
        else:
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


# -- native (JVM-side) HLL engine ----------------------------------------------
#
# The hash -> register-index pipeline runs as Spark SQL: F.xxhash64
# (bit-identical to our NumPy spark_xxhash64) + shift arithmetic + a single
# sign-bit-flipped MIN aggregate — whole-stage codegen end to end. Only
# (register_index, min_unsigned_rest) rows (<= 2^p per group) leave the JVM;
# rho is recovered in NumPy on those survivors. Registers are bit-identical
# to a NumPy build with hash_kind="spark" on the same integer keys.
# Measured ~97M tokens/s at local[32] (vs ~1.5M via the arrow harness).


def _hll_native(df: DataFrame, value_col: str, by: Sequence[str], p: int):
    from pyspark.sql import functions as F

    is_array = dict(df.dtypes)[value_col].startswith("array")
    cols = [F.col(c) for c in by]
    if is_array:
        base = df.select(*cols, F.explode(value_col).alias("_x"))
    else:
        base = df.select(*cols, F.col(value_col).alias("_x"))
    base = base.where(F.col("_x").isNotNull())
    h = F.xxhash64(F.col("_x"))
    idx = F.shiftrightunsigned(h, 64 - p)
    rest = F.shiftleft(h, p)
    # rho = clz(rest)+1 is monotone DECREASING in unsigned(rest), so
    # max(rho) per register == clz(unsigned-min(rest))+1. Flipping the sign
    # bit makes signed MIN order == unsigned order, so the whole per-row
    # job is hash + shifts + one MIN aggregate; the <= 2^p surviving rows
    # get their clz in NumPy.
    u = rest.bitwiseXOR(F.lit(-(1 << 63)))
    return base.select(*cols, idx.alias("_idx"), u.alias("_u")).groupBy(
        *by, "_idx").agg(F.min("_u").alias("_minu"))


def _hll_from_rows(idx: np.ndarray, minu: np.ndarray, p: int,
                   reuse: HyperLogLog | None = None) -> HyperLogLog:
    """Registers from native (_idx, _minu) rows. Pass ``reuse`` to fill an
    existing sketch's cleared registers instead of allocating (the grouped
    vectorized assembly calls this once per key)."""
    from ..core.hashing import bit_length_u64

    if reuse is None:
        h = HyperLogLog(p, 0, "spark")
    else:
        h = reuse
        h.registers.fill(0)
    rest = (np.asarray(minu, dtype=np.int64) ^ np.int64(-(1 << 63))).view(np.uint64)
    # same cap as HyperLogLog.add_batch so engines stay bit-identical
    rho = np.minimum(64 - bit_length_u64(rest) + 1, 64 - p + 1).astype(np.uint8)
    np.maximum.at(h.registers, np.asarray(idx, dtype=np.int64), rho)
    return h


def _hll_grouped_vectorized(kc: DataFrame, by: Sequence[str], p: int) -> DataFrame:
    """Grouped HLL assembly with ONE Python call per Arrow partition
    (applyInPandas costs ~150us per group — dominates at 10^5+ keys).
    Register rows are hash-repartitioned by group key; a reused dense
    register buffer walks each key slice, so estimates are bit-identical
    to the per-group path."""
    import pyarrow as pa

    from pyspark.sql.types import LongType, StructField, StructType

    from .agg import _group_ids, to_arrow_schema

    by = list(by)
    key_fields = [f for f in kc.schema.fields if f.name in by]
    out_schema = StructType(key_fields + [StructField("distinct_est", LongType())])
    in_arrow = to_arrow_schema(StructType(key_fields))

    def assemble(batches):
        tbls = [pa.Table.from_batches([b]) for b in batches]
        if not tbls:
            return
        tbl = pa.concat_tables(tbls)
        if tbl.num_rows == 0:
            return
        gids, uniques = _group_ids(tbl, by)
        idx = tbl.column("_idx").to_numpy().astype(np.int64)
        minu = tbl.column("_minu").to_numpy()
        order = np.argsort(gids, kind="stable")
        bounds = np.searchsorted(gids[order], np.arange(len(uniques) + 1))
        h = HyperLogLog(p, 0, "spark")  # reused register buffer
        key_cols: list[list] = [[] for _ in by]
        ests: list[int] = []
        for g, krow in enumerate(uniques):
            sl = order[bounds[g]:bounds[g + 1]]
            _hll_from_rows(idx[sl], minu[sl], p, reuse=h)
            ests.append(h.cardinality())
            for j in range(len(by)):
                key_cols[j].append(krow[j])
        arrays = [pa.array(key_cols[j], type=in_arrow.field(k).type)
                  for j, k in enumerate(by)]
        arrays.append(pa.array(ests, type=pa.int64()))
        yield pa.RecordBatch.from_arrays(arrays, names=by + ["distinct_est"])

    n_parts = kc.sparkSession.sparkContext.defaultParallelism
    return kc.repartition(n_parts, *by).mapInArrow(assemble, out_schema)


def hll_distinct(df: DataFrame, value_col: str, by: Sequence[str] | None = None,
                 p: int = 14, seed: int = 0, engine: str = "arrow",
                 hash_kind: str = "generic", keep_state: bool = False, **kw):
    """Distinct count via HyperLogLog.

    engine="native": JVM-codegen hashing/bucketing (integer or array<int>
    columns; implies hash_kind='spark', seed=0). engine="arrow": the generic
    blob harness (any key type)."""
    if engine == "native":
        by = list(by or [])
        kc = _hll_native(df, value_col, by, p)
        if not by:
            rows = kc.collect()
            h = _hll_from_rows(np.asarray([r["_idx"] for r in rows]),
                               np.asarray([r["_minu"] for r in rows]), p)
            out = {"distinct_est": h.cardinality()}
            if keep_state:
                out["state"] = h.to_bytes()
            return out
        if not keep_state:
            return _hll_grouped_vectorized(kc, by, p)
        from pyspark.sql.types import BinaryType, LongType, StructField, StructType

        key_fields = [f for f in kc.schema.fields if f.name in by]
        schema = StructType(key_fields + [StructField("distinct_est", LongType()),
                                          StructField("state", BinaryType())])

        def assemble(pdf):
            import pandas as pd

            h = _hll_from_rows(pdf["_idx"].to_numpy(), pdf["_minu"].to_numpy(), p)
            row = {k: [pdf[k].iloc[0]] for k in by}
            row["distinct_est"] = [h.cardinality()]
            row["state"] = [h.to_bytes()]
            return pd.DataFrame(row)

        return kc.groupBy(*by).applyInPandas(assemble, schema)
    kw.setdefault("keep_state", keep_state)
    return sketch_aggregate(df, HLLAggregator(value_col, p, seed, hash_kind), by=by, **kw)


def _cms_native(df: DataFrame, value_col: str, by: Sequence[str],
                depth: int, width: int, weight_col: str | None = None):
    from pyspark.sql import functions as F

    is_array = dict(df.dtypes)[value_col].startswith("array")
    cols = [F.col(c) for c in by]
    wsel = ([F.col(weight_col).cast("double").alias("_w")]
            if weight_col else [])
    if is_array:
        base = df.select(*cols, F.explode(value_col).alias("_x"), *wsel)
    else:
        base = df.select(*cols, F.col(value_col).alias("_x"), *wsel)
    base = base.where(F.col("_x").isNotNull())
    rows = F.array(*[
        F.struct(F.lit(j).alias("row"),
                 F.pmod(F.xxhash64(F.col("_x"), F.lit(j)), F.lit(width)).alias("idx"))
        for j in range(depth)
    ])
    if weight_col is None:
        return (base.select(*cols, F.explode(rows).alias("p"))
                .select(*cols, F.col("p.row"), F.col("p.idx"))
                .groupBy(*by, "row", "idx").agg(F.count(F.lit(1)).alias("c")))
    # weighted: c = sum(weight); NULL/zero weights contribute nothing,
    # negative/fractional surface through the same in-flow validation
    # columns the weighted DDSketch engine uses (checked at assembly)
    w = F.col("_w")
    base = base.where(w.isNotNull() & (w != 0))
    return (base.select(*cols, F.explode(rows).alias("p"), w)
            .select(*cols, F.col("p.row"), F.col("p.idx"), w)
            .groupBy(*by, "row", "idx")
            .agg(F.sum(w.cast("long")).alias("c"),
                 F.min(w).alias("_wmin"),
                 F.max(F.abs(w - F.floor(w))).alias("_wfrac")))


def _cms_from_rows(rows_i, idx_i, counts_i, depth: int, width: int) -> CountMinSketch:
    cm = CountMinSketch(depth, width, 0, "spark")
    r = np.asarray(rows_i, dtype=np.int64)
    i = np.asarray(idx_i, dtype=np.int64)
    c = np.asarray(counts_i, dtype=np.int64)
    np.add.at(cm.counts, (r, i), c)
    cm.total = int(c[r == 0].sum())
    return cm


def cms_state(df: DataFrame, value_col: str, by: Sequence[str] | None = None,
              depth: int = 5, width: int = 1 << 14, seed: int = 0,
              engine: str = "arrow", hash_kind: str = "generic",
              weight_col: str | None = None, **kw):
    """Count-Min state per group.

    engine="native": JVM xxhash64(key, row) + pmod bucketing; only
    (row, idx, count) cells — at most depth*width per group — leave the JVM;
    bit-identical to hash_kind='spark' NumPy builds (integer keys).

    ``weight_col``: each row's key counts ``weight`` times (integer adds,
    bit-identical to the expanded stream) — sketch a pre-aggregated
    (key, count) table without re-expanding it. NULL/zero weights
    contribute nothing; negative or fractional weights fail loudly."""
    if engine == "native":
        from .ddsketch_agg import _check_weight_cols

        by = list(by or [])
        kc = _cms_native(df, value_col, by, depth, width, weight_col)
        if not by:
            rows = kc.collect()
            if weight_col is not None and rows:
                _check_weight_cols(min(r["_wmin"] for r in rows),
                                   max(r["_wfrac"] for r in rows))
            cm = _cms_from_rows([r["row"] for r in rows], [r["idx"] for r in rows],
                                [r["c"] for r in rows], depth, width)
            return {"total": cm.total, "state": cm.to_bytes()}
        from pyspark.sql.types import BinaryType, LongType, StructField, StructType

        key_fields = [f for f in kc.schema.fields if f.name in by]
        schema = StructType(key_fields + [StructField("total", LongType()),
                                          StructField("state", BinaryType())])

        def assemble(pdf):
            import pandas as pd

            if weight_col is not None:
                _check_weight_cols(float(pdf["_wmin"].min()),
                                   float(pdf["_wfrac"].max()))
            cm = _cms_from_rows(pdf["row"].to_numpy(), pdf["idx"].to_numpy(),
                                pdf["c"].to_numpy(), depth, width)
            row = {k: [pdf[k].iloc[0]] for k in by}
            row["total"] = [cm.total]
            row["state"] = [cm.to_bytes()]
            return pd.DataFrame(row)

        return kc.groupBy(*by).applyInPandas(assemble, schema)
    kw.setdefault("keep_state", True)
    return sketch_aggregate(df, CMSAggregator(value_col, depth, width, seed,
                                              hash_kind, weight_col=weight_col),
                            by=by, **kw)


def _bloom_native(df: DataFrame, value_col: str, by: Sequence[str],
                  n_bits: int, n_hashes: int):
    from pyspark.sql import functions as F

    is_array = dict(df.dtypes)[value_col].startswith("array")
    cols = [F.col(c) for c in by]
    if is_array:
        base = df.select(*cols, F.explode(value_col).alias("_x"))
    else:
        base = df.select(*cols, F.col(value_col).alias("_x"))
    base = base.where(F.col("_x").isNotNull())
    probes = F.array(*[
        F.pmod(F.xxhash64(F.col("_x"), F.lit(i)), F.lit(n_bits))
        for i in range(n_hashes)
    ])
    # every non-null key contributes exactly n_hashes probe rows, so
    # n_added = sum(_c) / n_hashes per group — no extra aggregation or join
    # (an equi-join on group keys would silently drop NULL-key groups)
    return (base.select(*cols, F.explode(probes).alias("_pos"))
            .groupBy(*by, "_pos").agg(F.count(F.lit(1)).alias("_c")))


def _bloom_from_rows(positions, n_added: int, n_bits: int, n_hashes: int) -> BloomFilter:
    bf = BloomFilter(n_bits, n_hashes, 0, "spark")
    idx = np.asarray(positions, dtype=np.int64).view(np.uint64)
    np.bitwise_or.at(bf.words, (idx >> np.uint64(6)).astype(np.int64),
                     np.uint64(1) << (idx & np.uint64(63)))
    bf.n_added = int(n_added)
    return bf


def bloom_state(df: DataFrame, value_col: str, by: Sequence[str] | None = None,
                n_bits: int = 1 << 20, n_hashes: int = 7, seed: int = 0,
                engine: str = "arrow", hash_kind: str = "generic", **kw):
    """Bloom filter state per group.

    engine="native": JVM xxhash64 probes; only DISTINCT set-bit positions
    (<= n_bits per group, typically far fewer) leave the JVM — bit-identical
    to hash_kind='spark' NumPy builds (integer keys)."""
    if engine == "native":
        by = list(by or [])
        pos = _bloom_native(df, value_col, by, n_bits, n_hashes)
        if not by:
            rows = pos.collect()
            n_added = sum(r["_c"] for r in rows) // n_hashes
            bf = _bloom_from_rows([r["_pos"] for r in rows], n_added, n_bits, n_hashes)
            return {"n_added": bf.n_added, "fill_ratio": bf.fill_ratio,
                    "state": bf.to_bytes()}
        from pyspark.sql.types import BinaryType, DoubleType, LongType, StructField, StructType

        key_fields = [f for f in pos.schema.fields if f.name in by]
        schema = StructType(key_fields + [
            StructField("n_added", LongType()),
            StructField("fill_ratio", DoubleType()),
            StructField("state", BinaryType()),
        ])

        def assemble(pdf):
            import pandas as pd

            n_added = int(pdf["_c"].sum()) // n_hashes
            bf = _bloom_from_rows(pdf["_pos"].to_numpy(), n_added,
                                  n_bits, n_hashes)
            row = {k: [pdf[k].iloc[0]] for k in by}
            row["n_added"] = [bf.n_added]
            row["fill_ratio"] = [bf.fill_ratio]
            row["state"] = [bf.to_bytes()]
            return pd.DataFrame(row)

        return pos.groupBy(*by).applyInPandas(assemble, schema)
    kw.setdefault("keep_state", True)
    return sketch_aggregate(df, BloomAggregator(value_col, n_bits, n_hashes, seed, hash_kind),
                            by=by, **kw)


def tdigest_quantiles(df: DataFrame, value_col: str, by: Sequence[str] | None = None,
                      delta: float = 200.0,
                      quantiles: Sequence[float] = (0.5, 0.9, 0.99, 0.999),
                      weight_col: str | None = None, **kw):
    return sketch_aggregate(df, TDigestAggregator(value_col, delta, quantiles,
                                                  weight_col=weight_col),
                            by=by, **kw)


def kll_quantiles(df: DataFrame, value_col: str, by: Sequence[str] | None = None,
                  k: int = 200,
                  quantiles: Sequence[float] = (0.5, 0.9, 0.99, 0.999), **kw):
    return sketch_aggregate(df, KLLAggregator(value_col, k, quantiles), by=by, **kw)


class ThetaAggregator(SketchAggregator):
    """Theta/KMV sketch per group: distinct count + set-algebra state
    (union / intersect / a-not-b downstream of the blobs)."""

    def __init__(self, value_col: str, k: int = 4096, seed: int = 0,
                 hash_kind: str = "generic") -> None:
        self.value_cols = [value_col]
        self.value_col = value_col
        self.k = k
        self.seed = seed
        self.hash_kind = hash_kind

    def make(self) -> ThetaSketch:
        return ThetaSketch(self.k, self.seed, self.hash_kind)

    def add_arrow(self, state: ThetaSketch, table: pa.Table) -> None:
        state.add_batch(_keys_from_arrow(table.column(self.value_col)))

    def merge_blobs(self, blobs) -> bytes:
        it = iter(blobs)
        acc = ThetaSketch.from_bytes(next(it))
        for b in it:
            acc.merge(ThetaSketch.from_bytes(b))
        return acc.to_bytes()

    def finalize(self, blob: bytes) -> dict[str, Any]:
        sk = ThetaSketch.from_bytes(blob)
        return {"distinct_est": sk.estimate(), "retained": len(sk),
                "exact_mode": not sk.is_estimation_mode()}

    def output_fields(self) -> list[StructField]:
        from pyspark.sql.types import BooleanType

        return [StructField("distinct_est", DoubleType()),
                StructField("retained", LongType()),
                StructField("exact_mode", BooleanType())]


# -- native (JVM-side) theta engine --------------------------------------------
#
# The retained set of a theta sketch with hash_kind="spark" is exactly the
# k smallest distinct unsigned xxhash64 values (plus the (k+1)-th as theta),
# so the JVM can compute it relationally: hash, DISTINCT (map-side partial
# dedupe), then top-(k+1) in unsigned order (sign-bit flip makes signed
# order == unsigned order). Global: sort+limit (TakeOrdered, per-partition
# top-k then driver merge — no full sort). Grouped: window row_number.
# Only <= k+1 hash rows per group ever leave the JVM.


def _theta_native_hashes(df: DataFrame, value_col: str, by: Sequence[str], k: int):
    from pyspark.sql import Window, functions as F

    is_array = dict(df.dtypes)[value_col].startswith("array")
    cols = [F.col(c) for c in by]
    if is_array:
        base = df.select(*cols, F.explode(value_col).alias("_x"))
    else:
        base = df.select(*cols, F.col(value_col).alias("_x"))
    base = base.where(F.col("_x").isNotNull())
    u = F.xxhash64(F.col("_x")).bitwiseXOR(F.lit(-(1 << 63)))
    dedup = base.select(*cols, u.alias("_u")).distinct()
    if not by:
        return dedup.orderBy("_u").limit(k + 1)
    w = Window.partitionBy(*by).orderBy("_u")
    return (dedup.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") <= k + 1).drop("_rn"))


def _theta_from_rows(u_signed: np.ndarray, k: int) -> ThetaSketch:
    sk = ThetaSketch(k, 0, "spark")
    h = (np.asarray(u_signed, dtype=np.int64) ^ np.int64(-(1 << 63))).view(np.uint64)
    sk.add_hashes(h)
    return sk


def _theta_grouped_vectorized(kc: DataFrame, by: Sequence[str], k: int) -> DataFrame:
    """Grouped theta assembly with ONE Python call per Arrow partition
    (same rationale as the DDSketch/HLL vectorized assemblies)."""
    import pyarrow as pa

    from pyspark.sql.types import (
        BinaryType,
        BooleanType,
        LongType,
        StructField,
        StructType,
    )

    from .agg import _group_ids, to_arrow_schema

    by = list(by)
    key_fields = [f for f in kc.schema.fields if f.name in by]
    out_schema = StructType(key_fields + [
        StructField("distinct_est", DoubleType()),
        StructField("retained", LongType()),
        StructField("exact_mode", BooleanType()),
        StructField("state", BinaryType())])
    in_arrow = to_arrow_schema(StructType(key_fields))

    def assemble(batches):
        tbls = [pa.Table.from_batches([b]) for b in batches]
        if not tbls:
            return
        tbl = pa.concat_tables(tbls)
        if tbl.num_rows == 0:
            return
        gids, uniques = _group_ids(tbl, by)
        u = tbl.column("_u").to_numpy().astype(np.int64)
        order = np.argsort(gids, kind="stable")
        bounds = np.searchsorted(gids[order], np.arange(len(uniques) + 1))
        key_cols: list[list] = [[] for _ in by]
        ests, rets, exacts, blobs = [], [], [], []
        for g, krow in enumerate(uniques):
            sl = order[bounds[g]:bounds[g + 1]]
            sk = _theta_from_rows(u[sl], k)
            ests.append(sk.estimate())
            rets.append(len(sk))
            exacts.append(not sk.is_estimation_mode())
            blobs.append(sk.to_bytes())
            for j in range(len(by)):
                key_cols[j].append(krow[j])
        arrays = [pa.array(key_cols[j], type=in_arrow.field(kcol).type)
                  for j, kcol in enumerate(by)]
        arrays += [pa.array(ests, type=pa.float64()),
                   pa.array(rets, type=pa.int64()),
                   pa.array(exacts, type=pa.bool_()),
                   pa.array(blobs, type=pa.binary())]
        yield pa.RecordBatch.from_arrays(
            arrays, names=by + ["distinct_est", "retained", "exact_mode", "state"])

    n_parts = kc.sparkSession.sparkContext.defaultParallelism
    return kc.repartition(n_parts, *by).mapInArrow(assemble, out_schema)


def theta_state(df: DataFrame, value_col: str, by: Sequence[str] | None = None,
                k: int = 4096, seed: int = 0, engine: str = "arrow",
                hash_kind: str = "generic", **kw):
    """Theta sketch per group (global: dict with state + estimate).

    engine="native": JVM hashing + distinct + unsigned top-(k+1); retained
    hashes are bit-identical to hash_kind='spark' NumPy builds (integer
    keys). engine="arrow": the generic blob harness (any key type)."""
    if engine == "native":
        by = list(by or [])
        kc = _theta_native_hashes(df, value_col, by, k)
        if not by:
            sk = _theta_from_rows(np.asarray([r["_u"] for r in kc.collect()]), k)
            return {"distinct_est": sk.estimate(), "retained": len(sk),
                    "exact_mode": not sk.is_estimation_mode(),
                    "state": sk.to_bytes()}
        return _theta_grouped_vectorized(kc, by, k)
    kw.setdefault("keep_state", True)
    return sketch_aggregate(df, ThetaAggregator(value_col, k, seed, hash_kind),
                            by=by, **kw)


def theta_group_overlap(
    df: DataFrame,
    value_col: str,
    group_col: str,
    k: int = 4096,
    seed: int = 0,
    hash_kind: str = "generic",
    engine: str = "arrow",
    max_groups: int = 2000,
) -> DataFrame:
    """Pairwise distinct-set overlap between every pair of ``group_col``
    groups — the cross-source duplication matrix ("how many of source A's
    distinct values are also in B?") from ONE corpus scan.

    One grouped two-phase Theta aggregate over the corpus (only KB-scale
    state blobs shuffle), then C(G, 2) set-algebra reports computed
    driver-side from the G collected blobs: after the single scan, cost
    depends only on the number of groups, never the corpus size — at
    100 TB the matrix over 20 sources is 20 sketch blobs and 190 NumPy
    set operations. Raises when the group count exceeds ``max_groups``
    (the matrix is quadratic in G and the blobs land on the driver;
    pre-filter or bucket high-cardinality group columns first) — checked
    with a cheap bounded ``distinct().limit()`` probe on the group
    column BEFORE the sketch aggregate runs or any blob is collected, so
    a mistaken high-cardinality column (5M URLs) fails fast instead of
    OOM-ing the driver. NULL groups are excluded — NULL is a missing
    label, not a source.

    Output, one row per unordered pair (``group_a < group_b``): ``est_a``
    / ``est_b`` / ``est_union`` / ``est_intersection`` / ``jaccard`` /
    ``containment_a_in_b`` (share of A's distinct values also in B) /
    ``containment_b_in_a``, plus ``exact_mode`` — TRUE when neither
    sketch (nor their union) ever trimmed, in which case every estimate
    is an exact distinct count (the oracle contract, like
    ``rollup.theta_rollup_overlap``)."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import BooleanType, DoubleType, StructType

    labelled = df.where(F.col(group_col).isNotNull())
    # bounded cardinality probe FIRST — one column, map-side-combining
    # distinct, stops at max_groups+1 rows — so the guard fires before
    # the expensive grouped aggregate runs or any blob hits the driver
    n_probe = labelled.select(group_col).distinct().limit(max_groups + 1).count()
    if n_probe > max_groups:
        raise ValueError(
            f"theta_group_overlap: more than max_groups={max_groups} "
            "groups — the pairwise matrix is quadratic and the blobs land "
            "on the driver; pre-filter or bucket the group column, or "
            "raise max_groups")
    states = theta_state(
        labelled, value_col,
        by=[group_col], k=k, seed=seed, hash_kind=hash_kind, engine=engine)
    rows = states.select(group_col, "state").collect()
    sks = sorted(((r[0], ThetaSketch.from_bytes(bytes(r[1])))
                  for r in rows), key=lambda t: t[0])
    out_rows = []
    for i, (ga, a) in enumerate(sks):
        for gb, b in sks[i + 1:]:
            union = ThetaSketch(k, seed, hash_kind).merge(a).merge(b)
            inter = a.intersect(b)
            ea, eb = a.estimate(), b.estimate()
            eu, ei = union.estimate(), inter.estimate()
            exact = not (a.is_estimation_mode() or b.is_estimation_mode()
                         or union.is_estimation_mode()
                         or inter.is_estimation_mode())
            out_rows.append((
                ga, gb, float(ea), float(eb), float(eu), float(ei),
                float(ei / eu) if eu > 0 else 0.0,
                float(ei / ea) if ea > 0 else 0.0,
                float(ei / eb) if eb > 0 else 0.0,
                bool(exact)))
    gtype = states.schema[group_col].dataType
    schema = StructType()
    schema.add("group_a", gtype).add("group_b", gtype)
    for c in ("est_a", "est_b", "est_union", "est_intersection", "jaccard",
              "containment_a_in_b", "containment_b_in_a"):
        schema.add(c, DoubleType())
    schema.add("exact_mode", BooleanType())
    return df.sparkSession.createDataFrame(out_rows, schema)
