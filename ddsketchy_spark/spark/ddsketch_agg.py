"""DDSketch as a two-phase Spark aggregate.

The distributed analogue of the reference's `add* -> merge -> quantile`
lifecycle (`/root/reference/src/ddsketchy.rs:241-306,518-556`). Two engines:

``engine="native"`` (default) — the Spark-first hot path. The logarithmic
bucketing ``ceil(ln|x| * inv_ln_gamma)`` is expressed in Spark SQL, so the
entire scan -> (explode ->) bucket -> partial-aggregate pipeline runs inside
whole-stage codegen with map-side combine; ONLY (region, key, count) rows —
at most ~2*max_bins+1 per group regardless of input size — ever leave the
JVM, where NumPy assembles the final sketch. Measured ~3x faster than
shipping values to Python workers and it scales with cores because the JVM
hash aggregate parallelizes cleanly (Spark's ArrowWriter serializes
array<int> columns per element, so list-column IPC is the bottleneck the
native engine avoids entirely).

``engine="arrow"`` — the generic two-phase harness (mapInArrow partial
states -> associative blob merge). Needed for sketch state that SQL cannot
express; kept fully supported for DDSketch as the cross-check path and for
inputs already in Python-land.

Both engines produce identical estimates (same bucketing law; last-ulp
libm differences between JVM Math.log and np.log could in principle flip a
boundary key, but estimates remain within alpha and tests assert equality
on real data).
"""

from __future__ import annotations

import math
from typing import Any, Sequence

import numpy as np
import pyarrow as pa

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import DoubleType, LongType, StructField, StructType

from ..core.ddsketch import DDSketch
from ..core.mapping import LogMapping
from .agg import (
    SketchAggregator,
    numeric_values,
    numeric_values_native,
    sketch_aggregate,
)


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
        # dtype-preserving flatten: integer columns (e.g. token ids) hit
        # DDSketch.add_batch's exact bincount fast path instead of paying
        # the per-element log chain on the float cast
        vals = numeric_values_native(table.column(self.value_col))
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


# ---------------------------------------------------------------------------
# Native engine: JVM-side bucketing, NumPy assembly of the final sketch
# ---------------------------------------------------------------------------


def bucket_exprs(x, alpha: float):
    """The reference bucketing law as Spark SQL expressions over a double
    column ``x``: (finite_condition, region, key). THE single source of the
    native law — shared by the batch engine here and the streaming windowed
    path (`streaming/stream_agg.py`), so fixes cannot diverge.

    region: +1 positive store, -1 negative store, 0 zero bucket
    key:    ceil(ln|x| * inv_ln_gamma), the reference mapping
            (`/root/reference/src/mapping.rs:6-12`)."""
    m = LogMapping(alpha)
    inf = float("inf")
    finite = ~F.isnan(x) & (x < F.lit(inf)) & (x > F.lit(-inf))
    region = (
        F.when(x >= F.lit(m.min_indexable_value), F.lit(1))
        .when(x <= F.lit(-m.min_indexable_value), F.lit(-1))
        .otherwise(F.lit(0))
    )
    key = (
        F.when(
            region != 0,
            F.ceil(F.log(F.abs(x)) * F.lit(m.inv_ln_gamma)).cast("int"),
        )
        .otherwise(F.lit(0))
    )
    return finite, region, key


def _native_key_counts(
    df: DataFrame, value_col: str, by: Sequence[str], alpha: float,
    weight_col: str | None = None,
) -> DataFrame:
    """(by..., region, key, c, s, mn, mx) — one row per occupied bucket.

    The whole pipeline (scan, optional explode, finite filter, log bucketing,
    hash aggregate with map-side combine) is native Spark SQL: it stays in
    whole-stage codegen and shuffles at most ~2*max_bins+1 rows per group.

    ``weight_col``: each row's value counts ``weight`` times (the core
    ``add_weighted_batch`` expansion law, so a pre-aggregated
    (value, count) table sketches exactly). ``c`` becomes sum(weight) and
    ``s`` sum(x*weight); NULL and zero weights contribute nothing; two
    extra validation columns ride along (``_wmin``, ``_wfrac``) that the
    assembly layer checks — a negative or fractional weight fails the
    job with a clear error instead of silently corrupting counts. For an
    array ``value_col`` the row weight applies to every element."""
    dtype = dict(df.dtypes)[value_col]
    is_array = dtype.startswith("array")
    cols = [F.col(c) for c in by]
    wsel = ([F.col(weight_col).cast("double").alias("_w")]
            if weight_col else [])
    if is_array:
        base = df.select(*cols, F.explode(value_col).alias("_x"), *wsel)
    else:
        base = df.select(*cols, F.col(value_col).alias("_x"), *wsel)
    x = F.col("_x").cast("double")
    finite_cond, region, key = bucket_exprs(x, alpha)
    # NOTE (r6, tried and reverted): a two-level plan — count DISTINCT
    # values first, bucket only the O(vocab) distinct rows — is 1.5x
    # faster wall-clock for global int-token-array builds (2.2 -> 1.5 s
    # on 529M tokens at local[32], bucket rows bit-identical), but its
    # per-task ~50k-entry value hash map (~2.4 MB x 32 tasks) blows the
    # shared L3, so 8 -> 32-thread scaling efficiency drops to
    # 0.64-0.85 (measured at 1x AND 4x input) versus ~0.95-1.0 for this
    # direct compute-bound plan. The north rule pins scaling >= 0.8, so
    # the direct plan stays; on a multi-NODE cluster (per-node cache and
    # bandwidth scale with nodes) the two-level plan would be the win.
    if weight_col is None:
        finite = base.where(finite_cond)
        return finite.select(*cols, region.alias("region"),
                             key.alias("key"), x.alias("_x")).groupBy(
            *by, "region", "key"
        ).agg(
            F.count(F.lit(1)).alias("c"),
            F.sum("_x").alias("s"),
            F.min("_x").alias("mn"),
            F.max("_x").alias("mx"),
        )
    w = F.col("_w")
    # keep negative/fractional weights IN the aggregate (so _wmin/_wfrac
    # catch them — dropping them here would hide caller bugs); only NULL
    # and exact-zero weights are contribution-free by contract
    finite = base.where(finite_cond & w.isNotNull() & (w != 0))
    return finite.select(*cols, region.alias("region"), key.alias("key"),
                         x.alias("_x"), w.alias("_w")).groupBy(
        *by, "region", "key"
    ).agg(
        F.sum(w.cast("long")).alias("c"),
        F.sum(F.col("_x") * w).alias("s"),
        F.min("_x").alias("mn"),
        F.max("_x").alias("mx"),
        F.min(w).alias("_wmin"),
        F.max(F.abs(w - F.floor(w))).alias("_wfrac"),
    )


def _check_weight_cols(wmin: float, wfrac: float) -> None:
    """Fail fast on invalid weights surfaced by the in-flow validation
    columns (no extra pass over the data). Negativity is checked FIRST:
    a negative fractional weight (e.g. -1.5) is a negative-weight bug,
    not a fractional-weight one."""
    if wmin is not None and wmin < 0:
        raise ValueError(f"weights must be >= 0, found {wmin}")
    if wfrac and wfrac > 0:
        raise ValueError(
            "weights must be integral occurrence counts (a fractional "
            "weight has no expansion law); found a fractional value")


def sketch_from_key_counts(
    regions: np.ndarray,
    keys: np.ndarray,
    counts: np.ndarray,
    sums: np.ndarray,
    mins: np.ndarray,
    maxs: np.ndarray,
    alpha: float,
    max_bins: int,
) -> DDSketch:
    """Assemble a DDSketch from native (region, key, count) bucket rows."""
    sk = DDSketch(alpha, max_bins)
    if len(regions) == 0:
        return sk
    regions = np.asarray(regions, dtype=np.int64)
    keys = np.asarray(keys, dtype=np.int64)
    counts = np.asarray(counts, dtype=np.int64)
    pos = regions == 1
    neg = regions == -1
    if pos.any():
        order = np.argsort(keys[pos])
        sk.positive_store.add_keys(keys[pos][order], counts[pos][order])
    if neg.any():
        order = np.argsort(keys[neg])
        sk.negative_store.add_keys(keys[neg][order], counts[neg][order])
    sk.zero_count = int(counts[regions == 0].sum())
    sk._sum = float(np.asarray(sums, dtype=np.float64).sum())
    sk._raw_min = float(np.asarray(mins, dtype=np.float64).min())
    sk._raw_max = float(np.asarray(maxs, dtype=np.float64).max())
    return sk


def _native_global(
    df: DataFrame, value_col: str, alpha: float, max_bins: int,
    quantiles: Sequence[float], keep_state: bool,
    weight_col: str | None = None,
) -> dict:
    kc = _native_key_counts(df, value_col, [], alpha, weight_col).collect()
    if weight_col is not None and kc:
        _check_weight_cols(min(r["_wmin"] for r in kc),
                           max(r["_wfrac"] for r in kc))
    sk = sketch_from_key_counts(
        np.array([r["region"] for r in kc]),
        np.array([r["key"] for r in kc]),
        np.array([r["c"] for r in kc]),
        np.array([r["s"] for r in kc]),
        np.array([r["mn"] for r in kc]),
        np.array([r["mx"] for r in kc]),
        alpha, max_bins,
    )
    out = _estimates(sk, quantiles)
    if keep_state:
        out["state"] = sk.to_bytes()
    return out


def _collapse_keys(keys: np.ndarray, counts: np.ndarray, max_bins: int):
    """Emulate the collapsing store on sorted (key, count) pairs: when the
    key span exceeds max_bins, low keys collapse into the floor key
    (`/root/reference/src/store.rs:95-128`)."""
    if len(keys) == 0 or int(keys[-1]) - int(keys[0]) + 1 <= max_bins:
        return keys, counts
    floor = int(keys[-1]) - max_bins + 1
    cut = int(np.searchsorted(keys, floor, side="left"))
    low = counts[:cut].sum()
    if cut < len(keys) and int(keys[cut]) == floor:
        counts = counts[cut:].copy()
        counts[0] += low
        return keys[cut:], counts
    return (np.concatenate(([floor], keys[cut:])).astype(keys.dtype),
            np.concatenate(([low], counts[cut:])).astype(counts.dtype))


def _group_walk(m: LogMapping, regions, keys, counts, mins, qs,
                max_bins: int) -> list[float]:
    """The reference's three-region quantile walk over one group's bucket
    rows — pure NumPy, no Store/DDSketch objects. Bit-identical to
    DDSketch.quantile on a sketch assembled from the same rows."""
    neg_m = regions == -1
    pos_m = regions == 1
    zero = int(counts[regions == 0].sum())
    nk, nc = keys[neg_m], counts[neg_m]
    order = np.argsort(nk, kind="stable")
    nk, nc = _collapse_keys(nk[order], nc[order], max_bins)
    pk, pc = keys[pos_m], counts[pos_m]
    order = np.argsort(pk, kind="stable")
    pk, pc = _collapse_keys(pk[order], pc[order], max_bins)
    neg = int(nc.sum())
    total = neg + zero + int(pc.sum())
    raw_min = float(mins.min())
    if total == 1:
        return [raw_min for _ in qs]
    ncum = np.cumsum(nc) if len(nc) else nc
    pcum = np.cumsum(pc) if len(pc) else pc
    out = []
    for q in qs:
        rank = int(q * (total - 1.0))
        if rank < neg:
            i = int(np.searchsorted(ncum, neg - 1 - rank, side="right"))
            key = int(nk[i]) if i < len(nk) else int(nk[-1])
            out.append(-m.value(key))
        elif rank < neg + zero:
            out.append(0.0)
        else:
            i = int(np.searchsorted(pcum, rank - zero - neg, side="right"))
            key = int(pk[i]) if i < len(pk) else int(pk[-1])
            out.append(m.value(key))
    return out


def _native_grouped_vectorized(
    kc: DataFrame, by: Sequence[str], alpha: float, max_bins: int,
    quantiles: Sequence[float], keep_state: bool = False,
) -> DataFrame:
    """Assemble grouped estimates with ONE Python call per Arrow partition
    instead of one per key (`applyInPandas` costs ~150us/group — at 10^5+
    keys that dominates the job). Bucket rows are hash-repartitioned by the
    group key so each task owns whole groups, then a NumPy group-walk runs
    per key slice.

    ``keep_state=True`` additionally serializes each group's sketch: the
    slice is assembled into a real DDSketch (estimates come from it, so
    outputs stay bit-identical to the blob) and its ``to_bytes()`` rides
    along as a binary column — same one-call-per-partition shape."""
    import pyarrow as pa

    from .agg import to_arrow_schema, _group_ids

    m = LogMapping(alpha)
    by = list(by)
    qs = list(quantiles)
    key_fields = [f for f in kc.schema.fields if f.name in by]
    from pyspark.sql.types import BinaryType

    out_schema = StructType(key_fields + [
        StructField("count", LongType()), StructField("sum", DoubleType()),
        StructField("mean", DoubleType()), StructField("min", DoubleType()),
        StructField("max", DoubleType()),
    ] + [StructField(quantile_label(q), DoubleType()) for q in qs]
      + ([StructField("state", BinaryType())] if keep_state else []))
    in_arrow = to_arrow_schema(StructType(key_fields))
    walk_qs = [0.0] + qs + [1.0]  # min/max are quantile(0)/quantile(1)

    def assemble(batches):
        tbls = [pa.Table.from_batches([b]) for b in batches]
        if not tbls:
            return
        tbl = pa.concat_tables(tbls)
        if tbl.num_rows == 0:
            return
        gids, uniques = _group_ids(tbl, by)
        if "_wmin" in tbl.column_names:  # weighted bucket rows: validate
            _check_weight_cols(
                float(np.nanmin(tbl.column("_wmin").to_numpy())),
                float(np.nanmax(tbl.column("_wfrac").to_numpy())))
        regions = tbl.column("region").to_numpy().astype(np.int64)
        keys = tbl.column("key").to_numpy().astype(np.int64)
        counts = tbl.column("c").to_numpy().astype(np.int64)
        sums = tbl.column("s").to_numpy().astype(np.float64)
        mins = tbl.column("mn").to_numpy().astype(np.float64)
        maxs = tbl.column("mx").to_numpy().astype(np.float64)
        order = np.argsort(gids, kind="stable")
        bounds = np.searchsorted(gids[order], np.arange(len(uniques) + 1))
        out_rows: list[list] = [[] for _ in range(len(out_schema))]
        for g, krow in enumerate(uniques):
            sl = order[bounds[g]:bounds[g + 1]]
            col = 0
            for j in range(len(by)):
                out_rows[col].append(krow[j]); col += 1
            if keep_state:
                sk = sketch_from_key_counts(
                    regions[sl], keys[sl], counts[sl], sums[sl],
                    mins[sl], maxs[sl], alpha, max_bins)
                for val in _estimates(sk, qs).values():
                    out_rows[col].append(val); col += 1
                out_rows[col].append(sk.to_bytes()); col += 1
                continue
            walked = _group_walk(m, regions[sl], keys[sl], counts[sl],
                                 mins[sl], walk_qs, max_bins)
            total = int(counts[sl].sum())
            s = float(sums[sl].sum())
            out_rows[col].append(total); col += 1
            out_rows[col].append(s); col += 1
            out_rows[col].append(s / total if total else 0.0); col += 1
            out_rows[col].append(walked[0]); col += 1          # min = q(0)
            out_rows[col].append(walked[-1]); col += 1         # max = q(1)
            for v in walked[1:-1]:
                out_rows[col].append(v); col += 1
        arrays = []
        for j, f in enumerate(out_schema.fields):
            if j < len(by):
                arrays.append(pa.array(out_rows[j], type=in_arrow.field(f.name).type))
            elif isinstance(f.dataType, BinaryType):
                arrays.append(pa.array(out_rows[j], type=pa.binary()))
            elif f.dataType == LongType():
                arrays.append(pa.array(out_rows[j], type=pa.int64()))
            else:
                arrays.append(pa.array(out_rows[j], type=pa.float64()))
        yield pa.RecordBatch.from_arrays(arrays, names=[f.name for f in out_schema.fields])

    n_parts = kc.sparkSession.sparkContext.defaultParallelism
    return kc.repartition(n_parts, *by).mapInArrow(assemble, out_schema)


def _native_grouped(
    df: DataFrame, value_col: str, by: Sequence[str], alpha: float, max_bins: int,
    quantiles: Sequence[float], keep_state: bool,
    weight_col: str | None = None,
) -> DataFrame:
    by = list(by)
    kc = _native_key_counts(df, value_col, by, alpha, weight_col)
    # one Python call per partition (scales to millions of group keys),
    # with or without per-group state blobs
    return _native_grouped_vectorized(kc, by, alpha, max_bins, quantiles,
                                      keep_state=keep_state)


def _estimates(sk: DDSketch, quantiles: Sequence[float]) -> dict[str, Any]:
    out: dict[str, Any] = {
        "count": sk.count,
        "sum": sk.sum,
        "mean": sk.mean,
        "min": None if math.isinf(sk.min) else sk.min,
        "max": None if math.isinf(sk.max) else sk.max,
    }
    for q in quantiles:
        out[quantile_label(q)] = sk.quantile_opt(q)
    return out


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
    engine: str = "native",
    weight_col: str | None = None,
):
    """Quantile summary of ``value_col`` (scalar or array column).

    Grouped: DataFrame [by..., count, sum, mean, min, max, pXX...].
    Global (by=None): a plain dict with the same keys.

    engine="native": JVM-codegen bucketing (fastest, scales with cores).
    engine="arrow": generic mapInArrow two-phase harness (blob merge path).

    ``weight_col`` (native engine): each row's value counts ``weight``
    times — the exact expansion law of ``DDSketch.add_weighted_batch``,
    so quantiles over a pre-aggregated (value, occurrence_count) table
    match the raw-row sketch while shuffling only O(distinct values).
    Weights must be integral and >= 0 (NULL/zero rows contribute
    nothing; negative or fractional weights fail the job loudly)."""
    if engine not in ("native", "arrow"):
        raise ValueError(f"unknown engine {engine!r}")
    if engine == "native":
        if by:
            return _native_grouped(df, value_col, by, alpha, max_bins, quantiles, keep_state,
                                   weight_col=weight_col)
        return _native_global(df, value_col, alpha, max_bins, quantiles, keep_state,
                              weight_col=weight_col)
    if weight_col is not None:
        raise ValueError(
            "weight_col requires engine='native' (the blob harness ships "
            "raw values; pre-aggregate with the native engine instead)")
    agg = DDSketchAggregator(value_col, alpha=alpha, max_bins=max_bins, quantiles=quantiles)
    return sketch_aggregate(df, agg, by=by, merge_rounds=merge_rounds, fanout=fanout,
                            keep_state=keep_state)


def ddsketch_rollup(
    df: DataFrame,
    value_col: str,
    dims: Sequence[str],
    levels: Sequence[Sequence[str]] | None = None,
    alpha: float = 0.01,
    max_bins: int = 4096,
    quantiles: Sequence[float] = (0.5, 0.9, 0.99, 0.999),
    keep_state: bool = False,
    weight_col: str | None = None,
    persist: bool = True,
) -> DataFrame:
    """Every rollup level of a DDSketch summary from ONE scan of the data.

    ``levels`` is a list of dim subsets (default: SQL ROLLUP prefixes —
    ``[dims, dims[:-1], ..., []]``; ``[]`` is the global row). The finest
    (region, key, count) bucket-row frame is computed once at ``dims``
    granularity and PERSISTED; every coarser level re-aggregates those
    O(groups x (2*max_bins+1)) rows — sketch mergeability means summing
    bucket counts IS merging the sketches, so each level's estimates are
    identical to running ``ddsketch_quantiles`` directly at that grouping
    (the cube never rescans or reshuffles the raw table, which at 10^12
    rows is the entire cost). Composes with ``weight_col``.

    Output: one DataFrame with ALL dim columns (NULL where rolled up, the
    SQL ROLLUP convention), ``rollup_level`` (count of active dims), then
    count/sum/mean/min/max/pXX[/state]. Release the persisted bucket-row
    intermediate with ``pipeline.cache.release_cached_deps(result)``.

    Laziness note: a ``[]`` (global) level assembles driver-side, which
    runs one Spark job EAGERLY inside this call (it also materializes the
    persisted frame, so the later levels reuse it for free)."""
    from ..pipeline.cache import tag_cached_deps
    from .agg import validate_rollup_levels

    dims = list(dims)
    levels = validate_rollup_levels(dims, levels)
    spark = df.sparkSession
    kc = _native_key_counts(df, value_col, dims, alpha, weight_col)
    if persist:
        kc = kc.persist()
    weighted = weight_col is not None
    re_aggs = [F.sum("c").alias("c"), F.sum("s").alias("s"),
               F.min("mn").alias("mn"), F.max("mx").alias("mx")]
    if weighted:
        re_aggs += [F.min("_wmin").alias("_wmin"),
                    F.max("_wfrac").alias("_wfrac")]
    dim_fields = {f.name: f.dataType for f in df.schema.fields
                  if f.name in dims}
    qs = list(quantiles)
    measure_names = (["count", "sum", "mean", "min", "max"]
                     + [quantile_label(q) for q in qs]
                     + (["state"] if keep_state else []))
    parts = []
    for lv in levels:
        lvl_kc = kc if lv == dims else \
            kc.groupBy(*lv, "region", "key").agg(*re_aggs)
        if lv:
            est = _native_grouped_vectorized(lvl_kc, lv, alpha, max_bins,
                                             qs, keep_state=keep_state)
        else:
            rows = lvl_kc.collect()  # already (region, key)-aggregated
            if weighted and rows:
                _check_weight_cols(min(r["_wmin"] for r in rows),
                                   max(r["_wfrac"] for r in rows))
            sk = sketch_from_key_counts(
                np.array([r["region"] for r in rows]),
                np.array([r["key"] for r in rows]),
                np.array([r["c"] for r in rows]),
                np.array([r["s"] for r in rows]),
                np.array([r["mn"] for r in rows]),
                np.array([r["mx"] for r in rows]),
                alpha, max_bins) if rows else DDSketch(alpha, max_bins)
            vals = _estimates(sk, qs)
            if keep_state:
                vals["state"] = sk.to_bytes()
            from pyspark.sql.types import BinaryType
            schema = StructType(
                [StructField("count", LongType()),
                 StructField("sum", DoubleType()),
                 StructField("mean", DoubleType()),
                 StructField("min", DoubleType()),
                 StructField("max", DoubleType())]
                + [StructField(quantile_label(q), DoubleType()) for q in qs]
                + ([StructField("state", BinaryType())] if keep_state
                   else []))
            est = spark.createDataFrame([tuple(vals.values())], schema)
        sel = [(F.col(d) if d in lv else
                F.lit(None).cast(dim_fields[d])).alias(d) for d in dims]
        sel.append(F.lit(len(lv)).cast("int").alias("rollup_level"))
        sel += [F.col(m) for m in measure_names]
        parts.append(est.select(*sel))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return tag_cached_deps(out, [kc]) if persist else out


def ddsketch_state(
    df: DataFrame,
    value_col: str,
    by: Sequence[str] | None = None,
    alpha: float = 0.01,
    max_bins: int = 4096,
    merge_rounds: int = 1,
    fanout: int = 64,
    engine: str = "native",
    weight_col: str | None = None,
):
    """Return the merged sketch itself (driver-side DDSketch for global, or
    a DataFrame with a ``state`` blob column per key). ``weight_col`` as in
    ``ddsketch_quantiles`` (native engine only)."""
    if engine not in ("native", "arrow"):
        raise ValueError(f"unknown engine {engine!r}")
    if engine == "native":
        if by:
            return _native_grouped(df, value_col, by, alpha, max_bins, (),
                                   keep_state=True, weight_col=weight_col)
        out = _native_global(df, value_col, alpha, max_bins, (),
                             keep_state=True, weight_col=weight_col)
        return DDSketch.from_bytes(out["state"])
    if weight_col is not None:
        raise ValueError(
            "weight_col requires engine='native' (the blob harness ships "
            "raw values; pre-aggregate with the native engine instead)")
    agg = DDSketchAggregator(value_col, alpha=alpha, max_bins=max_bins, quantiles=())
    if by:
        return sketch_aggregate(df, agg, by=by, merge_rounds=merge_rounds, fanout=fanout,
                                keep_state=True)
    out = sketch_aggregate(df, agg, by=None, fanout=fanout, keep_state=True)
    return DDSketch.from_bytes(out["state"])
