"""One-call table profiling: per-column sketch summaries.

``profile_table(df)`` answers "what does this table look like" at any
scale: one exact-stats pass (count/nulls/min/max/mean for every column in
a single job — Catalyst fuses all the aggregates), plus per-column sketch
passes that each shuffle only bucket/register rows:

- numeric columns: DDSketch p50/p90/p99 (native engine, whole-stage
  codegen) + HLL distinct estimate
- string columns: HLL distinct estimate + exact avg length
- array<numeric> columns: element-level quantiles + element HLL (explode
  stays inside the JVM; no Python, no row shuffle)

Output is long-format — one row per column — so it writes/joins like any
other table. At 10^12 rows every pass is scan-bound with KB-scale state.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from .companions import hll_distinct
from .ddsketch_agg import ddsketch_quantiles, quantile_label


def profile_schema(quantiles: tuple[float, ...] = (0.5, 0.9, 0.99)) -> StructType:
    """Output schema: fixed stats columns + one pXX column per requested
    quantile."""
    return StructType([
        StructField("column", StringType()),
        StructField("dtype", StringType()),
        StructField("count", LongType()),
        StructField("nulls", LongType()),
        StructField("distinct_est", LongType()),
        StructField("min", DoubleType()),
        StructField("max", DoubleType()),
        StructField("mean", DoubleType()),
        StructField("avg_len", DoubleType()),
    ] + [StructField(quantile_label(q), DoubleType()) for q in quantiles])


PROFILE_SCHEMA = profile_schema()

_NUMERIC = ("tinyint", "smallint", "int", "bigint", "float", "double")


def _classify(dtype: str) -> str:
    if dtype in _NUMERIC or dtype.startswith("decimal"):
        return "numeric"
    if dtype == "string":
        return "string"
    if dtype.startswith("array<") and dtype[6:-1] in _NUMERIC:
        return "numeric_array"
    return "other"


_ENTRY_T = ("array<struct<cid:int,kind:int,k1:bigint,k2:bigint,"
            "vl:bigint,x:double>>")


def _sketch_entries(c: str, cid: int, kind: str, alpha: float, p: int):
    """Per-row entry array for the one-pass sketch scan: every non-null
    value (array columns: every non-null element) contributes one HLL
    register entry (kind 0: k1 = register index, vl = sign-flipped
    unsigned rest — exactly ``_hll_native``'s expressions, hashed on the
    RAW value so registers are bit-identical) and, for finite numeric
    values, one DDSketch bucket entry (kind 1: k1 = region, k2 = key —
    exactly ``bucket_exprs``)."""
    from .ddsketch_agg import bucket_exprs

    src = F.col(c) if kind == "numeric_array" else F.array(F.col(c))
    src = F.filter(src, lambda e: e.isNotNull())
    numeric = kind in ("numeric", "numeric_array")

    def to_entries(e):
        h = F.xxhash64(e)
        hll = F.struct(
            F.lit(cid).alias("cid"), F.lit(0).alias("kind"),
            F.shiftrightunsigned(h, 64 - p).alias("k1"),
            F.lit(0).cast("bigint").alias("k2"),
            F.shiftleft(h, p).bitwiseXOR(F.lit(-(1 << 63))).alias("vl"),
            F.lit(None).cast("double").alias("x"))
        if not numeric:
            return F.array(hll)
        x = e.cast("double")
        finite, region, key = bucket_exprs(x, alpha)
        dds = F.struct(
            F.lit(cid).alias("cid"), F.lit(1).alias("kind"),
            region.cast("bigint").alias("k1"),
            key.cast("bigint").alias("k2"),
            F.lit(None).cast("bigint").alias("vl"), x.alias("x"))
        # the CaseWhen guard keeps the bucket-key arithmetic off
        # non-finite values (ANSI overflow on cast(ceil(inf)))
        return F.when(finite, F.array(hll, dds)).otherwise(F.array(hll))

    return F.coalesce(F.flatten(F.transform(src, to_entries)),
                      F.array().cast(_ENTRY_T))


def profile_table(
    df: DataFrame,
    columns: Sequence[str] | None = None,
    alpha: float = 0.01,
    hll_p: int = 14,
    quantiles: tuple[float, ...] = (0.5, 0.9, 0.99),
) -> DataFrame:
    """One row per profiled column (see ``profile_schema(quantiles)``).
    Columns of unsupported types are reported with exact count/nulls only.

    Scan shape: exactly TWO passes over the table at any column count —
    one fused exact-stats aggregate (as before), and ONE sketch pass
    whose projection emits (column id, HLL register entry | DDSketch
    bucket entry) rows for every profiled column at once, folded by a
    single map-side-combining aggregate; the shuffle carries at most
    ``cols x (2^hll_p + buckets)`` rows. (Previously each column issued
    its own HLL scan and its own DDSketch scan: 2C+1 passes.) Register
    and bucket rows reuse ``_hll_native``'s and ``bucket_exprs``'s
    expressions verbatim, so every estimate is identical to the
    per-column engines'."""
    import numpy as np

    from .companions import _hll_from_rows
    from .ddsketch_agg import _estimates, sketch_from_key_counts

    dtypes = dict(df.dtypes)
    cols = list(columns) if columns else list(dtypes)
    schema = profile_schema(quantiles)

    # ONE exact pass for every column: Catalyst computes all of these
    # aggregates (including the total row count) in a single scan
    exprs = [F.count(F.lit(1)).alias("__total")]
    for c in cols:
        kind = _classify(dtypes[c])
        exprs.append(F.count(c).alias(f"{c}__cnt"))
        if kind == "numeric":
            x = F.col(c).cast("double")
            exprs += [F.min(x).alias(f"{c}__min"), F.max(x).alias(f"{c}__max"),
                      F.avg(x).alias(f"{c}__mean")]
        elif kind == "string":
            exprs.append(F.avg(F.length(c)).alias(f"{c}__avglen"))
        elif kind == "numeric_array":
            exprs.append(F.avg(F.size(c)).alias(f"{c}__avglen"))
    exact = df.agg(*exprs).first()
    n_total = exact["__total"]

    # ONE sketch pass for every eligible column: HLL register rows and
    # DDSketch bucket rows ride the same explode + hash aggregate
    kinds = {c: _classify(dtypes[c]) for c in cols}
    eligible = [c for c in cols
                if kinds[c] in ("numeric", "string", "numeric_array")]
    by_cid: dict[int, dict[str, list]] = {}
    if eligible:
        entries = [_sketch_entries(c, i, kinds[c], alpha, hll_p)
                   for i, c in enumerate(eligible)]
        cat = entries[0] if len(entries) == 1 else F.concat(*entries)
        kc = (df.select(F.explode(cat).alias("e")).select("e.*")
              .groupBy("cid", "kind", "k1", "k2")
              .agg(F.min("vl").alias("minu"), F.count("x").alias("c"),
                   F.sum("x").alias("s"), F.min("x").alias("mn"),
                   F.max("x").alias("mx"))
              .collect())
        for r in kc:
            d = by_cid.setdefault(r["cid"], {"hll": [], "dds": []})
            if r["kind"] == 0:
                d["hll"].append((r["k1"], r["minu"]))
            else:
                d["dds"].append((r["k1"], r["k2"], r["c"], r["s"],
                                 r["mn"], r["mx"]))

    rows = []
    for c in cols:
        kind = kinds[c]
        row = {f.name: None for f in schema.fields}
        row["column"] = c
        row["dtype"] = dtypes[c]
        row["count"] = exact[f"{c}__cnt"]
        row["nulls"] = n_total - exact[f"{c}__cnt"]
        got = (by_cid.get(eligible.index(c), {"hll": [], "dds": []})
               if c in eligible else {"hll": [], "dds": []})
        if kind in ("numeric", "string", "numeric_array") and row["count"] > 0:
            h = _hll_from_rows(
                np.asarray([t[0] for t in got["hll"]], dtype=np.int64),
                np.asarray([t[1] for t in got["hll"]], dtype=np.int64),
                hll_p)
            row["distinct_est"] = int(round(h.cardinality()))
        if kind == "numeric":
            row["min"] = _f(exact[f"{c}__min"])
            row["max"] = _f(exact[f"{c}__max"])
            row["mean"] = _f(exact[f"{c}__mean"])
        elif kind in ("string", "numeric_array"):
            row["avg_len"] = _f(exact[f"{c}__avglen"])
        if kind in ("numeric", "numeric_array") and row["count"] > 0:
            d = got["dds"]
            sk = sketch_from_key_counts(
                np.asarray([t[0] for t in d]), np.asarray([t[1] for t in d]),
                np.asarray([t[2] for t in d]),
                np.asarray([t[3] for t in d], dtype=np.float64),
                np.asarray([t[4] for t in d], dtype=np.float64),
                np.asarray([t[5] for t in d], dtype=np.float64),
                alpha, 4096)
            est = _estimates(sk, quantiles)
            for q in quantiles:
                row[quantile_label(q)] = _f(est[quantile_label(q)])
        rows.append(tuple(row[f.name] for f in schema.fields))

    return df.sparkSession.createDataFrame(rows, schema)


def _f(v):
    return None if v is None else float(v)


def column_correlations(
    df: DataFrame,
    cols: Sequence[str],
) -> DataFrame:
    """Pairwise Pearson correlations between numeric columns, all
    computed in ONE scalar aggregate pass (Catalyst fuses the
    C(n,2) `corr` co-moment aggregates into a single job with map-side
    partials — at 10^12 rows the cost is one scan, KB of state).

    The schema-discovery companion to `profile_table`: which measures
    move together (e.g. quantity vs price before choosing a mixture
    weight or a partition key). Output is long-format (col_a, col_b,
    corr, n_rows) with col_a < col_b, corr rounded to 6 dp and the
    ``-2.0`` sentinel when undefined (a constant column — never NULL
    doubles, oracle-comparator convention). Pairs use Spark's
    ``corr`` (pairwise-complete rows: both sides non-NULL); ``n_rows``
    is the table row count anchor."""
    cols = list(cols)
    if len(cols) < 2:
        raise ValueError(f"need at least 2 columns, got {cols!r}")
    if len(set(cols)) != len(cols):
        raise ValueError(f"duplicate columns in {cols!r}")
    aggs = [F.count(F.lit(1)).alias("_n")]
    pairs = []
    for i, a in enumerate(cols):
        for b in cols[i + 1:]:
            j = len(pairs)
            pairs.append((a, b))
            # pairwise-complete masking: NULL either side excludes the
            # row from ALL three co-moments (Spark's `corr` semantics,
            # but assembled from Welford aggregates + try_divide so a
            # constant column yields NULL instead of ANSI-mode
            # DIVIDE_BY_ZERO)
            m = F.col(a).isNotNull() & F.col(b).isNotNull()
            aa = F.when(m, F.col(a).cast("double"))
            bb = F.when(m, F.col(b).cast("double"))
            aggs += [F.covar_samp(aa, bb).alias(f"_cv{j}"),
                     F.stddev_samp(aa).alias(f"_sa{j}"),
                     F.stddev_samp(bb).alias(f"_sb{j}")]
    wide = df.agg(*aggs)
    rows = []
    for j, (a, b) in enumerate(pairs):
        corr = F.try_divide(F.col(f"_cv{j}"),
                            F.col(f"_sa{j}") * F.col(f"_sb{j}"))
        rows.append(F.struct(F.lit(a).alias("col_a"), F.lit(b).alias("col_b"),
                             F.coalesce(F.round(corr, 6),
                                        F.lit(-2.0)).alias("corr"),
                             F.col("_n").alias("n_rows")))
    return (wide.select(F.explode(F.array(*rows)).alias("_r"))
            .select("_r.col_a", "_r.col_b", "_r.corr", "_r.n_rows")
            .orderBy("col_a", "col_b"))
