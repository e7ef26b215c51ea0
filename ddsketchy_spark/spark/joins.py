"""Sketch-accelerated joins: Bloom-filtered semi-join pre-pass.

The classic 100 TB shuffle cut: before joining a huge fact table against a
smaller key set, probe each fact row against a Bloom filter of the build
side's keys. Rows with no possible match are dropped BEFORE the join
shuffle — at typical selectivities that removes most of the shuffle bytes
for the cost of one broadcast blob (n_bits/8 bytes) and a vectorized probe.

No false negatives (Bloom guarantee) means the filtered inner join returns
exactly the same rows as the unfiltered one; false positives only cost
wasted shuffle, bounded by the configured FPR.

Spark's AQE can inject runtime bloom filters inside ONE query
(``spark.sql.optimizer.runtime.bloomFilter.enabled``); this operator makes
the filter an explicit, REUSABLE artifact — build it once (or load it from
a checkpoint of a previous pipeline stage) and push it into any number of
later jobs, which the optimizer cannot do across queries.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, functions as F

from ..core.bloom import BloomFilter
from .companions import bloom_state

_INTEGRAL_TYPES = ("tinyint", "smallint", "int", "bigint")


def bloom_probe_column(df: DataFrame, key_col: str, blob: bytes):
    """Boolean column: key possibly-in the Bloom filter ``blob``.

    Arrow-batched pandas UDF over a broadcast of the blob; the filter is
    deserialized once per worker (cached closure) and probed with
    vectorized ``contains_batch`` per batch. NULL keys probe False (they
    can never equi-join).

    Integer keys: pandas coerces an int column to float64 whenever a batch
    contains a NULL, which would silently hash the float bit pattern and
    break the no-false-negative guarantee — the probe casts back to int64
    (exact below 2^53) and raises on larger keys rather than miss rows."""
    import pandas as pd

    from pyspark.sql.functions import pandas_udf

    bc = df.sparkSession.sparkContext.broadcast(blob)
    integral = dict(df.dtypes)[key_col] in _INTEGRAL_TYPES
    _cache: dict = {}

    def _probe(keys):
        import numpy as np

        bf = _cache.get("bf")
        if bf is None:
            bf = _cache["bf"] = BloomFilter.from_bytes(bc.value)
        mask = keys.notna().to_numpy()
        out = np.zeros(len(keys), dtype=bool)
        if mask.any():
            vals = keys[mask]
            if integral and vals.dtype.kind == "f":
                # NULL-in-batch coerced int64 -> float64; undo it exactly
                if np.abs(vals.to_numpy()).max() >= 2.0**53:
                    raise ValueError(
                        "integer join key exceeds 2^53 after pandas "
                        "null-coercion to float64; probe would be lossy")
                vals = vals.astype("int64")
            out[mask] = bf.contains_batch(vals.to_numpy())
        return pd.Series(out)

    probe = pandas_udf(_probe, "boolean")
    return probe(F.col(key_col))


def bloom_semi_join(
    large: DataFrame,
    small: DataFrame,
    on: str | Sequence[str],
    fpr: float = 0.01,
    n_bits: int | None = None,
    n_hashes: int = 7,
    blob: bytes | None = None,
) -> DataFrame:
    """INNER ``large JOIN small ON on`` with a Bloom pre-filter on the
    large side.

    ``on`` is a single key column name (string) or [large_col, small_col].
    Result rows are identical to the plain inner join (no false
    negatives); the Bloom pass drops non-matching large-side rows before
    the join shuffle. Pass a prebuilt ``blob`` (e.g. from a checkpoint) to
    skip the build.

    Inner join only: outer/anti joins must keep (or return) the very rows
    the pre-filter exists to drop, so pre-filtering would corrupt them.
    """
    if isinstance(on, str):
        lkey = skey = on
    else:
        lkey, skey = on
    if blob is None:
        if n_bits is None:
            # row count upper-bounds the distinct count; oversizing only
            # lowers the FPR, and count() is one cheap shuffle-free job
            n_keys = small.count()
            n_bits, n_hashes = BloomFilter.params_for_capacity(max(n_keys, 1), fpr)
        out = bloom_state(small, skey, n_bits=n_bits, n_hashes=n_hashes,
                          engine="arrow")
        blob = out["state"]
    filtered = large.where(bloom_probe_column(large, lkey, blob))
    cond = lkey if lkey == skey else (filtered[lkey] == small[skey])
    return filtered.join(small, on=cond, how="inner")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    ts_col: str,
    by: Sequence[str],
    value_cols: Sequence[str],
    how: str = "inner",
    time_buckets: int | None = None,
) -> DataFrame:
    """AS-OF join: each left row picks the LATEST right row with
    ``right.ts <= left.ts`` within the same ``by`` key (backward,
    inclusive) — the time-series join Spark has no native operator for.

    Composition, not a cartesian: tag both sides, union, one shuffle by
    key, and a carry-forward ``last(..., ignorenulls)`` window gives every
    left row the most recent right values. Cost is a single
    sort-within-partitions of |left| + |right| rows — survives any scale
    the window sort survives, with none of the range-join blowup.

    Returns the left rows plus ``value_cols`` from the matched right row
    (NULL when no right row precedes; ``how="inner"`` drops those).

    NULL timestamps never match: right rows with NULL ``ts_col`` are
    dropped (the ``<=`` predicate is unknowable for them), and left rows
    with NULL ``ts_col`` come back unmatched (NULLS FIRST ordering places
    them before every right row in the carry-forward window).

    ``time_buckets``: hot-key escape hatch. The window sort serializes each
    ``by`` key into one task — one dominant key (a user with 10^8 events)
    becomes the straggler. With ``time_buckets=N`` the timeline is split at
    global ts quantiles into N ranges, each (key, range) sorts
    independently in parallel, and a tiny per-(key, range) "carry-in"
    aggregate (the latest right row BEFORE each range) stitches the ranges
    together — same results, max task size ~1/N of the hot key.
    """
    from pyspark.sql import Window

    by = list(by)
    value_cols = list(value_cols)
    if how not in ("inner", "left"):
        raise ValueError(f"how must be 'inner' or 'left', got {how!r}")
    overlap = set(value_cols) & set(left.columns)
    if overlap:
        raise ValueError(f"value_cols collide with left columns: {overlap}")
    for tmp in ("_is_left", "_rv", "_asof", "_matched"):
        if tmp in left.columns or tmp in right.columns:
            raise ValueError(f"reserved column name {tmp!r} present in input")

    # the matched right row travels as ONE struct: non-null whenever a right
    # row precedes (even if every value in it is NULL), and all value_cols
    # come from the SAME row — per-column carries could mix rows or skip a
    # matched row whose value is NULL
    l_tag = left.withColumn("_is_left", F.lit(1)).withColumn(
        "_rv", F.lit(None).cast(
            "struct<" + ",".join(
                f"{c}:{dict(right.dtypes)[c]}" for c in value_cols) + ">"
            if value_cols else "struct<_m:boolean>"))
    r_val = (F.struct(*[F.col(c) for c in value_cols]) if value_cols
             else F.struct(F.lit(True).alias("_m")))
    # NULL join keys never match: drop them from the right side (left NULL-
    # key rows then see no right rows, matching equi-join semantics).
    # NULL timestamps must go too: `right.ts <= left.ts` is unknowable for
    # them, and asc ordering would sort a NULL-ts right row to the partition
    # head where the carry-forward window hands its values to every left row
    # that has no true preceding right row.
    r_src = right.where(F.col(ts_col).isNotNull())
    for k in by:
        r_src = r_src.where(F.col(k).isNotNull())
    r_tag = (r_src.select(*by, ts_col, r_val.alias("_rv"))
             .withColumn("_is_left", F.lit(0)))
    for c in left.columns:
        if c not in r_tag.columns:
            r_tag = r_tag.withColumn(c, F.lit(None).cast(dict(left.dtypes)[c]))
    unioned = l_tag.unionByName(r_tag)

    # right rows sort BEFORE left rows at equal ts => inclusive (<=) match;
    # _rv as the final key makes right-right ts ties deterministic (the
    # greatest value-struct wins)
    order_cols = (F.col(ts_col).asc(), F.col("_is_left").asc(),
                  F.col("_rv").asc_nulls_first())
    if time_buckets is not None and time_buckets > 1:
        # hot-key path: split the timeline at global ts quantiles so each
        # (key, range) sorts independently; stitch with a per-range carry-in
        for tmp in ("_tb", "_bf", "_ci", "_asof_local"):
            if tmp in left.columns or tmp in right.columns:
                raise ValueError(f"reserved column name {tmp!r} present in input")
        # monotone numeric image of the ts column (only ORDER matters for
        # bucketing, and equal values map equal): timestamps cannot cast to
        # double directly in Spark 4 — go through epoch micros/days
        ts_type = dict(unioned.dtypes)[ts_col]
        if ts_type.startswith("timestamp"):
            tsd = F.unix_micros(F.col(ts_col).cast("timestamp")).cast("double")
        elif ts_type == "date":
            tsd = F.unix_date(F.col(ts_col)).cast("double")
        else:
            tsd = F.col(ts_col).cast("double")
        qs = [i / time_buckets for i in range(1, time_buckets)]
        cuts = sorted(set(
            unioned.select(tsd.alias("_tsd")).approxQuantile("_tsd", qs, 0.001)))
        # bucket id = #cuts strictly below ts: monotone in ts, so every right
        # row in an earlier bucket has ts <= (in fact <) any ts here; equal
        # timestamps always share a bucket. NULL ts compares to no cuts ->
        # bucket 0 with no carry-in: unmatched, as documented.
        # Plain when-sums, NOT a higher-order filter(array, lambda): the
        # carry stitch below self-joins frames descending from `unioned`,
        # and DeduplicateRelations does not rewrite attribute references
        # inside HOF lambdas — a lambda here leaves a dangling ts reference
        # that fails binding (INTERNAL_ERROR_ATTRIBUTE_NOT_FOUND) on
        # broadcast-sized plans.
        bucket = F.lit(0).cast("long")
        for c in cuts:
            bucket = bucket + F.when(tsd > F.lit(float(c)), 1).otherwise(0)
        unioned = unioned.withColumn("_tb", bucket)
        w_local = (Window.partitionBy(*by, "_tb")
                   .orderBy(*order_cols)
                   .rowsBetween(Window.unboundedPreceding, Window.currentRow))
        local = unioned.select(
            "*", F.last(F.when(F.col("_is_left") == 0, F.col("_rv")),
                        ignorenulls=True).over(w_local).alias("_asof_local"))
        # latest right row per (key, bucket): max (ts, _rv) struct — the same
        # winner the window ordering picks at equal ts
        finals = (unioned.where(F.col("_is_left") == 0)
                  .groupBy(*by, "_tb")
                  .agg(F.max(F.struct(F.col(ts_col).alias("_t"),
                                      F.col("_rv").alias("_v"))).alias("_bf")))
        spine = unioned.select(*by, "_tb").distinct()
        w_carry = (Window.partitionBy(*by).orderBy("_tb")
                   .rowsBetween(Window.unboundedPreceding, -1))
        carry = (spine.join(finals, [*by, "_tb"], "left")
                 .select(*by, "_tb",
                         F.last("_bf", ignorenulls=True).over(w_carry)
                         .alias("_ci")))
        carried = (local.join(carry, [*by, "_tb"], "left")
                   .withColumn("_asof", F.coalesce(F.col("_asof_local"),
                                                   F.col("_ci._v")))
                   .drop("_asof_local", "_ci", "_tb"))
    else:
        w = (Window.partitionBy(*by)
             .orderBy(*order_cols)
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
        carried = unioned.select(
            "*", F.last(F.when(F.col("_is_left") == 0, F.col("_rv")),
                        ignorenulls=True).over(w).alias("_asof"))
    out = (carried.where(F.col("_is_left") == 1)
           .select(*[c for c in left.columns],
                   F.col("_asof").isNotNull().alias("_matched"),
                   *[F.col(f"_asof.{c}").alias(c) for c in value_cols]))
    if how == "inner":
        out = out.where(F.col("_matched"))
    return out.drop("_matched")


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    lo_col: str,
    hi_col: str,
    by: Sequence[str] | None = None,
    bucket_width: float | None = None,
) -> DataFrame:
    """Range join: pair every point row with every interval row whose
    ``[lo, hi]`` contains it (inclusive), optionally within ``by`` keys.

    A naive theta-join is O(|points| x |intervals|); this decomposes each
    interval into the fixed-width buckets it covers (explode), equi-joins
    points on their single bucket id, then applies the exact containment
    filter — a shuffled hash join whose blowup is bounded by
    interval_span / bucket_width per interval row, independent of table
    sizes. Pick ``bucket_width`` near the median interval span; default is
    estimated from a sample.

    Numeric columns only (cast timestamps to epoch first)."""
    by = list(by or [])
    overlap = (set(points.columns) & set(intervals.columns)) - set(by)
    if overlap:
        raise ValueError(
            f"points and intervals share non-key columns {overlap}; "
            f"rename one side to keep the output unambiguous")
    if "_b" in points.columns or "_b" in intervals.columns:
        raise ValueError("reserved column name '_b' present in input")
    if bucket_width is None:
        # approxQuantile scans the whole table once — an unbiased median,
        # unlike a first-partitions limit() prefix
        spans = intervals.select(
            (F.col(hi_col) - F.col(lo_col)).alias("_s")).where(F.col("_s") >= 0)
        med = spans.approxQuantile("_s", [0.5], 0.01)
        bucket_width = float(med[0]) if med else 1.0
        if bucket_width <= 0.0:
            # point intervals (lo == hi) are common; a near-zero width would
            # make every real-span interval trip the 2^20-bucket guard and
            # floor(point / 1e-9) overflows long for |values| > ~9.2e9.
            # Derive a width from the value RANGE instead: aim for ~2^16
            # buckets across the observed lo..hi extent.
            ext = intervals.select(
                F.min(lo_col).alias("_lo"), F.max(hi_col).alias("_hi")).first()
            span = (float(ext["_hi"]) - float(ext["_lo"])
                    if ext and ext["_lo"] is not None and ext["_hi"] is not None
                    else 0.0)
            if span > 0.0:
                bucket_width = span / float(1 << 16)
            else:
                raise ValueError(
                    "cannot infer bucket_width: sampled median interval span "
                    "is 0 and the lo/hi value range is empty or degenerate; "
                    "pass bucket_width explicitly")
    w = float(bucket_width)

    p = points.withColumn("_b", F.floor(F.col(point_col) / F.lit(w)).cast("long"))
    iv = intervals.where(F.col(lo_col) <= F.col(hi_col))
    lo_b = F.floor(F.col(lo_col) / F.lit(w)).cast("long")
    hi_b = F.floor(F.col(hi_col) / F.lit(w)).cast("long")
    # a single outlier interval spanning millions of buckets would explode
    # the shuffle (or overflow sequence()) — fail loudly with the remedy
    max_buckets = 1 << 20
    guard = F.when(
        hi_b - lo_b >= F.lit(max_buckets),
        F.raise_error(F.concat(
            F.lit("interval spans too many buckets (>2^20) at bucket_width="
                  f"{w!r}: lo="), F.col(lo_col).cast("string"),
            F.lit(" hi="), F.col(hi_col).cast("string"),
            F.lit("; raise bucket_width or split the interval"))),
    ).otherwise(lo_b)
    iv = iv.withColumn("_b", F.explode(F.sequence(guard, hi_b)))
    cond = [p["_b"] == iv["_b"]] + [p[k] == iv[k] for k in by]
    joined = p.join(iv, cond, "inner").where(
        (p[point_col] >= iv[lo_col]) & (p[point_col] <= iv[hi_col]))
    keep_p = [p[c] for c in points.columns]
    keep_iv = [iv[c] for c in intervals.columns if c not in by]
    return joined.select(*keep_p, *keep_iv)
