"""Sketch-guided range partitioning: balanced ranges on SKEWED columns.

``repartitionByRange`` samples the input per run — boundaries drift
between jobs, so two pipeline runs (or an incremental append) disagree
about which range a row belongs to. This module computes range
boundaries ONCE from a mergeable quantile sketch (the package's own
derandomized KLL / t-digest — one map-side pass, blob merge, no raw-row
shuffle) and assigns ranges with a pure-codegen comparison chain, so:

- boundaries are DETERMINISTIC for a given input (KLL's merge is
  order-independent — ``test_kll_nway_merge_order_independent``), and
  can be persisted/reused so later increments shard consistently;
- ranges are quantile-balanced even when the column is skewed (the
  equal-width alternative in ``shards.write_training_shards``
  collapses under skew: a Zipf-ish token-count column puts almost
  everything in range 0);
- per-range row counts are within the sketch's rank error of n/m
  (k=200 -> ~1.5-2% of n empirically, see test_kll_accuracy), modulo
  point masses: a value occupying >1/m of the distribution collapses
  adjacent boundaries and its whole mass lands in one range — the same
  behavior any rank-based splitter has on that input.

Scale shape: ONE aggregate over (col) to build the sketch (map-side
partials, driver merges O(k)-sized blobs), then a projection — no
shuffle, no window, no Python on the assignment path. The comparison
chain is O(m) per row inside whole-stage codegen; above ~2k ranges
compile cost and per-row work argue for two-level sharding instead
(quantile ranges over a coarse split, hash within) — enforced loudly.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, functions as F

_MAX_RANGES = 2048


def sketch_range_boundaries(
    df: DataFrame,
    col: str,
    n_ranges: int,
    sketch: str = "kll",
    k: int = 200,
) -> list[float]:
    """The ``n_ranges - 1`` interior quantile boundaries of ``df[col]``,
    estimated with one mergeable-sketch pass (``sketch`` = "kll" |
    "tdigest"; ``k`` = KLL parameter / t-digest delta). NULL rows are
    excluded (they get a NULL range id downstream). Boundaries are
    strictly increasing — quantile ties (heavy point masses) are
    collapsed, so fewer than ``n_ranges`` effective ranges can come
    back; callers treat the list's length + 1 as the true range count."""
    if not 1 <= n_ranges <= _MAX_RANGES:
        raise ValueError(
            f"n_ranges must be in [1, {_MAX_RANGES}], got {n_ranges} — "
            "above that, compose a coarse quantile split with hash "
            "sharding inside each range")
    if n_ranges == 1:
        return []
    from ..spark.agg import sketch_aggregate

    if sketch == "kll":
        from ..core.kll import KLLSketch
        from ..spark.companions import KLLAggregator

        agg = KLLAggregator(col, k=k, quantiles=())
        codec = KLLSketch.from_bytes
    elif sketch == "tdigest":
        from ..core.tdigest import TDigest
        from ..spark.companions import TDigestAggregator

        agg = TDigestAggregator(col, delta=float(k), quantiles=())
        codec = TDigest.from_bytes
    else:
        raise ValueError(f"unknown sketch {sketch!r} (kll|tdigest)")
    res = sketch_aggregate(df.select(col).where(F.col(col).isNotNull()),
                           agg, keep_state=True)
    if not res["count"]:
        return []
    sk = codec(res["state"])
    qs = [i / n_ranges for i in range(1, n_ranges)]
    bounds: list[float] = []
    for q in qs:
        b = float(sk.quantile(q))
        if not bounds or b > bounds[-1]:
            bounds.append(b)
    return bounds


def assign_range_id(df: DataFrame, col: str, boundaries: list[float],
                    out_col: str = "range_id") -> DataFrame:
    """Add ``out_col`` = the index of the range ``col`` falls in under
    ``boundaries`` (range i = [b_{i-1}, b_i); i in [0, len(boundaries)]).
    NULL values get a NULL range id — callers that cannot tolerate that
    (sinks) reject NULLs loudly themselves.

    The assignment is a sum of ``col >= boundary`` comparisons over the
    literal boundary list — one whole-stage-codegen projection, no HOF
    (an ``aggregate(array, ...)`` lambda would evaluate interpreted per
    element — the documented trap), no join, no Python."""
    if list(boundaries) != sorted(set(float(b) for b in boundaries)):
        raise ValueError("boundaries must be strictly increasing")
    if len(boundaries) >= _MAX_RANGES:
        raise ValueError(f"too many boundaries ({len(boundaries)})")
    if not boundaries:
        rid = F.lit(0)
    else:
        rid = reduce(
            lambda a, b: a + b,
            [(F.col(col) >= F.lit(float(b))).cast("int")
             for b in boundaries])
    return df.withColumn(
        out_col,
        F.when(F.col(col).isNull(), F.lit(None).cast("int"))
        .otherwise(rid))
