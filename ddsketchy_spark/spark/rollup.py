"""Incremental sketch rollups: persistent per-key states folded forward.

The operational pattern a 100 TB pipeline actually runs: a per-key sketch
table (e.g. token-length distributions per source, distinct users per day)
is kept as parquet state blobs and UPDATED incrementally as new data
arrives — never rebuilt from scratch. One pass over the new rows only;
the previous snapshot contributes KB-sized blobs.

Exactness: HLL, CMS, Bloom, Theta, and uncollapsed DDSketch merges are
associative and order-independent, so N incremental updates are
BIT-IDENTICAL to a one-shot build over all data. t-digest/KLL (and a
DDSketch whose store collapsed) are deterministic given the same update
sequence but their compaction depends on the fold tree — incremental and
one-shot builds agree within the sketch's error bound, not bitwise.

Layout: ``<root>/v=<n>/`` snapshot directories (immutable once written,
each complete when Spark's ``_SUCCESS`` marker exists; the highest
complete version wins). Writers write a NEW snapshot and never touch old
ones — readers always see a complete version; a failed writer leaves no
visible state. Single-writer per rollup root is assumed (two concurrent
writers could mint the same version; serialize updates per root).

Paths go through Hadoop's FileSystem API, so local, HDFS, and s3a:// roots
all work.
"""

from __future__ import annotations

import re
from typing import Sequence

from pyspark.sql import DataFrame, SparkSession

from .agg import SketchAggregator, build_partials, merge_grouped

_VERSION_RE = re.compile(r"^v=(\d+)$")


def _fs_and_path(spark: SparkSession, path: str):
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs, hpath, jvm


def latest_version(spark: SparkSession, root: str) -> int:
    """Highest complete snapshot version under root, or -1 if none."""
    fs, hpath, jvm = _fs_and_path(spark, root)
    if not fs.exists(hpath):
        return -1
    best = -1
    for status in fs.listStatus(hpath):
        name = status.getPath().getName()
        m = _VERSION_RE.match(name)
        if m and fs.exists(jvm.org.apache.hadoop.fs.Path(status.getPath(), "_SUCCESS")):
            best = max(best, int(m.group(1)))
    return best


def _snapshot_dir(root: str, version: int) -> str:
    return f"{root.rstrip('/')}/v={version}"


def read_rollup_states(spark: SparkSession, root: str) -> DataFrame | None:
    """The latest snapshot's (by..., state) rows, or None if no snapshot."""
    v = latest_version(spark, root)
    if v < 0:
        return None
    return spark.read.parquet(_snapshot_dir(root, v))


def update_rollup(
    spark: SparkSession,
    root: str,
    new_data: DataFrame,
    agg: SketchAggregator,
    by: Sequence[str],
    fanout: int = 64,
) -> int:
    """Fold ``new_data`` into the rollup; returns the new snapshot version.

    One pass over the NEW data only: per-partition partials are unioned
    with the previous snapshot's states, merged per key STATE-ONLY (no
    estimator work for millions of keys whose estimates would be
    discarded), and written as the next immutable snapshot. The version is
    derived from the snapshot actually read, so one update is internally
    consistent even if the listing changes underneath."""
    by = list(by)
    prev_v = latest_version(spark, root)
    partials = build_partials(new_data, agg, by)
    if prev_v >= 0:
        prev = spark.read.parquet(_snapshot_dir(root, prev_v))
        partials = partials.unionByName(prev.select(*by, "state"))
    merged = merge_grouped(partials, agg, by, fanout=fanout, states_only=True)
    next_v = prev_v + 1
    merged.write.mode("overwrite").parquet(_snapshot_dir(root, next_v))
    return next_v


def read_rollup(
    spark: SparkSession,
    root: str,
    agg: SketchAggregator,
    by: Sequence[str],
) -> DataFrame | None:
    """Estimator outputs (finalize columns) for every key in the latest
    snapshot."""
    states = read_rollup_states(spark, root)
    if states is None:
        return None
    # a snapshot has exactly one state per key; merge_grouped degenerates
    # to per-key finalize
    return merge_grouped(states, agg, list(by))


def read_rollup_version(spark: SparkSession, root: str,
                        version: int) -> DataFrame:
    """A SPECIFIC snapshot's (by..., state) rows; FileNotFoundError when
    that version does not exist or is incomplete (no ``_SUCCESS``)."""
    fs, _, jvm = _fs_and_path(spark, root)
    snap = _snapshot_dir(root, version)
    if not fs.exists(jvm.org.apache.hadoop.fs.Path(snap + "/_SUCCESS")):
        raise FileNotFoundError(
            f"no complete rollup snapshot v={version} under {root!r}")
    return spark.read.parquet(snap)


def rollup_drift(
    spark: SparkSession,
    root: str,
    agg: SketchAggregator,
    by: Sequence[str],
    v_old: int | None = None,
    v_new: int | None = None,
) -> DataFrame:
    """Per-key estimate drift between two rollup snapshots — the corpus
    health check between crawls (did a source's token-length p99 move?
    did a key's volume spike?), computed WITHOUT rescanning any data:
    both sides are the snapshots' KB-scale state blobs, finalized exactly
    as ``read_rollup`` would report each version.

    ``v_new`` defaults to the latest complete version, ``v_old`` to
    ``v_new - 1``. Output: by..., ``status`` ('added' = key only in new,
    'removed' = only in old — impossible for snapshots of one rollup
    lineage, kept for cross-root comparisons and corruption visibility,
    'both' otherwise), then for every finalize column c of ``agg``:
    ``c_old``, ``c_new``, and (numeric c) ``delta_c = c_new - c_old``
    (NULL when either side is missing).

    Scale shape: reads two state tables (one KB-scale blob per key), one
    per-key finalize pass each, one key-only full-outer join — no data
    rescans, no row shuffles beyond O(keys)."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import NumericType

    by = list(by)
    if v_new is None:
        v_new = latest_version(spark, root)
        if v_new < 0:
            raise FileNotFoundError(f"no rollup snapshots under {root!r}")
    if v_old is None:
        v_old = v_new - 1
    if v_old < 0:
        raise ValueError(
            f"v_old={v_old}: need two snapshots to drift (update the "
            "rollup at least twice)")
    if v_old == v_new:
        raise ValueError("v_old == v_new — nothing to compare")
    fields = agg.output_fields()
    sides = {}
    for tag, v in (("old", v_old), ("new", v_new)):
        est = merge_grouped(read_rollup_version(spark, root, v), agg, by)
        sides[tag] = est.select(
            *by, *[F.col(f.name).alias(f"{f.name}_{tag}") for f in fields],
            F.lit(True).alias(f"_in_{tag}"))
    j = (sides["old"].join(sides["new"], by, "full_outer") if by
         else sides["old"].crossJoin(sides["new"]))
    status = (F.when(F.col("_in_old").isNull(), F.lit("added"))
              .when(F.col("_in_new").isNull(), F.lit("removed"))
              .otherwise(F.lit("both")))
    cols = [F.col(c) for c in by] + [status.alias("status")]
    for f in fields:
        cols += [F.col(f"{f.name}_old"), F.col(f"{f.name}_new")]
        # every numeric finalize column gets a delta — NumericType covers
        # Decimal/Short/Byte outputs of custom aggregators too
        if isinstance(f.dataType, NumericType):
            cols.append((F.col(f"{f.name}_new") - F.col(f"{f.name}_old"))
                        .alias(f"delta_{f.name}"))
    return j.select(*cols)


def theta_rollup_overlap(
    spark: SparkSession,
    root: str,
    agg,
    by: Sequence[str],
    v_old: int | None = None,
    v_new: int | None = None,
    other_root: str | None = None,
) -> DataFrame:
    """Per-key SET overlap between two Theta-sketch rollup snapshots —
    "how many of this crawl's distinct items did we already have?" —
    from the snapshots' state blobs alone (Theta set algebra: union /
    intersect / a-not-b are closed on the states, so no data rescan).

    ``agg`` must be a ``ThetaAggregator`` (its states are the only ones
    with set algebra). ``v_new`` defaults to the latest version of
    ``root``; the old side reads ``other_root`` (cross-lineage
    comparison, e.g. two crawls rolled up separately) when given, else
    ``root`` at ``v_old`` (default ``v_new - 1``). Output per key:
    ``est_old``/``est_new``/``est_union``/``est_intersection``/
    ``est_new_only`` (the genuinely new items) / ``jaccard``, plus
    ``exact_mode`` — TRUE when every sketch involved never trimmed
    (retained < k), in which case all five estimates are EXACT distinct
    counts. Keys missing on one side are treated as the empty set.

    Scale shape: two state-table reads, one key-only full-outer join,
    one vectorized pass decoding two KB-scale blobs per key."""
    import pyarrow as pa

    from pyspark.sql import functions as F
    from pyspark.sql.types import (
        BooleanType, DoubleType, StructField, StructType)

    from ..core.theta import ThetaSketch
    from .agg import to_arrow_schema
    from .companions import ThetaAggregator

    if not isinstance(agg, ThetaAggregator):
        # fail driver-side with the real reason — any other aggregator's
        # blobs would only die executor-side inside ThetaSketch.from_bytes
        # with an opaque deserialization error
        raise TypeError(
            f"theta_rollup_overlap needs a ThetaAggregator (its states are "
            f"the only ones with set algebra), got {type(agg).__name__}")
    by = list(by)
    if v_new is None:
        v_new = latest_version(spark, root)
        if v_new < 0:
            raise FileNotFoundError(f"no rollup snapshots under {root!r}")
    old_root = other_root or root
    if v_old is None:
        v_old = (latest_version(spark, old_root) if other_root
                 else v_new - 1)
    if v_old < 0:
        raise ValueError(
            f"v_old={v_old}: need two snapshots to overlap (update the "
            "rollup at least twice, or pass other_root)")
    if other_root is None and v_old == v_new:
        raise ValueError("v_old == v_new — nothing to compare")
    old = (read_rollup_version(spark, old_root, v_old)
           .select(*by, F.col("state").alias("_s_old")))
    new = (read_rollup_version(spark, root, v_new)
           .select(*by, F.col("state").alias("_s_new")))
    j = old.join(new, by, "full_outer") if by else old.crossJoin(new)

    key_fields = [f for f in j.schema.fields if f.name in by]
    out_schema = StructType(key_fields + [
        StructField("est_old", DoubleType()),
        StructField("est_new", DoubleType()),
        StructField("est_union", DoubleType()),
        StructField("est_intersection", DoubleType()),
        StructField("est_new_only", DoubleType()),
        StructField("jaccard", DoubleType()),
        StructField("exact_mode", BooleanType()),
    ])
    out_arrow = to_arrow_schema(out_schema)
    k, seed, hk = agg.k, agg.seed, agg.hash_kind
    in_cols = list(j.columns)  # the DataFrame itself must not be captured

    def overlap(batches):
        for batch in batches:
            n = batch.num_rows
            if not n:
                continue
            olds = batch.column(len(by)).to_pylist()
            news = batch.column(len(by) + 1).to_pylist()
            cols: dict[str, list] = {f.name: [] for f in out_schema.fields}
            for i in range(n):
                a = (ThetaSketch.from_bytes(olds[i]) if olds[i] is not None
                     else ThetaSketch(k, seed, hk))
                b = (ThetaSketch.from_bytes(news[i]) if news[i] is not None
                     else ThetaSketch(k, seed, hk))
                union = ThetaSketch(k, seed, hk).merge(a).merge(b)
                inter = a.intersect(b)
                new_only = b.a_not_b(a)
                u = union.estimate()
                cols["est_old"].append(a.estimate())
                cols["est_new"].append(b.estimate())
                cols["est_union"].append(u)
                cols["est_intersection"].append(inter.estimate())
                cols["est_new_only"].append(new_only.estimate())
                cols["jaccard"].append(
                    inter.estimate() / u if u > 0 else 0.0)
                cols["exact_mode"].append(
                    not (a.is_estimation_mode() or b.is_estimation_mode()
                         or union.is_estimation_mode()))
            for kf in key_fields:
                cols[kf.name] = batch.column(
                    in_cols.index(kf.name)).to_pylist()
            yield pa.RecordBatch.from_arrays(
                [pa.array(cols[f.name], type=out_arrow.field(f.name).type)
                 for f in out_schema.fields],
                schema=out_arrow)

    return j.mapInArrow(overlap, out_schema)
