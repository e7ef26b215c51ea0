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
