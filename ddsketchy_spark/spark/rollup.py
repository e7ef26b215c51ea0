"""Incremental sketch rollups: persistent per-key states folded forward.

The operational pattern a 100 TB pipeline actually runs: a per-key sketch
table (e.g. token-length distributions per source, distinct users per day)
is kept as parquet state blobs and UPDATED incrementally as new data
arrives — never rebuilt from scratch. Because every sketch here merges
associatively and order-independently, folding yesterday's states with
today's partials is exact: N incremental updates produce bit-identical
estimates to one build over the union of all data.

Layout: ``<root>/v=<n>/`` snapshot directories (immutable once written,
each with Spark's ``_SUCCESS`` marker) + the highest complete version wins.
Writers write a NEW snapshot and never touch old ones — concurrent readers
always see a complete version; failed writers leave no visible state.
"""

from __future__ import annotations

import os
import re
from typing import Sequence

from pyspark.sql import DataFrame, SparkSession

from .agg import SketchAggregator, build_partials, merge_grouped

_VERSION_RE = re.compile(r"^v=(\d+)$")


def latest_version(root: str) -> int:
    """Highest complete snapshot version under root, or -1 if none."""
    if not os.path.isdir(root):
        return -1
    best = -1
    for name in os.listdir(root):
        m = _VERSION_RE.match(name)
        if m and os.path.exists(os.path.join(root, name, "_SUCCESS")):
            best = max(best, int(m.group(1)))
    return best


def _snapshot_dir(root: str, version: int) -> str:
    return os.path.join(root, f"v={version}")


def read_rollup_states(spark: SparkSession, root: str) -> DataFrame | None:
    """The latest snapshot's (by..., state) rows, or None if no snapshot."""
    v = latest_version(root)
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
    with the previous snapshot's states (KB-sized blobs), merged per key,
    and written as the next immutable snapshot."""
    by = list(by)
    partials = build_partials(new_data, agg, by)
    prev = read_rollup_states(spark, root)
    if prev is not None:
        partials = partials.unionByName(prev.select(*by, "state"))
    merged = merge_grouped(partials, agg, by, fanout=fanout, keep_state=True)
    next_v = latest_version(root) + 1
    out = merged.select(*by, "state")
    out.write.mode("overwrite").parquet(_snapshot_dir(root, next_v))
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
