"""Balanced training-shard sink: the last hop of a data pipeline.

A trainer wants the cleaned/mixed/packed corpus as N equal-ish shard
files it can assign to data-loader workers — deterministic membership
(re-running the pipeline reproduces shard contents bit-for-bit), exactly
one data file per shard (loaders seek by file, not by row group), and a
machine-readable manifest.

Three sharding modes:

- ``mode="hash"`` (default): ``shard = pmod(xxhash64(id, seed), n)`` —
  deterministic, balanced for free, membership independent of every other
  row (appends/filters never reshuffle survivors between shards).
- ``mode="range"``: contiguous ranges of ``range_col`` (e.g.
  ``pack_sequences``' ``start_seq`` so shard i holds sequences
  ``[i*W, (i+1)*W)`` — what a sequential loader wants). Boundaries are
  computed from the column's min/max in one tiny aggregate —
  deterministic, unlike ``repartitionByRange``'s sampled boundaries —
  so balance assumes ``range_col`` is roughly uniform, which fixed-length
  packed sequences guarantee.
- ``mode="quantile_range"``: contiguous ranges with QUANTILE boundaries
  from a mergeable KLL sketch (``partition.sketch_range_boundaries``) —
  balanced even on a skewed ``range_col``, still deterministic, and the
  boundaries land in the manifest (pass them back via ``boundaries=`` so
  a later increment shards consistently with the original run).

Scale shape: one projection + one shuffle into exactly ``n_shards``
partitions (every row moves once — the unavoidable cost of "one file per
shard"), an optional within-partition sort for reproducible file bytes,
and a metadata-only manifest written through Hadoop's FileSystem API
(local/HDFS/s3a). Size ``n_shards`` so a shard fits a task (~a few
hundred MB of parquet); at 100 TB that is tens of thousands of shards,
which is exactly what the trainer's loader pool wants.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession, functions as F

_MANIFEST = "_shards_meta.json"


def _assign_shard(df: DataFrame, n_shards: int, id_col: str, mode: str,
                  range_col: str | None, seed: int,
                  boundaries: list[float] | None = None) -> DataFrame:
    if mode == "quantile_range":
        if not range_col:
            raise ValueError("mode='quantile_range' requires range_col")
        from .partition import assign_range_id

        return assign_range_id(df, range_col, boundaries or [],
                               out_col="shard")
    if mode == "hash":
        return df.withColumn(
            "shard", F.pmod(F.xxhash64(F.col(id_col).cast("string"),
                                       F.lit(int(seed))),
                            F.lit(n_shards)).cast("int"))
    if mode == "range":
        if not range_col:
            raise ValueError("mode='range' requires range_col")
        bounds = df.agg(F.min(range_col).cast("double").alias("_lo"),
                        F.max(range_col).cast("double").alias("_hi"))
        # deterministic equal-width bins over [lo, hi]; the +1 keeps the
        # max row inside the last shard
        return (df.crossJoin(F.broadcast(bounds))
                .withColumn(
                    "shard",
                    F.least(
                        F.lit(n_shards - 1),
                        F.floor((F.col(range_col).cast("double")
                                 - F.col("_lo"))
                                * n_shards
                                / (F.col("_hi") - F.col("_lo") + 1)))
                    .cast("int"))
                .drop("_lo", "_hi"))
    raise ValueError(f"unknown mode {mode!r} (hash|range)")


def write_training_shards(
    df: DataFrame,
    path: str,
    n_shards: int,
    id_col: str = "doc_id",
    mode: str = "hash",
    range_col: str | None = None,
    sort_within: list[str] | None = None,
    seed: int = 0,
    write_mode: str = "overwrite",
    boundaries: list[float] | None = None,
    shuffle_seed: int | None = None,
) -> dict:
    """Write ``df`` as ``n_shards`` deterministic shards under ``path``
    (``shard=<i>/part-*.parquet``, exactly one data file per shard) plus a
    ``_shards_meta.json`` manifest; returns the manifest dict.

    Module docstring has the three sharding laws. ``sort_within`` orders
    rows inside each shard file (reproducible bytes; defaults to
    ``[id_col]``). Rows with a NULL ``id_col`` (hash) / ``range_col``
    (range modes) are rejected loudly rather than silently dropped — a
    sink must not lose rows. ``boundaries`` (quantile_range only)
    overrides the sketch pass with explicit boundaries — the consistency
    handle for incremental appends; quantile ties can collapse
    boundaries, so fewer than ``n_shards`` shard dirs may appear.

    ``shuffle_seed`` replaces ``sort_within`` with a seeded deterministic
    within-shard SHUFFLE (the md5 unit-uniform of ``id_col``, tie-broken
    by ``id_col``) — training-order randomization that reproduces
    byte-for-byte under the same seed. The two orderings are mutually
    exclusive; passing both raises rather than silently ignoring one."""
    if n_shards <= 0:
        raise ValueError(f"n_shards must be positive, got {n_shards}")
    if shuffle_seed is not None and sort_within is not None:
        raise ValueError(
            "sort_within and shuffle_seed are mutually exclusive orderings "
            "(a seeded shuffle IS the within-shard order); pass one")
    key = range_col if mode in ("range", "quantile_range") else id_col
    if mode == "quantile_range":
        if not range_col:
            raise ValueError("mode='quantile_range' requires range_col")
        if boundaries is None:
            from .partition import sketch_range_boundaries

            boundaries = sketch_range_boundaries(df, range_col, n_shards)
    out = _assign_shard(df, n_shards, id_col, mode, range_col, seed,
                        boundaries)
    out = out.withColumn(
        "shard",
        F.when(F.col(key).isNull(),
               F.raise_error(F.lit(f"write_training_shards: NULL {key} — "
                                   "shard membership undefined; filter or "
                                   "fill ids first")))
        .otherwise(F.col("shard")))
    # hash-repartition ON the shard column: every row of a given shard
    # lands in the same task (collisions may co-locate two shards in one
    # task — harmless), so partitionBy writes exactly one file per shard
    out = out.repartition(n_shards, "shard")
    # the partitioned write REQUIRES ordering by the partition column and
    # silently re-sorts (discarding any other order) when it isn't the
    # ordering prefix — so 'shard' must LEAD the within-partition sort
    # for sort_within/shuffle order to actually reach the file bytes
    if shuffle_seed is not None:
        from .mix import unit_uniform

        out = out.sortWithinPartitions(
            "shard", unit_uniform(F.col(id_col), shuffle_seed),
            F.col(id_col))
    else:
        out = out.sortWithinPartitions("shard", *(sort_within or [id_col]))
    out.write.partitionBy("shard").mode(write_mode).parquet(path)

    spark = df.sparkSession
    jvm = spark._jvm
    root = jvm.org.apache.hadoop.fs.Path(path)
    fs = root.getFileSystem(spark._jsc.hadoopConfiguration())
    shards = []
    for status in fs.listStatus(root):
        name = status.getPath().getName()
        if not name.startswith("shard="):
            continue
        files = [s for s in fs.listStatus(status.getPath())
                 if s.getPath().getName().endswith(".parquet")]
        shards.append({"shard": int(name.split("=", 1)[1]),
                       "n_files": len(files),
                       "bytes": int(sum(s.getLen() for s in files))})
    shards.sort(key=lambda s: s["shard"])
    manifest = {
        "format_version": 1,
        "n_shards": int(n_shards),
        "mode": mode,
        "id_col": id_col,
        "range_col": range_col,
        "seed": int(seed),
        "sort_within": (list(sort_within or [id_col])
                        if shuffle_seed is None
                        else [f"md5_shuffle(seed={shuffle_seed})", id_col]),
        "shuffle_seed": (int(shuffle_seed)
                         if shuffle_seed is not None else None),
        "columns": [c for c in df.columns],
        "boundaries": ([float(b) for b in boundaries]
                       if boundaries is not None else None),
        "shards": shards,
    }
    mpath = jvm.org.apache.hadoop.fs.Path(path.rstrip("/") + "/" + _MANIFEST)
    stream = fs.create(mpath, True)
    try:
        stream.write(bytearray(json.dumps(manifest).encode("utf-8")))
    finally:
        stream.close()
    return manifest


def read_training_shards(
    spark: SparkSession,
    path: str,
    shards: list[int] | None = None,
) -> tuple[DataFrame, dict]:
    """Read a ``write_training_shards`` artifact; ``shards`` selects a
    subset with genuine partition pruning (a loader worker reads only its
    own files). Returns (frame, manifest)."""
    jvm = spark._jvm
    mpath = jvm.org.apache.hadoop.fs.Path(path.rstrip("/") + "/" + _MANIFEST)
    fs = mpath.getFileSystem(spark._jsc.hadoopConfiguration())
    if not fs.exists(mpath):
        raise FileNotFoundError(
            f"no {_MANIFEST} under {path!r} — not a write_training_shards "
            "artifact")
    stream = fs.open(mpath)
    try:
        raw = jvm.org.apache.commons.io.IOUtils.toString(stream, "UTF-8")
    finally:
        stream.close()
    manifest = json.loads(raw)
    df = spark.read.parquet(path)
    if shards is not None:
        df = df.where(F.col("shard").isin([int(s) for s in shards]))
    return df, manifest
