"""pyarrow-direct parquet scan for Python-side sketch builds.

Why this exists: Spark's JVM->Python Arrow bridge (``ArrowWriter``)
serializes ``array<T>`` columns element-by-element, so a ``mapInArrow``
sketch build over a ``tokens:array<int32>`` column is IPC-bound (~4 M
tokens/s on 32 cores here). This module keeps the *scheduling* in Spark —
each task owns a set of parquet row-group splits — but reads the column
data with pyarrow **inside the Python worker**, skipping the JVM writer
entirely (~7x measured: 27+ M tokens/s on the same input and cores).

This is the same split-ownership pattern a distributed scan uses at 100 TB:
one (file, row_group) split per task unit, size-balanced bin-packing into
tasks, column pruning pushed to the parquet reader. It applies to any
``SketchAggregator`` (DDSketch, t-digest, KLL, ...), i.e. exactly the
sketches whose state SQL cannot express and that therefore cannot use the
native JVM engine.

Distributed lifecycle mirror of the reference's build->merge->query
(`/root/reference/src/datadog_reference_tests.rs:362-400`).
"""

from __future__ import annotations

import glob
import os
from typing import Sequence

import pyarrow as pa
import pyarrow.parquet as pq

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

from .agg import (
    DEFAULT_FANOUT,
    SketchAggregator,
    build_state_batches,
    merge_global,
    merge_grouped,
    partial_arrow_schema,
)

SPLIT_SCHEMA = StructType(
    [StructField("file", StringType()), StructField("rg", IntegerType())]
)


def _is_hidden(path: str, root: str) -> bool:
    """True if ANY path component below root is hidden/staging ('_'/'.'
    prefixed) — same rule as Spark's file index, so _temporary attempt
    files from a crashed write are never double-counted."""
    rel = os.path.relpath(path, root) if root else path
    return any(part.startswith(("_", ".")) for part in rel.split(os.sep))


def _open_parquet(fname: str) -> pq.ParquetFile:
    """Open a parquet file by plain path or scheme URI (hdfs://, s3://,
    file:/) — the portable twin of ``pq.ParquetFile(local_path)``, via the
    same ``pyarrow.fs`` resolution the checkpoint blobs use (fsio)."""
    if "://" not in fname:
        return pq.ParquetFile(fname)
    from ..pipeline.fsio import executor_fs

    fs, p = executor_fs(fname)
    return pq.ParquetFile(fs.open_input_file(p))


def parquet_files(path: str) -> list[str]:
    """Parquet data files under ``path`` (a directory, file, or — local
    only — a glob). Scheme URIs (``hdfs://``, ``s3://``/``s3a://``,
    ``file:/``) list through ``pyarrow.fs`` with the same hidden-file
    rule, and the returned names keep their scheme so the worker-side
    opens resolve the same filesystem."""
    if "://" in path:
        # one code path for EVERY scheme URI (file:// included, so the
        # remote branch is exercised by local tests): list via pyarrow.fs,
        # keep the scheme+authority on the returned names
        from pyarrow import fs as pafs

        from ..pipeline.fsio import executor_fs

        base = path.rstrip("/")
        fs, root = executor_fs(base)
        # URI prefix that maps an fs-local path back to a full URI with
        # its authority intact (hdfs://nn:8020/data -> root '/data',
        # prefix 'hdfs://nn:8020'; s3://bucket/k -> root 'bucket/k',
        # prefix 's3://')
        prefix = (base[:-len(root)] if root and base.endswith(root)
                  else base.split("://", 1)[0] + "://")
        info = fs.get_file_info(root)
        if info.type == pafs.FileType.File:
            return [path]
        sel = pafs.FileSelector(root, recursive=True)
        files = sorted(
            f.path for f in fs.get_file_info(sel)
            if f.type == pafs.FileType.File and f.path.endswith(".parquet"))
        return [prefix + f for f in files
                if not any(part.startswith(("_", "."))
                           for part in f[len(root):].split("/"))]
    if path.startswith("file:"):  # file:/x (no //) — normalize to a path
        path = "/" + path.split(":", 1)[1].lstrip("/")
    if os.path.isdir(path):
        files = sorted(glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True))
        return [f for f in files if not _is_hidden(f, path)]
    if os.path.isfile(path):
        files = [path]
    else:
        files = sorted(glob.glob(path))
    return [f for f in files if not os.path.basename(f).startswith(("_", "."))]


def parquet_splits(path: str) -> list[tuple[str, int]]:
    """One (file, row_group_index) split per row group.

    Row groups are the natural split unit: independently readable,
    column-pruned at the reader, and written at a bounded size
    (~128 MB default), so each split is one task's worth of work no
    matter how large the table is."""
    splits: list[tuple[str, int]] = []
    for f in parquet_files(path):
        md = _open_parquet(f).metadata
        splits.extend((f, rg) for rg in range(md.num_row_groups))
    return splits


def _arrow_schema_for(path: str, columns: Sequence[str]) -> pa.Schema:
    files = parquet_files(path)
    if not files:
        raise FileNotFoundError(f"no parquet files under {path!r}")
    full = _open_parquet(files[0]).schema_arrow
    return pa.schema([full.field(c) for c in columns])


def build_partials_direct(
    spark: SparkSession,
    path: str,
    agg: SketchAggregator,
    by: Sequence[str] | None = None,
) -> DataFrame:
    """Partial-state DataFrame (same shape as ``agg.build_partials``) built
    by reading parquet row groups with pyarrow inside the workers."""
    from pyspark.sql.pandas.types import from_arrow_type

    by = list(by or [])
    needed = by + [c for c in agg.value_cols if c not in by]
    in_arrow = _arrow_schema_for(path, needed)
    state_schema = partial_arrow_schema(in_arrow, by)
    out_schema = StructType(
        [StructField(k, from_arrow_type(in_arrow.field(k).type)) for k in by]
        + [StructField("state", BinaryType())]
    )

    splits = parquet_splits(path)
    if not splits:
        return spark.createDataFrame([], out_schema)
    sdf = spark.createDataFrame(splits, schema=SPLIT_SCHEMA).repartition(len(splits))

    def build(batches):
        def scan():
            open_file: tuple[str, pq.ParquetFile] | None = None
            for b in batches:
                for frow, rgrow in zip(b.column(0), b.column(1)):
                    fname = frow.as_py()
                    # reuse the handle for consecutive splits of one file:
                    # re-opening re-parses the footer (a round trip on
                    # object storage) once per row group otherwise
                    if open_file is None or open_file[0] != fname:
                        open_file = (fname, _open_parquet(fname))
                    tbl = open_file[1].read_row_group(rgrow.as_py(), columns=list(needed))
                    yield from tbl.to_batches()

        yield from build_state_batches(scan(), agg, by, state_schema)

    return sdf.mapInArrow(build, out_schema)


def build_partials_direct_checkpointed(
    spark: SparkSession,
    path: str,
    agg: SketchAggregator,
    ckpt_dir: str,
) -> DataFrame:
    """Direct scan with SPLIT-level checkpoint/resume: one state blob +
    lineage manifest per parquet row group.

    The checkpoint key is the (file, row_group) split itself — not the
    Spark partition id — so a resumed job reuses completed splits under ANY
    task placement or parallelism, and the manifest records exactly which
    physical input each blob covers (file, row group, rows, bytes, build
    seconds). Completed splits are never re-read; a restarted 100 TB job
    pays only for the splits it had not finished. Global aggregation-level
    analogue of the reference's serialize -> restore -> continue lifecycle
    (`/root/reference/src/serde_tests.rs:166-218`)."""
    import hashlib
    import json
    import time

    from ..pipeline import fsio

    fsio.fs_mkdirs(ckpt_dir)
    needed = list(agg.value_cols)
    out_schema = StructType([StructField("state", BinaryType())])

    splits = parquet_splits(path)
    if not splits:
        return spark.createDataFrame([], out_schema)
    sdf = spark.createDataFrame(splits, schema=SPLIT_SCHEMA).repartition(len(splits))

    # lineage fingerprints: a resumed run must be reading the SAME bytes
    # with the SAME aggregator config, else reuse silently yields wrong
    # estimates. File identity = size+mtime (cheap, no data read on skip);
    # agg identity = class + public config attrs.
    agg_fp = hashlib.sha1(repr(
        (type(agg).__name__,
         sorted((k, repr(v)) for k, v in vars(agg).items()
                if not k.startswith("_")))).encode()).hexdigest()[:16]

    def split_key(fname: str, rg: int) -> str:
        digest = hashlib.sha1(fname.encode()).hexdigest()[:10]
        return f"{os.path.basename(fname)}-{digest}-rg{rg:05d}"

    def build(batches):
        open_file: tuple[str, pq.ParquetFile] | None = None
        for b in batches:
            for frow, rgrow in zip(b.column(0), b.column(1)):
                fname, rg = frow.as_py(), rgrow.as_py()
                # scheme-portable stat: parquet_splits may hand back
                # hdfs://, s3://, or file:// URIs — os.stat would crash
                size, mtime_ns = fsio.fs_stat(fname)
                file_id = [size, mtime_ns]
                key = split_key(fname, rg)
                mpath = ckpt_dir.rstrip("/") + "/" + key + ".json"

                def resolved_blob(manifest: dict) -> bytes:
                    # split-specific lineage check, then the shared
                    # commit-record resolution (checkpoint.committed_blob
                    # — one protocol for both checkpoint flavors)
                    if manifest.get("agg_fp") != agg_fp or \
                            manifest.get("file_id") != file_id:
                        raise RuntimeError(
                            f"checkpoint lineage mismatch for split {key}: "
                            f"input file or aggregator config changed since "
                            f"the checkpoint; delete {ckpt_dir} to rebuild")
                    from .checkpoint import committed_blob

                    return committed_blob(ckpt_dir, manifest, key + ".bin",
                                          f"split {key}")

                if fsio.fs_exists(mpath):
                    blob = resolved_blob(json.loads(fsio.fs_read_bytes(mpath)))
                else:
                    t0 = time.perf_counter()
                    if open_file is None or open_file[0] != fname:
                        open_file = (fname, _open_parquet(fname))
                    st = agg.make()
                    tbl = open_file[1].read_row_group(rg, columns=needed)
                    agg.add_arrow(st, tbl)
                    blob = agg.state_bytes(st)
                    # unique-nonce blob first, then the manifest naming
                    # it: the manifest rename is the single commit point
                    # (same protocol as spark/checkpoint.py — a mixed
                    # blob/manifest pairing is unrepresentable). Losing
                    # the manifest race adopts the winner's pair.
                    bname = f"{key}-{time.time_ns():x}.bin"
                    fsio.fs_write_atomic(
                        ckpt_dir.rstrip("/") + "/" + bname, blob)
                    manifest = {
                        "file": fname, "row_group": rg, "file_id": file_id,
                        "agg_fp": agg_fp, "blob": bname,
                        "rows": tbl.num_rows, "input_bytes": tbl.nbytes,
                        "blob_bytes": len(blob),
                        "build_seconds": round(time.perf_counter() - t0, 4),
                        "completed_at": time.time(),
                    }
                    if not fsio.fs_write_atomic(
                            mpath, json.dumps(manifest).encode()):
                        try:
                            fsio.fs_delete_file(
                                ckpt_dir.rstrip("/") + "/" + bname)
                        except OSError:
                            pass
                        blob = resolved_blob(
                            json.loads(fsio.fs_read_bytes(mpath)))
                yield pa.RecordBatch.from_arrays(
                    [pa.array([blob], type=pa.binary())], names=["state"])

    return sdf.mapInArrow(build, out_schema)


def sketch_aggregate_parquet(
    spark: SparkSession,
    path: str,
    agg: SketchAggregator,
    by: Sequence[str] | None = None,
    merge_rounds: int = 1,
    fanout: int = DEFAULT_FANOUT,
    keep_state: bool = False,
    ckpt_dir: str | None = None,
):
    """Two-phase sketch aggregation straight off parquet files.

    Same contract as ``agg.sketch_aggregate`` (grouped -> DataFrame,
    global -> finalize() dict) but phase 1 scans with pyarrow in the
    workers — use for raw-parquet hot paths where the input needs no
    pre-transformation in Spark. Pass ``ckpt_dir`` for split-level
    checkpoint/resume (global aggregation only)."""
    if ckpt_dir is not None:
        if by:
            raise ValueError("ckpt_dir is supported for global aggregation only")
        partials = build_partials_direct_checkpointed(spark, path, agg, ckpt_dir)
    else:
        partials = build_partials_direct(spark, path, agg, by)
    if by:
        return merge_grouped(
            partials, agg, list(by), merge_rounds=merge_rounds, fanout=fanout,
            keep_state=keep_state,
        )
    blob = merge_global(partials, agg, fanout=fanout)
    out = agg.finalize(blob)
    if keep_state:
        out["state"] = blob
    return out
