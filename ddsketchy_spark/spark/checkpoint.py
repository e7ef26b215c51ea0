"""Checkpointed sketch aggregation: per-partition state blobs + lineage,
resumable stage-1.

Mirrors the reference's serialize -> restore -> continue lifecycle
(`/root/reference/src/serde_tests.rs:166-218`) at the job level:

- Stage 1 writes one nonce-suffixed state blob per input partition to
  the checkpoint dir plus a JSON lineage manifest (partition id, blob
  filename, rows consumed, a deterministic input checksum, build
  seconds, blob bytes, attempt timestamp).
- The MANIFEST rename is the single commit point: the blob's filename
  is unique per attempt and recorded IN the manifest, so a committed
  manifest can only ever pair with the exact blob its own attempt
  wrote — concurrent or zombie attempts (even with different lineage
  over a nondeterministic upstream) can never persist a mixed
  blob/manifest pair, and a crash between the two writes leaves only
  an unreferenced orphan blob that no resume will read. Writes are
  ATOMIC (tmp file + rename), so a killed job never leaves a truncated
  file; rerunning skips partitions whose manifest is already present
  and recomputes only the missing ones — the executor checks before
  consuming its input iterator, so skipped partitions do almost no I/O
  (the columnar scan is lazy).
- The merge stage reads blobs from the checkpoint dir, so a resumed job
  produces estimates bit-identical to an uninterrupted run (merge order
  independence makes the recompute/reuse mix irrelevant).

The checkpoint dir is any Hadoop-addressable URI — ``/local/path``,
``file:/...``, ``hdfs://...``, ``s3://``/``s3a://...`` — all I/O (executor
blob writes included) goes through the cluster-portable filesystem layer in
``pipeline/fsio.py`` (pyarrow.fs), never ``os.*``. Resume assumes the SAME
input split layout (same files, same partitioning) — the lineage checksum
verifies this per partition when validate=True.
"""

from __future__ import annotations

import json
import time
from typing import Iterator

import numpy as np
import pyarrow as pa

from pyspark import TaskContext
from pyspark.sql import DataFrame

from ..pipeline import fsio
from .agg import SketchAggregator, merge_global


def _manifest_path(ckpt_dir: str, pid: int) -> str:
    return ckpt_dir.rstrip("/") + f"/part-{pid:05d}.json"


def _attempt_nonce() -> str:
    """Unique-per-attempt blob suffix: task attempt id when running under
    Spark (unique across all attempts of all tasks in an app) plus a
    timestamp (unique across app restarts)."""
    ctx = TaskContext.get()
    aid = ctx.taskAttemptId() if ctx is not None else 0
    return f"{aid}-{time.time_ns():x}"


def committed_blob(ckpt_dir: str, manifest: dict, legacy_name: str,
                   what: str) -> bytes:
    """The blob a committed manifest references (``blob`` filename;
    pre-r5 manifests fall back to ``legacy_name``). A missing blob means
    the directory was externally modified — fail loudly. The single
    commit-record resolution shared by the partition checkpoint (here)
    and the direct-scan per-split checkpoint (``arrow_scan``), so the
    manifest protocol cannot diverge between the two flavors."""
    bname = manifest.get("blob", legacy_name)
    bpath = ckpt_dir.rstrip("/") + "/" + bname
    if not fsio.fs_exists(bpath):
        raise RuntimeError(
            f"checkpoint corrupted for {what}: manifest present "
            f"but its blob {bname!r} is missing; delete {ckpt_dir} to "
            "rebuild")
    return fsio.fs_read_bytes(bpath)


def _committed_blob(ckpt_dir: str, manifest: dict, pid: int) -> bytes:
    return committed_blob(ckpt_dir, manifest, f"part-{pid:05d}.bin",
                          f"partition {pid}")


def build_partials_checkpointed(
    df: DataFrame,
    agg: SketchAggregator,
    ckpt_dir: str,
    validate: bool = False,
) -> DataFrame:
    """Stage 1 with per-partition checkpoint/resume. Returns the partial-
    states DataFrame (one row per partition), identical to
    ``build_partials(df, agg)`` but persistent."""
    fsio.fs_mkdirs(ckpt_dir)
    pruned = df.select(*agg.value_cols)
    schema = "state binary"

    def build(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        ctx = TaskContext.get()
        pid = ctx.partitionId() if ctx is not None else 0
        mpath = _manifest_path(ckpt_dir, pid)
        if fsio.fs_exists(mpath):
            # resume: reuse the completed partition's state without
            # consuming (decoding) the input. The manifest is the commit
            # record; it names the exact blob its attempt wrote.
            manifest = json.loads(fsio.fs_read_bytes(mpath))
            blob = _committed_blob(ckpt_dir, manifest, pid)
            if not validate:
                yield pa.RecordBatch.from_arrays(
                    [pa.array([blob], type=pa.binary())], names=["state"])
                return
            # validate path falls through to recompute the checksum only
            state = None
            rows = 0
            checksum = 0
            for batch in batches:
                rows += len(batch)
                checksum = (checksum + int(_batch_checksum(batch))) % (1 << 61)
            if rows != manifest["rows"] or checksum != manifest["checksum"]:
                raise RuntimeError(
                    f"checkpoint lineage mismatch for partition {pid}: "
                    f"input changed since checkpoint (rows {rows} vs "
                    f"{manifest['rows']}); delete {ckpt_dir} to rebuild"
                )
            yield pa.RecordBatch.from_arrays(
                [pa.array([blob], type=pa.binary())], names=["state"])
            return

        t0 = time.perf_counter()
        state = agg.make()
        rows = 0
        checksum = 0
        for batch in batches:
            rows += len(batch)
            checksum = (checksum + int(_batch_checksum(batch))) % (1 << 61)
            agg.add_arrow(state, pa.Table.from_batches([batch]))
        blob = agg.state_bytes(state)
        # blob first (unique nonce name — rename cannot collide), then
        # the manifest naming it: the manifest rename is the single
        # commit point. Losing the manifest race means another attempt
        # committed a complete (blob, manifest) pair of its own — adopt
        # the winner's blob and drop ours, so what this task yields is
        # exactly what a later resume will serve.
        bname = f"part-{pid:05d}-{_attempt_nonce()}.bin"
        fsio.fs_write_atomic(ckpt_dir.rstrip("/") + "/" + bname, blob)
        manifest = {
            "partition": pid,
            "blob": bname,
            "rows": rows,
            "checksum": checksum,
            "blob_bytes": len(blob),
            "build_seconds": round(time.perf_counter() - t0, 4),
            "completed_at": time.time(),
            "recomputed": True,
        }
        if not fsio.fs_write_atomic(mpath, json.dumps(manifest).encode()):
            try:
                fsio.fs_delete_file(ckpt_dir.rstrip("/") + "/" + bname)
            except OSError:
                pass
            winner = json.loads(fsio.fs_read_bytes(mpath))
            blob = _committed_blob(ckpt_dir, winner, pid)
        yield pa.RecordBatch.from_arrays(
            [pa.array([blob], type=pa.binary())], names=["state"])

    return pruned.mapInArrow(build, schema)


def _batch_checksum(batch: pa.RecordBatch) -> int:
    """Deterministic per-batch input fingerprint (cheap, column-order
    sensitive)."""
    h = 0
    for col in batch.columns:
        for b in col.buffers():
            if b is not None:
                a = np.frombuffer(b, dtype=np.uint8)
                # sample large buffers: first/last 4 KB + length
                if len(a) > 8192:
                    a = np.concatenate([a[:4096], a[-4096:]])
                h = (h * 1000003 + int(a.astype(np.uint64).sum()) + len(b)) % (1 << 61)
    return h


def checkpointed_sketch_aggregate(
    df: DataFrame,
    agg: SketchAggregator,
    ckpt_dir: str,
    fanout: int = 64,
    validate: bool = False,
) -> dict:
    """Global two-phase aggregation with stage-1 checkpoint/resume."""
    partials = build_partials_checkpointed(df, agg, ckpt_dir, validate=validate)
    blob = merge_global(partials, agg, fanout=fanout)
    out = agg.finalize(blob)
    out["state"] = blob
    return out


def load_metrics(ckpt_dir: str) -> list[dict]:
    """All partition lineage manifests, ordered by partition id."""
    out = []
    for f in fsio.fs_list_names(ckpt_dir):
        if f.endswith(".json"):
            out.append(json.loads(fsio.fs_read_bytes(
                ckpt_dir.rstrip("/") + "/" + f)))
    return out


def checkpoint_summary(ckpt_dir: str) -> dict:
    ms = load_metrics(ckpt_dir)
    return {
        "partitions": len(ms),
        "rows": sum(m["rows"] for m in ms),
        "blob_bytes": sum(m["blob_bytes"] for m in ms),
        "build_seconds_total": round(sum(m["build_seconds"] for m in ms), 3),
    }
