"""Cluster-portable filesystem I/O (never ``os.*``/``open``).

Two layers, one rule — state and sidecar bytes must reach HDFS/S3 the same
way parquet does, so checkpoint/resume is true on a real cluster, not just
on a POSIX mount:

- **Driver-side JSON sidecars** (IVF index, shard manifest, minhash dedup
  index metadata) go through the JVM Hadoop ``FileSystem`` via the Spark
  gateway (``write_json_sidecar``/``read_json_sidecar``): it sees the full
  ``spark.hadoop.*`` configuration (s3a credentials, HDFS HA nameservices)
  for free.
- **Executor-side blobs** (per-partition checkpoint states, streaming
  running state) CANNOT use the gateway — Python workers have no JVM — so
  they go through ``pyarrow.fs`` (``executor_fs``/``fs_write_atomic``/...):
  ``file:/`` and bare paths resolve to the local FS, ``hdfs://`` to libhdfs
  (the Hadoop native client, present on cluster nodes), ``s3://``/``s3a://``
  to Arrow's native S3. Atomicity contract: ``fs_write_atomic`` writes a
  tmp file and renames — atomic on local/HDFS; on S3 the final PUT of the
  copy is atomic per object, which is the strongest S3 offers. There is
  deliberately NO overwrite mode: rename-over is not atomic on HDFS, so
  callers that must supersede earlier state use unique filenames plus a
  single commit record — generation files in ``streaming/stream_agg.py``,
  nonce-suffixed blobs referenced by the manifest in
  ``spark/checkpoint.py`` / ``spark/arrow_scan.py``.
"""

from __future__ import annotations

import json
import time


def _hadoop_path_fs(spark, path: str):
    """Resolve ``path`` through the JVM Hadoop ``FileSystem`` (sees the
    full ``spark.hadoop.*`` configuration). Returns ``(hpath, fs)`` —
    the one shared resolution for every driver-side Hadoop call here."""
    hpath = spark._jvm.org.apache.hadoop.fs.Path(path)
    return hpath, hpath.getFileSystem(spark._jsc.hadoopConfiguration())


def write_json_sidecar(spark, dir_path: str, name: str, obj: dict) -> None:
    """Write ``obj`` as ``<dir_path>/<name>`` (overwriting)."""
    hpath, fs = _hadoop_path_fs(spark, dir_path.rstrip("/") + "/" + name)
    out = fs.create(hpath, True)
    try:
        out.write(bytearray(json.dumps(obj).encode("utf-8")))
    finally:
        out.close()


def read_json_sidecar(spark, dir_path: str, name: str,
                      missing_hint: str = "") -> dict:
    """Read ``<dir_path>/<name>`` as a dict; FileNotFoundError (with
    ``missing_hint`` appended) when absent — a loud signal that the
    directory is not the expected artifact."""
    hpath, fs = _hadoop_path_fs(spark, dir_path.rstrip("/") + "/" + name)
    if not fs.exists(hpath):
        raise FileNotFoundError(
            f"no {name} under {dir_path!r}" +
            (f" — {missing_hint}" if missing_hint else ""))
    stream = fs.open(hpath)
    try:
        raw = spark._jvm.org.apache.commons.io.IOUtils.toString(
            stream, "UTF-8")
    finally:
        stream.close()
    return json.loads(raw)


# ---------------------------------------------------------------------------
# Executor-safe layer (pyarrow.fs) — usable inside mapInArrow/applyInPandas
# workers, where no JVM gateway exists. Deliberately lazy-imports pyarrow.fs
# (tiny module, no pandas pulled in — cf. the CLAUDE.md worker-start note).

def executor_fs(path: str):
    """Resolve ``path`` to ``(pyarrow.fs.FileSystem, fs-local path)``.

    Accepts bare paths (``/tmp/x``), ``file:/`` in any slash count,
    ``hdfs://``, and ``s3://``; Hadoop's ``s3a://``/``s3n://`` spellings are
    mapped to Arrow's ``s3://`` so one URI works from both driver-side
    Hadoop code and executor-side Python."""
    from pyarrow import fs as pafs

    if path.startswith("s3a://") or path.startswith("s3n://"):
        path = "s3://" + path.split("://", 1)[1]
    return pafs.FileSystem.from_uri(path)


def fs_mkdirs(path: str) -> None:
    fs, p = executor_fs(path)
    fs.create_dir(p, recursive=True)


def fs_exists(path: str) -> bool:
    from pyarrow import fs as pafs

    fs, p = executor_fs(path)
    return fs.get_file_info(p).type != pafs.FileType.NotFound


def hadoop_exists(spark, path: str) -> bool:
    """Driver-side existence probe through the JVM Hadoop ``FileSystem`` —
    the counterpart of ``fs_exists`` for DRIVER code, which must see the
    full ``spark.hadoop.*`` configuration (s3a credentials, HDFS HA
    nameservices) the same way ``write_json_sidecar``/``read_json_sidecar``
    do. ``fs_exists`` (pyarrow.fs) is the executor-side fallback and can
    mis-resolve such paths on the driver."""
    hpath, fs = _hadoop_path_fs(spark, path)
    return bool(fs.exists(hpath))


def hadoop_rename(spark, src: str, dst: str) -> bool:
    """Driver-side rename through the JVM Hadoop ``FileSystem`` — the
    commit primitive for directory swaps (atomic on HDFS; on object
    stores a copy+delete the maintenance-window contract covers).
    Returns the FileSystem's own success flag."""
    spath, fs = _hadoop_path_fs(spark, src)
    dpath = spark._jvm.org.apache.hadoop.fs.Path(dst)
    return bool(fs.rename(spath, dpath))


def hadoop_delete(spark, path: str, recursive: bool = True) -> bool:
    """Driver-side recursive delete through the JVM Hadoop FileSystem.
    Returns False when the path did not exist."""
    hpath, fs = _hadoop_path_fs(spark, path)
    if not fs.exists(hpath):
        return False
    return bool(fs.delete(hpath, recursive))


def fs_stat(path: str) -> tuple[int, int]:
    """``(size_bytes, mtime_ns)`` of ``path`` via ``pyarrow.fs`` —
    scheme-portable replacement for ``os.stat`` in executor code (file
    identity for checkpoint lineage). Raises FileNotFoundError when
    absent. ``mtime_ns`` is 0 on stores that report no mtime."""
    from pyarrow import fs as pafs

    fs, p = executor_fs(path)
    info = fs.get_file_info(p)
    if info.type == pafs.FileType.NotFound:
        raise FileNotFoundError(path)
    mtime_ns = info.mtime_ns if info.mtime_ns is not None else 0
    return int(info.size), int(mtime_ns)


def fs_read_bytes(path: str) -> bytes:
    fs, p = executor_fs(path)
    with fs.open_input_stream(p) as f:
        return f.read()


def fs_write_atomic(path: str, data: bytes) -> bool:
    """Write ``data`` to ``path`` via tmp-file + rename. Returns True if
    this call produced the file, False if a concurrent writer (another task
    attempt) won the race — in which case the winner's complete file is
    left untouched. Never leaves a truncated file at ``path``, and never
    deletes a committed file.

    There is deliberately no overwrite mode (rename-over is not atomic on
    HDFS, and delete-then-rename can destroy a racing winner's commit):
    callers that must supersede earlier state write unique filenames and
    flip a single commit record — see the module docstring."""
    fs, p = executor_fs(path)
    tmp = f"{p}.tmp-{time.time_ns()}"
    with fs.open_output_stream(tmp) as f:
        f.write(data)
    try:
        fs.move(tmp, p)
        return True
    except OSError:
        # HDFS rename refuses an existing destination: a concurrent
        # attempt committed first and its file is complete (it, too,
        # renamed). Anything else is a real error — re-raise it.
        if not fs_exists(path):
            raise
        fs.delete_file(tmp)
        return False


def fs_list_names(path: str) -> list[str]:
    """Base names of the files directly under ``path`` (sorted), [] when the
    directory does not exist."""
    from pyarrow import fs as pafs

    fs, p = executor_fs(path)
    try:
        infos = fs.get_file_info(pafs.FileSelector(p, recursive=False))
    except (FileNotFoundError, OSError):
        return []
    return sorted(i.base_name for i in infos
                  if i.type == pafs.FileType.File)


def fs_delete_file(path: str) -> None:
    fs, p = executor_fs(path)
    fs.delete_file(p)
