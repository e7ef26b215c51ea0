"""JSON sidecar I/O through Hadoop's FileSystem API.

Index/sink artifacts in this package (IVF index, shard manifest, minhash
dedup index) carry their driver-side metadata in an underscore-prefixed
JSON file INSIDE the artifact directory: the underscore keeps Spark's
parquet reader from treating it as data, and going through Hadoop's
FileSystem (never ``os.*``/``open``) makes the same code work for
local paths, HDFS, and s3a:// — the CLAUDE.md filesystem rule.
"""

from __future__ import annotations

import json


def write_json_sidecar(spark, dir_path: str, name: str, obj: dict) -> None:
    """Write ``obj`` as ``<dir_path>/<name>`` (overwriting)."""
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(dir_path.rstrip("/") + "/" + name)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
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
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(dir_path.rstrip("/") + "/" + name)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    if not fs.exists(hpath):
        raise FileNotFoundError(
            f"no {name} under {dir_path!r}" +
            (f" — {missing_hint}" if missing_hint else ""))
    stream = fs.open(hpath)
    try:
        raw = jvm.org.apache.commons.io.IOUtils.toString(stream, "UTF-8")
    finally:
        stream.close()
    return json.loads(raw)
