"""fsio contract tests — the pieces a local POSIX run cannot exercise by
accident.

Local rename silently overwrites, so ``fs_write_atomic``'s HDFS behavior
(rename REFUSES an existing destination) is simulated with a wrapper
filesystem that enforces HDFS rename semantics over the real local store.
Gate: an existing destination is a complete concurrent winner — the loser
returns False, the winner's bytes survive untouched, and no tmp litter is
left. There is deliberately no overwrite mode (callers that supersede
state use unique filenames + a single commit record — see fsio's module
docstring); a rename failure with NO existing destination re-raises."""

import os

import pytest

from ddsketchy_spark.pipeline import fsio


class _HdfsLikeFS:
    """Delegates to a real pyarrow FileSystem but refuses rename-over, the
    way HDFS (and fsio's atomicity contract) does."""

    def __init__(self, inner):
        self._inner = inner

    def move(self, src, dst):
        from pyarrow import fs as pafs

        if self._inner.get_file_info(dst).type != pafs.FileType.NotFound:
            raise OSError(f"rename destination exists: {dst}")
        return self._inner.move(src, dst)

    def __getattr__(self, name):
        return getattr(self._inner, name)


def test_fs_write_atomic_loser_semantics(tmp_path, monkeypatch):
    real_executor_fs = fsio.executor_fs
    monkeypatch.setattr(
        fsio, "executor_fs",
        lambda path: (lambda fp: (_HdfsLikeFS(fp[0]), fp[1]))(
            real_executor_fs(path)))

    p = str(tmp_path / "blob.bin")
    assert fsio.fs_write_atomic(p, b"winner") is True

    # existing destination is a complete concurrent winner — kept, loser
    # reports False and cleans up after itself
    assert fsio.fs_write_atomic(p, b"loser") is False
    assert fsio.fs_read_bytes(p) == b"winner"
    leftovers = [n for n in os.listdir(tmp_path) if ".tmp-" in n]
    assert leftovers == []


def test_fs_write_atomic_reraises_non_race_failures(tmp_path, monkeypatch):
    """A rename failure with NO file at the destination is a real error
    (permissions, connectivity), not a lost race — it must surface."""
    real_executor_fs = fsio.executor_fs

    class _BrokenRenameFS(_HdfsLikeFS):
        def move(self, src, dst):
            raise OSError("rename RPC failed")

    monkeypatch.setattr(
        fsio, "executor_fs",
        lambda path: (lambda fp: (_BrokenRenameFS(fp[0]), fp[1]))(
            real_executor_fs(path)))
    with pytest.raises(OSError, match="rename RPC failed"):
        fsio.fs_write_atomic(str(tmp_path / "x.bin"), b"data")


def test_fs_stat_matches_os_stat_and_takes_uris(tmp_path):
    p = tmp_path / "f.bin"
    p.write_bytes(b"x" * 1234)
    st = os.stat(p)
    for addr in (str(p), "file://" + str(p)):
        size, mtime_ns = fsio.fs_stat(addr)
        assert size == 1234 == st.st_size
        # pyarrow reports mtime at >= second granularity on local fs
        assert abs(mtime_ns - st.st_mtime_ns) < 2_000_000_000
    with pytest.raises(FileNotFoundError):
        fsio.fs_stat(str(tmp_path / "missing.bin"))


def test_hadoop_exists_driver_side(spark, tmp_path):
    """Driver-side sidecar probes ride the JVM Hadoop FileSystem (sees
    spark.hadoop.*), matching read/write_json_sidecar."""
    d = str(tmp_path / "idx")
    assert fsio.hadoop_exists(spark, f"{d}/_meta.json") is False
    fsio.fs_mkdirs(d)
    fsio.write_json_sidecar(spark, d, "_meta.json", {"v": 1})
    assert fsio.hadoop_exists(spark, f"{d}/_meta.json") is True
    assert fsio.hadoop_exists(spark, "file://" + d + "/_meta.json") is True
