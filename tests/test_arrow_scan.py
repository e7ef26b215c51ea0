"""pyarrow-direct parquet scan engine tests.

Gate: ``sketch_aggregate_parquet`` (workers read row groups with pyarrow,
bypassing the JVM Arrow writer) must produce bit-identical estimates to the
JVM-scan arrow engine and to a local single-sketch build, for global and
grouped paths, scalar and token-array columns."""

import numpy as np
import pyarrow.parquet as pq
import pytest

from ddsketchy_spark import DDSketch
from ddsketchy_spark.data.synth import read_tokens
from ddsketchy_spark.spark.agg import sketch_aggregate
from ddsketchy_spark.spark.arrow_scan import (
    build_partials_direct,
    parquet_splits,
    sketch_aggregate_parquet,
)
from ddsketchy_spark.spark.ddsketch_agg import DDSketchAggregator, quantile_label

QS = [0.5, 0.9, 0.99, 0.999]


def test_parquet_splits_cover_all_row_groups(token_table_path):
    splits = parquet_splits(token_table_path)
    assert len(splits) >= 4  # 20k rows / 5k rows_per_file -> >=4 files
    total = sum(
        pq.ParquetFile(f).metadata.row_group(rg).num_rows for f, rg in splits
    )
    assert total == 20_000


def test_direct_global_matches_local_bitwise(spark, token_table_path):
    agg = DDSketchAggregator("n_tok", quantiles=QS)
    res = sketch_aggregate_parquet(spark, token_table_path, agg)

    tbl = pq.read_table(token_table_path, columns=["n_tok"])
    local = DDSketch(0.01)
    local.add_batch(tbl.column("n_tok").to_numpy().astype(np.float64))

    assert res["count"] == local.count == 20_000
    for q in QS:
        assert res[quantile_label(q)] == local.quantile(q), q
    assert res["mean"] == pytest.approx(local.mean, rel=1e-12)


def test_direct_matches_jvm_scan_engine(spark, token_table_path):
    """Same estimates whether the values crossed the JVM Arrow writer or
    were read by pyarrow in the worker (tokens array column)."""
    agg = DDSketchAggregator("tokens", quantiles=QS)
    direct = sketch_aggregate_parquet(spark, token_table_path, agg)
    jvm = sketch_aggregate(read_tokens(spark, token_table_path), agg)
    assert direct["count"] == jvm["count"]
    for q in QS:
        assert direct[quantile_label(q)] == jvm[quantile_label(q)], q
    assert direct["sum"] == pytest.approx(jvm["sum"], rel=1e-12)


def test_direct_grouped_matches_jvm_scan(spark, token_table_path):
    agg = DDSketchAggregator("n_tok", quantiles=QS)
    direct = {
        r["source"]: r
        for r in sketch_aggregate_parquet(
            spark, token_table_path, agg, by=["source"]
        ).collect()
    }
    jvm = {
        r["source"]: r
        for r in sketch_aggregate(
            read_tokens(spark, token_table_path), agg, by=["source"]
        ).collect()
    }
    assert set(direct) == set(jvm) and len(direct) >= 2
    for src, row in direct.items():
        assert row["count"] == jvm[src]["count"]
        for q in QS:
            assert row[quantile_label(q)] == jvm[src][quantile_label(q)], (src, q)


def test_direct_empty_input(spark, tmp_path):
    agg = DDSketchAggregator("n_tok")
    empty = str(tmp_path / "empty")
    import os

    os.makedirs(empty, exist_ok=True)
    with pytest.raises(FileNotFoundError):
        sketch_aggregate_parquet(spark, empty, agg)


def test_direct_partials_shape(spark, token_table_path):
    agg = DDSketchAggregator("n_tok")
    partials = build_partials_direct(spark, token_table_path, agg, by=["source"])
    assert [f.name for f in partials.schema.fields] == ["source", "state"]
    n_splits = len(parquet_splits(token_table_path))
    # at most one state row per (split x key)
    n_sources = (
        read_tokens(spark, token_table_path).select("source").distinct().count()
    )
    assert partials.count() <= n_splits * n_sources


def test_direct_checkpoint_resume(spark, token_table_path, tmp_path):
    """Split-level resume: delete a few split manifests, re-run, and get
    bit-identical estimates with only the missing splits recomputed."""
    import glob
    import json
    import os

    from ddsketchy_spark.spark.arrow_scan import sketch_aggregate_parquet

    ckpt = str(tmp_path / "direct_ckpt")
    agg = DDSketchAggregator("n_tok", quantiles=QS)
    first = sketch_aggregate_parquet(spark, token_table_path, agg, ckpt_dir=ckpt)
    manifests = sorted(glob.glob(os.path.join(ckpt, "*.json")))
    assert len(manifests) == len(parquet_splits(token_table_path))
    total_rows = sum(json.load(open(m))["rows"] for m in manifests)
    assert total_rows == 20_000

    # simulate a killed job: drop 3 completed splits (blob + manifest)
    kept_times = {}
    for m in manifests[:3]:
        blob = json.load(open(m))["blob"]
        os.remove(os.path.join(ckpt, blob))
        os.remove(m)
    for m in manifests[3:]:
        kept_times[m] = json.load(open(m))["completed_at"]

    second = sketch_aggregate_parquet(spark, token_table_path, agg, ckpt_dir=ckpt)
    for q in QS:
        assert second[quantile_label(q)] == first[quantile_label(q)], q
    assert second["count"] == first["count"]
    # untouched splits were NOT recomputed (manifest timestamps unchanged)
    for m, t in kept_times.items():
        assert json.load(open(m))["completed_at"] == t, m
    # dropped splits were rebuilt
    assert len(glob.glob(os.path.join(ckpt, "*.json"))) == len(manifests)


def test_direct_checkpoint_file_uri(spark, token_table_path, tmp_path):
    """The direct-scan checkpoint goes through fsio (pyarrow.fs), not
    os.*/open(): drive it with a ``file:`` URI — which POSIX calls would
    reject as a literal path — and resume from it."""
    import json

    from ddsketchy_spark.pipeline import fsio
    from ddsketchy_spark.spark.arrow_scan import sketch_aggregate_parquet

    ckpt = "file://" + str(tmp_path / "direct_ckpt_uri")
    agg = DDSketchAggregator("n_tok", quantiles=QS)
    first = sketch_aggregate_parquet(spark, token_table_path, agg, ckpt_dir=ckpt)
    names = fsio.fs_list_names(ckpt)
    manifests = [n for n in names if n.endswith(".json")]
    assert len(manifests) == len(parquet_splits(token_table_path))
    times = {m: json.loads(fsio.fs_read_bytes(ckpt + "/" + m))["completed_at"]
             for m in manifests}

    # resume: every split reused (timestamps unchanged), estimates identical
    second = sketch_aggregate_parquet(spark, token_table_path, agg, ckpt_dir=ckpt)
    for q in QS:
        assert second[quantile_label(q)] == first[quantile_label(q)], q
    assert second["count"] == first["count"]
    for m, t in times.items():
        assert json.loads(
            fsio.fs_read_bytes(ckpt + "/" + m))["completed_at"] == t, m


def test_direct_checkpoint_uri_input_combo(spark, token_table_path, tmp_path):
    """URI INPUT combined with a checkpoint dir — the split-identity stat
    must resolve through pyarrow.fs (``os.stat('file://...')`` crashes), so
    this is the one combination the separate URI-input and URI-ckpt tests
    missed. Estimates match the plain run; resume reuses every split."""
    import json

    from ddsketchy_spark.pipeline import fsio
    from ddsketchy_spark.spark.arrow_scan import sketch_aggregate_parquet

    uri = "file://" + token_table_path
    ckpt = "file://" + str(tmp_path / "uri_combo_ckpt")
    agg = DDSketchAggregator("n_tok", quantiles=QS)
    first = sketch_aggregate_parquet(spark, uri, agg, ckpt_dir=ckpt)
    plain = sketch_aggregate_parquet(spark, token_table_path, agg)
    assert first == plain
    manifests = [n for n in fsio.fs_list_names(ckpt) if n.endswith(".json")]
    assert len(manifests) == len(parquet_splits(token_table_path))
    times = {m: json.loads(fsio.fs_read_bytes(ckpt + "/" + m))["completed_at"]
             for m in manifests}
    second = sketch_aggregate_parquet(spark, uri, agg, ckpt_dir=ckpt)
    assert second == first
    for m, t in times.items():  # resume reused every split
        assert json.loads(
            fsio.fs_read_bytes(ckpt + "/" + m))["completed_at"] == t, m


def test_direct_scan_uri_input(spark, token_table_path):
    """The direct scan itself accepts scheme URIs end to end: listing,
    splits, and worker-side opens all resolve through pyarrow.fs when the
    INPUT table is addressed as ``file://`` (the SAME pyarrow.fs branch
    hdfs:// and s3:// take, scheme prefix kept on every name) — estimates
    match the plain-path run exactly."""
    from ddsketchy_spark.spark.arrow_scan import (
        parquet_files, sketch_aggregate_parquet)

    uri = "file://" + token_table_path
    plain_files = parquet_files(token_table_path)
    uri_files = parquet_files(uri)
    assert plain_files and uri_files == ["file://" + f for f in plain_files]

    agg = DDSketchAggregator("n_tok", quantiles=QS)
    via_uri = sketch_aggregate_parquet(spark, uri, agg)
    via_path = sketch_aggregate_parquet(spark, token_table_path, agg)
    assert via_uri == via_path
