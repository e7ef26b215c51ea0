"""Johnson-Lindenstrauss projection: exact engine==NumPy parity, the
distance-preservation statistic, passthrough/NULL/ragged contracts, and
composition with PQ."""

import numpy as np
import pytest

from ddsketchy_spark.pipeline.similarity import (
    jl_project_rows, jl_projection, reduce_dim)


def _vecs(spark, A, extra=True):
    rows = []
    for i in range(len(A)):
        rows.append((i, [float(x) for x in A[i]], "s%d" % (i % 3)))
    if extra:
        rows.append((len(A), None, "s0"))
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, src string")


def test_reduce_dim_exact_numpy_parity_and_passthrough(spark):
    rng = np.random.default_rng(31)
    A = rng.normal(size=(120, 24))
    df = _vecs(spark, A).repartition(5)
    out = reduce_dim(df, out_dim=8, in_dim=24, seed=7).collect()
    R = jl_projection(24, 8, seed=7)
    want = jl_project_rows(A, R)
    # the fixed-order kernel IS X @ R (to fp noise)
    np.testing.assert_allclose(want, A @ R, rtol=1e-12)
    assert len(out) == 120  # NULL vec dropped
    for r in out:
        np.testing.assert_array_equal(
            np.array(r["embedding"]), want[r["vec_id"]])
        assert r["src"] == "s%d" % (r["vec_id"] % 3)  # passthrough intact


def test_reduce_dim_partitioning_invariant(spark):
    rng = np.random.default_rng(32)
    A = rng.normal(size=(80, 16))
    a = {r["vec_id"]: tuple(r["embedding"]) for r in
         reduce_dim(_vecs(spark, A, extra=False).coalesce(1),
                    4, 16, seed=1).collect()}
    b = {r["vec_id"]: tuple(r["embedding"]) for r in
         reduce_dim(_vecs(spark, A, extra=False).repartition(7),
                    4, 16, seed=1).collect()}
    assert a == b


def test_jl_distance_preservation_statistic():
    """The law reduce_dim implements: with out_dim = 32 from 64, pairwise
    squared distances distort by small relative amounts on average."""
    rng = np.random.default_rng(33)
    A = rng.normal(size=(200, 64))
    Y = A @ jl_projection(64, 32, seed=0)
    d_a = ((A[:, None, :] - A[None, :, :]) ** 2).sum(-1)
    d_y = ((Y[:, None, :] - Y[None, :, :]) ** 2).sum(-1)
    iu = np.triu_indices(200, 1)
    ratio = d_y[iu] / d_a[iu]
    assert abs(ratio.mean() - 1.0) < 0.05
    assert np.quantile(np.abs(ratio - 1.0), 0.95) < 0.6


def test_reduce_dim_feeds_pq(spark):
    from ddsketchy_spark.pipeline.pq import pq_encode, train_pq_codebooks

    rng = np.random.default_rng(34)
    A = rng.normal(size=(300, 64))
    red = reduce_dim(_vecs(spark, A, extra=False), 16, 64, seed=2)
    books = train_pq_codebooks(red, m=4, nbits=4, train_rows=200)
    codes = pq_encode(red, books).collect()
    assert len(codes) == 300
    assert all(len(r["codes"]) == 4 for r in codes)


def test_reduce_dim_guards(spark):
    df = _vecs(spark, np.zeros((3, 8)), extra=False)
    with pytest.raises(ValueError, match="must be <= in_dim"):
        reduce_dim(df, 16, 8)
    with pytest.raises(ValueError, match="dims must be"):
        reduce_dim(df, 0, 8)
    with pytest.raises(ValueError, match="no column"):
        reduce_dim(df, 2, 8, vec_col="nope")
    ragged = spark.createDataFrame(
        [(1, [1.0, 2.0]), (2, [1.0, 2.0, 3.0])],
        "vec_id long, embedding array<double>")
    with pytest.raises(Exception, match="ragged or wrong-dim"):
        reduce_dim(ragged, 1, 2).collect()
