"""Frequent Directions: certified bound law, mergeability, serialization,
and the Spark aggregation path vs the exact distributed Gram."""

import numpy as np
import pytest

from ddsketchy_spark.core.fd import FrequentDirections
from ddsketchy_spark.spark.matrix import (
    FDAggregator, exact_gram, exact_singular_values)


def _spec_norm_diff(A: np.ndarray, B: np.ndarray) -> float:
    d = A.T @ A - B.T @ B
    return float(np.abs(np.linalg.eigvalsh(d)).max())


def _rand(n, d, seed):
    rng = np.random.default_rng(seed)
    # low-rank + noise: the regime FD is for
    U = rng.normal(size=(n, 4))
    V = rng.normal(size=(4, d))
    return U @ V * 3.0 + rng.normal(size=(n, d)) * 0.3


def test_fd_bound_certificate_and_psd():
    A = _rand(500, 24, 1)
    sk = FrequentDirections(24, ell=16)
    sk.add_batch(A)
    B = sk.sketch_matrix()
    err = _spec_norm_diff(A, B)
    assert err <= sk.cov_error_bound() + 1e-6
    assert sk.cov_error_bound() <= sk.frob_sq / sk.ell + 1e-6
    # A^T A - B^T B is PSD (shrinking only removes mass)
    d = A.T @ A - B.T @ B
    assert np.linalg.eigvalsh(d).min() >= -1e-6
    assert sk.n_rows == 500
    assert sk.frob_sq == pytest.approx(float((A * A).sum()))


def test_fd_singular_value_estimates_within_bound():
    A = _rand(400, 16, 2)
    sk = FrequentDirections(16, ell=12)
    sk.add_batch(A)
    sv_sk = sk.singular_values(6)
    sv_ex = np.linalg.svd(A, compute_uv=False)[:6]
    for i in range(6):
        # Weyl on the PSD difference: sigma_i(A)^2 - delta <= sigma_i(B)^2
        assert sv_sk[i] ** 2 <= sv_ex[i] ** 2 + 1e-6
        assert sv_sk[i] ** 2 >= sv_ex[i] ** 2 - sk.cov_error_bound() - 1e-6


def test_fd_merge_preserves_bound_and_counts():
    A = _rand(600, 20, 3)
    chunks = np.array_split(A, 4)
    parts = []
    for c in chunks:
        s = FrequentDirections(20, ell=14)
        s.add_batch(c)
        parts.append(s)
    acc = FrequentDirections.from_bytes(parts[0].to_bytes())
    for p in parts[1:]:
        acc.merge(p)
    assert acc.n_rows == 600
    assert acc.frob_sq == pytest.approx(sum(p.frob_sq for p in parts))
    assert _spec_norm_diff(A, acc.sketch_matrix()) <= acc.cov_error_bound() + 1e-6
    assert acc.cov_error_bound() <= acc.frob_sq / acc.ell + 1e-6
    # merge in a different tree shape: bound still certified
    acc2 = FrequentDirections(20, ell=14)
    for p in (parts[2], parts[0], parts[3], parts[1]):
        acc2.merge(p)
    assert _spec_norm_diff(A, acc2.sketch_matrix()) <= acc2.cov_error_bound() + 1e-6


def test_fd_serialization_roundtrip_and_determinism():
    A = _rand(300, 12, 4)
    s1 = FrequentDirections(12, ell=8)
    s1.add_batch(A)
    blob = s1.to_bytes()
    s2 = FrequentDirections.from_bytes(blob)
    assert s2.to_bytes() == blob
    assert np.array_equal(s1.sketch_matrix(), s2.sketch_matrix())
    # continue adding after restore == continue on the original
    more = _rand(100, 12, 5)
    s1.add_batch(more)
    s2.add_batch(more)
    assert s1.to_bytes() == s2.to_bytes()
    # same input order -> bit-identical sketch
    s3 = FrequentDirections(12, ell=8)
    s3.add_batch(A)
    s3.add_batch(more)
    assert s3.to_bytes() == s1.to_bytes()


def test_fd_guards():
    sk = FrequentDirections(8, ell=4)
    with pytest.raises(ValueError, match=r"expected \(m, 8\)"):
        sk.add_batch(np.zeros((3, 5)))
    with pytest.raises(ValueError, match="finite"):
        sk.add_batch(np.full((2, 8), np.nan))
    with pytest.raises(ValueError, match="cannot merge"):
        sk.merge(FrequentDirections(8, ell=5))
    with pytest.raises(ValueError, match="cannot merge"):
        sk.merge(FrequentDirections(9, ell=4))
    with pytest.raises(ValueError, match="not a FrequentDirections blob"):
        FrequentDirections.from_bytes(b"XXXXGARBAGE")
    with pytest.raises(ValueError):
        FrequentDirections(0, 4)
    with pytest.raises(ValueError):
        FrequentDirections(4, 0)
    assert FrequentDirections(4, 2).is_empty()


def test_fd_empty_and_small():
    sk = FrequentDirections(6, ell=4)
    assert np.array_equal(sk.singular_values(3), np.zeros(3))
    sk.add_batch(np.eye(6)[:2])
    sv = sk.singular_values(4)
    assert sv[0] == pytest.approx(1.0) and sv[1] == pytest.approx(1.0)
    assert sv[2] == 0.0 and sk.cov_error_bound() == 0.0


# ---------------------------------------------------------------------------
# Spark path
# ---------------------------------------------------------------------------


def _vec_df(spark, A, with_nulls=False):
    rows = [(i, [float(x) for x in A[i]], "g%d" % (i % 2)) for i in range(len(A))]
    if with_nulls:
        rows += [(None, None, "g0"), (len(A) + 1, None, "g1")]
    return spark.createDataFrame(
        rows, "id long, vec array<double>, grp string")


def test_fd_spark_global_matches_certificate(spark):
    from ddsketchy_spark.spark.agg import sketch_aggregate

    A = _rand(800, 16, 7)
    df = _vec_df(spark, A, with_nulls=True).repartition(6)
    agg = FDAggregator("vec", dim=16, ell=12, k_out=5)
    out = sketch_aggregate(df.where("vec is not null"), agg)
    assert out["n_rows"] == 800
    assert out["frob_sq"] == pytest.approx(float((A * A).sum()))
    sv_ex = np.linalg.svd(A, compute_uv=False)[:5]
    for i in range(5):
        assert out[f"sv_{i+1}"] ** 2 <= sv_ex[i] ** 2 + 1e-6
        assert out[f"sv_{i+1}"] ** 2 >= sv_ex[i] ** 2 - out["err_bound"] - 1e-6
    assert out["err_bound"] <= out["frob_sq"] / 12 + 1e-6


def test_fd_spark_single_partition_bit_identical_to_driver(spark):
    from ddsketchy_spark.spark.agg import sketch_aggregate

    A = _rand(200, 8, 8)
    df = _vec_df(spark, A).coalesce(1)
    agg = FDAggregator("vec", dim=8, ell=6, k_out=4)
    out = sketch_aggregate(df, agg)
    ref = FrequentDirections(8, ell=6)
    ref.add_batch(A)
    svs = ref.singular_values(4)
    for i in range(4):
        assert out[f"sv_{i+1}"] == pytest.approx(float(svs[i]), abs=1e-12)
    assert out["err_bound"] == pytest.approx(ref.cov_error_bound(), abs=1e-12)


def test_fd_spark_grouped(spark):
    from ddsketchy_spark.spark.agg import sketch_aggregate

    A = _rand(400, 10, 9)
    df = _vec_df(spark, A).repartition(5)
    agg = FDAggregator("vec", dim=10, ell=8, k_out=3)
    rows = {r["grp"]: r for r in
            sketch_aggregate(df, agg, by=["grp"]).collect()}
    for g in ("g0", "g1"):
        sub = A[[i for i in range(len(A)) if i % 2 == int(g[1])]]
        assert rows[g]["n_rows"] == len(sub)
        sv_ex = np.linalg.svd(sub, compute_uv=False)[:3]
        for i in range(3):
            assert rows[g][f"sv_{i+1}"] ** 2 >= sv_ex[i] ** 2 - rows[g]["err_bound"] - 1e-6
            assert rows[g][f"sv_{i+1}"] ** 2 <= sv_ex[i] ** 2 + 1e-6


def test_exact_gram_distributed(spark):
    A = _rand(300, 12, 10)
    df = _vec_df(spark, A, with_nulls=True).repartition(7)
    g, n = exact_gram(df, "vec", 12)
    assert n == 300
    np.testing.assert_allclose(g, A.T @ A, rtol=1e-10)
    sv = exact_singular_values(g, 4)
    np.testing.assert_allclose(
        sv, np.linalg.svd(A, compute_uv=False)[:4], rtol=1e-8)


def test_fd_through_rollup_and_drift(spark, tmp_path):
    """FDAggregator rides the generic rollup harness: two snapshot
    updates fold forward, read_rollup's spectrum obeys the certificate
    against the exact union Gram, and rollup_drift emits delta_sv_*
    columns for the spectral drift report."""
    from ddsketchy_spark.spark.rollup import (
        read_rollup, rollup_drift, update_rollup)

    A1 = _rand(300, 12, 20)
    A2 = _rand(200, 12, 21) * 2.0
    agg = FDAggregator("vec", dim=12, ell=10, k_out=3)
    root = str(tmp_path / "fd_roll")
    for A in (A1, A2):
        df = spark.createDataFrame(
            [("k", [float(x) for x in row]) for row in A],
            "grp string, vec array<double>")
        update_rollup(spark, root, df, agg, ["grp"])

    est = read_rollup(spark, root, agg, ["grp"]).collect()[0]
    both = np.vstack([A1, A2])
    assert est["n_rows"] == 500
    assert est["frob_sq"] == pytest.approx(float((both * both).sum()))
    sv_ex = np.linalg.svd(both, compute_uv=False)[:3]
    for i in range(3):
        assert est[f"sv_{i+1}"] ** 2 <= sv_ex[i] ** 2 + 1e-6
        assert est[f"sv_{i+1}"] ** 2 >= sv_ex[i] ** 2 - est["err_bound"] - 1e-6

    drift = rollup_drift(spark, root, agg, ["grp"]).collect()[0]
    assert drift["status"] == "both"
    assert drift["delta_n_rows"] == 200
    # the spectrum grew (A2 doubles the scale), and the drift sees it
    assert drift["delta_sv_1"] > 0
    assert drift["sv_1_old"] > 0 and drift["sv_1_new"] > drift["sv_1_old"]


def test_fd_through_streaming_generic_operator(spark, tmp_path):
    """stream_sketch_by_key is generic over aggregators: a streamed FD
    converges to a state whose spectrum satisfies the same certificate
    as a batch build over all the data."""
    from ddsketchy_spark.streaming import stream_sketch_by_key

    A = _rand(600, 10, 22)
    src = str(tmp_path / "fd_stream_src")
    df = spark.createDataFrame(
        [(("g%d" % (i % 2)), [float(x) for x in A[i]])
         for i in range(len(A))],
        "grp string, vec array<double>")
    df.repartition(6).write.parquet(src)
    schema = spark.read.parquet(src).schema
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", "2").parquet(src))
    agg = FDAggregator("vec", dim=10, ell=8, k_out=3)
    out = stream_sketch_by_key(stream, agg, ["grp"])
    q = (out.writeStream.format("memory").queryName("fd_stream")
         .outputMode("update")
         .option("checkpointLocation", str(tmp_path / "fd_ck"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    rows = spark.sql(
        "SELECT * FROM (SELECT *, row_number() OVER ("
        "  PARTITION BY grp ORDER BY n_rows DESC) rn FROM fd_stream) "
        "WHERE rn = 1").collect()
    got = {r["grp"]: r for r in rows}
    for g in ("g0", "g1"):
        sub = A[[i for i in range(len(A)) if i % 2 == int(g[1])]]
        r = got[g]
        assert r["n_rows"] == len(sub)
        assert r["frob_sq"] == pytest.approx(float((sub * sub).sum()))
        sv_ex = np.linalg.svd(sub, compute_uv=False)[:3]
        for i in range(3):
            assert r[f"sv_{i+1}"] ** 2 <= sv_ex[i] ** 2 + 1e-6
            assert (r[f"sv_{i+1}"] ** 2
                    >= sv_ex[i] ** 2 - r["err_bound"] - 1e-6)
        assert r["err_bound"] <= r["frob_sq"] / 8 + 1e-6


def test_fd_weighted_ingest(spark):
    """weight_col: the sketched Gram is exactly sum(w * x x^T) — the
    certificate holds against the weighted Gram; integral weights match
    the expanded stream's exact spectrum within the bound; NULL/zero
    weights contribute nothing; negative weights fail loudly."""
    from ddsketchy_spark.spark.agg import sketch_aggregate

    rng = np.random.default_rng(40)
    A = _rand(150, 10, 41)
    w = rng.integers(0, 4, size=150)  # includes zeros
    rows = [(i, [float(x) for x in A[i]], int(w[i])) for i in range(150)]
    rows += [(900, None, 5), (901, [0.0] * 10, None)]  # NULL vec / NULL w
    df = spark.createDataFrame(
        rows, "id long, vec array<double>, w long").repartition(4)
    agg = FDAggregator("vec", dim=10, ell=8, k_out=3, weight_col="w")
    out = sketch_aggregate(df, agg)

    expanded = np.repeat(A, w, axis=0)
    assert out["n_rows"] == int((w > 0).sum())  # physical rows ingested
    assert out["frob_sq"] == pytest.approx(float((expanded ** 2).sum()))
    sv_ex = np.linalg.svd(expanded, compute_uv=False)[:3]
    for i in range(3):
        assert out[f"sv_{i+1}"] ** 2 <= sv_ex[i] ** 2 + 1e-6
        assert out[f"sv_{i+1}"] ** 2 >= sv_ex[i] ** 2 - out["err_bound"] - 1e-6
    assert out["err_bound"] <= out["frob_sq"] / 8 + 1e-6

    # fractional importance weights: certificate vs the weighted Gram
    wf = rng.uniform(0.1, 2.0, size=150)
    dff = spark.createDataFrame(
        [(i, [float(x) for x in A[i]], float(wf[i])) for i in range(150)],
        "id long, vec array<double>, w double").repartition(3)
    outf = sketch_aggregate(
        dff, FDAggregator("vec", dim=10, ell=8, k_out=3, weight_col="w"))
    gram_w = (A * wf[:, None]).T @ A
    assert outf["frob_sq"] == pytest.approx(float(np.trace(gram_w)))
    sv_w = np.sqrt(np.maximum(np.linalg.eigvalsh(gram_w)[::-1][:3], 0.0))
    for i in range(3):
        assert outf[f"sv_{i+1}"] ** 2 <= sv_w[i] ** 2 + 1e-6
        assert outf[f"sv_{i+1}"] ** 2 >= sv_w[i] ** 2 - outf["err_bound"] - 1e-6

    # negative weights fail the job with the real reason
    bad = spark.createDataFrame(
        [(1, [0.0] * 10, -1.0)], "id long, vec array<double>, w double")
    with pytest.raises(Exception, match="weights must be >= 0"):
        sketch_aggregate(
            bad, FDAggregator("vec", dim=10, ell=8, weight_col="w"))
