"""Per-row token-array equality vs the reference rows (input_hint invariant)
and extra error-bound suites from the reference's validation corpus
(/root/reference/tests/error_bounds_validation.rs)."""

import numpy as np
import pyarrow.parquet as pq
import pytest

from ddsketchy_spark import DDSketch
from ddsketchy_spark.data.synth import row_block, write_token_table


def test_token_table_regenerates_bit_identical(tmp_path):
    """The generator is a pure function of (seed, row index): two builds
    with DIFFERENT file layouts produce identical per-row token arrays."""
    a = write_token_table(str(tmp_path / "a"), n_rows=3000, seed=42,
                          rows_per_file=1000)
    b = write_token_table(str(tmp_path / "b"), n_rows=3000, seed=42,
                          rows_per_file=1000)
    ta = pq.read_table(a).sort_by("doc_id")
    tb = pq.read_table(b).sort_by("doc_id")
    assert ta.equals(tb)


def test_token_rows_golden_fingerprint():
    """Pinned fingerprint of the first row block — catches any silent change
    to the reference rows across rounds (per-row token-array equality)."""
    tbl = row_block(seed=42, start=0, count=100)
    flat = tbl.column("tokens").combine_chunks().flatten().to_numpy()
    n_tok = tbl.column("n_tok").to_numpy()
    assert tbl.column("doc_id")[0].as_py() == "doc-000000000000"
    # structural invariants
    offsets = np.concatenate([[0], np.cumsum(n_tok)])
    assert offsets[-1] == len(flat)
    assert (n_tok >= 1).all() and (n_tok <= 8192).all()
    assert flat.min() >= 0 and flat.max() < 50_000
    # pinned values (golden; regenerate ONLY if the generator contract changes)
    fp = int(np.bitwise_xor.reduce(
        (flat.astype(np.int64) * 1000003 + np.arange(len(flat))) % (1 << 61)))
    assert (int(n_tok.sum()), int(n_tok[0]), int(flat[0]), fp) == (
        55352, 450, 83, 51181383639)


def test_error_bounds_bimodal():
    """80% U(0.001, 0.1) + 20% U(1, 10) (ref :272-292)."""
    rng = np.random.default_rng(1337)
    small = rng.uniform(0.001, 0.1, 8000)
    large = rng.uniform(1.0, 10.0, 2000)
    vals = np.concatenate([small, large])
    rng.shuffle(vals)
    sk = DDSketch.from_values(vals, alpha=0.01)
    sv = np.sort(vals)
    for q in [0.05, 0.25, 0.5, 0.75, 0.79, 0.81, 0.95, 0.99]:
        exact = sv[int(q * (len(sv) - 1))]
        assert abs(sk.quantile(q) - exact) / exact <= 0.01 + 1e-9, q


def test_error_bounds_high_precision():
    """alpha = 0.005 and 0.001 (ref :204-237)."""
    rng = np.random.default_rng(1337)
    vals = rng.exponential(1.0, 50_000)
    sv = np.sort(vals)
    for alpha in (0.005, 0.001):
        sk = DDSketch.from_values(vals, alpha=alpha)
        for q in [0.01, 0.1, 0.5, 0.9, 0.99, 0.999]:
            exact = sv[int(q * (len(sv) - 1))]
            assert abs(sk.quantile(q) - exact) / exact <= alpha + 1e-9, (alpha, q)


def test_error_bounds_low_quantiles_uncollapsed():
    """Low-quantile accuracy holds while the store is within its bin budget."""
    rng = np.random.default_rng(1337)
    vals = rng.lognormal(0.0, 1.0, 100_000)
    sk = DDSketch.from_values(vals, alpha=0.01)
    assert not sk.positive_store.is_collapsed
    sv = np.sort(vals)
    for q in [0.001, 0.01, 0.05]:
        exact = sv[int(q * (len(sv) - 1))]
        assert abs(sk.quantile(q) - exact) / exact <= 0.01 + 1e-9, q
