"""Table-profiler tests: exact stats exact, sketch estimates within bounds,
type dispatch correct."""

import pyarrow.parquet as pq
import pytest

from ddsketchy_spark.spark.profile import profile_table


@pytest.fixture(scope="module")
def prof(spark, token_table_path):
    df = spark.read.parquet(token_table_path)
    return df, {r["column"]: r for r in profile_table(df).collect()}


def test_profile_covers_all_columns(prof):
    _, p = prof
    assert set(p) == {"doc_id", "tokens", "n_tok", "source"}


def test_profile_exact_stats(prof, token_table_path):
    _, p = prof
    tbl = pq.read_table(token_table_path, columns=["n_tok"])
    col = tbl.column("n_tok").to_numpy()
    r = p["n_tok"]
    assert r["count"] == len(col) == 20_000
    assert r["nulls"] == 0
    assert r["min"] == float(col.min())
    assert r["max"] == float(col.max())
    assert r["mean"] == pytest.approx(col.mean(), rel=1e-12)


def test_profile_distinct_and_quantiles(prof):
    df, p = prof
    exact_sources = df.select("source").distinct().count()
    assert p["source"]["distinct_est"] == exact_sources  # tiny: HLL exact
    # doc_id: 20k distinct, p=14 HLL -> within ~2%
    assert abs(p["doc_id"]["distinct_est"] - 20_000) <= 0.02 * 20_000
    # n_tok p50 within alpha of exact lower quantile
    import numpy as np

    vals = np.sort(np.array(
        [r["n_tok"] for r in df.select("n_tok").collect()], dtype=float))
    exact_p50 = vals[(len(vals) - 1) // 2]
    assert abs(p["n_tok"]["p50"] - exact_p50) <= 0.01 * exact_p50


def test_profile_array_and_string_columns(prof):
    _, p = prof
    assert p["tokens"]["avg_len"] is not None and p["tokens"]["avg_len"] > 0
    assert p["tokens"]["p50"] is not None        # element-level quantiles
    assert p["doc_id"]["avg_len"] is not None    # string length
    assert p["doc_id"]["p50"] is None            # strings have no quantiles
