"""Deterministic synthetic token table (the input_hint schema).

Schema: (doc_id:string, tokens:array<int32>, n_tok:int32, source:string) —
an Iceberg-shaped table of pre-tokenized training sequences. In production
this is `spark.read.table("catalog.db.tokens")`; in this sandbox (no Iceberg
jar) we synthesize Parquet with an identical schema behind the
``read_tokens`` indirection.

Determinism: every row is a pure function of (seed, row index) — the table
regenerates bit-identically at any scale/partitioning, which underwrites the
per-row token-array-equality invariant (BASELINE.json input_hint) and
checkpoint/resume tests.

Distributions (FIXTURES.md F1):
- n_tok ~ lognormal(mu=6, sigma=1) clipped to [1, 8192] (heavy-tailed)
- tokens ~ Zipf-ish over a 50k vocab
- source: 8 categories, skewed — source_0 has ~60% of rows (exercises
  salting / skew handling)
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

VOCAB_SIZE = 50_000
N_SOURCES = 8
# source_0 ~60%, remainder geometric-ish over the other 7
SOURCE_WEIGHTS = np.array([0.60, 0.16, 0.09, 0.06, 0.04, 0.025, 0.015, 0.01])
SOURCE_NAMES = [f"source_{i}" for i in range(N_SOURCES)]


def row_block(seed: int, start: int, count: int) -> pa.Table:
    """Generate rows [start, start+count) as one Arrow table (vectorized)."""
    rng = np.random.default_rng(np.random.SeedSequence([seed, start, count]))
    n_tok = np.clip(
        np.rint(rng.lognormal(mean=6.0, sigma=1.0, size=count)), 1, 8192
    ).astype(np.int32)
    src_idx = rng.choice(N_SOURCES, size=count, p=SOURCE_WEIGHTS)
    total = int(n_tok.sum())
    # Zipf-ish over the vocab: inverse-CDF of a power law, clipped to vocab
    u = rng.random(total)
    tok = np.minimum(
        (u ** (-1.0 / 1.1) - 1.0) * 100.0, VOCAB_SIZE - 1
    ).astype(np.int32)
    offsets = np.zeros(count + 1, dtype=np.int64)
    np.cumsum(n_tok, out=offsets[1:])
    if offsets[-1] <= 2**31 - 1:
        tokens = pa.ListArray.from_arrays(
            pa.array(offsets.astype(np.int32)), pa.array(tok, type=pa.int32()))
    else:  # >2^31 tokens per block: 64-bit offsets (large_list)
        tokens = pa.LargeListArray.from_arrays(
            pa.array(offsets), pa.array(tok, type=pa.int32()))
    doc_id = pa.array([f"doc-{i:012d}" for i in range(start, start + count)], type=pa.string())
    source = pa.array([SOURCE_NAMES[i] for i in src_idx], type=pa.string())
    return pa.table(
        {
            "doc_id": doc_id,
            "tokens": tokens,
            "n_tok": pa.array(n_tok, type=pa.int32()),
            "source": source,
        }
    )


def write_token_table(
    path: str,
    n_rows: int,
    seed: int = 42,
    rows_per_file: int = 250_000,
    row_group_rows: int = 4096,
    overwrite: bool = False,
) -> str:
    """Write the token table as a multi-file Parquet dataset.

    ``row_group_rows`` keeps row groups small enough that Spark can split a
    file across tasks (a parquet file never splits below row-group
    granularity — one giant row group per file serializes the scan)."""
    if os.path.isdir(path) and not overwrite:
        existing = [f for f in os.listdir(path) if f.endswith(".parquet")]
        if existing:
            return path
    os.makedirs(path, exist_ok=True)
    i = 0
    part = 0
    while i < n_rows:
        c = min(rows_per_file, n_rows - i)
        tbl = row_block(seed, i, c)
        pq.write_table(
            tbl,
            os.path.join(path, f"part-{part:05d}.parquet"),
            row_group_size=row_group_rows,
        )
        i += c
        part += 1
    return path


def read_tokens(spark, path_or_table: str):
    """Indirection for the Iceberg-shaped source: a real catalog table name
    (contains no '/') loads via the catalog; otherwise Parquet path."""
    if "/" not in path_or_table and "." in path_or_table:
        return spark.read.table(path_or_table)
    return spark.read.parquet(path_or_table)
