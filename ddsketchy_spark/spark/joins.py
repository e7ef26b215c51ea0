"""Sketch-accelerated joins: Bloom-filtered semi-join pre-pass.

The classic 100 TB shuffle cut: before joining a huge fact table against a
smaller key set, probe each fact row against a Bloom filter of the build
side's keys. Rows with no possible match are dropped BEFORE the join
shuffle — at typical selectivities that removes most of the shuffle bytes
for the cost of one broadcast blob (n_bits/8 bytes) and a vectorized probe.

No false negatives (Bloom guarantee) means the filtered join returns
exactly the same rows as the unfiltered one; false positives only cost
wasted shuffle, bounded by the configured FPR.

Spark's AQE can inject runtime bloom filters inside ONE query
(``spark.sql.optimizer.runtime.bloomFilter.enabled``); this operator makes
the filter an explicit, REUSABLE artifact — build it once (or load it from
a checkpoint of a previous pipeline stage) and push it into any number of
later jobs, which the optimizer cannot do across queries.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, functions as F

from ..core.bloom import BloomFilter
from .companions import bloom_state


def bloom_probe_column(df: DataFrame, key_col: str, blob: bytes):
    """Boolean column: key possibly-in the Bloom filter ``blob``.

    Arrow-batched pandas UDF over a broadcast of the blob: one
    deserialization per executor task, vectorized ``contains_batch`` per
    batch. NULL keys probe False (they can never equi-join)."""
    import pandas as pd

    from pyspark.sql.functions import pandas_udf

    bc = df.sparkSession.sparkContext.broadcast(blob)

    def _probe(keys):
        import numpy as np

        bf = BloomFilter.from_bytes(bc.value)
        mask = keys.notna().to_numpy()
        out = np.zeros(len(keys), dtype=bool)
        if mask.any():
            vals = keys[mask].to_numpy()
            out[mask] = bf.contains_batch(vals)
        return pd.Series(out)

    probe = pandas_udf(_probe, "boolean")

    return probe(F.col(key_col))


def bloom_semi_join(
    large: DataFrame,
    small: DataFrame,
    on: str | Sequence[str],
    fpr: float = 0.01,
    n_bits: int | None = None,
    n_hashes: int = 7,
    how: str = "inner",
    blob: bytes | None = None,
) -> DataFrame:
    """``large JOIN small ON on`` with a Bloom pre-filter on the large side.

    ``on`` is a single key column name (string) or [large_col, small_col].
    Result rows are identical to the plain join (no false negatives); the
    Bloom pass drops non-matching large-side rows before the join shuffle.
    Pass a prebuilt ``blob`` (e.g. from a checkpoint) to skip the build.
    """
    if isinstance(on, str):
        lkey = skey = on
    else:
        lkey, skey = on
    if blob is None:
        if n_bits is None:
            n_keys = small.select(skey).distinct().count()
            proto = BloomFilter.for_capacity(max(n_keys, 1), fpr)
            n_bits, n_hashes = proto.n_bits, proto.n_hashes
        out = bloom_state(small, skey, n_bits=n_bits, n_hashes=n_hashes,
                          engine="arrow")
        blob = out["state"]
    filtered = large.where(bloom_probe_column(large, lkey, blob))
    cond = filtered[lkey] == small[skey] if lkey != skey else lkey
    if isinstance(cond, str):
        return filtered.join(small, on=cond, how=how)
    return filtered.join(small, on=cond, how=how)
