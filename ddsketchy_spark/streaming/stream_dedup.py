"""Streaming exact deduplication — the ingest-time half of the dedup
pipeline (`pipeline/dedup.py` holds the batch half).

Spark-first design: dedup is expressed as native streaming
``dropDuplicates`` / ``dropDuplicatesWithinWatermark`` over a 16-byte text
digest, so the streaming state store holds one digest row per distinct
document — never the text — and Spark's checkpointing gives exactly-once
keep-first semantics across restarts for free."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_dedup_exact(
    stream_df: DataFrame,
    text_col: str = "text",
    ts_col: str | None = None,
    watermark_delay: str = "10 minutes",
) -> DataFrame:
    """Keep the FIRST-seen row per identical-text digest in a stream.

    Two state regimes:

    - ``ts_col`` given (the scale path): ``withWatermark`` +
      ``dropDuplicatesWithinWatermark`` — a duplicate arriving within
      ``watermark_delay`` of the first occurrence is dropped, and the
      digest's state row is evicted once the watermark passes it. State is
      bounded by (arrival rate x delay), independent of stream lifetime.
      The documented trade-off: a duplicate arriving AFTER the window
      passes through (web-crawl dedup wants the batch pipeline for the
      long tail anyway).
    - ``ts_col=None``: global ``dropDuplicates`` over the digest — true
      keep-first-forever semantics, but the state store grows with the
      distinct-document count (16-byte digests: ~1.6 GB per 100 M distinct
      docs, spread across the state-store partitions).

    Rows with NULL ``text_col`` pass through untouched, matching batch
    ``dedup_exact`` (an equi-dedup on a NULL digest would collapse them
    all into one).

    Mirrors `pipeline/dedup.py:dedup_exact` (same digest law:
    md5(lower(trim(text)))); reference semantics per ddsketchy's
    keep-one-representative contract."""
    fp = F.md5(F.lower(F.trim(F.col(text_col))))
    nulls = stream_df.where(F.col(text_col).isNull())
    nonnull = stream_df.where(F.col(text_col).isNotNull()).withColumn("_fp", fp)
    if ts_col is not None:
        deduped = (nonnull.withWatermark(ts_col, watermark_delay)
                   .dropDuplicatesWithinWatermark(["_fp"]))
    else:
        deduped = nonnull.dropDuplicates(["_fp"])
    return deduped.drop("_fp").unionByName(nulls)
