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


def stream_dedup_near(
    stream_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 64,
    bands: int = 16,
    shingle_k: int = 3,
    seed: int = 1,
    threshold: float = 0.8,
    max_bucket_members: int = 256,
    state_ttl_ms: int | None = None,
) -> DataFrame:
    """Streaming near-duplicate PAIR detection: MinHash-LSH with per-bucket
    state — the custom stateful operator Structured Streaming lacks.

    Stages (first two stateless, reusing the batch laws bit-for-bit):

    1. MinHash signatures per micro-batch (``minhash_signatures`` —
       vectorized mapInArrow, identical to batch).
    2. Explode each doc to its ``bands`` (band, bucket) keys
       (``_band_buckets``, same NumPy pass as batch).
    3. ``applyInPandasWithState`` keyed by (band, bucket): state holds the
       bucket's member ids + packed signature matrix; each arriving doc is
       scored against ALL members (and co-arriving docs) in one NumPy
       slot-agreement pass, and pairs with ``est_jaccard >= threshold``
       are emitted in Append mode.

    Semantics vs batch ``minhash_lsh_pairs``: the emitted pair set equals
    the batch candidate pairs at the same threshold — a pair sharing
    SEVERAL bands is emitted once per shared band, so dedup downstream
    (``dropDuplicates(["id_a","id_b"])`` in foreachBatch) for exactly-once
    pairs.

    State per bucket is capped at ``max_bucket_members`` EARLIEST members
    (the canonical representatives persist; a boilerplate flood bucket
    stops growing instead of OOMing — its members are exact-dup fodder
    anyway). The cap applies to PERSISTED state only: co-arriving docs
    within one micro-batch are always scored against each other, so the
    emitted pair set never depends on Arrow chunk boundaries; per-call
    scoring memory is O((bucket's batch rows + cap) * chunk * num_perm)
    bools. Rows with NULL text or NULL id are ignored.

    CHECKPOINT COMPATIBILITY: the state rows hold raw signature matrices,
    so they are only meaningful under the signature law that wrote them.
    Round 3 changed the MinHash law (v2 — JVM word hashing; see
    ``minhash_signatures``): a checkpoint written under v1 must be
    discarded, or resumed batches would score v2 signatures against v1
    state and emit noise instead of near-dup pairs.

    ``state_ttl_ms`` bounds TOTAL state: a (band, bucket) whose state has
    seen no new member for that many processing-time milliseconds is
    evicted, so the state-store row count tracks the recent-activity
    working set instead of growing with stream lifetime. The trade-off
    mirrors ``stream_dedup_exact``'s watermark regime: a duplicate
    arriving after its bucket expired is NOT paired with the pre-expiry
    members (run the batch pipeline for the long tail). ``None``
    (default) keeps buckets forever — per-bucket members stay capped but
    the bucket COUNT grows with the stream's distinct-bucket lifetime."""
    import pandas as pd

    from pyspark.sql.streaming.state import GroupStateTimeout
    from pyspark.sql.types import (
        ArrayType, BinaryType, DoubleType, LongType, StructField, StructType)

    from ..pipeline.dedup import make_band_explode, minhash_signatures

    if num_perm % bands:
        raise ValueError("bands must divide num_perm")
    r = num_perm // bands
    src = stream_df.where(F.col(text_col).isNotNull()
                          & F.col(id_col).isNotNull())
    sigs = minhash_signatures(src, text_col, id_col, num_perm, shingle_k, seed)
    id_field = sigs.schema[id_col]

    import numpy as np

    bucket_schema = StructType([
        id_field,
        StructField("sig", ArrayType(LongType())),
        StructField("band", LongType()),
        StructField("bucket", LongType()),
    ])

    banded = sigs.mapInArrow(
        make_band_explode(id_col, num_perm, bands, r, carry_sig=True),
        bucket_schema)

    out_schema = StructType([
        StructField("id_a", id_field.dataType),
        StructField("id_b", id_field.dataType),
        StructField("est_jaccard", DoubleType()),
    ])
    state_schema = StructType([
        StructField("ids", ArrayType(id_field.dataType)),
        StructField("sigs", BinaryType()),
    ])

    def update(key, pdf_iter, state):
        if state_ttl_ms is not None and state.hasTimedOut:
            state.remove()
            return
        if state.exists:
            ids, blob = state.get
            ids = list(ids)
            mat = (np.frombuffer(bytes(blob), dtype=np.int64)
                   .reshape(-1, num_perm))
        else:
            ids, mat = [], np.empty((0, num_perm), dtype=np.int64)
        out_a, out_b, out_e = [], [], []

        def emit(x, y, est):
            a, b = (x, y) if x < y else (y, x)
            out_a.append(a); out_b.append(b); out_e.append(est)

        for pdf in pdf_iter:
            if not len(pdf):
                continue
            new_ids = pdf[id_col].tolist()
            new_mat = np.asarray(pdf["sig"].tolist(), dtype=np.int64)
            if len(ids):
                est = (new_mat[:, None, :] == mat[None, :, :]).mean(axis=2)
                for i, j in zip(*np.nonzero(est >= threshold)):
                    if new_ids[i] != ids[j]:
                        emit(new_ids[i], ids[j], float(est[i, j]))
            est_nn = (new_mat[:, None, :] == new_mat[None, :, :]).mean(axis=2)
            for i, j in zip(*np.nonzero(est_nn >= threshold)):
                if i < j and new_ids[i] != new_ids[j]:
                    emit(new_ids[i], new_ids[j], float(est_nn[i, j]))
            # co-arriving docs in LATER pandas chunks of this micro-batch
            # must still see these rows (the member cap applies only to the
            # PERSISTED state, truncated at update time below) — otherwise
            # a full bucket would silently drop intra-batch pairs and the
            # emitted set would depend on Arrow chunking
            ids.extend(new_ids)
            mat = np.concatenate([mat, new_mat])
        ids = ids[:max_bucket_members]
        mat = mat[:max_bucket_members]
        state.update((ids, bytearray(mat.tobytes())))
        if state_ttl_ms is not None:
            # the TTL clock restarts on every update — idle buckets expire
            state.setTimeoutDuration(state_ttl_ms)
        if out_a:
            yield pd.DataFrame(
                {"id_a": out_a, "id_b": out_b, "est_jaccard": out_e})

    timeout = (GroupStateTimeout.ProcessingTimeTimeout
               if state_ttl_ms is not None else GroupStateTimeout.NoTimeout)
    return banded.groupBy("band", "bucket").applyInPandasWithState(
        update, out_schema, state_schema, "append", timeout)


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
