"""Multimodal (image/audio/video) column plumbing.

Media are opaque ``binary`` columns with typed metadata. The Spark-side
machinery — schemas, partition sizing, Arrow batch shapes, UDF signatures —
is real and tested; the actual codec step is STUBBED because no media
libraries exist in this environment:

- ``decode_media``: raises NotImplementedError unless a decoder callback is
  injected (plug in PIL/torchaudio/ffmpeg in production).
- ``fake_feature_extract``: a deterministic stand-in (hash-derived feature
  vector from the bytes) so the full pipeline — including downstream
  similarity/dedup over media features — is exercised end-to-end.

Scale notes: media rows are large (MBs); keep
``spark.sql.files.maxPartitionBytes`` small enough that a partition of
media rows fits executor memory, and always select metadata columns
WITHOUT the binary payload when only metadata is needed (column pruning
keeps the payload unread in Parquet).
"""

from __future__ import annotations

from typing import Callable, Iterator

import numpy as np
import pyarrow as pa

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", StringType()),
        StructField("modality", StringType()),  # image | audio | video
        StructField("payload", BinaryType()),
        StructField("meta", StructType([
            StructField("width", IntegerType()),
            StructField("height", IntegerType()),
            StructField("sample_rate", IntegerType()),
            StructField("n_frames", IntegerType()),
            StructField("codec", StringType()),
        ])),
    ]
)


def synth_media(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake media table matching MEDIA_SCHEMA."""
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n):
        modality = ["image", "audio", "video"][i % 3]
        payload = rng.integers(0, 256, size=256 + (i % 7) * 64, dtype=np.uint8).tobytes()
        meta = (64 + i % 4 * 32, 64, 16000, 1 + i % 30, "fake")
        rows.append((f"m-{i:06d}", modality, bytearray(payload), meta))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def decode_media(
    df: DataFrame,
    decoder: Callable[[bytes, str], np.ndarray] | None = None,
) -> DataFrame:
    """Decode payloads into dense arrays via an injected decoder.

    ``decoder(payload_bytes, modality) -> np.ndarray(float32)``. Without a
    decoder this raises NotImplementedError AT EXECUTION TIME on the
    executors (media libs are not available in this sandbox)."""
    schema = StructType([
        StructField("media_id", StringType()),
        StructField("decoded", ArrayType(FloatType())),
    ])
    pruned = df.select("media_id", "modality", "payload")

    def run(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            ids = batch.column(0).to_pylist()
            modalities = batch.column(1).to_pylist()
            payloads = batch.column(2).to_pylist()
            out = []
            for m, p in zip(modalities, payloads):
                if decoder is None:
                    raise NotImplementedError(
                        "no media decoder available in this environment; "
                        "inject decoder=... (e.g. PIL/ffmpeg-based) in production"
                    )
                out.append(decoder(p, m).astype(np.float32).tolist())
            yield pa.RecordBatch.from_arrays(
                [pa.array(ids), pa.array(out, type=pa.list_(pa.float32()))],
                names=["media_id", "decoded"],
            )

    return pruned.mapInArrow(run, schema)


def fake_feature_extract(df: DataFrame, dim: int = 16) -> DataFrame:
    """Deterministic stand-in feature extractor: dim float32 features
    derived from payload bytes (chunk sums), so downstream similarity /
    dedup over media features runs for real."""
    schema = StructType([
        StructField("media_id", StringType()),
        StructField("features", ArrayType(FloatType())),
        StructField("payload_bytes", LongType()),
    ])
    pruned = df.select("media_id", "payload")

    def run(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            ids = batch.column(0).to_pylist()
            payloads = batch.column(1).to_pylist()
            feats, sizes = [], []
            for p in payloads:
                a = np.frombuffer(p, dtype=np.uint8).astype(np.float32)
                pad = (-len(a)) % dim
                if pad:
                    a = np.concatenate([a, np.zeros(pad, dtype=np.float32)])
                f = a.reshape(dim, -1).mean(axis=1) / 255.0
                feats.append(f.tolist())
                sizes.append(len(p))
            yield pa.RecordBatch.from_arrays(
                [pa.array(ids), pa.array(feats, type=pa.list_(pa.float32())),
                 pa.array(sizes, type=pa.int64())],
                names=["media_id", "features", "payload_bytes"],
            )

    return pruned.mapInArrow(run, schema)


def frame_sample_plan(df: DataFrame, every_n: int = 10) -> DataFrame:
    """Native projection computing which frames to sample per video row —
    the planning half of frame sampling (decode half is the stub above)."""
    n_frames = F.col("meta.n_frames")
    idxs = F.when(
        n_frames > 0,
        F.sequence(F.lit(0), n_frames - 1, F.lit(every_n)),
    ).otherwise(F.array().cast("array<int>"))  # 0-frame rows: empty plan, not a crash
    return df.filter(F.col("modality") == "video").select(
        "media_id", idxs.alias("frame_idxs"))


def resize_media(
    df: DataFrame,
    width: int,
    height: int,
    resizer: Callable[[bytes, str, int, int], bytes] | None = None,
) -> DataFrame:
    """Resize media payloads to (width, height) via an injected resizer.

    ``resizer(payload, modality, width, height) -> bytes``. Without one,
    raises NotImplementedError at execution time (no media libs in this
    sandbox — plug in PIL/ffmpeg in production). The Spark plumbing is
    real: payload column rewritten, meta struct updated to the new
    dimensions, everything else carried through."""
    schema = StructType([
        StructField("media_id", StringType()),
        StructField("modality", StringType()),
        StructField("payload", BinaryType()),
        StructField("meta", MEDIA_SCHEMA["meta"].dataType),
    ])
    pruned = df.select("media_id", "modality", "payload", "meta")

    def run(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            ids = batch.column(0).to_pylist()
            modalities = batch.column(1).to_pylist()
            payloads = batch.column(2).to_pylist()
            metas = batch.column(3).to_pylist()
            out_payloads, out_metas = [], []
            for m, p, meta in zip(modalities, payloads, metas):
                if resizer is None:
                    raise NotImplementedError(
                        "no media resizer available in this environment; "
                        "inject resizer=... (e.g. PIL-based) in production")
                out_payloads.append(resizer(p, m, width, height))
                meta = dict(meta or {})
                meta["width"] = width
                meta["height"] = height
                out_metas.append(meta)
            # derive the Arrow struct from MEDIA_SCHEMA (single source of
            # truth — a hand-written field list would drift)
            from pyspark.sql.pandas.types import to_arrow_type

            meta_type = to_arrow_type(MEDIA_SCHEMA["meta"].dataType)
            yield pa.RecordBatch.from_arrays(
                [pa.array(ids), pa.array(modalities),
                 pa.array(out_payloads, type=pa.binary()),
                 pa.array(out_metas, type=meta_type)],
                names=["media_id", "modality", "payload", "meta"])

    return pruned.mapInArrow(run, schema)


def fake_resizer(payload: bytes, modality: str, width: int, height: int) -> bytes:
    """Deterministic resize stand-in: nearest-neighbor subsample of the
    payload bytes to width*height — keeps the full pipeline executable."""
    a = np.frombuffer(payload, dtype=np.uint8)
    n = max(width * height, 1)
    if len(a) == 0:
        return bytes(n)  # empty payload resizes to zeros, not a crash
    idx = (np.arange(n) * len(a)) // n
    return a[np.minimum(idx, len(a) - 1)].tobytes()
