"""Multimodal (image/audio/video) column plumbing.

Media are opaque ``binary`` columns with typed metadata. The Spark-side
machinery — schemas, partition sizing, Arrow batch shapes, UDF signatures —
is real and tested. Codecs are two-tier:

- Built-in, dependency-free NumPy codecs for trivial containers (binary
  PPM / 24-bit BMP images, PCM WAV audio — see ``builtin_decoder`` /
  ``builtin_resizer``): ``decode_media``/``resize_media`` run end to end
  on REAL decoded pixels/samples with no media libraries at all.
- The injected-codec seam for production formats (JPEG/PNG/FLAC/MP4/...):
  pass decoder=/resizer= (PIL/torchaudio/ffmpeg-backed) — unknown
  containers raise NotImplementedError at execution time.
- ``fake_feature_extract``: a deterministic stand-in (hash-derived feature
  vector from the bytes); ``pooled_features`` pools REAL decoded content
  to fixed width so downstream similarity/dedup sees actual media.

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
    """Decode payloads into dense arrays.

    ``decoder(payload_bytes, modality) -> np.ndarray(float32)``; defaults
    to ``builtin_decoder`` (real P6 PPM / 24-bit BMP / PCM WAV decoding,
    NumPy only). Unrecognized containers raise NotImplementedError AT
    EXECUTION TIME on the executors — inject a PIL/ffmpeg-backed decoder
    for production formats."""
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
            dec = decoder or builtin_decoder
            out = [dec(p, m).astype(np.float32).tolist()
                   for m, p in zip(modalities, payloads)]
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
    """Resize media payloads to (width, height).

    ``resizer(payload, modality, width, height) -> bytes``; defaults to
    ``builtin_resizer`` (real nearest-neighbor resize for P6 PPM / 24-bit
    BMP, re-encoded in their own container). Other containers raise
    NotImplementedError at execution time — inject a PIL/ffmpeg-backed
    resizer in production. The Spark plumbing: payload column rewritten,
    meta struct updated to the new dimensions, everything else carried
    through."""
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
            rz = resizer or builtin_resizer
            for m, p, meta in zip(modalities, payloads, metas):
                out_payloads.append(rz(p, m, width, height))
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


# ---------------------------------------------------------------------------
# Dependency-free REAL codecs for trivial containers (round-5): binary PPM
# (P6) and 24-bit uncompressed BMP images, PCM WAV audio — implemented from
# the published container layouts with NumPy only, so decode -> features ->
# similarity/dedup runs END TO END on actual decoded pixels/samples in this
# sandbox. Production formats (JPEG/PNG/FLAC/MP4/...) still go through the
# injected-codec seam of ``decode_media``/``resize_media``.


def encode_ppm(img: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB -> binary PPM (P6, maxval 255)."""
    img = np.ascontiguousarray(img, dtype=np.uint8)
    h, w = img.shape[0], img.shape[1]
    return b"P6\n%d %d\n255\n" % (w, h) + img.tobytes()


def decode_ppm(data: bytes) -> np.ndarray:
    """Binary PPM (P6) -> (h, w, 3) uint8 RGB. Handles whitespace and
    ``#`` comments in the header; maxval must be 255 (the 8-bit case)."""
    if data[:2] != b"P6":
        raise ValueError("not a P6 PPM payload")
    toks: list[int] = []
    i = 2
    while len(toks) < 3:
        while i < len(data) and data[i : i + 1].isspace():
            i += 1
        if data[i : i + 1] == b"#":
            while i < len(data) and data[i] != 0x0A:
                i += 1
            continue
        j = i
        while j < len(data) and not data[j : j + 1].isspace():
            j += 1
        toks.append(int(data[i:j]))
        i = j
    w, h, maxval = toks
    if maxval != 255:
        raise NotImplementedError(f"PPM maxval {maxval} != 255")
    i += 1  # exactly one whitespace byte separates header from raster
    return np.frombuffer(data, np.uint8, count=w * h * 3,
                         offset=i).reshape(h, w, 3)


def encode_bmp(img: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB -> 24-bit uncompressed (BI_RGB) bottom-up BMP
    with the standard BITMAPINFOHEADER, rows padded to 4 bytes."""
    import struct

    img = np.ascontiguousarray(img, dtype=np.uint8)
    h, w = img.shape[0], img.shape[1]
    pad = (-(w * 3)) % 4
    body = b"".join(img[r, :, ::-1].tobytes() + b"\x00" * pad
                    for r in range(h - 1, -1, -1))
    off = 14 + 40
    header = struct.pack("<2sIHHI", b"BM", off + len(body), 0, 0, off)
    dib = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body),
                      2835, 2835, 0, 0)
    return header + dib + body


def decode_bmp(data: bytes) -> np.ndarray:
    """24-bit uncompressed bottom-up BMP -> (h, w, 3) uint8 RGB."""
    import struct

    if data[:2] != b"BM":
        raise ValueError("not a BMP payload")
    off = struct.unpack_from("<I", data, 10)[0]
    w, h = struct.unpack_from("<ii", data, 18)
    bpp = struct.unpack_from("<H", data, 28)[0]
    comp = struct.unpack_from("<I", data, 30)[0]
    if bpp != 24 or comp != 0 or h <= 0:
        raise NotImplementedError(
            f"only 24-bit uncompressed bottom-up BMP supported "
            f"(bpp={bpp}, compression={comp}, height={h})")
    stride = (w * 3 + 3) // 4 * 4
    rows = np.frombuffer(data, np.uint8, count=stride * h,
                         offset=off).reshape(h, stride)
    return rows[::-1, : w * 3].reshape(h, w, 3)[:, :, ::-1].copy()


def encode_wav(samples: np.ndarray, sample_rate: int = 16000) -> bytes:
    """float samples in [-1, 1] (mono) -> 16-bit PCM WAV."""
    import struct

    pcm = np.round(np.clip(np.asarray(samples, dtype=np.float64), -1.0, 1.0)
                   * 32767.0).astype("<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, sample_rate * 2, 2, 16)
    return (b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(pcm))
            + b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(pcm)) + pcm)


def decode_wav(data: bytes) -> np.ndarray:
    """PCM WAV (8- or 16-bit, any channel count; chunks walked per the
    RIFF spec) -> float32 samples in [-1, 1], channels interleaved."""
    import struct

    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    bits = None
    pos = 12
    samples = None
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        clen = struct.unpack_from("<I", data, pos + 4)[0]
        body = pos + 8
        if cid == b"fmt ":
            audio_fmt, _nch, _rate = struct.unpack_from("<HHI", data, body)
            bits = struct.unpack_from("<H", data, body + 14)[0]
            if audio_fmt != 1 or bits not in (8, 16):
                raise NotImplementedError(
                    f"only 8/16-bit PCM WAV supported "
                    f"(format={audio_fmt}, bits={bits})")
        elif cid == b"data":
            if bits is None:
                raise ValueError("WAV data chunk before fmt chunk")
            raw = data[body : body + clen]
            if bits == 16:
                samples = (np.frombuffer(raw[: len(raw) // 2 * 2], "<i2")
                           .astype(np.float32) / 32768.0)
            else:
                samples = ((np.frombuffer(raw, np.uint8)
                            .astype(np.float32) - 128.0) / 128.0)
        pos = body + clen + (clen & 1)  # RIFF chunks are 2-byte aligned
    if samples is None:
        raise ValueError("WAV payload has no data chunk")
    return samples


def builtin_decoder(payload: bytes, modality: str) -> np.ndarray:
    """Default ``decode_media`` codec: sniffs the container magic and
    decodes PPM/BMP images to [0, 1] float32 pixel arrays (flattened
    h*w*3 RGB) and PCM WAV audio to [-1, 1] float32 samples. Any other
    container raises NotImplementedError — inject decoder=... for
    production formats."""
    if payload[:2] == b"P6":
        return (decode_ppm(payload).astype(np.float32) / 255.0).ravel()
    if payload[:2] == b"BM":
        return (decode_bmp(payload).astype(np.float32) / 255.0).ravel()
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return decode_wav(payload)
    raise NotImplementedError(
        "unrecognized media container (built-in decoder handles P6 PPM, "
        "24-bit BMP, PCM WAV); inject decoder=... (e.g. PIL/ffmpeg-based) "
        "for production formats")


def builtin_resizer(payload: bytes, modality: str, width: int,
                    height: int) -> bytes:
    """Default ``resize_media`` codec: real nearest-neighbor resize for
    PPM/BMP images, re-encoded in their own container. Non-image or
    unknown containers raise NotImplementedError (inject resizer=...)."""
    if payload[:2] == b"P6":
        img, enc = decode_ppm(payload), encode_ppm
    elif payload[:2] == b"BM":
        img, enc = decode_bmp(payload), encode_bmp
    else:
        raise NotImplementedError(
            "built-in resizer handles P6 PPM and 24-bit BMP images only; "
            "inject resizer=... (e.g. PIL-based) for other media")
    h, w = img.shape[0], img.shape[1]
    ri = (np.arange(height, dtype=np.int64) * h) // height
    ci = (np.arange(width, dtype=np.int64) * w) // width
    return enc(img[ri][:, ci])


def synth_real_media(spark, n: int = 24, seed: int = 42) -> DataFrame:
    """Deterministic media table whose payloads are REAL containers the
    built-in codecs decode: PPM and BMP gradient images, sine-wave PCM
    WAVs — matching MEDIA_SCHEMA with honest metadata."""
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n):
        kind = i % 3
        if kind < 2:
            w, h = 16 + (i % 4) * 8, 12 + (i % 3) * 4
            yy, xx = np.mgrid[0:h, 0:w]
            img = np.stack([(xx * 255) // max(w - 1, 1),
                            (yy * 255) // max(h - 1, 1),
                            rng.integers(0, 256, size=(h, w))],
                           axis=-1).astype(np.uint8)
            payload = encode_ppm(img) if kind == 0 else encode_bmp(img)
            rows.append((f"m-{i:06d}", "image", bytearray(payload),
                         (w, h, None, 1, "ppm" if kind == 0 else "bmp")))
        else:
            rate, n_samp = 8000, 800 + (i % 5) * 160
            t = np.arange(n_samp) / rate
            samples = 0.5 * np.sin(2 * np.pi * (220 + 20 * i) * t)
            rows.append((f"m-{i:06d}", "audio",
                         bytearray(encode_wav(samples, rate)),
                         (None, None, rate, None, "wav")))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def pooled_features(df: DataFrame, dim: int = 16,
                    col: str = "decoded") -> DataFrame:
    """Fixed-width features from variable-length decoded arrays: mean
    over ``dim`` equal bins (zero-padded tail) — the decoded-content
    analogue of ``fake_feature_extract``, so real pixels/samples feed the
    similarity/dedup layer."""
    schema = StructType([
        StructField("media_id", StringType()),
        StructField("features", ArrayType(FloatType())),
    ])
    pruned = df.select("media_id", col)

    def run(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            ids = batch.column(0).to_pylist()
            vals = batch.column(1).to_pylist()
            feats = []
            for v in vals:
                a = np.asarray(v or [0.0], dtype=np.float32)
                pad = (-len(a)) % dim
                if pad:
                    a = np.concatenate([a, np.zeros(pad, dtype=np.float32)])
                feats.append((a.reshape(dim, -1).mean(axis=1)).tolist())
            yield pa.RecordBatch.from_arrays(
                [pa.array(ids), pa.array(feats, type=pa.list_(pa.float32()))],
                names=["media_id", "features"])

    return pruned.mapInArrow(run, schema)
