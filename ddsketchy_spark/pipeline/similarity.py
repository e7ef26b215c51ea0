"""Similarity search over embedding columns (array<float>).

- ``cosine_topk``: brute-force all-pairs top-k, 100% native Spark SQL
  (zip_with/aggregate dot products inside codegen). Correctness baseline;
  O(n^2) — test scale or per-bucket use only.
- ``lsh_cosine_topk``: the scale path. Random-hyperplane signatures (sign
  of dot with r fixed Gaussian vectors, Charikar 2002) computed natively
  from a broadcast hyperplane literal; candidates agree on >= one signature
  band; exact cosine verifies candidates. Shuffle carries (band_key, id,
  embedding) only within buckets.
- ``ann_query``: top-k neighbors of one query vector (broadcast literal
  predicate -> a single scan + native sort).
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import DataFrame, functions as F


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda s, x: s + x)


def _norm(a):
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x),
                              F.lit(0.0), lambda s, x: s + x))


def cosine_expr(a, b):
    return _dot(a, b) / (_norm(a) * _norm(b))


def cosine_topk(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 3,
) -> DataFrame:
    """For every vector: its top-k most-cosine-similar other vectors.
    Brute force (O(n^2)) — the exactness baseline."""
    from pyspark.sql import Window

    v = df.select(F.col(id_col).alias("id"),
                  F.col(vec_col).cast("array<double>").alias("vec"))
    a, b = v.alias("a"), v.alias("b")
    pairs = a.join(b, F.col("a.id") != F.col("b.id")).select(
        F.col("a.id").alias("id"),
        F.col("b.id").alias("neighbor"),
        cosine_expr(F.col("a.vec"), F.col("b.vec")).alias("cos"),
    )
    w = Window.partitionBy("id").orderBy(F.desc("cos"), F.asc("neighbor"))
    return (pairs.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= k).drop("rk"))


def _hyperplanes(dim: int, n_planes: int, seed: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim))


def rh_signature_col(vec, planes: np.ndarray):
    """Native column: packed sign bits of dot(vec, plane_i) as one BIGINT."""
    bits = None
    for i, p in enumerate(planes):
        plane = F.array(*[F.lit(float(x)) for x in p])
        bit = F.when(_dot(vec, plane) >= 0, F.lit(1 << i)).otherwise(F.lit(0))
        bits = bit if bits is None else bits + bit
    return bits.cast("long")


def _lsh_enriched(v: DataFrame, id_field, planes: np.ndarray,
                  n_planes: int, bands: int, width: int) -> DataFrame:
    """(id, nvec, keys): row-normalized vector + per-band signature keys,
    computed with the SAME NumPy math as the broadcast path (normalize,
    E @ planes.T sign bits, band slicing) so the two engines produce
    bit-identical candidates and cosines."""
    import pyarrow as pa

    from pyspark.sql.types import (
        ArrayType, DoubleType, LongType, StructField, StructType)

    schema = StructType([
        StructField("id", id_field.dataType),
        StructField("nvec", ArrayType(DoubleType())),
        StructField("keys", ArrayType(LongType())),
    ])
    mask = (1 << width) - 1
    shifts = np.arange(bands, dtype=np.int64) * width
    plane_bits = np.arange(n_planes, dtype=np.int64)

    def enrich(batches):
        for batch in batches:
            n = batch.num_rows
            if not n:
                continue
            dim = planes.shape[1]
            E = (batch.column(1).flatten().to_numpy()
                 .reshape(n, dim).astype(np.float64, copy=True))
            E /= np.linalg.norm(E, axis=1, keepdims=True)
            bits = (E @ planes.T >= 0).astype(np.int64)
            sigs = (bits << plane_bits).sum(axis=1)
            keys = (sigs[:, None] >> shifts[None, :]) & mask
            offs_v = np.arange(0, (n + 1) * dim, dim, dtype=np.int32)
            offs_k = np.arange(0, (n + 1) * bands, bands, dtype=np.int32)
            yield pa.RecordBatch.from_arrays(
                [batch.column(0),
                 pa.ListArray.from_arrays(pa.array(offs_v), pa.array(E.ravel())),
                 pa.ListArray.from_arrays(pa.array(offs_k), pa.array(keys.ravel()))],
                names=["id", "nvec", "keys"])

    return v.mapInArrow(enrich, schema)


def _drop_big_buckets(banded: DataFrame, cap: int | None) -> DataFrame:
    """Drop (blk, key) band buckets with more members than ``cap`` before
    a candidate self-join (None = keep all). The same degenerate-bucket
    guard as ``minhash_lsh_pairs``'s ``max_bucket_size`` — applied to the
    banded rows, so every verify engine sees identical buckets."""
    if cap is None:
        return banded
    small = (banded.groupBy("blk", "key")
             .agg(F.count(F.lit(1)).alias("_bn"))
             .where(F.col("_bn") <= cap).drop("_bn"))
    return banded.join(small, ["blk", "key"], "inner")


def _score_pairs_arrow(paired: DataFrame, id_field, dim: int) -> DataFrame:
    """(id, neighbor, cos) from (id, neighbor, _va, _vb) rows: one einsum
    per Arrow batch over the already-normalized vectors."""
    import pyarrow as pa

    out_schema = (f"id {id_field.dataType.simpleString()}, "
                  f"neighbor {id_field.dataType.simpleString()}, cos double")

    def score(batches):
        for batch in batches:
            n = batch.num_rows
            if not n:
                continue
            va = batch.column(2).flatten().to_numpy().reshape(n, dim)
            vb = batch.column(3).flatten().to_numpy().reshape(n, dim)
            cos = np.einsum("ij,ij->i", va, vb)
            yield pa.RecordBatch.from_arrays(
                [batch.column(0), batch.column(1), pa.array(cos)],
                names=["id", "neighbor", "cos"])

    return paired.select("id", "neighbor", "_va", "_vb").mapInArrow(
        score, out_schema)


def lsh_cosine_topk(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 3,
    n_planes: int = 16,
    bands: int = 4,
    seed: int = 7,
    dim: int | None = None,
    verify: str = "auto",
    max_broadcast_rows: int = 2_000_000,
    auto_local_rows: int = 20_000,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Approximate top-k via random-hyperplane LSH: candidates share at
    least one signature band; exact cosine ranks candidates.

    SIZE THE BAND KEYS FOR THE CORPUS: a band key has
    ``width = n_planes/bands`` bits, so expected bucket occupancy is
    ``n / 2^width`` and candidate volume ~ ``bands * n^2 / 2^width`` —
    the q9 bench shape (16 planes / 8 bands = 2-bit keys) is fine at 2k
    vectors and quadratic death at 50k (use e.g. 64/4 there). For
    buckets that stay degenerate anyway (duplicate-heavy corpora),
    ``max_bucket_size`` drops band buckets with more members than the
    cap before the self-join — identically in every engine, so results
    stay engine-independent.

    ``verify`` picks the scoring engine (identical results — same NumPy
    signature/cosine math in each):

    - ``"broadcast"``: candidate pairs carry ONLY integer ids; cosines come
      from a broadcast row-normalized embedding matrix scored with one
      NumPy matmul pass per Arrow batch. Fastest under
      ``max_broadcast_rows``; refuses inputs above it (the broadcast is
      dim*8 bytes per vector).
    - ``"local"``: fully distributed — the slim (blk, key, id) self-join
      generates candidates, normalized vectors are joined back onto the
      deduplicated pairs, and one einsum per Arrow batch scores them. No
      driver collect, no broadcast matrix, no ceiling: the 100-TB path.
    - ``"auto"`` (default): broadcast under ``auto_local_rows`` (the
      measured performance crossover — at 50k vectors the local engine
      runs ~2x faster than broadcast's driver-side banding frame), local
      above it; the probe is a bounded ``limit(n+1).count()``, never a
      full count of the table.
    - ``"sql"``: per-element higher-order-function scoring, kept as a
      pure-SQL reference (~50x slower on millions of pairs)."""
    from pyspark.sql import Window

    if n_planes % bands:
        raise ValueError("bands must divide n_planes")
    # NULL ids can never enter a pair graph — filtered at dispatch, the
    # package-wide law (and the broadcast engine would otherwise crash:
    # toPandas coerces an id column with a NULL to float64, so the
    # mapInArrow scorer emits float64 ids under a bigint-declared schema
    # — the minhash engine's r4 fix, mirrored here). NULL vectors can
    # never be near anything — same law as NULL text in the minhash
    # engine (and the Arrow enrichment would reshape-crash on them).
    v = df.where(F.col(id_col).isNotNull()
                 & F.col(vec_col).isNotNull()).select(
        F.col(id_col).alias("id"),
        F.col(vec_col).cast("array<double>").alias("vec"))
    if dim is None:
        first = v.select("vec").first()
        if first is None:
            raise ValueError(
                "no rows with a non-NULL id and vector to infer dim from; "
                "pass dim= explicitly for empty inputs")
        dim = len(first[0])
    width = n_planes // bands
    planes = _hyperplanes(dim, n_planes, seed)
    if verify not in ("auto", "broadcast", "local", "sql"):
        raise ValueError(f"unknown verify mode {verify!r}")
    if verify == "auto":
        # bounded probe: early-stops after thr+1 rows instead of a full
        # count of a possibly-100-TB table (round-2 advice)
        thr = min(auto_local_rows, max_broadcast_rows)
        verify = "local" if v.limit(thr + 1).count() > thr else "broadcast"

    cached: list = []
    if verify == "local":
        from pyspark import StorageLevel

        id_field = df.schema[id_col]
        enriched = _lsh_enriched(v, id_field, planes, n_planes, bands, width)
        # consumed by the band explode AND both join-back sides: persist or
        # the normalize+sign pass over the full table runs three times
        # (lazy result forbids unpersisting here — tagged on the result for
        # pipeline.cache.release_cached_deps)
        enriched = enriched.persist(StorageLevel.MEMORY_AND_DISK)
        cached.append(enriched)
        banded = enriched.select(
            "id", F.posexplode("keys").alias("blk", "key"))
        banded = _drop_big_buckets(banded, max_bucket_size)
        sa, sb = banded.alias("a"), banded.alias("b")
        cand = (
            sa.join(sb, (F.col("a.blk") == F.col("b.blk"))
                    & (F.col("a.key") == F.col("b.key"))
                    & (F.col("a.id") != F.col("b.id")))
            .select(F.col("a.id").alias("id"), F.col("b.id").alias("neighbor"))
            .dropDuplicates(["id", "neighbor"])
        )
        va = enriched.select("id", F.col("nvec").alias("_va"))
        vb = enriched.select(F.col("id").alias("neighbor"),
                             F.col("nvec").alias("_vb"))
        paired = cand.join(va, "id").join(vb, "neighbor")
        scored = _score_pairs_arrow(paired, id_field, dim)
    elif verify == "broadcast":
        import pandas as pd
        import pyarrow as pa

        pdf = v.toPandas()
        if len(pdf) > max_broadcast_rows:
            raise ValueError(
                f"{len(pdf)} embeddings exceed max_broadcast_rows="
                f"{max_broadcast_rows}; use verify='sql' or raise the limit")
        if len(pdf) == 0:
            # empty input (possible only with dim= given): np.stack and
            # createDataFrame both refuse zero rows — there are no pairs
            from pyspark.sql.types import DoubleType, StructField, StructType

            id_field = df.schema[id_col]
            return df.sparkSession.createDataFrame([], StructType([
                StructField("id", id_field.dataType),
                StructField("neighbor", id_field.dataType),
                StructField("cos", DoubleType())]))
        # ids may be any type: join on dense row indices, map back on output
        id_values = pdf["id"].to_numpy()
        order = np.argsort(id_values, kind="stable")
        id_sorted = id_values[order]
        E = np.stack(pdf["vec"].to_numpy()[order]).astype(np.float64)
        E /= np.linalg.norm(E, axis=1, keepdims=True)
        n = len(E)
        spark = df.sparkSession
        bc = spark.sparkContext.broadcast((id_sorted.tolist(), E))

        # signatures in one NumPy matmul (same math as rh_signature_col,
        # without compiling a bands*dim-literal SQL expression)
        bits = (E @ planes.T >= 0).astype(np.int64)
        sigs = (bits << np.arange(n_planes, dtype=np.int64)).sum(axis=1)
        mask = (1 << width) - 1
        rows = {
            "idx": np.repeat(np.arange(n, dtype=np.int64), bands),
            "blk": np.tile(np.arange(bands, dtype=np.int64), n),
            "key": (
                (sigs[:, None] >> (np.arange(bands, dtype=np.int64)[None, :] * width))
                & mask
            ).ravel(),
        }
        slim = spark.createDataFrame(pd.DataFrame(rows))
        slim = _drop_big_buckets(slim, max_bucket_size)
        sa, sb = slim.alias("a"), slim.alias("b")
        cand = (
            sa.join(sb, (F.col("a.blk") == F.col("b.blk")) & (F.col("a.key") == F.col("b.key"))
                    & (F.col("a.idx") != F.col("b.idx")))
            .select(F.col("a.idx").alias("ia"), F.col("b.idx").alias("ib"))
            .dropDuplicates(["ia", "ib"])
        )
        id_field = df.schema[id_col]
        out_schema = (f"id {id_field.dataType.simpleString()}, "
                      f"neighbor {id_field.dataType.simpleString()}, cos double")

        def score(batches):
            idlist, mat = bc.value
            idarr = np.asarray(idlist)
            for batch in batches:
                ia = batch.column(0).to_numpy()
                ib = batch.column(1).to_numpy()
                cos = np.einsum("ij,ij->i", mat[ia], mat[ib])
                yield pa.RecordBatch.from_arrays(
                    [pa.array(idarr[ia].tolist()), pa.array(idarr[ib].tolist()),
                     pa.array(cos)],
                    names=["id", "neighbor", "cos"])

        scored = cand.mapInArrow(score, out_schema)
    else:
        sig = v.withColumn("sig", rh_signature_col(F.col("vec"), planes))
        banded = sig.select(
            "id", "vec",
            F.explode(F.array(*[
                F.struct(
                    F.lit(bnd).alias("blk"),
                    F.shiftrightunsigned(F.col("sig"), bnd * width)
                    .bitwiseAND(F.lit((1 << width) - 1)).alias("key"),
                )
                for bnd in range(bands)
            ])).alias("p"),
        ).select("id", "vec", "p.blk", "p.key")
        banded = _drop_big_buckets(banded, max_bucket_size)
        a, b = banded.alias("a"), banded.alias("b")
        scored = (
            a.join(b, (F.col("a.blk") == F.col("b.blk")) & (F.col("a.key") == F.col("b.key"))
                   & (F.col("a.id") != F.col("b.id")))
            .select(F.col("a.id").alias("id"), F.col("b.id").alias("neighbor"),
                    F.col("a.vec").alias("va"), F.col("b.vec").alias("vb"))
            .dropDuplicates(["id", "neighbor"])
            .withColumn("cos", cosine_expr(F.col("va"), F.col("vb")))
            .drop("va", "vb")
        )
    from .cache import tag_cached_deps

    w = Window.partitionBy("id").orderBy(F.desc("cos"), F.asc("neighbor"))
    return tag_cached_deps(
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k).drop("rk"), cached)


def _train_ivf_centroids(
    v: DataFrame,
    n_clusters: int,
    kmeans_iters: int,
    seed: int,
    train_rows: int,
) -> np.ndarray:
    """Spherical k-means centroids from a BOUNDED deterministic sample
    (``deterministic_sample``: the train_rows smallest xxhash64(id) — a
    pure function of the data, same on any cluster size). Only the sample
    reaches the driver; the result is the (n_clusters, dim) row-normalized
    centroid matrix. ``v`` must have columns (id, vec)."""
    from ..spark.skew import deterministic_sample

    # Arrow-path driver transfer (toPandas), NOT a row collect: same rows
    # in the same deterministic order, ~3x faster for array columns
    pdf = deterministic_sample(v, train_rows, "id", salt=seed).toPandas()
    sample = np.asarray(
        [np.asarray(x) for x in pdf["vec"]], dtype=np.float64)
    if sample.size == 0:
        raise ValueError("cannot train IVF centroids: no non-null ids")
    S = sample / np.linalg.norm(sample, axis=1, keepdims=True)
    rng = np.random.default_rng(seed)
    cents = S[rng.choice(len(S), size=min(n_clusters, len(S)),
                         replace=False)].copy()
    for _ in range(kmeans_iters):
        assign = (S @ cents.T).argmax(axis=1)
        for c in range(len(cents)):
            members = S[assign == c]
            if len(members):
                m = members.sum(axis=0)
                norm = np.linalg.norm(m)
                if norm > 0:
                    cents[c] = m / norm
    return cents


def ivf_index(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_clusters: int = 16,
    kmeans_iters: int = 10,
    seed: int = 11,
    train_rows: int = 100_000,
) -> tuple[DataFrame, np.ndarray]:
    """Build a reusable IVF index: (index_df, centroids).

    ``index_df`` = (id, nvec: array<double>, cluster: long) — every vector
    L2-normalized and assigned to its single nearest centroid in one NumPy
    matmul per Arrow batch; ``centroids`` is the trained (n_clusters, dim)
    matrix (persist it alongside the index).

    The scale move: write the index ``partitionBy("cluster")`` to parquet.
    ``ann_query_ivf`` filters on ``cluster IN (probed)``, which Spark turns
    into PARTITION PRUNING — a query then reads only n_probe/n_clusters of
    the corpus from storage, the inverted-file property that makes IVF
    sublinear. Deterministic end to end (seeded k-means on a
    data-deterministic sample)."""
    v = df.select(F.col(id_col).alias("id"),
                  F.col(vec_col).cast("array<double>").alias("vec"))
    cents = _train_ivf_centroids(v, n_clusters, kmeans_iters, seed, train_rows)
    return _ivf_assign(v, cents, df.schema[id_col]), cents


def _ivf_assign(v: DataFrame, cents: np.ndarray, id_field) -> DataFrame:
    """(id, nvec, cluster) rows: every vector L2-normalized and assigned
    to its nearest centroid — one NumPy matmul per Arrow batch. The one
    assignment kernel shared by ``ivf_index`` and ``append_to_ivf_index``
    so index generations can never disagree on the law."""
    import pyarrow as pa

    from pyspark.sql.types import (
        ArrayType, DoubleType, LongType, StructField, StructType)

    dim = cents.shape[1]
    bc = v.sparkSession.sparkContext.broadcast(cents)
    schema = StructType([
        StructField("id", id_field.dataType),
        StructField("nvec", ArrayType(DoubleType())),
        StructField("cluster", LongType()),
    ])

    def assign(batches):
        C = bc.value
        for batch in batches:
            n = batch.num_rows
            if not n:
                continue
            E = (batch.column(1).flatten().to_numpy()
                 .reshape(n, dim).astype(np.float64, copy=True))
            E /= np.linalg.norm(E, axis=1, keepdims=True)
            best = (E @ C.T).argmax(axis=1).astype(np.int64)
            offs = np.arange(0, (n + 1) * dim, dim, dtype=np.int32)
            yield pa.RecordBatch.from_arrays(
                [batch.column(0),
                 pa.ListArray.from_arrays(pa.array(offs), pa.array(E.ravel())),
                 pa.array(best)],
                names=["id", "nvec", "cluster"])

    return v.mapInArrow(assign, schema)


def write_ivf_index(
    index_df: DataFrame,
    centroids: np.ndarray,
    path: str,
    mode: str = "error",
    extra_meta: dict | None = None,
) -> None:
    """Persist an ``ivf_index`` as a self-contained on-disk artifact.

    The member table is written ``partitionBy("cluster")`` (the layout
    ``ann_query_ivf``'s ``cluster IN (...)`` filter prunes to n_probe/
    n_clusters of), and the trained centroid matrix rides in a
    ``_ivf_meta.json`` sidecar INSIDE the index directory — written
    through Hadoop's FileSystem API, so local, HDFS, and s3a:// paths all
    work, and the underscore prefix keeps Spark's parquet reader from
    treating it as data. Floats serialize via repr (exact round-trip), so
    a reloaded index probes identically.

    ``extra_meta`` merges caller keys (e.g. a default n_probe, the
    training seed) into the sidecar; the reserved keys (centroids,
    n_clusters, dim, format_version) are rejected — silently clobbering
    them would corrupt the index or desynchronize the probe."""
    import json

    spark = index_df.sparkSession
    C = np.asarray(centroids, dtype=np.float64)
    meta = {
        "format_version": 1,
        "n_clusters": int(C.shape[0]),
        "dim": int(C.shape[1]),
        "centroids": [[float(x) for x in row] for row in C],
    }
    bad = set(extra_meta or {}) & set(meta)
    if bad:
        raise ValueError(f"extra_meta may not override reserved sidecar "
                         f"keys {sorted(bad)}")
    # member table FIRST, sidecar LAST: the sidecar is the commit marker —
    # read_ivf_index refuses a sidecar-less dir, so a crashed write can
    # never serve a partial index (the retrain_ivf_index safety contract)
    index_df.write.partitionBy("cluster").mode(mode).parquet(path)
    meta.update(extra_meta or {})
    meta.setdefault("generation", 1)
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path.rstrip("/") + "/_ivf_meta.json")
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    out = fs.create(hpath, True)
    try:
        out.write(bytearray(json.dumps(meta).encode("utf-8")))
    finally:
        out.close()


def read_ivf_index(spark, path: str) -> tuple[DataFrame, np.ndarray, dict]:
    """Load a ``write_ivf_index`` artifact: (index_df, centroids, meta).

    The parquet scan keeps the ``cluster`` partition column, so
    ``ann_query_ivf(index_df, centroids, ...)`` served from this frame
    gets genuine partition pruning; ``meta`` is the sidecar dict (minus
    the centroid payload)."""
    import json

    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path.rstrip("/") + "/_ivf_meta.json")
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    if not fs.exists(hpath):
        raise FileNotFoundError(
            f"no _ivf_meta.json under {path!r} — not a write_ivf_index "
            "artifact (write the index with write_ivf_index, not bare "
            ".write.parquet, so the centroids travel with it)")
    stream = fs.open(hpath)
    try:
        raw = jvm.org.apache.commons.io.IOUtils.toString(stream, "UTF-8")
    finally:
        stream.close()
    meta = json.loads(raw)
    cents = np.asarray(meta.pop("centroids"), dtype=np.float64)
    if cents.shape != (meta["n_clusters"], meta["dim"]):
        raise ValueError(f"corrupt IVF sidecar: centroid shape "
                         f"{cents.shape} != ({meta['n_clusters']}, "
                         f"{meta['dim']})")
    return spark.read.parquet(path), cents, meta


def append_to_ivf_index(
    df: DataFrame,
    path: str,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> dict:
    """Fold new vectors into an existing on-disk IVF index under its OWN
    centroids — no retraining, so assignments stay consistent with every
    earlier generation and probes prune identically across appends. New
    files land inside the existing ``cluster=...`` partition directories
    (partition pruning keeps working per append generation). NULL-id and
    NULL-vector rows are excluded. Returns the sidecar meta.

    When the data distribution drifts far from the trained centroids,
    clusters go unbalanced and recall at fixed n_probe decays — the
    rebalance story is a periodic retrain + full rewrite (``ivf_index`` +
    ``write_ivf_index`` to a new path), not an in-place mutation."""
    spark = df.sparkSession
    _, cents, meta = read_ivf_index(spark, path)
    base = df.where(F.col(id_col).isNotNull() & F.col(vec_col).isNotNull())
    first = base.select(vec_col).first()
    if first is not None and len(first[0]) != meta["dim"]:
        raise ValueError(
            f"appended vectors have dim {len(first[0])} but the index was "
            f"trained at dim {meta['dim']}")
    v = base.select(F.col(id_col).alias("id"),
                    F.col(vec_col).cast("array<double>").alias("vec"))
    assigned = _ivf_assign(v, cents, df.schema[id_col])
    assigned.write.partitionBy("cluster").mode("append").parquet(path)
    return meta


def retrain_ivf_index(
    spark,
    path: str,
    new_path: str,
    n_clusters: int | None = None,
    kmeans_iters: int = 10,
    seed: int = 11,
    train_rows: int = 100_000,
) -> dict:
    """Periodic IVF rebalance (the drift remedy ``append_to_ivf_index``
    documents): re-run spherical k-means over a BOUNDED deterministic
    sample of the FULL index — base plus every appended generation, so
    drifted appends pull centroids toward where the data actually lives —
    and rewrite every member under the new centroids into ``new_path``
    as the next index generation.

    Versioning + mid-rewrite safety: the sidecar carries ``generation``
    (old + 1) and ``retrained_from``; ``write_ivf_index`` commits the
    member table FIRST and the sidecar LAST, and ``read_ivf_index``
    refuses any directory without a sidecar — so a probe can never read a
    half-rewritten index: it either sees the complete new generation or a
    loud FileNotFoundError, and the old generation at ``path`` stays
    intact throughout (swap paths only after this returns).

    Scale shape: only the ``train_rows`` deterministic sample reaches the
    driver; reassignment is the shared ``_ivf_assign`` matmul kernel
    streaming over the index; the rewrite is one partitionBy("cluster")
    write. Returns the new sidecar meta."""
    if path.rstrip("/") == new_path.rstrip("/"):
        raise ValueError(
            "retrain must write a NEW generation path — rewriting in "
            "place would race live probes against a half-deleted index")
    idx, _cents, meta = read_ivf_index(spark, path)
    v = idx.select("id", F.col("nvec").alias("vec"))
    k = n_clusters or meta["n_clusters"]
    new_cents = _train_ivf_centroids(v, k, kmeans_iters, seed, train_rows)
    assigned = _ivf_assign(v, new_cents, idx.schema["id"])
    carried = {k2: v2 for k2, v2 in meta.items()
               if k2 not in ("format_version", "n_clusters", "dim",
                             "generation", "retrained_from")}
    write_ivf_index(assigned, new_cents, new_path, extra_meta={
        **carried,
        "generation": int(meta.get("generation", 1)) + 1,
        "retrained_from": path,
    })
    return read_ivf_index(spark, new_path)[2]


def ann_query_ivf(
    index_df: DataFrame,
    centroids: np.ndarray,
    queries,
    k: int = 10,
    n_probe: int = 2,
    query_ids=None,
) -> DataFrame:
    """Sublinear batched ANN over an ``ivf_index``: each query probes only
    its ``n_probe`` nearest centroids' inverted lists.

    Query->centroid assignment is driver-side (nq x n_clusters — tiny);
    the probed member rows are selected with a native ``cluster IN (...)``
    filter (partition pruning when the index was written
    ``partitionBy("cluster")``), then scored per Arrow batch against the
    broadcast query matrix with the same tie-safe per-batch top-k
    pre-filter as ``ann_query_batch``. Returns (query_id, id, cos) —
    approximate: a true neighbor in an unprobed cluster is missed (raise
    ``n_probe`` for recall, the standard IVF dial)."""
    import pyarrow as pa

    from pyspark.sql import Window

    Q = np.asarray(queries, dtype=np.float64)
    if Q.ndim == 1:
        Q = Q[None, :]
    Q = Q / np.linalg.norm(Q, axis=1, keepdims=True)
    nq, dim = Q.shape
    qids = np.arange(nq, dtype=np.int64) if query_ids is None \
        else np.asarray(query_ids, dtype=np.int64)
    if len(qids) != nq:
        raise ValueError(f"{len(qids)} query_ids for {nq} queries")
    eff_probe = min(n_probe, len(centroids))
    probes = np.argsort(-(Q @ centroids.T), axis=1)[:, :eff_probe]
    needed = sorted({int(c) for row in probes for c in row})
    # query q only scores members of ITS probed clusters: map cluster ->
    # probing queries, ship with the broadcast
    by_cluster: dict[int, list[int]] = {}
    for qi, row in enumerate(probes):
        for c in row:
            by_cluster.setdefault(int(c), []).append(qi)
    bc = index_df.sparkSession.sparkContext.broadcast((Q, qids, by_cluster))
    id_field = index_df.schema["id"]
    out_schema = (f"query_id long, id {id_field.dataType.simpleString()}, "
                  "cos double")
    probed = index_df.where(F.col("cluster").isin(needed)) \
                     .select("id", "nvec", "cluster")

    def score(batches):
        Qm, qid_arr, cl_map = bc.value
        for batch in batches:
            n = batch.num_rows
            if not n:
                continue
            E = (batch.column(1).flatten().to_numpy()
                 .reshape(n, dim).astype(np.float64, copy=False))
            cl = batch.column(2).to_numpy()
            # mask: row i scorable by query j only if j probed cluster(i)
            sims = E @ Qm.T  # (n, nq)
            np.nan_to_num(sims, copy=False, nan=-2.0)
            mask = np.full(sims.shape, False)
            for c, qlist in cl_map.items():
                rows_c = cl == c
                if rows_c.any():
                    mask[np.ix_(rows_c, qlist)] = True
            sims = np.where(mask, sims, -2.0)
            kk = min(k, n)
            kth = np.partition(sims, n - kk, axis=0)[n - kk, :]
            keep = sims >= np.maximum(kth[None, :], -1.5)
            rows, cols = np.nonzero(keep)
            if not len(rows):
                continue
            yield pa.RecordBatch.from_arrays(
                [pa.array(qid_arr[cols]),
                 batch.column(0).take(pa.array(rows, type=pa.int64())),
                 pa.array(sims[rows, cols])],
                names=["query_id", batch.schema.names[0], "cos"])

    scored = probed.mapInArrow(score, out_schema)
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("id"))
    return (scored.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= k).drop("rk"))


def ivf_cosine_topk(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 3,
    n_clusters: int = 16,
    n_probe: int = 2,
    kmeans_iters: int = 10,
    seed: int = 11,
    train_rows: int = 100_000,
) -> DataFrame:
    """Approximate top-k via an IVF (inverted-file) index, fully
    distributed:

    1. Train spherical k-means centroids on a BOUNDED deterministic sample
       (``deterministic_sample``: the train_rows smallest xxhash64(id) —
       a pure function of the data, same on any cluster size). Only the
       sample ever reaches the driver; only the (n_clusters x dim) centroid
       matrix is broadcast.
    2. Assign every vector to its ``n_probe`` nearest centroids in one
       NumPy matmul per Arrow batch (mapInArrow) — normalized vectors and
       cluster ids stay distributed.
    3. Candidates = pairs sharing a cluster: a self-join that shuffles only
       (cluster, id) rows.
    4. Verify: join normalized vectors back onto the deduplicated pairs and
       score with one einsum per Arrow batch.

    No full-table collect anywhere — the input size is unbounded.
    Deterministic (fixed seed, fixed iteration count, data-deterministic
    sample)."""
    import pyarrow as pa

    from pyspark import StorageLevel
    from pyspark.sql import Window
    from pyspark.sql.types import (
        ArrayType, DoubleType, LongType, StructField, StructType)

    from ..spark.skew import deterministic_sample

    v = df.select(F.col(id_col).alias("id"),
                  F.col(vec_col).cast("array<double>").alias("vec"))

    # --- 1. bounded-sample k-means training (driver-side, O(train_rows)) ---
    cents = _train_ivf_centroids(v, n_clusters, kmeans_iters, seed, train_rows)
    dim = cents.shape[1]
    bc_cents = df.sparkSession.sparkContext.broadcast(cents)
    eff_probe = min(n_probe, len(cents))

    # --- 2. distributed assignment: (id, nvec, clusters) per batch ---------
    id_field = df.schema[id_col]
    assign_schema = StructType([
        StructField("id", id_field.dataType),
        StructField("nvec", ArrayType(DoubleType())),
        StructField("clusters", ArrayType(LongType())),
    ])

    def assign_batches(batches):
        C = bc_cents.value
        for batch in batches:
            n = batch.num_rows
            if not n:
                continue
            E = (batch.column(1).flatten().to_numpy()
                 .reshape(n, dim).astype(np.float64, copy=True))
            E /= np.linalg.norm(E, axis=1, keepdims=True)
            sims = E @ C.T
            probes = np.argsort(-sims, axis=1)[:, :eff_probe].astype(np.int64)
            offs_v = np.arange(0, (n + 1) * dim, dim, dtype=np.int32)
            offs_c = np.arange(0, (n + 1) * eff_probe, eff_probe, dtype=np.int32)
            yield pa.RecordBatch.from_arrays(
                [batch.column(0),
                 pa.ListArray.from_arrays(pa.array(offs_v), pa.array(E.ravel())),
                 pa.ListArray.from_arrays(pa.array(offs_c),
                                          pa.array(probes.ravel()))],
                names=["id", "nvec", "clusters"])

    enriched = v.mapInArrow(assign_batches, assign_schema)
    # consumed by the cluster explode AND both vector join-back sides
    # (tagged on the result for pipeline.cache.release_cached_deps)
    enriched = enriched.persist(StorageLevel.MEMORY_AND_DISK)

    # --- 3. candidates: slim (cluster, id) self-join ------------------------
    clustered = enriched.select("id", F.explode("clusters").alias("cluster"))
    a, b = clustered.alias("a"), clustered.alias("b")
    cand = (
        a.join(b, (F.col("a.cluster") == F.col("b.cluster"))
               & (F.col("a.id") != F.col("b.id")))
        .select(F.col("a.id").alias("id"), F.col("b.id").alias("neighbor"))
        .dropDuplicates(["id", "neighbor"])
    )

    # --- 4. verify: join nvecs back, einsum per batch -----------------------
    va = enriched.select("id", F.col("nvec").alias("_va"))
    vb = enriched.select(F.col("id").alias("neighbor"),
                         F.col("nvec").alias("_vb"))
    scored = _score_pairs_arrow(cand.join(va, "id").join(vb, "neighbor"),
                                id_field, dim)
    from .cache import tag_cached_deps

    w = Window.partitionBy("id").orderBy(F.desc("cos"), F.asc("neighbor"))
    return tag_cached_deps(
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k).drop("rk"), [enriched])


def ann_query(
    df: DataFrame,
    query_vec,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 10,
) -> DataFrame:
    """Top-k neighbors of one query vector — a single scan, native sort."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    v = F.col(vec_col).cast("array<double>")
    return (
        df.select(F.col(id_col), cosine_expr(v, q).alias("cos"))
        .orderBy(F.desc("cos"), F.asc(id_col))
        .limit(k)
    )


def ann_query_batch(
    df: DataFrame,
    queries,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 10,
    query_ids=None,
) -> DataFrame:
    """Exact top-k neighbors for a BATCH of query vectors in ONE table scan.

    The (nq, dim) query matrix is L2-normalized once and broadcast; each
    Arrow batch computes all nq cosines with a single matmul and emits only
    its per-query top-k survivors (every row tying the k-th score is kept,
    so global tie-breaks by id stay exact), then one window keeps the final
    per-query (cos desc, id asc) top-k. Scan volume is one pass regardless
    of nq; shuffle is ~O(batches * nq * k) candidate rows, never the table.

    ``queries``: array-like (nq, dim). ``query_ids``: optional labels
    (default 0..nq-1). Returns (query_id, id_col, cos)."""
    import pyarrow as pa

    from pyspark.sql import Window

    Q = np.asarray(queries, dtype=np.float64)
    if Q.ndim == 1:
        Q = Q[None, :]
    Q = Q / np.linalg.norm(Q, axis=1, keepdims=True)
    nq, dim = Q.shape
    qids = np.arange(nq, dtype=np.int64) if query_ids is None \
        else np.asarray(query_ids, dtype=np.int64)
    if len(qids) != nq:
        raise ValueError(f"{len(qids)} query_ids for {nq} queries")
    bc = df.sparkSession.sparkContext.broadcast((Q, qids))
    id_field = df.schema[id_col]
    out_schema = (f"query_id long, {id_col} {id_field.dataType.simpleString()}, "
                  "cos double")
    v = df.select(F.col(id_col), F.col(vec_col).cast("array<double>").alias("vec"))

    def topk_batches(batches):
        Qm, qid_arr = bc.value
        for batch in batches:
            n = batch.num_rows
            if not n:
                continue
            E = (batch.column(1).flatten().to_numpy()
                 .reshape(n, dim).astype(np.float64, copy=True))
            E /= np.linalg.norm(E, axis=1, keepdims=True)
            sims = E @ Qm.T  # (n, nq)
            # a zero-norm vector yields NaN cosines, and NaN sorts HIGHEST
            # in np.partition — map to -2 (below any cosine) so it can
            # neither win nor poison a query's k-th threshold
            np.nan_to_num(sims, copy=False, nan=-2.0)
            kk = min(k, n)
            # per-query k-th score; keep every row >= it (ties included, so
            # the global id-asc tie-break can never lose the true winner).
            # Floor at -1.5: a batch with fewer than kk valid rows has
            # kth = -2.0 (the NaN sentinel), which would otherwise pass
            # every degenerate row through to the output
            kth = np.partition(sims, n - kk, axis=0)[n - kk, :]
            rows, cols = np.nonzero(sims >= np.maximum(kth[None, :], -1.5))
            if not len(rows):
                continue
            yield pa.RecordBatch.from_arrays(
                [pa.array(qid_arr[cols]),
                 batch.column(0).take(pa.array(rows, type=pa.int64())),
                 pa.array(sims[rows, cols])],
                names=["query_id", batch.schema.names[0], "cos"])

    scored = v.mapInArrow(topk_batches, out_schema)
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc(id_col))
    return (scored.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= k).drop("rk"))


# ---------------------------------------------------------------------------
# Johnson-Lindenstrauss random projection (dimension reduction)
# ---------------------------------------------------------------------------


def jl_projection(in_dim: int, out_dim: int, seed: int = 0) -> np.ndarray:
    """The deterministic (in_dim, out_dim) Gaussian JL matrix, scaled by
    1/sqrt(out_dim) so E[||x R||^2] = ||x||^2 — a pure function of
    (in_dim, out_dim, seed), so every worker regenerates it identically
    and nothing needs to ride a broadcast or sidecar."""
    if out_dim < 1 or in_dim < 1:
        raise ValueError(f"dims must be >= 1, got ({in_dim}, {out_dim})")
    rng = np.random.default_rng(seed)
    return rng.standard_normal((in_dim, out_dim)) / np.sqrt(out_dim)


def jl_project_rows(X: np.ndarray, R: np.ndarray) -> np.ndarray:
    """``X @ R`` with a FIXED per-row accumulation order (sum over input
    dims j in order), so a row's projection is bit-identical no matter
    how rows are batched — BLAS gemm blocking varies with the batch
    shape and would make `reduce_dim` partitioning-dependent in the last
    ulp. Cost is the same O(n * in_dim * out_dim) vectorized flops."""
    X = np.asarray(X, dtype=np.float64)
    Y = np.zeros((X.shape[0], R.shape[1]), dtype=np.float64)
    for j in range(R.shape[0]):
        Y += X[:, j, None] * R[j][None, :]
    return Y


def reduce_dim(
    df: DataFrame,
    out_dim: int,
    in_dim: int,
    vec_col: str = "embedding",
    seed: int = 0,
) -> DataFrame:
    """Johnson-Lindenstrauss dimension reduction of an embedding column:
    ``vec -> vec @ R`` with the deterministic Gaussian ``jl_projection``
    matrix (Johnson & Lindenstrauss 1984; Gaussian form e.g. Indyk &
    Motwani 1998). Pairwise distances/inner products are preserved within
    (1 +- eps) w.h.p. for out_dim = O(ln n / eps^2) — the standard
    preprocessing step before LSH / IVF / PQ when raw embeddings are
    wider than the similarity task needs (4x narrower vectors = 4x less
    shuffle and index footprint for the downstream engines in this
    module, which all take the projected column unchanged).

    Rows with a NULL vector are dropped (the `pq_encode` convention);
    every other column passes through untouched. One vectorized
    fixed-order matmul (``jl_project_rows``) per Arrow batch against the
    worker-regenerated R — no shuffle, no broadcast, a pure
    pipeline-local projection of the scan, bit-identical under any
    partitioning. A ragged row (wrong ``in_dim``) fails the job with a
    clear error."""
    import pyarrow as pa

    from pyspark.sql.types import ArrayType, DoubleType, StructField, StructType

    if out_dim > in_dim:
        raise ValueError(
            f"out_dim {out_dim} must be <= in_dim {in_dim} (JL reduces)")
    jl_projection(in_dim, out_dim, seed)  # validate dims eagerly
    names = df.columns
    if vec_col not in names:
        raise ValueError(f"no column {vec_col!r} in {names}")
    vi = names.index(vec_col)
    v = df.where(F.col(vec_col).isNotNull()) \
          .withColumn(vec_col, F.col(vec_col).cast("array<double>"))
    out_schema = StructType([
        f if f.name != vec_col
        else StructField(vec_col, ArrayType(DoubleType()), True)
        for f in v.schema.fields])
    in_dim = int(in_dim)
    out_dim = int(out_dim)

    def project(batches):
        R = jl_projection(in_dim, out_dim, seed)
        for batch in batches:
            n = batch.num_rows
            if not n:
                continue
            col = batch.column(vi)
            flat = col.flatten().to_numpy(zero_copy_only=False)
            if flat.size != n * in_dim:
                raise ValueError(
                    f"expected {n} vectors of dim {in_dim}, got "
                    f"{flat.size} values — ragged or wrong-dim input")
            Y = jl_project_rows(flat.reshape(n, in_dim), R)
            offs = np.arange(n + 1, dtype=np.int32) * out_dim
            new = pa.ListArray.from_arrays(
                pa.array(offs, type=pa.int32()),
                pa.array(Y.reshape(-1), type=pa.float64()))
            arrays = [new if i == vi else batch.column(i)
                      for i in range(batch.num_columns)]
            yield pa.RecordBatch.from_arrays(arrays, names=names)

    return v.mapInArrow(project, out_schema)
