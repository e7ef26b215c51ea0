"""Product quantization (PQ) — the ANN memory-compression layer.

Jégou, Douze & Schmid 2011 ("Product Quantization for Nearest Neighbor
Search"): split the embedding space into ``m`` orthogonal subspaces, run
k-means with ``2**nbits`` centroids in EACH subspace, and store every
vector as its ``m`` per-subspace centroid ids — an ``m``-byte code in
place of a ``dim``-float array. At dim=64/float64 and m=8 that is a 64×
compression: the codes for 10^12 vectors fit where the raw floats never
could, which is what makes exhaustive-ish ANN over a 100-TB embedding
corpus feasible at all.

Query-time scoring is ADC (asymmetric distance computation): the QUERY
stays un-quantized; per query one tiny (m, 2**nbits) lookup table of
subspace dot products is built driver-side, and scoring a database
vector is m byte-indexed table lookups + adds — no float vector is read
at query time. Because vectors are L2-normalized before encoding, the
ADC score ``q · decode(code)`` approximates cosine similarity.

Spark shapes (the same contract as the IVF layer in ``similarity.py``):

- codebooks train driver-side on a BOUNDED ``deterministic_sample`` (a
  pure function of the data — identical on any cluster size);
- encoding is one NumPy matmul chain per Arrow batch (``mapInArrow``,
  no shuffle — audit-pinned);
- queries broadcast one LUT blob and stream the code table once with a
  per-batch top-k pre-filter, shuffling only ~O(batches × nq × k)
  candidate rows;
- ``write_pq_index``/``read_pq_index`` persist codes + codebook sidecar
  through the Hadoop FS API (local/HDFS/s3a), member table FIRST and
  sidecar LAST so a crashed write can never serve a partial index;
- ``ivf_pq_index``/``ann_query_ivf_pq`` compose with the IVF layer as
  IVFADC: codes quantize the RESIDUAL ``nvec - centroid(cluster)``, and
  a probe scores ``q·centroid + ADC(residual)`` over only ``n_probe``
  inverted lists (partition pruning on the ``cluster`` column).
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import DataFrame, functions as F

_PQ_SIDECAR = "_pq_meta.json"
_IVFPQ_SIDECAR = "_ivf_pq_meta.json"


# ---------------------------------------------------------------------------
# training

def _kmeans_subspaces(S: np.ndarray, m: int, nbits: int, iters: int,
                      seed: int) -> np.ndarray:
    """Per-subspace Lloyd k-means over the (n, dim) training matrix.
    Returns (m, 2**nbits, dim//m) codebooks. Deterministic (seeded init
    from sample rows); an emptied cluster keeps its previous centroid."""
    n, dim = S.shape
    dsub = dim // m
    k = 1 << nbits
    rng = np.random.default_rng(seed)
    books = np.empty((m, k, dsub), dtype=np.float64)
    for j in range(m):
        X = np.ascontiguousarray(S[:, j * dsub:(j + 1) * dsub])
        init = rng.choice(n, size=k, replace=n < k)
        C = X[init].copy()
        for _ in range(iters):
            # argmin ||x-c||^2 == argmin (||c||^2 - 2 x·c); ||x||^2 drops
            d = (C * C).sum(axis=1)[None, :] - 2.0 * (X @ C.T)
            assign = d.argmin(axis=1)
            acc = np.zeros_like(C)
            np.add.at(acc, assign, X)
            counts = np.bincount(assign, minlength=k)
            nz = counts > 0
            C[nz] = acc[nz] / counts[nz, None]
        books[j] = C
    return books


def train_pq_codebooks(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    m: int = 8,
    nbits: int = 8,
    kmeans_iters: int = 15,
    seed: int = 11,
    train_rows: int = 100_000,
) -> np.ndarray:
    """Train PQ codebooks: (m, 2**nbits, dim//m) float64.

    Vectors are L2-normalized before training (the cosine contract every
    engine in this package shares), then each of the ``m`` subspaces is
    k-means-quantized independently on a bounded ``deterministic_sample``
    (the ``train_rows`` smallest xxhash64(id) rows — same rows on any
    partitioning, so codebooks are a pure function of the data). Only
    the sample reaches the driver."""
    from ..spark.skew import deterministic_sample

    if nbits < 1 or nbits > 8:
        raise ValueError(f"nbits must be in 1..8 (one code byte per "
                         f"subspace), got {nbits}")
    v = df.where(F.col(vec_col).isNotNull()).select(
        F.col(id_col).alias("id"),
        F.col(vec_col).cast("array<double>").alias("vec"))
    # Arrow-path driver transfer (toPandas), NOT a row collect: same rows
    # in the same deterministic order, ~3x faster for array columns
    pdf = deterministic_sample(v, train_rows, "id", salt=seed).toPandas()
    sample = np.asarray([np.asarray(x) for x in pdf["vec"]],
                        dtype=np.float64)
    if sample.size == 0:
        raise ValueError("cannot train PQ codebooks: no non-null "
                         f"({id_col}, {vec_col}) rows")
    dim = sample.shape[1]
    if dim % m:
        raise ValueError(f"dim {dim} is not divisible by m={m} subspaces")
    norms = np.linalg.norm(sample, axis=1, keepdims=True)
    S = sample / np.where(norms == 0, 1.0, norms)
    return _kmeans_subspaces(S, m, nbits, kmeans_iters, seed)


# ---------------------------------------------------------------------------
# encode / decode

def _codes_to_binary(codes_u8: np.ndarray):
    """(n, m) uint8 code matrix -> one Arrow binary array of m-byte rows,
    zero Python per row (offsets + data buffers built directly)."""
    import pyarrow as pa

    n, m = codes_u8.shape
    offs = np.arange(0, (n + 1) * m, m, dtype=np.int32)
    return pa.Array.from_buffers(
        pa.binary(), n,
        [None, pa.py_buffer(offs.tobytes()),
         pa.py_buffer(np.ascontiguousarray(codes_u8).tobytes())])


def _binary_to_codes(col, m: int) -> np.ndarray:
    """Arrow binary array of m-byte codes -> (n, m) uint8 matrix. Reads
    the offsets/data buffers directly (honouring the array's slice
    offset); raises on ragged rows, which ``pq_encode`` never produces
    but a hand-written table could."""
    n = len(col)
    offs = np.frombuffer(col.buffers()[1], dtype=np.int32)[
        col.offset:col.offset + n + 1]
    if n and not ((offs[1:] - offs[:-1]) == m).all():
        rows = col.to_pylist()
        bad = next(len(r or b"") for r in rows if len(r or b"") != m)
        raise ValueError(f"PQ code rows must be exactly {m} bytes, "
                         f"found {bad}")
    data = np.frombuffer(col.buffers()[2], dtype=np.uint8)
    return data[offs[0]:offs[-1]].reshape(n, m)


def _assign_codes(X: np.ndarray, books: np.ndarray) -> np.ndarray:
    """(n, dim) -> (n, m) uint8 nearest-centroid codes per subspace."""
    n = X.shape[0]
    m, _k, dsub = books.shape
    codes = np.empty((n, m), dtype=np.uint8)
    for j in range(m):
        Xj = X[:, j * dsub:(j + 1) * dsub]
        C = books[j]
        d = (C * C).sum(axis=1)[None, :] - 2.0 * (Xj @ C.T)
        codes[:, j] = d.argmin(axis=1)
    return codes


def pq_encode(
    df: DataFrame,
    codebooks: np.ndarray,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Encode every vector to its m-byte PQ code: (id, codes: binary).

    One NumPy matmul chain per Arrow batch against the broadcast
    codebooks; vectors are L2-normalized first (matching training), and
    NULL-id / NULL-vector rows are excluded. No shuffle — the output is
    a pipeline-local projection of the scan."""
    import pyarrow as pa

    from pyspark.sql.types import BinaryType, StructField, StructType

    books = np.asarray(codebooks, dtype=np.float64)
    m, _k, dsub = books.shape
    dim = m * dsub
    bc = df.sparkSession.sparkContext.broadcast(books)
    id_field = df.schema[id_col]
    schema = StructType([StructField("id", id_field.dataType),
                         StructField("codes", BinaryType())])
    v = df.where(F.col(id_col).isNotNull() & F.col(vec_col).isNotNull()) \
          .select(F.col(id_col).alias("id"),
                  F.col(vec_col).cast("array<double>").alias("vec"))

    def encode(batches):
        B = bc.value
        for batch in batches:
            n = batch.num_rows
            if not n:
                continue
            E = (batch.column(1).flatten().to_numpy()
                 .reshape(n, dim).astype(np.float64, copy=True))
            norms = np.linalg.norm(E, axis=1, keepdims=True)
            E /= np.where(norms == 0, 1.0, norms)
            yield pa.RecordBatch.from_arrays(
                [batch.column(0), _codes_to_binary(_assign_codes(E, B))],
                names=["id", "codes"])

    return v.mapInArrow(encode, schema)


def pq_reconstruct(codebooks: np.ndarray, codes: bytes) -> np.ndarray:
    """Driver-side decode of one m-byte code back to its (dim,) centroid
    reconstruction — the test/debug inverse of ``pq_encode``."""
    books = np.asarray(codebooks, dtype=np.float64)
    m, _k, dsub = books.shape
    c = np.frombuffer(codes, dtype=np.uint8)
    if len(c) != m:
        raise ValueError(f"code has {len(c)} bytes, codebooks expect {m}")
    return np.concatenate([books[j, c[j]] for j in range(m)])


# ---------------------------------------------------------------------------
# ADC query

def _adc_lut(Q: np.ndarray, books: np.ndarray) -> np.ndarray:
    """(nq, dim) normalized queries -> (nq, m, 2**nbits) dot-product LUT:
    LUT[q, j, c] = Q[q, sub_j] · codebook[j, c]."""
    m, k, dsub = books.shape
    nq = Q.shape[0]
    lut = np.empty((nq, m, k), dtype=np.float64)
    for j in range(m):
        lut[:, j, :] = Q[:, j * dsub:(j + 1) * dsub] @ books[j].T
    return lut


def _adc_scores(lut: np.ndarray, codes: np.ndarray) -> np.ndarray:
    """(n, m) codes × (nq, m, k) LUT -> (n, nq) ADC scores (approximate
    cosine): m byte-indexed gathers + adds, no float vectors touched."""
    n, m = codes.shape
    nq = lut.shape[0]
    sims = np.zeros((n, nq), dtype=np.float64)
    for j in range(m):
        sims += lut[:, j, codes[:, j]].T
    return sims


def ann_query_pq(
    encoded_df: DataFrame,
    codebooks: np.ndarray,
    queries,
    k: int = 10,
    query_ids=None,
) -> DataFrame:
    """Batched ANN over a ``pq_encode`` table via asymmetric distance
    computation. Returns (query_id, id, score) — ``score`` is the ADC
    approximation of cosine (exact when the quantizer reconstructs
    exactly, e.g. codebooks trained with 2**nbits >= n distinct rows).

    One broadcast LUT blob, one scan of the CODE table (never the float
    vectors), the same tie-safe per-batch top-k pre-filter as
    ``ann_query_batch``, one window final."""
    import pyarrow as pa

    from pyspark.sql import Window

    books = np.asarray(codebooks, dtype=np.float64)
    m = books.shape[0]
    Q = np.asarray(queries, dtype=np.float64)
    if Q.ndim == 1:
        Q = Q[None, :]
    norms = np.linalg.norm(Q, axis=1, keepdims=True)
    Q = Q / np.where(norms == 0, 1.0, norms)
    nq = Q.shape[0]
    if Q.shape[1] != m * books.shape[2]:
        raise ValueError(f"queries have dim {Q.shape[1]} but codebooks "
                         f"expect {m * books.shape[2]}")
    qids = np.arange(nq, dtype=np.int64) if query_ids is None \
        else np.asarray(query_ids, dtype=np.int64)
    if len(qids) != nq:
        raise ValueError(f"{len(qids)} query_ids for {nq} queries")
    bc = encoded_df.sparkSession.sparkContext.broadcast(
        (_adc_lut(Q, books), qids))
    id_field = encoded_df.schema["id"]
    out_schema = (f"query_id long, id {id_field.dataType.simpleString()}, "
                  "score double")
    v = encoded_df.select("id", "codes")

    def score(batches):
        lut, qid_arr = bc.value
        for batch in batches:
            n = batch.num_rows
            if not n:
                continue
            codes = _binary_to_codes(batch.column(1), m)
            sims = _adc_scores(lut, codes)
            kk = min(k, n)
            kth = np.partition(sims, n - kk, axis=0)[n - kk, :]
            rows, cols = np.nonzero(sims >= kth[None, :])
            if not len(rows):
                continue
            yield pa.RecordBatch.from_arrays(
                [pa.array(qid_arr[cols]),
                 batch.column(0).take(pa.array(rows, type=pa.int64())),
                 pa.array(sims[rows, cols])],
                names=["query_id", "id", "score"])

    scored = v.mapInArrow(score, out_schema)
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("id"))
    return (scored.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= k).drop("rk"))


# ---------------------------------------------------------------------------
# persistence (the write_ivf_index sidecar pattern)

def _codebooks_meta(books: np.ndarray, kind: str) -> dict:
    return {
        "format_version": 1,
        "kind": kind,
        "m": int(books.shape[0]),
        "n_codes": int(books.shape[1]),
        "dsub": int(books.shape[2]),
        "dim": int(books.shape[0] * books.shape[2]),
        "codebooks": [[[float(x) for x in row] for row in book]
                      for book in books],
    }


def _check_extra(extra_meta: dict | None, reserved: set) -> None:
    bad = set(extra_meta or {}) & reserved
    if bad:
        raise ValueError(f"extra_meta may not override reserved sidecar "
                         f"keys {sorted(bad)}")


def write_pq_index(
    encoded_df: DataFrame,
    codebooks: np.ndarray,
    path: str,
    mode: str = "error",
    extra_meta: dict | None = None,
) -> None:
    """Persist a ``pq_encode`` table as a self-contained artifact: the
    code table as parquet plus the codebooks in a ``_pq_meta.json``
    sidecar (Hadoop FS API — local/HDFS/s3a; floats via repr so a
    reloaded index scores identically). Member table FIRST, sidecar
    LAST: the sidecar is the commit marker, so a crashed write can never
    serve a partial index."""
    from .fsio import write_json_sidecar

    books = np.asarray(codebooks, dtype=np.float64)
    meta = _codebooks_meta(books, "pq")
    _check_extra(extra_meta, set(meta))
    encoded_df.write.mode(mode).parquet(path)
    meta.update(extra_meta or {})
    meta.setdefault("generation", 1)
    write_json_sidecar(encoded_df.sparkSession, path, _PQ_SIDECAR, meta)


def read_pq_index(spark, path: str) -> tuple[DataFrame, np.ndarray, dict]:
    """Load a ``write_pq_index`` artifact: (encoded_df, codebooks, meta).
    Refuses a sidecar-less directory (not a committed PQ index)."""
    from .fsio import read_json_sidecar

    meta = read_json_sidecar(
        spark, path, _PQ_SIDECAR,
        missing_hint="not a write_pq_index artifact (write with "
        "write_pq_index so the codebooks travel with the codes)")
    books = np.asarray(meta.pop("codebooks"), dtype=np.float64)
    if books.shape != (meta["m"], meta["n_codes"], meta["dsub"]):
        raise ValueError(
            f"corrupt PQ sidecar: codebook shape {books.shape} != "
            f"({meta['m']}, {meta['n_codes']}, {meta['dsub']})")
    return spark.read.parquet(path), books, meta


# ---------------------------------------------------------------------------
# IVF-PQ composition (IVFADC): coarse inverted lists + PQ of the residual

def ivf_pq_index(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_clusters: int = 16,
    m: int = 8,
    nbits: int = 8,
    kmeans_iters: int = 10,
    seed: int = 11,
    train_rows: int = 100_000,
) -> tuple[DataFrame, np.ndarray, np.ndarray]:
    """Build an IVFADC index: (index_df, centroids, codebooks) where
    ``index_df`` = (id, cluster, codes) — each vector assigned to its
    nearest coarse centroid (the shared ``_ivf_assign`` kernel) and its
    RESIDUAL ``nvec - centroid`` PQ-encoded. Residual quantization is
    what makes the Jégou IVFADC design accurate: residual magnitudes are
    much smaller than vector magnitudes, so the same code budget buys
    far less quantization error.

    Scale shape: centroids and residual codebooks train on one bounded
    deterministic sample; assignment + encoding stream the table in two
    mapInArrow passes; write with ``write_ivf_pq_index`` to get
    ``partitionBy("cluster")`` partition pruning at probe time."""
    from ..spark.skew import deterministic_sample
    from .similarity import _ivf_assign, _train_ivf_centroids

    if nbits < 1 or nbits > 8:
        raise ValueError(f"nbits must be in 1..8, got {nbits}")
    v = df.where(F.col(vec_col).isNotNull()).select(
        F.col(id_col).alias("id"),
        F.col(vec_col).cast("array<double>").alias("vec"))
    cents = _train_ivf_centroids(v, n_clusters, kmeans_iters, seed,
                                 train_rows)
    dim = cents.shape[1]
    if dim % m:
        raise ValueError(f"dim {dim} is not divisible by m={m} subspaces")
    from pyspark import StorageLevel

    from .cache import tag_cached_deps

    # two consumers (residual-sample collect + the encode pass): persist
    # or the assignment mapInArrow over the whole corpus runs twice;
    # release via pipeline.cache.release_cached_deps on the returned frame
    assigned = _ivf_assign(v, cents, df.schema[id_col]).persist(
        StorageLevel.MEMORY_AND_DISK)
    # residual codebooks from the SAME deterministic sample law: the
    # sampled rows' (nvec - centroid[cluster]) matrix (Arrow toPandas
    # transfer — same rows, same deterministic order as a row collect)
    samp = deterministic_sample(assigned, train_rows, "id",
                                salt=seed).toPandas()
    R = np.asarray([np.asarray(x) for x in samp["nvec"]], dtype=np.float64) \
        - cents[samp["cluster"].to_numpy().astype(np.int64)]
    books = _kmeans_subspaces(R, m, nbits, kmeans_iters, seed)
    return (tag_cached_deps(_encode_residuals(assigned, cents, books),
                            [assigned]), cents, books)


def _encode_residuals(assigned: DataFrame, cents: np.ndarray,
                      books: np.ndarray) -> DataFrame:
    """(id, nvec, cluster) -> (id, cluster, codes): PQ codes of the
    residual against the broadcast coarse centroids. One NumPy chain per
    Arrow batch; the shared kernel for build and (future) append so
    generations can never disagree on the law."""
    import pyarrow as pa

    from pyspark.sql.types import (BinaryType, LongType, StructField,
                                   StructType)

    dim = cents.shape[1]
    bc = assigned.sparkSession.sparkContext.broadcast((cents, books))
    id_field = assigned.schema["id"]
    schema = StructType([StructField("id", id_field.dataType),
                         StructField("cluster", LongType()),
                         StructField("codes", BinaryType())])

    def encode(batches):
        C, B = bc.value
        for batch in batches:
            n = batch.num_rows
            if not n:
                continue
            E = (batch.column(1).flatten().to_numpy()
                 .reshape(n, dim).astype(np.float64, copy=True))
            cl = batch.column(2).to_numpy()
            E -= C[cl]
            yield pa.RecordBatch.from_arrays(
                [batch.column(0), batch.column(2),
                 _codes_to_binary(_assign_codes(E, B))],
                names=["id", "cluster", "codes"])

    return assigned.mapInArrow(encode, schema)


def write_ivf_pq_index(
    index_df: DataFrame,
    centroids: np.ndarray,
    codebooks: np.ndarray,
    path: str,
    mode: str = "error",
    extra_meta: dict | None = None,
) -> None:
    """Persist an ``ivf_pq_index``: code table ``partitionBy("cluster")``
    (probe-time partition pruning) + centroids AND residual codebooks in
    one ``_ivf_pq_meta.json`` sidecar. Same commit order contract as
    ``write_pq_index``."""
    from .fsio import write_json_sidecar

    C = np.asarray(centroids, dtype=np.float64)
    books = np.asarray(codebooks, dtype=np.float64)
    if C.shape[1] != books.shape[0] * books.shape[2]:
        raise ValueError(
            f"centroid dim {C.shape[1]} != codebook dim "
            f"{books.shape[0] * books.shape[2]}")
    meta = _codebooks_meta(books, "ivf_pq")
    meta["n_clusters"] = int(C.shape[0])
    meta["centroids"] = [[float(x) for x in row] for row in C]
    _check_extra(extra_meta, set(meta))
    # cluster-clustered write: without it every task opens one file per
    # cluster it sees (tasks x clusters tiny files); repartitioned, the
    # layout is ~one file per cluster and the commit is file-count-bound
    (index_df.repartition("cluster")
     .write.partitionBy("cluster").mode(mode).parquet(path))
    meta.update(extra_meta or {})
    meta.setdefault("generation", 1)
    write_json_sidecar(index_df.sparkSession, path, _IVFPQ_SIDECAR, meta)


def read_ivf_pq_index(
    spark, path: str,
) -> tuple[DataFrame, np.ndarray, np.ndarray, dict]:
    """Load a ``write_ivf_pq_index`` artifact:
    (index_df, centroids, codebooks, meta)."""
    from .fsio import read_json_sidecar

    meta = read_json_sidecar(
        spark, path, _IVFPQ_SIDECAR,
        missing_hint="not a write_ivf_pq_index artifact")
    books = np.asarray(meta.pop("codebooks"), dtype=np.float64)
    cents = np.asarray(meta.pop("centroids"), dtype=np.float64)
    if books.shape != (meta["m"], meta["n_codes"], meta["dsub"]):
        raise ValueError(
            f"corrupt IVF-PQ sidecar: codebook shape {books.shape} != "
            f"({meta['m']}, {meta['n_codes']}, {meta['dsub']})")
    if cents.shape != (meta["n_clusters"], meta["dim"]):
        raise ValueError(
            f"corrupt IVF-PQ sidecar: centroid shape {cents.shape} != "
            f"({meta['n_clusters']}, {meta['dim']})")
    return spark.read.parquet(path), cents, books, meta


def append_to_ivf_pq_index(
    df: DataFrame,
    path: str,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> dict:
    """Fold new vectors into an existing on-disk IVF-PQ index under its
    OWN centroids and residual codebooks — no retraining, so codes stay
    consistent with every earlier generation and probes score appended
    members under the identical law (the shared ``_ivf_assign`` +
    ``_encode_residuals`` kernels). New files land inside the existing
    ``cluster=...`` partition directories, so partition pruning keeps
    working per append generation. NULL-id / NULL-vector rows are
    excluded. Returns the sidecar meta.

    Same drift caveat as ``append_to_ivf_index``: when the distribution
    moves far from the trained centroids, residuals grow and ADC error
    with them — the remedy is a periodic rebuild (``ivf_pq_index`` +
    ``write_ivf_pq_index`` to a new path)."""
    spark = df.sparkSession
    _, cents, books, meta = read_ivf_pq_index(spark, path)
    base = df.where(F.col(id_col).isNotNull() & F.col(vec_col).isNotNull())
    first = base.select(vec_col).first()
    if first is not None and len(first[0]) != meta["dim"]:
        raise ValueError(
            f"appended vectors have dim {len(first[0])} but the index "
            f"was trained at dim {meta['dim']}")
    v = base.select(F.col(id_col).alias("id"),
                    F.col(vec_col).cast("array<double>").alias("vec"))
    from .similarity import _ivf_assign

    assigned = _ivf_assign(v, cents, df.schema[id_col])
    encoded = _encode_residuals(assigned, cents, books)
    encoded.write.partitionBy("cluster").mode("append").parquet(path)
    return meta


def ann_query_ivf_pq(
    index_df: DataFrame,
    centroids: np.ndarray,
    codebooks: np.ndarray,
    queries,
    k: int = 10,
    n_probe: int = 2,
    query_ids=None,
) -> DataFrame:
    """Sublinear compressed ANN over an ``ivf_pq_index`` (IVFADC): each
    query probes its ``n_probe`` nearest coarse centroids' inverted
    lists, selected with a native ``cluster IN (...)`` filter (partition
    pruning on a ``write_ivf_pq_index`` layout), and scores members as
    ``q·centroid(cluster) + ADC(residual codes)`` — exactly
    ``q·(centroid + decode(codes))``, the reconstruction's cosine.
    Returns (query_id, id, score)."""
    import pyarrow as pa

    from pyspark.sql import Window

    C = np.asarray(centroids, dtype=np.float64)
    books = np.asarray(codebooks, dtype=np.float64)
    m = books.shape[0]
    Q = np.asarray(queries, dtype=np.float64)
    if Q.ndim == 1:
        Q = Q[None, :]
    norms = np.linalg.norm(Q, axis=1, keepdims=True)
    Q = Q / np.where(norms == 0, 1.0, norms)
    nq = Q.shape[0]
    if Q.shape[1] != C.shape[1]:
        raise ValueError(f"queries have dim {Q.shape[1]} but the index "
                         f"was trained at dim {C.shape[1]}")
    qids = np.arange(nq, dtype=np.int64) if query_ids is None \
        else np.asarray(query_ids, dtype=np.int64)
    if len(qids) != nq:
        raise ValueError(f"{len(qids)} query_ids for {nq} queries")
    eff_probe = min(n_probe, len(C))
    coarse = Q @ C.T  # (nq, n_clusters): reused as the q·centroid term
    probes = np.argsort(-coarse, axis=1)[:, :eff_probe]
    needed = sorted({int(c) for row in probes for c in row})
    by_cluster: dict[int, list[int]] = {}
    for qi, row in enumerate(probes):
        for c in row:
            by_cluster.setdefault(int(c), []).append(qi)
    lut = _adc_lut(Q, books)
    bc = index_df.sparkSession.sparkContext.broadcast(
        (lut, coarse, qids, by_cluster))
    id_field = index_df.schema["id"]
    out_schema = (f"query_id long, id {id_field.dataType.simpleString()}, "
                  "score double")
    probed = index_df.where(F.col("cluster").isin(needed)) \
                     .select("id", "codes", "cluster")

    def score(batches):
        L, coarse_m, qid_arr, cl_map = bc.value
        for batch in batches:
            n = batch.num_rows
            if not n:
                continue
            codes = _binary_to_codes(batch.column(1), m)
            cl = batch.column(2).to_numpy()
            sims = _adc_scores(L, codes)  # (n, nq) residual term
            sims += coarse_m.T[cl]        # + q·centroid(cluster(row))
            mask = np.full(sims.shape, False)
            for c, qlist in cl_map.items():
                rows_c = cl == c
                if rows_c.any():
                    mask[np.ix_(rows_c, qlist)] = True
            sims = np.where(mask, sims, -np.inf)
            kk = min(k, n)
            kth = np.partition(sims, n - kk, axis=0)[n - kk, :]
            keep = sims >= np.maximum(kth[None, :], -1e30)
            rows, cols = np.nonzero(keep)
            if not len(rows):
                continue
            yield pa.RecordBatch.from_arrays(
                [pa.array(qid_arr[cols]),
                 batch.column(0).take(pa.array(rows, type=pa.int64())),
                 pa.array(sims[rows, cols])],
                names=["query_id", "id", "score"])

    scored = probed.mapInArrow(score, out_schema)
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("id"))
    return (scored.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= k).drop("rk"))
