"""Incremental dedup: persistent MinHash-LSH and exact-digest indexes.

The web-scale dedup loop is incremental: a new crawl increment arrives
and must be deduplicated against a corpus that was already cleaned —
WITHOUT recomputing signatures for (or even rescanning the text of) the
100-TB corpus. This module persists the corpus's MinHash signatures and
LSH band buckets once, as a self-contained on-disk artifact, then probes
new increments against it:

- ``write_minhash_index``   — corpus -> (sigs, band buckets) parquet +
  a ``_minhash_index.json`` parameter sidecar (Hadoop FS: local/HDFS/s3a).
- ``minhash_pairs_against_index`` — (id_inc, id_corpus, est_jaccard)
  cross pairs, bit-identical to what the batch engine would report for
  the same pairs on the union corpus (same signature law, same banding
  layout, same slot-agreement kernel — all literally shared code).
- ``dedup_against_index``   — the composition: drop increment docs that
  match the corpus, then near-dedup the survivors among themselves.
- ``append_to_minhash_index`` — grow the index with the kept survivors,
  closing the loop for the next increment.

Scale shape of the probe (the part that matters at 100 TB): the corpus
side is only ever SCANNED — signature construction happened at index
time. The increment's distinct (band, bucket) set is broadcast, so the
corpus bands table streams through a broadcast hash join (no corpus
shuffle) down to just the rows sharing a bucket with the increment;
per-bucket caps and the pair join then operate on that reduced set.
Signature join-back touches the corpus sigs table with a candidate-id
join (AQE converts it to broadcast when the candidate set is small).
With ``broadcast_increment=False`` (a huge increment) the same plan runs
as shuffle joins. Parameters ride in the sidecar, so a probe CANNOT run
with mismatched num_perm/bands/seed — the classic silent-wrong-results
failure of hand-rolled incremental dedup.

The signature/banding law is the package's documented MinHash law v2
(``dedup.minhash_signatures`` / ``dedup.make_band_explode``); est_jaccard
estimates Broder's resemblance (Broder 1997; banding analysis as in
Leskovec/Rajaraman/Ullman MMDS ch.3). The reference sketch library has no
incremental-index analogue — this is pipeline scope, same family as
``similarity.write_ivf_index``.

The SEMANTIC member (``write_cosine_index`` / ``cosine_pairs_against_
index`` / ``dedup_against_cosine_index`` / ``append_to_cosine_index``)
runs the same loop over EMBEDDINGS: the corpus's row-normalized vectors
and random-hyperplane band keys persist once (the batch engine's own
enrichment kernel, ``similarity._lsh_enriched``, so probe candidacy and
cosines are bit-identical to ``dedup_semantic(method="lsh")`` on the
union); probes broadcast the increment's touched (blk, key) set onto the
corpus bands scan exactly as the MinHash probe does.

The EXACT-digest twin (``write_exact_index`` / ``exact_matches_against_
index`` / ``dedup_against_exact_index`` / ``append_to_exact_index``) is
the cheap first line of the same loop: "has this exact page been crawled
before" needs only the 32-hex md5 of the normalized text
(``dedup.exact_fingerprint`` — literally the batch engine's digest).
Digests are written range-partitioned and sorted, so a small increment's
probe pushes an ``IN`` predicate into the corpus scan and parquet
file/row-group min-max stats skip almost all of a 100-TB corpus's digest
table; large increments fall back to a broadcast (or shuffle) hash join
that still only ever SCANS the corpus side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import LongType, StructField, StructType

from .dedup import (
    dedup_near_text,
    make_band_explode,
    make_slot_agreement_scorer,
    minhash_signatures,
)
from .fsio import read_json_sidecar, write_json_sidecar

_SIDECAR = "_minhash_index.json"


def _bucket_schema(id_field) -> StructType:
    return StructType([
        id_field,
        StructField("band", LongType()),
        StructField("bucket", LongType()),
    ])


def write_minhash_index(
    df: DataFrame,
    path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 128,
    bands: int = 32,
    shingle_k: int = 3,
    seed: int = 1,
    mode: str = "error",
) -> dict:
    """Build and persist a MinHash-LSH index of ``df`` under ``path``.

    Layout: ``path/sigs`` = (id, sig: array<bigint>) parquet;
    ``path/bands`` = (id, band, bucket) parquet, sorted within partitions
    by (band, bucket) so parquet row-group min/max stats can skip
    non-matching groups under a pushed bucket predicate; ``path/
    _minhash_index.json`` = the parameter sidecar every probe reads its
    law from. NULL-id rows are excluded (the package-wide law: they can
    never enter a pair graph). Returns the sidecar dict.

    One corpus pass computes signatures (persisted for the two writes),
    shuffling nothing but the (id, band, bucket) rows of the bands
    write. ``mode`` is the parquet save mode ("error" refuses an
    existing index; "overwrite" replaces it)."""
    from pyspark import StorageLevel

    if num_perm % bands:
        raise ValueError("bands must divide num_perm")
    base = df.where(F.col(id_col).isNotNull())
    sigs = minhash_signatures(base, text_col, id_col, num_perm, shingle_k,
                              seed).persist(StorageLevel.MEMORY_AND_DISK)
    try:
        sigs.write.mode(mode).parquet(path.rstrip("/") + "/sigs")
        banded = sigs.mapInArrow(
            make_band_explode(id_col, num_perm, bands, num_perm // bands),
            _bucket_schema(df.schema[id_col]))
        (banded.sortWithinPartitions("band", "bucket")
         .write.mode(mode).parquet(path.rstrip("/") + "/bands"))
        n_docs = sigs.count()
    finally:
        sigs.unpersist()
    meta = {
        "format_version": 1,
        "num_perm": int(num_perm),
        "bands": int(bands),
        "r": int(num_perm // bands),
        "shingle_k": int(shingle_k),
        "seed": int(seed),
        "id_col": id_col,
        "id_type": df.schema[id_col].dataType.simpleString(),
        "text_col": text_col,
        "n_docs": int(n_docs),
    }
    write_json_sidecar(df.sparkSession, path, _SIDECAR, meta)
    return meta


def read_minhash_index(spark: SparkSession, path: str
                       ) -> tuple[DataFrame, DataFrame, dict]:
    """Load a ``write_minhash_index`` artifact: (bands_df, sigs_df, meta)."""
    meta = read_json_sidecar(
        spark, path, _SIDECAR,
        "not a write_minhash_index artifact (build the index with "
        "write_minhash_index so the signature parameters travel with it)")
    _heal_precompact(spark, path.rstrip("/") + "/bands",
                     path.rstrip("/") + "/sigs")
    bands_df = spark.read.parquet(path.rstrip("/") + "/bands")
    sigs_df = spark.read.parquet(path.rstrip("/") + "/sigs")
    return bands_df, sigs_df, meta


def _resolve_index(spark, index):
    if isinstance(index, str):
        return read_minhash_index(spark, index)
    bands_df, sigs_df, meta = index
    return bands_df, sigs_df, meta


def _check_increment_schema(inc_df: DataFrame, meta: dict) -> None:
    id_col = meta["id_col"]
    if id_col not in inc_df.columns:
        raise ValueError(
            f"increment has no {id_col!r} column (index id_col); rename "
            "the increment's id column to match the index")
    t = inc_df.schema[id_col].dataType.simpleString()
    if t != meta["id_type"]:
        raise ValueError(
            f"increment {id_col} type {t!r} != index id type "
            f"{meta['id_type']!r} — pair ids would not compare")


def minhash_pairs_against_index(
    inc_df: DataFrame,
    index,
    text_col: str = "text",
    broadcast_increment="auto",
    auto_broadcast_rows: int = 2_000_000,
    max_bucket_size: int | None = None,
    pushdown_buckets: int = 10_000,
) -> DataFrame:
    """Cross near-duplicate candidate pairs between an increment and an
    indexed corpus: (id_inc, id_corpus, est_jaccard).

    ``index`` is a ``write_minhash_index`` path or the
    ``read_minhash_index`` triple. Signature parameters come from the
    index sidecar — never from the caller — so the increment is hashed
    under the exact law the corpus was indexed under, and est_jaccard is
    bit-identical to the batch engine's value for the same pair (shared
    signature/banding/scoring code, pinned by the parity test).

    Probe plan, small to large (the exact index's design, r5): when the
    increment touches at most ``pushdown_buckets`` distinct buckets they
    are collected (bounded: int64s) into an ``IN`` predicate on the
    bands scan — the index layout sorts by (band, bucket), so parquet
    min-max stats SKIP non-matching row groups of a 100-TB bands table
    instead of streaming it. Above that, ``broadcast_increment``: True /
    False / "auto" (bounded ``limit(n+1).count()`` probe against
    ``auto_broadcast_rows``). When the increment is broadcast-sized, the
    corpus bands scan never shuffles: distinct increment buckets
    broadcast onto it, candidate corpus rows stream out of the scan.
    ``max_bucket_size`` caps
    per-(band, bucket) membership counted over candidate corpus rows and
    increment rows separately (an approximation of the batch engine's
    union-wide cap — buckets the increment never touches cost nothing
    here, so the count is over the touched subset).

    A doc id present on BOTH sides never pairs with itself (re-probing
    an already-indexed doc reports only its other matches)."""
    spark = inc_df.sparkSession
    bands_df, sigs_df, meta = _resolve_index(spark, index)
    _check_increment_schema(inc_df, meta)
    id_col, num_perm = meta["id_col"], meta["num_perm"]
    inc = inc_df.where(F.col(id_col).isNotNull())

    from pyspark import StorageLevel

    from .cache import tag_cached_deps

    inc_sigs = minhash_signatures(
        inc, text_col, id_col, num_perm, meta["shingle_k"], meta["seed"]
    ).persist(StorageLevel.MEMORY_AND_DISK)
    inc_banded = inc_sigs.mapInArrow(
        make_band_explode(id_col, num_perm, meta["bands"], meta["r"]),
        _bucket_schema(inc_df.schema[id_col]))

    if broadcast_increment == "auto":
        small = (inc.limit(auto_broadcast_rows + 1).count()
                 <= auto_broadcast_rows)
    else:
        small = bool(broadcast_increment)
    maybe_bc = F.broadcast if small else (lambda d: d)

    # corpus rows sharing a bucket with the increment. Small increments
    # (<= pushdown_buckets distinct buckets, bounded collect of int64s)
    # push a bucket IN predicate onto the bands SCAN — the index layout
    # sorts by (band, bucket), so parquet min-max stats SKIP the
    # non-matching row groups of a 100-TB bands table (the exact index's
    # pushed-IN design, same contract). Larger increments fall back to
    # the broadcast semi join, where the bands table still only STREAMS.
    touched = inc_banded.select("band", "bucket").dropDuplicates()
    pushed = None
    if pushdown_buckets:
        sample = touched.limit(pushdown_buckets + 1).collect()
        if len(sample) <= pushdown_buckets:
            pushed = sorted({r["bucket"] for r in sample})
    scan = (bands_df.where(F.col("bucket").isin(pushed))
            if pushed is not None else bands_df)
    cand_corpus = scan.join(maybe_bc(touched), ["band", "bucket"])
    if max_bucket_size is not None:
        for side in ("corpus", "inc"):
            frame = cand_corpus if side == "corpus" else inc_banded
            ok = (frame.groupBy("band", "bucket")
                  .agg(F.count(F.lit(1)).alias("_bn"))
                  .where(F.col("_bn") <= max_bucket_size).drop("_bn"))
            if side == "corpus":
                cand_corpus = cand_corpus.join(ok, ["band", "bucket"])
            else:
                inc_banded = inc_banded.join(ok, ["band", "bucket"])

    c, i = cand_corpus.alias("c"), inc_banded.alias("i")
    cand = (c.join(maybe_bc(i),
                   (F.col("c.band") == F.col("i.band"))
                   & (F.col("c.bucket") == F.col("i.bucket"))
                   & (F.col(f"c.{id_col}") != F.col(f"i.{id_col}")))
            .select(F.col(f"i.{id_col}").alias("id_inc"),
                    F.col(f"c.{id_col}").alias("id_corpus"))
            .dropDuplicates(["id_inc", "id_corpus"]))
    sc_ = sigs_df.select(F.col(id_col).alias("id_corpus"),
                         F.col("sig").alias("_sig_c"))
    si = inc_sigs.select(F.col(id_col).alias("id_inc"),
                         F.col("sig").alias("_sig_i"))
    paired = (cand.join(sc_, "id_corpus").join(maybe_bc(si), "id_inc")
              .select("id_inc", "id_corpus", "_sig_i", "_sig_c"))
    t = meta["id_type"]
    out = paired.mapInArrow(
        make_slot_agreement_scorer(num_perm, ("id_inc", "id_corpus")),
        f"id_inc {t}, id_corpus {t}, est_jaccard double")
    return tag_cached_deps(out, [inc_sigs])


def dedup_against_index(
    inc_df: DataFrame,
    index,
    threshold: float = 0.8,
    text_col: str = "text",
    within: bool = True,
    keep_by: str | None = None,
    broadcast_increment="auto",
    max_bucket_size: int | None = None,
    checkpoint_dir: str | None = None,
    pushdown_buckets: int = 10_000,
) -> DataFrame:
    """Incremental near-dedup of ``inc_df`` against an indexed corpus.

    Returns one row per increment row: (id_col, corpus_match, component,
    keep) —

    - ``corpus_match``: the MIN corpus id with est_jaccard >= threshold
      (NULL when the doc matches nothing in the corpus). Matched docs are
      dropped: keep = FALSE, component = NULL.
    - survivors are then near-deduplicated among THEMSELVES (``within=
      True``) with the exact ``dedup_near_text`` semantics and the
      index's own signature parameters: component = cluster id, keep =
      canonical survivor (``keep_by`` = quality-aware selection).
    - NULL-id rows pass through (keep = TRUE, both labels NULL), the
      package-wide law.

    The incremental law this implements: a doc survives iff it matches
    nothing already kept in the corpus AND it wins among its own
    increment's duplicates — the standard semantics of dedup loops that
    process crawls in arrival order. Follow with ``append_to_minhash_
    index`` on the kept rows to fold survivors into the index for the
    next increment."""
    spark = inc_df.sparkSession
    bands_df, sigs_df, meta = _resolve_index(spark, index)
    id_col = meta["id_col"]
    pairs = minhash_pairs_against_index(
        inc_df, (bands_df, sigs_df, meta), text_col=text_col,
        broadcast_increment=broadcast_increment,
        max_bucket_size=max_bucket_size,
        pushdown_buckets=pushdown_buckets)
    hits = (pairs.where(F.col("est_jaccard") >= threshold)
            .groupBy("id_inc").agg(F.min("id_corpus").alias("corpus_match")))
    marked = inc_df.join(
        hits, inc_df[id_col] == hits["id_inc"], "left").drop("id_inc")
    dropped = (marked.where(F.col("corpus_match").isNotNull())
               .select(F.col(id_col), "corpus_match",
                       F.lit(None).cast(meta["id_type"]).alias("component"),
                       F.lit(False).alias("keep")))
    survivors = marked.where(F.col("corpus_match").isNull()) \
                      .drop("corpus_match")
    if within:
        labels = dedup_near_text(
            survivors, threshold=threshold, text_col=text_col,
            id_col=id_col, num_perm=meta["num_perm"], bands=meta["bands"],
            shingle_k=meta["shingle_k"], seed=meta["seed"],
            max_bucket_size=max_bucket_size, checkpoint_dir=checkpoint_dir,
            keep_by=keep_by)
    else:
        labels = survivors.select(
            F.col(id_col),
            F.lit(None).cast(meta["id_type"]).alias("component"),
            F.lit(True).alias("keep"))
    from .cache import cached_deps, tag_cached_deps

    kept_side = labels.select(
        F.col(id_col),
        F.lit(None).cast(meta["id_type"]).alias("corpus_match"),
        "component", "keep")
    out = kept_side.unionByName(dropped)
    return tag_cached_deps(out, cached_deps(pairs) + cached_deps(labels))


_EXACT_SIDECAR = "_exact_index.json"


def write_exact_index(
    df: DataFrame,
    path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    mode: str = "error",
    n_files: int | None = None,
) -> dict:
    """Persist the exact-duplicate digest table of ``df`` under ``path``:
    ``path/digests`` = (id, fingerprint) parquet, RANGE-partitioned and
    sorted by fingerprint (md5 is uniform, so ranges are balanced) —
    every file and row group covers a narrow digest interval, which is
    what lets a probe's pushed ``IN`` predicate skip the rest of the
    corpus via parquet min-max stats. Plus the ``_exact_index.json``
    parameter sidecar (Hadoop FS). NULL-id and NULL-text rows are
    excluded (the package law: neither can ever be a duplicate of
    anything). Returns the sidecar dict."""
    from .dedup import exact_fingerprint

    base = (df.where(F.col(id_col).isNotNull()
                     & F.col(text_col).isNotNull())
            .select(F.col(id_col),
                    exact_fingerprint(text_col).alias("fingerprint")))
    part = (base.repartitionByRange(n_files, "fingerprint") if n_files
            else base.repartitionByRange("fingerprint"))
    (part.sortWithinPartitions("fingerprint")
     .write.mode(mode).parquet(path.rstrip("/") + "/digests"))
    spark = df.sparkSession
    n_docs = spark.read.parquet(path.rstrip("/") + "/digests").count()
    meta = {
        "format_version": 1,
        "id_col": id_col,
        "id_type": df.schema[id_col].dataType.simpleString(),
        "text_col": text_col,
        "law": "md5(lower(trim(text)))",
        "n_docs": int(n_docs),
    }
    write_json_sidecar(spark, path, _EXACT_SIDECAR, meta)
    return meta


def read_exact_index(spark: SparkSession, path: str
                     ) -> tuple[DataFrame, dict]:
    """Load a ``write_exact_index`` artifact: (digests_df, meta)."""
    meta = read_json_sidecar(
        spark, path, _EXACT_SIDECAR,
        "not a write_exact_index artifact (build it with "
        "write_exact_index so the digest law travels with it)")
    _heal_precompact(spark, path.rstrip("/") + "/digests")
    return spark.read.parquet(path.rstrip("/") + "/digests"), meta


def _resolve_exact_index(spark, index):
    if isinstance(index, str):
        return read_exact_index(spark, index)
    digests_df, meta = index
    return digests_df, meta


def exact_matches_against_index(
    inc_df: DataFrame,
    index,
    text_col: str | None = None,
    broadcast_increment="auto",
    auto_broadcast_rows: int = 2_000_000,
    pushdown_digests: int = 10_000,
) -> DataFrame:
    """(id_inc, corpus_match) for every increment doc whose normalized
    text digest already exists in the indexed corpus; ``corpus_match`` =
    the MIN matching corpus id. A doc id present on both sides never
    matches itself (re-probing an indexed doc reports only its twins).

    Probe plan, small to large: when the increment has at most
    ``pushdown_digests`` distinct digests, they are collected (bounded:
    32-hex strings) into an ``IN`` predicate on the corpus scan — with
    the index's range-partitioned sorted layout, parquet min-max stats
    skip nearly every file of a 100-TB digest table. Otherwise the
    corpus table streams through a hash join against the increment's
    digests (broadcast when the increment is small per
    ``broadcast_increment`` — True / False / "auto" with a bounded
    ``limit(n+1).count()`` probe; never a corpus-side shuffle when
    broadcast)."""
    from .dedup import exact_fingerprint

    spark = inc_df.sparkSession
    digests_df, meta = _resolve_exact_index(spark, index)
    _check_increment_schema(inc_df, meta)
    id_col = meta["id_col"]
    tcol = text_col or meta["text_col"]
    inc = (inc_df.where(F.col(id_col).isNotNull()
                        & F.col(tcol).isNotNull())
           .select(F.col(id_col).alias("id_inc"),
                   exact_fingerprint(tcol).alias("fingerprint")))

    probe = inc.select("fingerprint").dropDuplicates()
    pushed = None
    if pushdown_digests:
        sample = [r["fingerprint"] for r in
                  probe.limit(pushdown_digests + 1).collect()]
        if len(sample) <= pushdown_digests:
            pushed = sample
    corpus = digests_df.select(F.col(id_col).alias("_id_corpus"),
                               "fingerprint")
    if pushed is not None:
        # the IN predicate reaches the scan: with the range-sorted
        # layout, min-max stats skip non-matching files/row groups; the
        # surviving corpus rows are broadcast so the increment (which
        # may be row-heavy even with few distinct digests) never moves
        joined = inc.join(
            F.broadcast(corpus.where(F.col("fingerprint").isin(pushed))),
            "fingerprint")
    else:
        if broadcast_increment == "auto":
            small = (inc.limit(auto_broadcast_rows + 1).count()
                     <= auto_broadcast_rows)
        else:
            small = bool(broadcast_increment)
        maybe_bc = F.broadcast if small else (lambda d: d)
        joined = corpus.join(maybe_bc(inc), "fingerprint")
    return (joined.where(F.col("_id_corpus") != F.col("id_inc"))
            .groupBy("id_inc")
            .agg(F.min("_id_corpus").alias("corpus_match")))


def dedup_against_exact_index(
    inc_df: DataFrame,
    index,
    text_col: str | None = None,
    within: bool = True,
    broadcast_increment="auto",
    pushdown_digests: int = 10_000,
) -> DataFrame:
    """Incremental EXACT dedup of ``inc_df`` against an indexed corpus:
    one row per increment row, (id_col, corpus_match, keep) —
    corpus-matched docs are dropped (keep = FALSE); survivors are then
    exact-deduplicated among themselves (``within=True``: min id per
    digest wins, the batch ``dedup_exact`` law). NULL-text and NULL-id
    rows pass through with keep = TRUE and a NULL corpus_match — the
    package-wide law. Same row contract as ``dedup_against_index`` minus
    ``component`` (exact groups need no cluster label), so the two
    compose: run this first, feed the survivors to the near-dup probe.

    Follow with ``append_to_exact_index`` on the kept rows to fold
    survivors into the index for the next increment."""
    spark = inc_df.sparkSession
    digests_df, meta = _resolve_exact_index(spark, index)
    id_col = meta["id_col"]
    tcol = text_col or meta["text_col"]
    hits = exact_matches_against_index(
        inc_df, (digests_df, meta), text_col=tcol,
        broadcast_increment=broadcast_increment,
        pushdown_digests=pushdown_digests)
    marked = inc_df.join(hits, inc_df[id_col] == hits["id_inc"], "left") \
                   .drop("id_inc")
    dropped = (marked.where(F.col("corpus_match").isNotNull())
               .select(F.col(id_col), "corpus_match",
                       F.lit(False).alias("keep")))
    survivors = marked.where(F.col("corpus_match").isNull()) \
                      .drop("corpus_match")
    if within:
        from .dedup import dedup_exact

        kept = dedup_exact(survivors, text_col=tcol, id_col=id_col)
        kept_ids = kept.select(F.col(id_col).alias("_kid")).dropDuplicates()
        labeled = (survivors.join(
            kept_ids, survivors[id_col] == F.col("_kid"), "left")
            .select(F.col(id_col),
                    F.lit(None).cast(meta["id_type"]).alias("corpus_match"),
                    (F.col("_kid").isNotNull()
                     | F.col(id_col).isNull()).alias("keep")))
    else:
        labeled = survivors.select(
            F.col(id_col),
            F.lit(None).cast(meta["id_type"]).alias("corpus_match"),
            F.lit(True).alias("keep"))
    return labeled.unionByName(dropped)


_COS_SIDECAR = "_cosine_index.json"


def write_cosine_index(
    df: DataFrame,
    path: str,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_planes: int = 16,
    bands: int = 4,
    seed: int = 7,
    dim: int | None = None,
    mode: str = "error",
) -> dict:
    """Build and persist a random-hyperplane cosine-LSH index of ``df``
    under ``path`` — the SEMANTIC member of the incremental-dedup index
    family (exact digests / MinHash text / cosine embeddings).

    Layout: ``path/vecs`` = (id, nvec: array<double>) parquet — the
    row-NORMALIZED vectors, so probe-time scoring is one einsum with no
    renormalization; ``path/bands`` = (id, blk, key) parquet, sorted
    within partitions by (blk, key) for row-group min-max skipping under
    a pushed bucket predicate; ``path/_cosine_index.json`` = the
    parameter sidecar (planes regenerate deterministically from
    (dim, n_planes, seed) — only the law's parameters travel, never the
    matrix). NULL-id and NULL-vector rows are excluded (the package-wide
    law). Returns the sidecar dict.

    Signatures use the batch engine's own enrichment kernel
    (``similarity._lsh_enriched`` — normalize, E @ planes.T sign bits,
    band slicing), so probe candidates and cosines are bit-identical to
    what ``lsh_cosine_topk``/``dedup_semantic(method="lsh")`` would
    report for the same pairs on the union corpus."""
    from pyspark import StorageLevel

    from .similarity import _hyperplanes, _lsh_enriched

    if n_planes % bands:
        raise ValueError("bands must divide n_planes")
    if not 0 < n_planes <= 62:
        raise ValueError("n_planes must be in 1..62 (sign bits pack into "
                         "one BIGINT)")
    base = df.where(F.col(id_col).isNotNull() & F.col(vec_col).isNotNull())
    if dim is None:
        first = base.select(vec_col).first()
        if first is None:
            raise ValueError("no non-NULL vectors to index")
        dim = len(first[0])
    width = n_planes // bands
    planes = _hyperplanes(dim, n_planes, seed)
    v = base.select(F.col(id_col).alias("id"),
                    F.col(vec_col).cast("array<double>").alias("vec"))
    enriched = _lsh_enriched(v, df.schema[id_col], planes, n_planes, bands,
                             width).persist(StorageLevel.MEMORY_AND_DISK)
    try:
        (enriched.select(F.col("id").alias(id_col), "nvec")
         .write.mode(mode).parquet(path.rstrip("/") + "/vecs"))
        (enriched.select(F.col("id").alias(id_col),
                         F.posexplode("keys").alias("blk", "key"))
         .sortWithinPartitions("blk", "key")
         .write.mode(mode).parquet(path.rstrip("/") + "/bands"))
        n_vecs = enriched.count()
    finally:
        enriched.unpersist()
    meta = {
        "format_version": 1,
        "n_planes": int(n_planes),
        "bands": int(bands),
        "width": int(width),
        "seed": int(seed),
        "dim": int(dim),
        "id_col": id_col,
        "id_type": df.schema[id_col].dataType.simpleString(),
        "vec_col": vec_col,
        "n_vecs": int(n_vecs),
        "law": "random-hyperplane sign LSH (similarity._lsh_enriched)",
    }
    write_json_sidecar(df.sparkSession, path, _COS_SIDECAR, meta)
    return meta


def read_cosine_index(spark: SparkSession, path: str
                      ) -> tuple[DataFrame, DataFrame, dict]:
    """Load a ``write_cosine_index`` artifact: (bands_df, vecs_df, meta)."""
    meta = read_json_sidecar(
        spark, path, _COS_SIDECAR,
        "not a write_cosine_index artifact (build the index with "
        "write_cosine_index so the LSH parameters travel with it)")
    _heal_precompact(spark, path.rstrip("/") + "/bands",
                     path.rstrip("/") + "/vecs")
    bands_df = spark.read.parquet(path.rstrip("/") + "/bands")
    vecs_df = spark.read.parquet(path.rstrip("/") + "/vecs")
    return bands_df, vecs_df, meta


def _resolve_cosine_index(spark, index):
    if isinstance(index, str):
        return read_cosine_index(spark, index)
    bands_df, vecs_df, meta = index
    return bands_df, vecs_df, meta


def _check_increment_vec(inc_df: DataFrame, meta: dict,
                         vec_col: str) -> None:
    if vec_col not in inc_df.columns:
        raise ValueError(
            f"increment has no {vec_col!r} column (index vec_col); rename "
            "the increment's vector column to match the index")
    first = (inc_df.where(F.col(vec_col).isNotNull())
             .select(vec_col).first())
    if first is not None and len(first[0]) != meta["dim"]:
        raise ValueError(
            f"increment vectors have dim {len(first[0])} but the index "
            f"was built at dim {meta['dim']} — cosines would be garbage")


def _cosine_probe_collected(spark, bands_df, vecs_df, meta, id_field,
                            enr_pdf, max_bucket_size, pushdown_buckets):
    """The bounded-increment probe plan over a COLLECTED enrichment.

    Same laws as the distributed plan, job for job cheaper: the
    increment's band rows and touched (blk, key) set are driver-built
    local relations (broadcast into the candidacy join), the pushed
    key-IN predicate comes straight from the collected keys (no extra
    collect job), the inc-side ``max_bucket_size`` counts are computed
    in Python over the same band rows, and scoring gathers the
    increment's normalized vector from a broadcast matrix — the corpus
    vector still arrives through the vecs join, and the cosine is the
    identical einsum over the identical float64 rows."""
    import numpy as np
    import pyarrow as pa

    from pyspark.sql.types import (
        DoubleType, LongType, StructField, StructType)

    from .cache import tag_cached_deps

    id_col = meta["id_col"]
    bands = meta["bands"]
    dim = meta["dim"]
    id_t = id_field.dataType
    out_schema_t = StructType([StructField("id_inc", id_t),
                               StructField("id_corpus", id_t),
                               StructField("cos", DoubleType())])
    n = len(enr_pdf)
    if n == 0:
        return tag_cached_deps(
            spark.createDataFrame([], out_schema_t), [])
    ids = enr_pdf["id"].tolist()
    keys_mat = np.stack(enr_pdf["keys"].to_numpy()).astype(np.int64)
    nvec_mat = np.stack(enr_pdf["nvec"].to_numpy()).astype(np.float64)

    pair_counts: dict[tuple[int, int], int] = {}
    for i in range(n):
        for b in range(bands):
            bk = (b, int(keys_mat[i, b]))
            pair_counts[bk] = pair_counts.get(bk, 0) + 1
    pushed = None
    if pushdown_buckets and len(pair_counts) <= pushdown_buckets:
        pushed = sorted({k for _, k in pair_counts})
    scan = (bands_df.where(F.col("key").isin(pushed))
            if pushed is not None else bands_df)
    touched = spark.createDataFrame(sorted(pair_counts),
                                    "blk long, key long")
    cand_corpus = scan.join(F.broadcast(touched), ["blk", "key"])
    if max_bucket_size is not None:
        ok = (cand_corpus.groupBy("blk", "key")
              .agg(F.count(F.lit(1)).alias("_bn"))
              .where(F.col("_bn") <= max_bucket_size).drop("_bn"))
        cand_corpus = cand_corpus.join(ok, ["blk", "key"])
    banded_schema = StructType([StructField("id", id_t),
                                StructField("blk", LongType()),
                                StructField("key", LongType())])
    inc_rows = [(ids[i], b, int(keys_mat[i, b]))
                for i in range(n) for b in range(bands)
                if max_bucket_size is None
                or pair_counts[(b, int(keys_mat[i, b]))] <= max_bucket_size]
    inc_banded = spark.createDataFrame(inc_rows, banded_schema)

    c, i_ = cand_corpus.alias("c"), inc_banded.alias("i")
    cand = (c.join(F.broadcast(i_),
                   (F.col("c.blk") == F.col("i.blk"))
                   & (F.col("c.key") == F.col("i.key"))
                   & (F.col(f"c.{id_col}") != F.col("i.id")))
            .select(F.col("i.id").alias("id_inc"),
                    F.col(f"c.{id_col}").alias("id_corpus"))
            .dropDuplicates(["id_inc", "id_corpus"]))
    vc = vecs_df.select(F.col(id_col).alias("id_corpus"),
                        F.col("nvec").alias("_vb"))
    paired = cand.join(vc, "id_corpus").select("id_inc", "id_corpus", "_vb")
    bc = spark.sparkContext.broadcast((ids, nvec_mat))
    out_schema = (f"id_inc {id_t.simpleString()}, "
                  f"id_corpus {id_t.simpleString()}, cos double")

    def score(batches):
        idlist, mat = bc.value
        pos = {x: j for j, x in enumerate(idlist)}
        for batch in batches:
            nn = batch.num_rows
            if not nn:
                continue
            ia = np.array([pos[x] for x in batch.column(0).to_pylist()],
                          dtype=np.int64)
            va = mat[ia]
            vb = batch.column(2).flatten().to_numpy().reshape(nn, dim)
            cos = np.einsum("ij,ij->i", va, vb)
            yield pa.RecordBatch.from_arrays(
                [batch.column(0), batch.column(1), pa.array(cos)],
                names=["id_inc", "id_corpus", "cos"])

    return tag_cached_deps(paired.mapInArrow(score, out_schema), [])


def cosine_pairs_against_index(
    inc_df: DataFrame,
    index,
    vec_col: str | None = None,
    broadcast_increment="auto",
    auto_broadcast_rows: int = 2_000_000,
    max_bucket_size: int | None = None,
    pushdown_buckets: int = 10_000,
    collect_increment_rows: int | None = 50_000,
) -> DataFrame:
    """Cross semantic near-duplicate candidate pairs between an increment
    and an indexed corpus: (id_inc, id_corpus, cos).

    The increment is enriched under the index sidecar's own LSH law
    (planes regenerated from (dim, n_planes, seed) — callers cannot
    desync it); a pair is a candidate iff the two vectors share at least
    one band key, exactly the batch engine's candidacy law, and ``cos``
    is the same einsum over the same normalized float64 vectors — the
    cross-parity test pins bit-identity.

    Scale shape (what matters at 100 TB): small increments (at most
    ``pushdown_buckets`` distinct keys, bounded int64 collect) push a
    key ``IN`` predicate onto the bands SCAN — the (blk, key)-sorted
    layout lets parquet min-max stats skip non-matching row groups
    (the exact index's pushed-IN design, r5). Otherwise the corpus
    bands table only STREAMS — the increment's distinct (blk, key) set
    broadcasts onto it and candidate corpus rows flow out of the scan;
    normalized corpus vectors are joined back by candidate id only (AQE
    broadcasts when the candidate set is small). ``broadcast_increment``:
    True / False / "auto" (bounded ``limit(n+1).count()`` probe).
    ``max_bucket_size``
    caps per-(blk, key) membership counted over candidate corpus rows
    and increment rows separately. A doc id present on BOTH sides never
    pairs with itself.

    ``collect_increment_rows``: increments at or under this many rows
    (bounded ``limit(n+1).count()`` probe; only with
    ``broadcast_increment`` "auto"/True) run the COLLECTED probe plan —
    the enriched increment (same ``_lsh_enriched`` kernel, so nvec/keys
    are bit-identical) is collected once; its band rows and touched
    buckets become local relations and scoring gathers the increment
    vector from a broadcast matrix, removing the distributed enrichment
    persist, the touched-collect job and one join from every probe.
    Pairs and cosines are identical (same candidacy joins, same einsum
    over the same float64 rows). NaN DOUBLE ids fall back to the
    distributed plan (pandas cannot key NaN)."""
    from pyspark import StorageLevel

    from .cache import tag_cached_deps
    from .similarity import _hyperplanes, _lsh_enriched, _score_pairs_arrow

    spark = inc_df.sparkSession
    bands_df, vecs_df, meta = _resolve_cosine_index(spark, index)
    _check_increment_schema(inc_df, meta)
    id_col = meta["id_col"]
    vcol = vec_col or meta["vec_col"]
    _check_increment_vec(inc_df, meta, vcol)
    planes = _hyperplanes(meta["dim"], meta["n_planes"], meta["seed"])

    inc = inc_df.where(F.col(id_col).isNotNull() & F.col(vcol).isNotNull())
    v = inc.select(F.col(id_col).alias("id"),
                   F.col(vcol).cast("array<double>").alias("vec"))
    id_field = inc_df.schema[id_col]
    if (collect_increment_rows is not None
            and broadcast_increment in ("auto", True)
            and inc.limit(collect_increment_rows + 1).count()
            <= collect_increment_rows):
        enr_pdf = _lsh_enriched(v, id_field, planes, meta["n_planes"],
                                meta["bands"], meta["width"]).toPandas()
        if not enr_pdf["id"].isna().any():
            return _cosine_probe_collected(
                spark, bands_df, vecs_df, meta, id_field, enr_pdf,
                max_bucket_size, pushdown_buckets)
        # NaN double ids: fall through to the distributed plan below
    enriched = _lsh_enriched(
        v, id_field, planes, meta["n_planes"], meta["bands"], meta["width"]
    ).persist(StorageLevel.MEMORY_AND_DISK)
    inc_banded = enriched.select("id", F.posexplode("keys").alias("blk", "key"))

    if broadcast_increment == "auto":
        small = (inc.limit(auto_broadcast_rows + 1).count()
                 <= auto_broadcast_rows)
    else:
        small = bool(broadcast_increment)
    maybe_bc = F.broadcast if small else (lambda d: d)

    touched = inc_banded.select("blk", "key").dropDuplicates()
    pushed = None
    if pushdown_buckets:
        sample = touched.limit(pushdown_buckets + 1).collect()
        if len(sample) <= pushdown_buckets:
            pushed = sorted({r["key"] for r in sample})
    scan = (bands_df.where(F.col("key").isin(pushed))
            if pushed is not None else bands_df)
    cand_corpus = scan.join(maybe_bc(touched), ["blk", "key"])
    if max_bucket_size is not None:
        for side in ("corpus", "inc"):
            frame = cand_corpus if side == "corpus" else inc_banded
            ok = (frame.groupBy("blk", "key")
                  .agg(F.count(F.lit(1)).alias("_bn"))
                  .where(F.col("_bn") <= max_bucket_size).drop("_bn"))
            if side == "corpus":
                cand_corpus = cand_corpus.join(ok, ["blk", "key"])
            else:
                inc_banded = inc_banded.join(ok, ["blk", "key"])

    c, i = cand_corpus.alias("c"), inc_banded.alias("i")
    cand = (c.join(maybe_bc(i),
                   (F.col("c.blk") == F.col("i.blk"))
                   & (F.col("c.key") == F.col("i.key"))
                   & (F.col(f"c.{id_col}") != F.col("i.id")))
            .select(F.col("i.id").alias("id_inc"),
                    F.col(f"c.{id_col}").alias("id_corpus"))
            .dropDuplicates(["id_inc", "id_corpus"]))
    vc = vecs_df.select(F.col(id_col).alias("id_corpus"),
                        F.col("nvec").alias("_vb"))
    vi = enriched.select(F.col("id").alias("id_inc"),
                         F.col("nvec").alias("_va"))
    paired = (cand.join(vc, "id_corpus").join(maybe_bc(vi), "id_inc")
              .select(F.col("id_inc").alias("id"),
                      F.col("id_corpus").alias("neighbor"), "_va", "_vb"))
    scored = _score_pairs_arrow(paired, id_field, meta["dim"])
    out = scored.select(F.col("id").alias("id_inc"),
                        F.col("neighbor").alias("id_corpus"), "cos")
    return tag_cached_deps(out, [enriched])


def dedup_against_cosine_index(
    inc_df: DataFrame,
    index,
    threshold: float = 0.9,
    vec_col: str | None = None,
    within: bool = True,
    keep_by: str | None = None,
    broadcast_increment="auto",
    max_bucket_size: int | None = None,
    checkpoint_dir: str | None = None,
    within_k: int = 32,
    pushdown_buckets: int = 10_000,
) -> DataFrame:
    """Incremental SEMANTIC dedup of ``inc_df`` against an indexed corpus
    — the embedding twin of ``dedup_against_index``, same row contract:
    one row per increment row, (id_col, corpus_match, component, keep).

    - ``corpus_match``: the MIN corpus id with cos >= threshold (NaN
      cosines never match — the zero-vector guard). Matched docs are
      dropped: keep = FALSE, component = NULL.
    - survivors are near-deduplicated among THEMSELVES (``within=True``)
      with ``dedup_semantic(method="lsh")`` under the index's own LSH
      parameters: component = cluster id, keep = canonical survivor
      (``keep_by`` = quality-aware selection); ``within_k`` is the
      per-node candidate degree cap of the within pass.
    - NULL-id rows pass through (keep = TRUE, both labels NULL).

    Follow with ``append_to_cosine_index`` on the kept rows to fold
    survivors into the index for the next increment."""
    from .cache import cached_deps, tag_cached_deps
    from .dedup import dedup_semantic

    spark = inc_df.sparkSession
    bands_df, vecs_df, meta = _resolve_cosine_index(spark, index)
    id_col = meta["id_col"]
    vcol = vec_col or meta["vec_col"]
    pairs = cosine_pairs_against_index(
        inc_df, (bands_df, vecs_df, meta), vec_col=vcol,
        broadcast_increment=broadcast_increment,
        max_bucket_size=max_bucket_size,
        pushdown_buckets=pushdown_buckets)
    hits = (pairs.where(~F.isnan(F.col("cos"))
                        & (F.col("cos") >= threshold))
            .groupBy("id_inc").agg(F.min("id_corpus").alias("corpus_match")))
    marked = inc_df.join(
        hits, inc_df[id_col] == hits["id_inc"], "left").drop("id_inc")
    dropped = (marked.where(F.col("corpus_match").isNotNull())
               .select(F.col(id_col), "corpus_match",
                       F.lit(None).cast(meta["id_type"]).alias("component"),
                       F.lit(False).alias("keep")))
    survivors = marked.where(F.col("corpus_match").isNull()) \
                      .drop("corpus_match")
    if within:
        # dim comes from the sidecar, NOT from an eager .first() probe of
        # the survivors: a fully-duplicate increment (the steady state of a
        # streaming crawl re-seeing its corpus) leaves ZERO survivors, and
        # the probe would raise instead of returning all-dropped labels
        labels = dedup_semantic(
            survivors, threshold=threshold, vec_col=vcol, id_col=id_col,
            method="lsh", checkpoint_dir=checkpoint_dir, keep_by=keep_by,
            k=within_k, n_planes=meta["n_planes"], bands=meta["bands"],
            seed=meta["seed"], max_bucket_size=max_bucket_size,
            dim=meta["dim"])
    else:
        labels = survivors.select(
            F.col(id_col),
            F.lit(None).cast(meta["id_type"]).alias("component"),
            F.lit(True).alias("keep"))
    kept_side = labels.select(
        F.col(id_col),
        F.lit(None).cast(meta["id_type"]).alias("corpus_match"),
        "component", "keep")
    out = kept_side.unionByName(dropped)
    return tag_cached_deps(out, cached_deps(pairs) + cached_deps(labels))


def append_to_cosine_index(df: DataFrame, path: str,
                           vec_col: str | None = None) -> dict:
    """Fold new vectors (typically ``dedup_against_cosine_index``
    survivors) into an existing cosine index under its OWN sidecar law;
    updates ``n_vecs``. The caller appends each id at most once (append
    exactly the kept survivors), as with the MinHash twin."""
    from pyspark import StorageLevel

    from .similarity import _hyperplanes, _lsh_enriched

    spark = df.sparkSession
    meta = read_json_sidecar(
        spark, path, _COS_SIDECAR,
        "not a write_cosine_index artifact — nothing to append to")
    _check_increment_schema(df, meta)
    id_col = meta["id_col"]
    vcol = vec_col or meta["vec_col"]
    _check_increment_vec(df, meta, vcol)
    planes = _hyperplanes(meta["dim"], meta["n_planes"], meta["seed"])
    _heal_precompact(spark, path.rstrip("/") + "/bands",
                     path.rstrip("/") + "/vecs")
    base = df.where(F.col(id_col).isNotNull() & F.col(vcol).isNotNull())
    v = base.select(F.col(id_col).alias("id"),
                    F.col(vcol).cast("array<double>").alias("vec"))
    enriched = _lsh_enriched(
        v, df.schema[id_col], planes, meta["n_planes"], meta["bands"],
        meta["width"]).persist(StorageLevel.MEMORY_AND_DISK)
    try:
        (enriched.select(F.col("id").alias(id_col), "nvec")
         .write.mode("append").parquet(path.rstrip("/") + "/vecs"))
        (enriched.select(F.col("id").alias(id_col),
                         F.posexplode("keys").alias("blk", "key"))
         .sortWithinPartitions("blk", "key")
         .write.mode("append").parquet(path.rstrip("/") + "/bands"))
        n_new = enriched.count()
    finally:
        enriched.unpersist()
    meta["n_vecs"] = int(meta["n_vecs"]) + int(n_new)
    write_json_sidecar(spark, path, _COS_SIDECAR, meta)
    return meta


def append_to_exact_index(df: DataFrame, path: str,
                          text_col: str | None = None) -> dict:
    """Fold new documents (typically ``dedup_against_exact_index``
    survivors) into an existing exact index under its OWN sidecar law;
    updates ``n_docs``. The caller appends each id at most once (append
    exactly the kept survivors), as with the MinHash twin. Appended
    files are range-partitioned among themselves — pushdown pruning
    still skips whole files per append generation."""
    from .dedup import exact_fingerprint

    spark = df.sparkSession
    meta = read_json_sidecar(
        spark, path, _EXACT_SIDECAR,
        "not a write_exact_index artifact — nothing to append to")
    _check_increment_schema(df, meta)
    id_col = meta["id_col"]
    tcol = text_col or meta["text_col"]
    _heal_precompact(spark, path.rstrip("/") + "/digests")
    base = (df.where(F.col(id_col).isNotNull()
                     & F.col(tcol).isNotNull())
            .select(F.col(id_col),
                    exact_fingerprint(tcol).alias("fingerprint")))
    n_new = base.count()
    (base.repartitionByRange("fingerprint")
     .sortWithinPartitions("fingerprint")
     .write.mode("append").parquet(path.rstrip("/") + "/digests"))
    meta["n_docs"] = int(meta["n_docs"]) + int(n_new)
    write_json_sidecar(spark, path, _EXACT_SIDECAR, meta)
    return meta


def _heal_precompact(spark: SparkSession, *table_paths: str) -> None:
    """Restore any table left in the crashed-compaction state (table dir
    renamed away, ``<table>_precompact`` backup holding the data) before
    it is read OR appended to. Probes would otherwise fail with a raw
    path-does-not-exist error, and an APPEND would silently create a
    fresh table containing only the increment, orphaning the backup —
    so every read_*/append_* entry point heals first (two cheap
    existence checks per table when nothing is wrong)."""
    from . import fsio

    for table_path in table_paths:
        cur = table_path.rstrip("/")
        old = cur + "_precompact"
        if not fsio.hadoop_exists(spark, cur) and fsio.hadoop_exists(
                spark, old):
            if not fsio.hadoop_rename(spark, old, cur):
                raise IOError(f"could not restore {old} -> {cur}")


def _compact_table(spark: SparkSession, table_path: str,
                   order_cols: list, n_files: int | None) -> None:
    """Crash-safe rewrite of one parquet table as a single globally
    range-sorted generation (the shared kernel of the three index
    compactors). read -> global ``repartitionByRange(order_cols)`` ->
    sorted rewrite into ``<table>_compact_tmp``, row-count verified,
    then a rename swap (``<table>`` -> ``<table>_precompact`` -> temp
    in, backup deleted last). Crash between the two renames leaves
    ``<table>_precompact`` holding the data; the next call self-heals
    by restoring it before compacting. Single-writer maintenance
    window, like append (object-store renames are copy+delete, not
    atomic). Every row is preserved exactly — compaction reorganizes,
    never dedupes."""
    from . import fsio

    cur = table_path.rstrip("/")
    old, tmp = cur + "_precompact", cur + "_compact_tmp"
    _heal_precompact(spark, cur)  # crash between the swap renames
    df = spark.read.parquet(cur)
    n = df.count()
    part = (df.repartitionByRange(n_files, *order_cols) if n_files
            else df.repartitionByRange(*order_cols))
    fsio.hadoop_delete(spark, tmp)  # stale temp from a crashed run
    (part.sortWithinPartitions(*order_cols)
     .write.mode("overwrite").parquet(tmp))
    n_tmp = spark.read.parquet(tmp).count()
    if n_tmp != n:
        fsio.hadoop_delete(spark, tmp)
        raise RuntimeError(
            f"compaction row-count mismatch ({n_tmp} != {n}) — "
            f"temp discarded, {cur} untouched")
    fsio.hadoop_delete(spark, old)
    if not fsio.hadoop_rename(spark, cur, old):
        raise IOError(f"could not stage {cur} -> {old}")
    if not fsio.hadoop_rename(spark, tmp, cur):
        fsio.hadoop_rename(spark, old, cur)  # roll back
        raise IOError(f"could not commit {tmp} -> {cur} (rolled back)")
    fsio.hadoop_delete(spark, old)


def compact_exact_index(spark: SparkSession, path: str,
                        n_files: int | None = None) -> dict:
    """Rewrite the digest table as ONE globally range-sorted generation.

    Every ``append_to_exact_index`` adds its own range-partitioned file
    set: correct (probes skip per generation), but after N crawls the
    table holds N overlapping range layouts — file count grows without
    bound (the small-files problem) and a probe's min-max skipping must
    touch one file per generation per digest interval instead of one
    file total. Compaction restores the single-write layout via the
    crash-safe swap in ``_compact_table``. Sidecar gains a
    ``compactions`` counter; ``n_docs`` and every row are preserved
    exactly (duplicate fingerprints, if the caller ever appended any,
    are kept)."""
    meta = read_json_sidecar(
        spark, path, _EXACT_SIDECAR,
        "not a write_exact_index artifact — nothing to compact")
    _compact_table(spark, path.rstrip("/") + "/digests",
                   ["fingerprint"], n_files)
    meta["compactions"] = int(meta.get("compactions", 0)) + 1
    write_json_sidecar(spark, path, _EXACT_SIDECAR, meta)
    return meta


def compact_minhash_index(spark: SparkSession, path: str,
                          n_files: int | None = None) -> dict:
    """Compact a MinHash index's ``bands`` and ``sigs`` tables.

    Each ``append_to_minhash_index`` adds one file generation per table;
    after N crawls a probe's pushed bucket-``IN`` predicate must consult
    min-max stats in one file per generation per bucket interval, and
    file counts grow without bound. Compaction rewrites ``bands`` as one
    globally range-sorted layout on (band, bucket) — restoring
    single-file-per-bucket-interval row-group skipping for the r5
    pushdown probe — and ``sigs`` range-sorted on the id column (the
    candidate join-back key). Each table swaps independently via the
    crash-safe protocol in ``_compact_table`` (a crash between the two
    tables leaves the first compacted and the second not — both states
    are valid indexes). Probe results are unchanged: compaction
    reorganizes rows, never drops or dedupes them."""
    meta = read_json_sidecar(
        spark, path, _SIDECAR,
        "not a write_minhash_index artifact — nothing to compact")
    root = path.rstrip("/")
    _compact_table(spark, root + "/bands", ["band", "bucket"], n_files)
    _compact_table(spark, root + "/sigs", [meta["id_col"]], n_files)
    meta["compactions"] = int(meta.get("compactions", 0)) + 1
    write_json_sidecar(spark, path, _SIDECAR, meta)
    return meta


def compact_cosine_index(spark: SparkSession, path: str,
                         n_files: int | None = None) -> dict:
    """Compact a cosine index's ``bands`` and ``vecs`` tables — the
    semantic twin of ``compact_minhash_index``: ``bands`` rewrites
    range-sorted on (blk, key) so the pushed key-``IN`` probe skips row
    groups in one generation instead of N, ``vecs`` range-sorted on the
    id column. Same crash-safe per-table swap; rows preserved exactly;
    sidecar ``compactions`` counter incremented."""
    meta = read_json_sidecar(
        spark, path, _COS_SIDECAR,
        "not a write_cosine_index artifact — nothing to compact")
    root = path.rstrip("/")
    _compact_table(spark, root + "/bands", ["blk", "key"], n_files)
    _compact_table(spark, root + "/vecs", [meta["id_col"]], n_files)
    meta["compactions"] = int(meta.get("compactions", 0)) + 1
    write_json_sidecar(spark, path, _COS_SIDECAR, meta)
    return meta


def append_to_minhash_index(df: DataFrame, path: str,
                            text_col: str | None = None) -> dict:
    """Fold new documents (typically ``dedup_against_index`` survivors)
    into an existing index: signatures and band buckets are computed
    under the index's OWN sidecar parameters (callers cannot desync the
    law) and appended; the sidecar's ``n_docs`` is updated. Returns the
    updated sidecar dict.

    The caller is responsible for appending each id at most once (the
    natural usage — append exactly the kept survivors — guarantees it);
    an id present twice would pair with itself on later probes."""
    from pyspark import StorageLevel

    spark = df.sparkSession
    meta = read_json_sidecar(
        spark, path, _SIDECAR,
        "not a write_minhash_index artifact — nothing to append to")
    _check_increment_schema(df, meta)
    id_col = meta["id_col"]
    tcol = text_col or meta["text_col"]
    _heal_precompact(spark, path.rstrip("/") + "/bands",
                     path.rstrip("/") + "/sigs")
    base = df.where(F.col(id_col).isNotNull())
    sigs = minhash_signatures(
        base, tcol, id_col, meta["num_perm"], meta["shingle_k"],
        meta["seed"]).persist(StorageLevel.MEMORY_AND_DISK)
    try:
        sigs.write.mode("append").parquet(path.rstrip("/") + "/sigs")
        banded = sigs.mapInArrow(
            make_band_explode(id_col, meta["num_perm"], meta["bands"],
                              meta["r"]),
            _bucket_schema(df.schema[id_col]))
        (banded.sortWithinPartitions("band", "bucket")
         .write.mode("append").parquet(path.rstrip("/") + "/bands"))
        n_new = sigs.count()
    finally:
        sigs.unpersist()
    meta["n_docs"] = int(meta["n_docs"]) + int(n_new)
    write_json_sidecar(spark, path, _SIDECAR, meta)
    return meta
