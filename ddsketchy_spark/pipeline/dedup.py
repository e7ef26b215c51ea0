"""Deduplication operators for training-data pipelines.

Scale design notes (the part that matters at 100 TB):
- Exact dedup is a hash-groupBy on a 16-byte digest — shuffle carries only
  (digest, id), never the text.
- MinHash/LSH shuffles (band_hash, id) rows: bands * n rows of ~24 bytes.
  Candidate generation is a self-join on band buckets (shuffled hash join;
  quadratic blowup confined to buckets, optionally capped by
  max_bucket_size). Slot-agreement verification has two engines:
  verify="broadcast" scores candidates against a BROADCAST signature matrix
  (num_perm*8 bytes per doc, bounded by max_broadcast_rows ~2M docs);
  verify="local" joins the signature arrays back onto the candidate pairs
  and counts agreement with one vectorized NumPy pass per Arrow batch —
  fully distributed, no driver collect, no ceiling. verify="auto" picks by
  corpus size.
- SimHash reduces each doc to one 64-bit signature; near-dup candidates at
  Hamming distance <= d come from d+1-way table rotations (pigeonhole),
  all native joins.
- Word-level Jaccard all-pairs is provided for oracle parity at test scale
  ONLY (cartesian by construction — do not run at production scale; use
  minhash_lsh_pairs there).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pyarrow as pa

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    ArrayType,
    LongType,
    StructField,
    StructType,
)

from ..core.hashing import splitmix64
from .chunking import iter_doc_chunks


def exact_fingerprint(text_col: str):
    """The package-wide exact-duplicate digest: md5 of the
    whitespace-trimmed, lowercased text. ONE definition so the batch
    engines and the persistent exact index can never disagree."""
    return F.md5(F.lower(F.trim(F.col(text_col))))


def exact_dup_groups(df: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id", collect_ids: bool = True) -> DataFrame:
    """Groups of byte-identical (normalized) documents.

    Returns (fingerprint, n_docs[, ids]) for groups with n_docs > 1.
    ``collect_ids=False`` skips the per-group id list — use at full scale,
    where a pathological fingerprint with millions of members would blow up
    a single aggregation buffer."""
    fp = exact_fingerprint(text_col)
    aggs = [F.count(F.lit(1)).alias("n_docs")]
    if collect_ids:
        aggs.append(F.sort_array(F.collect_list(id_col)).alias("ids"))
    return (
        df.filter(F.col(text_col).isNotNull())  # null texts are not duplicates
        .select(fp.alias("fingerprint"), F.col(id_col))
        .groupBy("fingerprint")
        .agg(*aggs)
        .filter(F.col("n_docs") > 1)
    )


def dedup_exact(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep one representative (min id) per identical-text group.

    Rows with NULL text are never treated as duplicates of anything — they
    pass through untouched (an equi-join on a NULL fingerprint would
    otherwise silently drop them all)."""
    nulls = df.filter(F.col(text_col).isNull())
    nonnull = df.filter(F.col(text_col).isNotNull())
    fp = exact_fingerprint(text_col)
    w = nonnull.withColumn("_fp", fp)
    keep = w.groupBy("_fp").agg(F.min(id_col).alias(id_col)).select("_fp", id_col)
    return w.join(keep, ["_fp", id_col], "inner").drop("_fp").unionByName(nulls)


def word_jaccard_pairs(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                       threshold: float = 0.8, method: str = "allpairs",
                       positional: bool = True,
                       broadcast_docs: int = 100_000,
                       collect_verify_tokens: int = 3_000_000) -> DataFrame:
    """EXACT word-set Jaccard pairs at ``jaccard >= threshold``.

    ``method="allpairs"`` (default, the scale path): prefix-filtered
    similarity join (Bayardo et al.'s AllPairs) — candidates come from a
    self-join on each document's PREFIX tokens only, then exact Jaccard is
    verified natively. Same results as the cartesian path, no O(n^2) blowup.
    ``method="cartesian"``: the all-pairs self-join, kept as the test-scale
    oracle baseline.

    ``broadcast_docs``: corpora at or under this many documents run the
    join plan in BROADCAST form — the (id, tok) token table is persisted
    once and broadcast into every join (candidate self-join, overlap
    verification), so the whole verify chain is one streaming codegen
    pass with no wide shuffles (measured ~2.5x at 5k template docs, where
    the shuffle plan sorts the |pairs| x |doc| expansion). Above the
    threshold the original all-shuffle plan runs unchanged — the probe is
    a bounded ``limit(n+1).count()``, identical results either way.

    ``collect_verify_tokens``: within the broadcast gate, corpora whose
    (id, token) table has at most this many rows additionally verify the
    candidate pairs with a vectorized NumPy overlap kernel against a
    collected token CSR (one searchsorted pass per Arrow batch) instead
    of the |pairs| x |doc| expansion joins — same pairs, bit-identical
    jaccard doubles (the kernel computes the same int64 overlap count
    and the same IEEE double division)."""
    sets = df.select(
        F.col(id_col).alias("id"),
        F.array_distinct(F.split(F.col(text_col), " ")).alias("ws"),
    )
    if method == "cartesian":
        a = sets.alias("a")
        b = sets.alias("b")
        inter = F.size(F.array_intersect(F.col("a.ws"), F.col("b.ws")))
        union = F.size(F.array_union(F.col("a.ws"), F.col("b.ws")))
        return (
            a.join(b, F.col("a.id") < F.col("b.id"))
            .select(
                F.col("a.id").alias("id_a"),
                F.col("b.id").alias("id_b"),
                (inter / union).alias("jaccard"),
            )
            .filter(F.col("jaccard") >= threshold)
        )
    if method != "allpairs":
        raise ValueError(f"unknown method {method!r}")
    small = (broadcast_docs is not None
             and df.limit(broadcast_docs + 1).count() <= broadcast_docs)
    return _word_jaccard_allpairs(sets, threshold, positional=positional,
                                  broadcast=small,
                                  collect_verify_tokens=collect_verify_tokens)


def _word_jaccard_allpairs(sets: DataFrame, threshold: float,
                           positional: bool = True,
                           broadcast: bool = False,
                           collect_verify_tokens: int | None = 3_000_000) -> DataFrame:
    """Prefix-filtered exact similarity join — distributed, no cartesian.

    Completeness argument (Jaccard >= t => the pair survives filtering):
    J(A,B) >= t implies |A^B| >= t*|A∪B| >= t*max(|A|,|B|), so with every
    document's distinct tokens sorted by a common total order (ascending
    document frequency, rarest first; ties by token), if A and B shared no
    token within their prefixes of length |X| - ceil(t*|X|) + 1, the
    smallest common token would sit in one side's suffix, forcing
    |A^B| <= ceil(t*|X|) - 1 < t*|X| — contradiction. The same |A^B| bound
    gives the size filter t*|B| <= |A| <= |B|/t. Verification then counts
    the exact overlap of each deduplicated candidate pair with the
    token-join kernel (see the inline note) — so the filters only need
    completeness, never precision.

    Positional filter (PPJoin, Xiao et al. 2008, join-form as in Vernica
    et al. 2010): each prefix row also carries the token's 1-based
    position ``pos`` in the document's sorted token list, and the join
    keeps a candidate-generating token only when

        min(i, j) + min(|A| - i, |B| - j) >= ceil(t/(1+t) * (|A| + |B|))

    Soundness of the bound: common tokens strictly BEFORE the matching
    token w in the global order occupy positions < i in A and < j in B,
    so there are at most min(i-1, j-1) of them; common tokens at or after
    w are w itself plus at most min(|A|-i, |B|-j) more — so the total
    overlap O <= min(i,j) + min(|A|-i, |B|-j). J(A,B) >= t is equivalent
    to O >= t/(1+t)*(|A|+|B|) (since J = O/(|A|+|B|-O)), so any token row
    violating the inequality cannot come from a qualifying pair.
    Completeness: a qualifying pair satisfies the bound at EVERY common
    token, so all of its generating prefix rows survive — the
    dropDuplicates afterwards still sees the pair. (ceil is applied after
    round(.,9) so fp dust can only LOWER the required overlap — filters
    may only get looser, never lossy.)

    Scale shape: shuffles are O(total tokens) for the df-count and the
    per-doc sort, then O(prefix tokens) for the candidate self-join —
    stop words land in suffixes (rarest-first order) and are never
    indexed, which is what confines the join blowup. Verification flows
    O(candidates x doc tokens) NARROW (id, id, tok) rows through two hash
    joins and a map-side-combining count — the document arrays themselves
    never replicate per pair. The per-doc window sort partitions by doc
    id: bounded by document length, no hot keys. Everything stays in
    codegen; no Python, no driver collect, no interpreted set ops.

    ``broadcast=True`` (bounded corpora only — the caller gates on a doc
    count): the (id, tok) token table is persisted once (it otherwise
    recomputes for each of its four consumers) and hash-broadcast into
    the candidate self-join and both verification joins, so candidate
    generation and the |pairs| x |doc| overlap expansion run as ONE
    whole-stage-codegen pipeline — the only wide shuffles left are the
    candidate dropDuplicates and the map-side-combined overlap count.
    The expansion sides also drop df=1 tokens first (a token in exactly
    one document can never be common to a pair, so the overlap count is
    unchanged). Release the persisted token table with
    ``pipeline.cache.release_cached_deps(result)``."""
    from pyspark.sql import Window

    sets = sets.where(F.col("ws").isNotNull()).withColumn("sz", F.size("ws"))
    toks = sets.select("id", "sz", F.explode("ws").alias("tok"))
    pinned: list[DataFrame] = []
    use_collect = False
    if broadcast:
        from pyspark import StorageLevel

        toks = toks.persist(StorageLevel.MEMORY_AND_DISK)
        pinned.append(toks)
        # the count doubles as the eager materialization of the persist;
        # it gates the NumPy verify kernel (bounded driver collect) below
        use_collect = (collect_verify_tokens is not None
                       and toks.count() <= collect_verify_tokens)
    dfreq = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    w = Window.partitionBy("id").orderBy(F.asc("df"), F.asc("tok"))
    # fp guard: 0.8*5 = 4.000000000000001 would ceil to 5 and shorten the
    # prefix below the completeness bound — round before ceiling
    need = F.ceil(F.round(F.col("sz") * F.lit(threshold), 9))
    pref = (toks.join(dfreq, "tok")
            .withColumn("pos", F.row_number().over(w))
            .where(F.col("pos") <= F.col("sz") - need + 1)
            .select("tok", "id", "sz", "pos"))
    if broadcast:
        from pyspark import StorageLevel

        # prefix-sized (a few % of tokens): both sides of the self-join
        # read it — persist or the join+window run twice
        pref = pref.persist(StorageLevel.MEMORY_AND_DISK)
        pinned.append(pref)
    a, b = pref.alias("a"), pref.alias("b")
    eps = 1e-9
    # PPJoin positional filter: overlap upper bound at this matching token
    # vs the overlap a qualifying pair needs (see docstring; same
    # round-before-ceil fp guard as `need` — dust only loosens the filter)
    overlap_ub = (
        F.least(F.col("a.pos"), F.col("b.pos"))
        + F.least(F.col("a.sz") - F.col("a.pos"),
                  F.col("b.sz") - F.col("b.pos")))
    overlap_need = F.ceil(F.round(
        (F.col("a.sz") + F.col("b.sz"))
        * F.lit(threshold / (1.0 + threshold)), 9))
    cond = ((F.col("a.tok") == F.col("b.tok"))
            & (F.col("a.id") < F.col("b.id"))
            & (F.col("a.sz") >= F.col("b.sz") * threshold - eps)
            & (F.col("b.sz") >= F.col("a.sz") * threshold - eps))
    if positional:
        cond = cond & (overlap_ub >= overlap_need)
    cand = (
        a.join(F.broadcast(b) if broadcast else b, cond)
        .select(F.col("a.id").alias("id_a"), F.col("a.sz").alias("_sza"),
                F.col("b.id").alias("id_b"), F.col("b.sz").alias("_szb"))
        .dropDuplicates(["id_a", "id_b"])
    )
    # Exact-overlap verification WITHOUT per-pair set operations (the
    # overlap-count kernel of the MapReduce PPJoin, Vernica et al. 2010):
    # expand each candidate pair by A's tokens, keep the ones B also has
    # (hash join on (id_b, tok)), and count — one row per COMMON token,
    # all inside whole-stage codegen. Replaces array_intersect over the
    # joined-back word arrays, which (a) ships each doc's array once per
    # pair and (b) builds a boxed hash set per pair OUTSIDE codegen —
    # measured 2.5x slower than this on 1.9M candidates. Every candidate
    # shares >= 1 (prefix) token, so the inner join never drops a pair.
    # |A∪B| = |A| + |B| - |A∩B| (ws is distinct) avoids union entirely.
    shared = toks
    if broadcast:
        # df=1 tokens can never be common to a pair — dropping them from
        # BOTH expansion sides leaves every pair's overlap count intact
        # while shrinking the |pairs| x |doc| expansion
        shared = toks.join(
            F.broadcast(dfreq.where(F.col("df") >= 2).select("tok")), "tok")
    if use_collect:
        # NumPy overlap verification (bounded corpora only): collect the
        # df>=2 token table ONCE and broadcast it as a CSR of dense token
        # codes; each Arrow batch of candidate pairs expands id_a's codes
        # via the CSR and membership-tests them against id_b's sorted
        # segment with one int64 searchsorted — the same overlap count
        # the expansion joins aggregate, without the |pairs| x |doc|
        # shuffle rows or the |pairs|-group hash aggregate. Every
        # candidate pair shares >= 1 prefix token (df >= 2), so both ids
        # are present in the CSR and the count is >= 1 — exactly the
        # pairs the inner join keeps. jaccard is the identical int64
        # count through the identical IEEE double division (long/long
        # division is double division in Spark too).
        import pandas as pd

        pdf = (shared.where(F.col("id").isNotNull())
               .select("id", "tok").toPandas())
        if pdf["id"].isna().any():
            # a NaN DOUBLE id survives isNotNull but pandas' factorize
            # drops NaN and the kernel's dict lookup cannot normalize it
            # — keep the join plan, whose NaN-normalizing join semantics
            # define the law for such ids (CLAUDE.md NaN-key rule)
            use_collect = False
    if use_collect:
        spark = sets.sparkSession
        if len(pdf):
            id_codes, id_uniques = pd.factorize(pdf["id"].to_numpy())
            tok_codes, _ = pd.factorize(pdf["tok"].to_numpy())
            n_tok = int(tok_codes.max()) + 1
            keys = np.sort(id_codes.astype(np.int64) * np.int64(n_tok)
                           + tok_codes.astype(np.int64))
            counts = np.bincount(id_codes,
                                 minlength=len(id_uniques)).astype(np.int64)
            offsets = np.concatenate(
                [np.zeros(1, dtype=np.int64), np.cumsum(counts)])
            payload = (list(id_uniques), keys, offsets, counts, n_tok)
        else:  # no df>=2 token anywhere => cand is empty; keep kernel safe
            payload = ([], np.empty(0, np.int64), np.zeros(1, np.int64),
                       np.empty(0, np.int64), 1)
        bc = spark.sparkContext.broadcast(payload)
        id_t = sets.schema["id"].dataType.simpleString()
        thr = float(threshold)

        def verify_pairs(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
            idlist, keys, offsets, counts, n_tok = bc.value
            pos = {v: i for i, v in enumerate(idlist)}
            nkeys = len(keys)
            vtok = np.int64(n_tok)
            for batch in batches:
                n = batch.num_rows
                if not n:
                    continue
                a_vals = batch.column(0).to_pylist()
                b_vals = batch.column(2).to_pylist()
                ca = np.array([pos[x] for x in a_vals], dtype=np.int64)
                cb = np.array([pos[x] for x in b_vals], dtype=np.int64)
                la = counts[ca]
                total = int(la.sum())
                pair_idx = np.repeat(np.arange(n, dtype=np.int64), la)
                cum = np.cumsum(la) - la
                idx = (np.arange(total, dtype=np.int64)
                       - np.repeat(cum, la) + np.repeat(offsets[ca], la))
                tokc = keys[idx] - np.repeat(ca, la) * vtok
                queries = np.repeat(cb, la) * vtok + tokc
                p = np.searchsorted(keys, queries)
                hit = p < nkeys
                hit[hit] = keys[p[hit]] == queries[hit]
                inter = np.bincount(pair_idx[hit], minlength=n)
                sza = (batch.column(1).to_numpy(zero_copy_only=False)
                       .astype(np.int64))
                szb = (batch.column(3).to_numpy(zero_copy_only=False)
                       .astype(np.int64))
                jac = inter / (sza + szb - inter)
                sel = np.flatnonzero(jac >= thr)
                yield pa.RecordBatch.from_arrays(
                    [pa.array([a_vals[i] for i in sel],
                              type=batch.column(0).type),
                     pa.array([b_vals[i] for i in sel],
                              type=batch.column(2).type),
                     pa.array(jac[sel], type=pa.float64())],
                    names=["id_a", "id_b", "jaccard"])

        verified = cand.mapInArrow(
            verify_pairs, f"id_a {id_t}, id_b {id_t}, jaccard double")
        if pinned:
            from .cache import tag_cached_deps

            return tag_cached_deps(verified, pinned)
        return verified
    ta = shared.select(F.col("id").alias("id_a"), "tok")
    tb = shared.select(F.col("id").alias("id_b"), "tok")
    verified = (cand.join(F.broadcast(ta) if broadcast else ta, "id_a")
                .join(F.broadcast(tb) if broadcast else tb, ["id_b", "tok"])
                .groupBy("id_a", "id_b", "_sza", "_szb")
                .agg(F.count(F.lit(1)).alias("_inter"))
                .select("id_a", "id_b",
                        (F.col("_inter")
                         / (F.col("_sza") + F.col("_szb") - F.col("_inter")))
                        .alias("jaccard"))
                .filter(F.col("jaccard") >= threshold))
    if pinned:
        from .cache import tag_cached_deps

        return tag_cached_deps(verified, pinned)
    return verified


def dedup_paragraphs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    sep: str = "\n",
    min_chars: int = 20,
) -> DataFrame:
    """Corpus-wide PARAGRAPH dedup (Lee et al. 2022's motivation at
    paragraph granularity): every ``sep``-separated paragraph that already
    appeared earlier in the corpus (first occurrence = smallest
    (doc_id, position), matching on md5(lower(trim(p)))) is REMOVED from
    the document text; the first occurrence stays. Paragraphs shorter
    than ``min_chars`` trimmed characters are never dedup candidates
    (empty/short lines would otherwise all collide and mangle spacing).

    Returns ``df`` with ``text_col`` rewritten (paragraphs re-joined with
    ``sep``; a doc whose every paragraph was removed becomes ""), plus
    ``n_paras_removed``. NULL-text and NULL-id rows pass through
    untouched (NULL ids cannot be ordered into the first-occurrence law).
    ``sep`` is a LITERAL separator (regex-escaped before the split, so
    ". " means dot-space, not any-char-space).

    Scale shape — the document TEXT never shuffles: the duplicate search
    explodes only (hash, doc_id, pos) rows (~28 B each); the first
    occurrence per hash comes from a map-side-combining
    ``min(struct(doc_id, pos))`` aggregate (NOT a window — a
    billion-occurrence boilerplate paragraph would pin a window's hash
    partition to one task, while the min-aggregate combines partials and
    the loser join is AQE-skew-splittable); only the LOSER positions come
    back — one (doc_id, loser_positions[]) row per affected doc, joined
    back (duplicate-heavy docs are a small fraction, so AQE broadcasts
    this side). The rewrite is a native per-doc array filter in the
    projection. Caveat: that filter is a higher-order-function lambda
    referencing the joined loser array — do not SELF-JOIN the returned
    frame directly (the known DeduplicateRelations/HOF binding trap,
    CLAUDE.md); materialize or localCheckpoint first."""
    import re as _re

    sep_re = _re.escape(sep)
    eligible = (F.col(text_col).isNotNull()) & (F.col(id_col).isNotNull())
    paras = (df.where(eligible)
             .select(id_col, F.posexplode(F.split(F.col(text_col), sep_re))
                     .alias("_pos", "_p"))
             .where(F.length(F.trim(F.col("_p"))) >= min_chars)
             .select(id_col, "_pos",
                     F.md5(F.lower(F.trim(F.col("_p")))).alias("_h")))
    winners = paras.groupBy("_h").agg(
        F.min(F.struct(F.col(id_col).alias("id"),
                       F.col("_pos").alias("pos"))).alias("_w"))
    losers = (paras.join(winners, "_h")
              .where((F.col(id_col) != F.col("_w.id"))
                     | (F.col("_pos") != F.col("_w.pos")))
              .groupBy(id_col)
              .agg(F.collect_set("_pos").alias("_loser_pos")))
    joined = df.join(losers, id_col, "left")
    parts = F.split(F.col(text_col), sep_re)
    loser_arr = F.col("_loser_pos")
    kept = F.filter(parts, lambda x, i: ~F.array_contains(loser_arr, i))
    new_text = (F.when(F.col("_loser_pos").isNull() | ~eligible,
                       F.col(text_col))
                .otherwise(F.array_join(kept, sep)))
    n_removed = F.coalesce(F.size("_loser_pos"), F.lit(0))
    return (joined.withColumn("n_paras_removed", n_removed)
            .withColumn(text_col, new_text)
            .drop("_loser_pos"))


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------


# Polynomial combiner base for word-hash shingles (signature law v2) and
# the NumPy chunk budget for the (num_perm x shingles) permutation matrix.
_SHINGLE_POLY = np.uint64(0x100000001B3)  # FNV-1a 64 prime
# Chunk sizes keep the (num_perm x shingles) / (words x 64) working
# matrices ~1 MB AND reused in-place across chunks: large fresh NumPy
# temps fault in fresh pages on every batch, which under 32 concurrent
# Python workers costs ~100 ms/MB on THP-compacting hosts (measured here:
# a per-batch 2x8.6 MB perms chain turned 7 ms of compute into 2.5 s).
_PERM_CHUNK_SHINGLES = 1 << 10
_SIMHASH_CHUNK_WORDS = 1 << 11


def _word_hash_rows(df: DataFrame, text_col: str, id_col: str, seed: int) -> DataFrame:
    """(id, wh: array<bigint>) — one xxhash64 per word, built JVM-side.

    The shared string-hashing front end of the v2 MinHash/SimHash signature
    laws: all per-byte hashing happens in the JVM (``xxhash64(word, seed)``
    inside an array ``transform``); Python only ever sees fixed-width
    int64s. NULL-text rows are filtered here (they carry no signature),
    matching the v1 behavior of skipping them.

    The transform lambda references ONLY its own variable and a literal —
    no outer attribute capture — so it is safe on frames that later
    self-join (the DeduplicateRelations dangling-exprId trap hits only
    lambdas that capture outer columns; see CLAUDE.md / joins.py)."""
    words = F.split(F.col(text_col), " ")
    wh = F.transform(words, lambda w: F.xxhash64(w, F.lit(seed)))
    return (df.where(F.col(text_col).isNotNull())
            .select(id_col, wh.alias("wh")))


def _shingle_hashes_flat(flat: np.ndarray, lens: np.ndarray, k: int,
                         seed: int) -> tuple[np.ndarray, np.ndarray]:
    """Doc-major flat shingle hashes from doc-major flat word hashes.

    Combiner law (v2): shingle hash = splitmix64(sum_i wh[i] * P^(m-1-i))
    over the shingle's m word hashes (m = k, or the whole document when it
    has fewer than k words — one shingle, mirroring v1's whole-text
    shingle). Fully vectorized: one sliding-window polynomial over the
    concatenated batch, cross-document windows masked out by position.

    Returns (shingles, counts): flat shingle hashes (int64) and the number
    of shingles per document (``lens - k + 1`` clamped to >= 1)."""
    n_docs = len(lens)
    total = int(lens.sum())
    counts = np.maximum(lens - k + 1, 1)
    u = flat.view(np.uint64)
    powers = np.empty(k, dtype=np.uint64)
    powers[k - 1] = 1
    with np.errstate(over="ignore"):
        for i in range(k - 2, -1, -1):
            powers[i] = powers[i + 1] * _SHINGLE_POLY
    off = np.zeros(n_docs + 1, dtype=np.int64)
    np.cumsum(lens, out=off[1:])
    out = np.empty(int(counts.sum()), dtype=np.int64)
    long_docs = lens >= k
    # which output slots belong to long docs (doc-major on both sides)
    is_long_slot = np.repeat(long_docs, counts)
    if total >= k:
        nw = total - k + 1
        # shifted in-place accumulation, not a (nw, k) windowed matmul —
        # keeps the largest temp at O(nw) bytes (see chunk-size note above)
        with np.errstate(over="ignore"):
            poly = u[:nw] * powers[0]
            tmp = np.empty(nw, dtype=np.uint64)
            for i in range(1, k):
                np.multiply(u[i:i + nw], powers[i], out=tmp)
                poly += tmp
        # window starting at flat position p is intra-document iff p and
        # p+k-1 fall in the same doc
        doc_of = np.repeat(np.arange(n_docs, dtype=np.int64), lens)
        valid = doc_of[:nw] == doc_of[k - 1:]
        out[is_long_slot] = splitmix64(
            poly[valid].view(np.int64), seed).view(np.int64)
    # short docs (< k words): one shingle over all their words — rare,
    # loop only over those docs
    if not long_docs.all():
        short_idx = np.flatnonzero(~long_docs)
        vals = np.empty(len(short_idx), dtype=np.uint64)
        with np.errstate(over="ignore"):
            for j, d in enumerate(short_idx):
                m = int(lens[d])
                seg = u[off[d]:off[d] + m]
                vals[j] = np.uint64((seg * powers[k - m:]).sum(dtype=np.uint64))
        out[~is_long_slot] = splitmix64(vals.view(np.int64), seed).view(np.int64)
    return out, counts


def _list_lengths(arr: pa.Array) -> np.ndarray:
    """Per-row lengths of an Arrow list array as int64 (no nulls expected).

    Offset arithmetic, NOT ``pyarrow.compute.list_value_length`` — the
    ``pyarrow.compute`` import alone costs ~0.4 s (it pulls in pandas) in
    every fresh Python worker."""
    return np.diff(arr.offsets.to_numpy().astype(np.int64))


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 128,
    shingle_k: int = 3,
    seed: int = 1,
) -> DataFrame:
    """(id, sig: array<bigint>) — MinHash over word k-shingles.

    Signature law v2 (round 3): word hashing happens JVM-side
    (``xxhash64(word, seed)`` per word inside codegen-adjacent array
    transform — no Python string ever materializes); shingle hashes are a
    vectorized sliding-window polynomial over the concatenated word-hash
    stream of the WHOLE Arrow batch (cross-document windows masked), and
    the num_perm universal-hash permutations h_i(x) = a_i*x + b_i reduce
    to per-document minima with one ``np.minimum.reduceat`` per chunk.
    No per-document Python loop anywhere on the hot path (v1 built k-word
    shingle STRINGS per document in Python — the cost the round-2 verdict
    flagged; v2 changes the signature values, and every consumer is
    invariant- or parity-based, not value-based).

    Documents shorter than ``shingle_k`` words contribute one shingle over
    all their words (v1: the whole text as one shingle). NULL-text rows
    are dropped (no signature), as in v1."""
    id_field = df.schema[id_col]
    schema = StructType([id_field, StructField("sig", ArrayType(LongType()))])
    hashed = _word_hash_rows(df, text_col, id_col, seed)
    rng = np.random.default_rng(seed)
    A = rng.integers(1, (1 << 61) - 1, size=num_perm, dtype=np.int64) | 1
    B = rng.integers(0, (1 << 61) - 1, size=num_perm, dtype=np.int64)
    # captured by value so tests can shrink it to force chunk boundaries
    chunk = _PERM_CHUNK_SHINGLES

    def run(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        buf = np.empty((num_perm, chunk), dtype=np.int64)  # reused in-place
        for batch in batches:
            n = batch.num_rows
            if not n:
                continue
            wh_arr = batch.column(1)
            lens = _list_lengths(wh_arr)
            flat = wh_arr.flatten().to_numpy().astype(np.int64, copy=False)
            shingles, counts = _shingle_hashes_flat(flat, lens, shingle_k, seed)
            starts = np.zeros(n + 1, dtype=np.int64)
            np.cumsum(counts, out=starts[1:])
            sig = np.empty((n, num_perm), dtype=np.int64)
            # chunk at document boundaries; the (num_perm, <=chunk) perm
            # matrix is computed IN-PLACE into one reused buffer
            for d0, d1 in iter_doc_chunks(starts, chunk):
                seg = shingles[starts[d0]:starts[d1]]
                m = len(seg)
                if m > buf.shape[1]:  # single doc longer than the chunk
                    buf = np.empty((num_perm, m), dtype=np.int64)
                with np.errstate(over="ignore"):
                    np.multiply(A[:, None], seg[None, :], out=buf[:, :m])
                    np.add(buf[:, :m], B[:, None], out=buf[:, :m])
                local_off = (starts[d0:d1] - starts[d0])
                sig[d0:d1] = np.minimum.reduceat(
                    buf[:, :m], local_off, axis=1).T
            offsets = pa.array(
                np.arange(0, (n + 1) * num_perm, num_perm, dtype=np.int32))
            sig_arr = pa.ListArray.from_arrays(
                offsets, pa.array(sig.ravel(), type=pa.int64()))
            yield pa.RecordBatch.from_arrays(
                [batch.column(0), sig_arr], names=[id_col, "sig"])

    return hashed.mapInArrow(run, schema)


def _band_buckets(sig_matrix: np.ndarray, bands: int, r: int) -> np.ndarray:
    """(n, bands) bucket hashes: fold each band's r signature slots through
    splitmix64 (vectorized over rows)."""
    n = sig_matrix.shape[0]
    out = np.empty((n, bands), dtype=np.int64)
    for b in range(bands):
        h = np.zeros(n, dtype=np.int64)
        for j in range(b * r, (b + 1) * r):
            h = splitmix64(h ^ sig_matrix[:, j], b).view(np.int64)
        out[:, b] = h
    return out


def make_band_explode(id_col: str, num_perm: int, bands: int, r: int,
                      carry_sig: bool = False):
    """mapInArrow function exploding (id, sig) rows to one row per band:
    (id[, sig], band, bucket) — the ONE banding layout shared by the batch
    LSH engine and the streaming near-dup operator (their documented
    pair-for-pair parity depends on the layouts staying bit-identical)."""

    def to_buckets(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        band_ids = np.arange(bands, dtype=np.int64)
        for batch in batches:
            n = batch.num_rows
            if not n:
                continue
            mat = (batch.column(1).flatten().to_numpy()
                   .reshape(n, num_perm).astype(np.int64, copy=False))
            bk = _band_buckets(mat, bands, r)
            idx = pa.array(np.repeat(np.arange(n, dtype=np.int64), bands))
            cols = [batch.column(0).take(idx)]
            names = [id_col]
            if carry_sig:
                cols.append(batch.column(1).take(idx))
                names.append("sig")
            cols += [pa.array(np.tile(band_ids, n)), pa.array(bk.ravel())]
            names += ["band", "bucket"]
            yield pa.RecordBatch.from_arrays(cols, names=names)

    return to_buckets


def _minhash_lsh_pairs_local(
    df: DataFrame,
    text_col: str,
    id_col: str,
    num_perm: int,
    bands: int,
    r: int,
    shingle_k: int,
    seed: int,
    max_bucket_size: int | None,
    broadcast_sigs: bool = False,
) -> DataFrame:
    """Fully distributed LSH verification — no driver collect, no broadcast
    matrix, no document-count ceiling.

    Plan shape: signatures stay distributed; band buckets come from the same
    vectorized `_band_buckets` NumPy pass per Arrow batch; the candidate
    self-join shuffles ONLY (band, bucket, id) rows; verification joins the
    two signature arrays back onto the deduplicated candidate pairs (two
    shuffles of |pairs| rows) and counts agreeing slots with one vectorized
    NumPy pass per Arrow batch. Shuffle volume is
    O(bands * n + |pairs| * num_perm) — every stage is executor-local.

    ``max_bucket_size`` drops band buckets with more members than the cap
    before the self-join: a degenerate bucket of m identical docs costs
    O(m^2) pairs, and at web scale the boilerplate-text buckets are exactly
    the low-information ones (their members are already caught by exact
    dedup). None = keep all buckets (bit-parity with the broadcast path).

    ``broadcast_sigs`` (the caller gates it on a BOUNDED doc-count probe,
    never on this 100-TB default): hash-broadcast the persisted signature
    table into the two verification join-backs instead of shuffling
    |pairs| * num_perm * 8 bytes of signature rows — a broadcast hash join
    returns the same rows as the shuffle join, so scored pairs are
    bit-identical (regression-tested). The broadcast relation costs
    ~num_perm * 8 bytes per doc per side, which is why the gate is a doc
    count, not a flag default."""
    from pyspark import StorageLevel

    sigs = minhash_signatures(df, text_col, id_col, num_perm, shingle_k, seed)
    # two consumers (bucket explode + sig join-back): persist or the minhash
    # pass over the full corpus runs twice. The result is lazy, so this
    # function cannot unpersist — the cache is tagged on the result for
    # deterministic release via pipeline.cache.release_cached_deps
    sigs = sigs.persist(StorageLevel.MEMORY_AND_DISK)
    id_field = df.schema[id_col]
    bucket_schema = StructType([
        id_field,
        StructField("band", LongType()),
        StructField("bucket", LongType()),
    ])

    banded = sigs.mapInArrow(
        make_band_explode(id_col, num_perm, bands, r), bucket_schema)
    if max_bucket_size is not None:
        small = (banded.groupBy("band", "bucket")
                 .agg(F.count(F.lit(1)).alias("_bn"))
                 .where(F.col("_bn") <= max_bucket_size).drop("_bn"))
        banded = banded.join(small, ["band", "bucket"], "inner")
    a, b = banded.alias("a"), banded.alias("b")
    cand = (
        a.join(b, (F.col("a.band") == F.col("b.band"))
               & (F.col("a.bucket") == F.col("b.bucket"))
               & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")))
        .select(F.col(f"a.{id_col}").alias("id_a"),
                F.col(f"b.{id_col}").alias("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    sa = sigs.select(F.col(id_col).alias("id_a"), F.col("sig").alias("_sig_a"))
    sb = sigs.select(F.col(id_col).alias("id_b"), F.col("sig").alias("_sig_b"))
    if broadcast_sigs:
        sa, sb = F.broadcast(sa), F.broadcast(sb)
    paired = (cand.join(sa, "id_a").join(sb, "id_b")
              .select("id_a", "id_b", "_sig_a", "_sig_b"))
    # slot agreement vectorized per Arrow batch — NOT a zip_with/filter
    # higher-order expression, which evaluates interpreted per ELEMENT:
    # num_perm * |pairs| evals is exactly the documented ~50x trap the
    # broadcast engine's NumPy scorer avoids (BENCH/BASELINE.md). One
    # (rows, num_perm) == + mean per batch matches its arithmetic exactly.
    t = id_field.dataType.simpleString()
    out_schema = f"id_a {t}, id_b {t}, est_jaccard double"

    from .cache import tag_cached_deps

    return tag_cached_deps(
        paired.mapInArrow(
            make_slot_agreement_scorer(num_perm, ("id_a", "id_b")),
            out_schema),
        [sigs])


def make_slot_agreement_scorer(num_perm: int, out_names: tuple[str, str]):
    """mapInArrow kernel scoring candidate pairs whose batches carry
    (id_x, id_y, sig_x, sig_y): est_jaccard = fraction of agreeing
    signature slots, one vectorized (rows, num_perm) ``==`` + mean per
    Arrow batch. Shared by the batch local engine and the incremental
    index probe so their est values are bit-identical by construction —
    NOT a zip_with/filter higher-order expression, which evaluates
    interpreted per ELEMENT (num_perm * |pairs| evals — the documented
    ~50x trap)."""

    def score_pairs(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            n = batch.num_rows
            if not n:
                continue
            A = (batch.column(2).flatten().to_numpy()
                 .reshape(n, num_perm))
            B = (batch.column(3).flatten().to_numpy()
                 .reshape(n, num_perm))
            est = (A == B).sum(axis=1) / float(num_perm)
            yield pa.RecordBatch.from_arrays(
                [batch.column(0), batch.column(1), pa.array(est)],
                names=[out_names[0], out_names[1], "est_jaccard"])

    return score_pairs


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 128,
    bands: int = 32,
    shingle_k: int = 3,
    seed: int = 1,
    verify: str = "auto",
    max_broadcast_rows: int = 2_000_000,
    max_bucket_size: int | None = None,
    auto_local_rows: int = 20_000,
    broadcast_docs: int | None = 100_000,
) -> DataFrame:
    """Candidate near-duplicate pairs via banded LSH over MinHash signatures,
    with the estimated Jaccard (fraction of agreeing signature slots).

    rows-per-band r = num_perm/bands; candidate prob ~ 1-(1-J^r)^bands.

    ``verify`` picks the verification engine (identical results either way —
    same signatures, same buckets, same agree-count math):

    - ``"broadcast"``: signatures + band buckets are computed in one
      vectorized NumPy pass; the candidate self-join shuffles ONLY
      (band, bucket, idx) ints; candidate pairs are scored against a
      broadcast signature matrix with one NumPy pass per Arrow batch.
      Small-corpus engine: the broadcast costs num_perm*8 bytes per doc
      (1 GB per ~1M docs) — refuses inputs above ``max_broadcast_rows``,
      and its driver-side banding frame makes it SLOWER than the local
      engine well before that (measured 13.4 s vs 5.1 s at 50k docs).
    - ``"local"``: fully distributed — signature arrays are joined back
      onto the deduplicated candidate pairs and slot agreement is counted
      with one vectorized NumPy pass per Arrow batch. No driver collect,
      no broadcast, no ceiling. This is the 100-TB path, and it is at
      parity with broadcast from ~5k docs already.
    - ``"auto"`` (default): broadcast under ``auto_local_rows`` (the
      measured performance crossover), local above it. The probe is a
      bounded ``limit(n+1).count()`` — it early-stops after n+1 rows
      instead of paying a full count of a possibly-100-TB corpus.

    ``broadcast_docs``: corpora at or under this many documents run the
    LOCAL engine's signature join-back as a broadcast hash join (the
    persisted signature table is ~num_perm*8 bytes/doc, so the default
    gate caps each broadcast side at ~100 MB) instead of shuffling
    |pairs| signature rows — measured ~2x on the 50k-doc verify chain,
    with scored pairs bit-identical (a broadcast join returns the same
    rows). The probe is the same bounded ``limit(n+1).count()`` pattern;
    above the gate (or with ``broadcast_docs=None``) the all-shuffle
    join-back runs unchanged, so the 100-TB plan shape is untouched.

    NULL-id rows never enter the pair graph (a pair with a NULL id could
    not be clustered or canonicalized downstream) — filtered here so BOTH
    engines share the law explicitly; the broadcast engine additionally
    relied on it (r4 fix: a NULL id made toPandas coerce the id column to
    float64 — the CLAUDE.md pandas-NULL trap — and the float ids then
    mismatched the declared long Arrow output schema)."""
    if num_perm % bands:
        raise ValueError("bands must divide num_perm")
    r = num_perm // bands
    if verify not in ("auto", "broadcast", "local"):
        raise ValueError(f"unknown verify mode {verify!r}")
    df = df.where(F.col(id_col).isNotNull())

    def _bounded_sig_broadcast() -> bool:
        # bounded probe, never a full count (the corpus may be 100 TB)
        return (broadcast_docs is not None
                and df.limit(broadcast_docs + 1).count() <= broadcast_docs)

    if verify == "local":
        return _minhash_lsh_pairs_local(
            df, text_col, id_col, num_perm, bands, r, shingle_k, seed,
            max_bucket_size, broadcast_sigs=_bounded_sig_broadcast())
    if verify == "auto":
        thr = min(auto_local_rows, max_broadcast_rows)
        if df.limit(thr + 1).count() > thr:
            return _minhash_lsh_pairs_local(
                df, text_col, id_col, num_perm, bands, r, shingle_k, seed,
                max_bucket_size, broadcast_sigs=_bounded_sig_broadcast())
    elif df.limit(max_broadcast_rows + 1).count() > max_broadcast_rows:
        raise ValueError(
            f"corpus exceeds max_broadcast_rows={max_broadcast_rows}; "
            "use verify='local' (fully distributed) at this scale")
    from pyspark import StorageLevel

    from .cache import tag_cached_deps

    # Candidate generation is DISTRIBUTED (the same banded mapInArrow +
    # JVM bucket self-join the local engine uses); only the verification
    # matrix is collected and broadcast. The previous formulation built a
    # bands*n-row banding frame ON THE DRIVER and self-joined that
    # LocalRelation — the join alone cost more than the whole distributed
    # pipeline (measured 8.2 s of a 13 s run at 50k docs).
    sigs = minhash_signatures(df, text_col, id_col, num_perm, shingle_k,
                              seed).persist(StorageLevel.MEMORY_AND_DISK)
    pdf = sigs.toPandas()
    if not len(pdf):  # empty corpus: no pairs (np.stack rejects zero rows)
        sigs.unpersist()
        t = df.schema[id_col].dataType.simpleString()
        return df.sparkSession.createDataFrame(
            [], f"id_a {t}, id_b {t}, est_jaccard double")
    # ids may be any type (input_hint doc_id is string): the broadcast
    # carries the id-sorted signature matrix; scoring maps ids to rows
    id_values = pdf[id_col].to_numpy()
    order = np.argsort(id_values, kind="stable")
    id_sorted = id_values[order]
    sig_matrix = np.stack(pdf["sig"].to_numpy()[order]).astype(np.int64)

    spark = df.sparkSession
    bc = spark.sparkContext.broadcast((id_sorted.tolist(), sig_matrix))

    id_field = df.schema[id_col]
    bucket_schema = StructType([
        id_field,
        StructField("band", LongType()),
        StructField("bucket", LongType()),
    ])
    banded = sigs.mapInArrow(
        make_band_explode(id_col, num_perm, bands, r), bucket_schema)
    if max_bucket_size is not None:
        # same degenerate-bucket cap as the local path, so verify="auto"
        # yields identical pairs at either scale
        small = (banded.groupBy("band", "bucket")
                 .agg(F.count(F.lit(1)).alias("_bn"))
                 .where(F.col("_bn") <= max_bucket_size).drop("_bn"))
        banded = banded.join(small, ["band", "bucket"], "inner")
    a, b = banded.alias("a"), banded.alias("b")
    cand = (
        a.join(b, (F.col("a.band") == F.col("b.band"))
               & (F.col("a.bucket") == F.col("b.bucket"))
               & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")))
        .select(F.col(f"a.{id_col}").alias("id_a"),
                F.col(f"b.{id_col}").alias("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    out_schema = (f"id_a {id_field.dataType.simpleString()}, "
                  f"id_b {id_field.dataType.simpleString()}, est_jaccard double")

    def score(batches):
        idlist, mat = bc.value
        pos = {v: i for i, v in enumerate(idlist)}
        for batch in batches:
            ia = np.array([pos[x] for x in batch.column(0).to_pylist()],
                          dtype=np.int64)
            ib = np.array([pos[x] for x in batch.column(1).to_pylist()],
                          dtype=np.int64)
            agree = (mat[ia] == mat[ib]).mean(axis=1) if len(ia) else \
                np.empty(0, dtype=np.float64)
            yield pa.RecordBatch.from_arrays(
                [batch.column(0), batch.column(1), pa.array(agree)],
                names=["id_a", "id_b", "est_jaccard"])

    return tag_cached_deps(cand.mapInArrow(score, out_schema), [sigs])


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def simhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    seed: int = 2,
) -> DataFrame:
    """(id, simhash: bigint) — 64-bit SimHash over word features.

    Signature law v2 (round 3): word hashing happens JVM-side
    (``xxhash64(word, seed)``, the shared ``_word_hash_rows`` front end
    with MinHash); Python does one bit-unpack + per-document vote
    reduction (``np.add.reduceat``) over the WHOLE Arrow batch — no
    per-document loop (v1 hashed Python string arrays per doc). A bit is
    set iff strictly more than half the word occurrences have it set
    (ties -> 0, as in v1); duplicate words vote once per occurrence."""
    id_field = df.schema[id_col]
    schema = StructType([id_field, StructField("simhash", LongType())])
    hashed = _word_hash_rows(df, text_col, id_col, seed)
    chunk_words = _SIMHASH_CHUNK_WORDS  # captured by value for tests

    def run(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        bit_idx = np.arange(64, dtype=np.uint64)
        # reused in-place (uint64: reduceat keeps the input dtype, and a
        # narrow type would wrap the vote count on long documents)
        bits = np.empty((chunk_words, 64), dtype=np.uint64)
        for batch in batches:
            n = batch.num_rows
            if not n:
                continue
            wh_arr = batch.column(1)
            lens = _list_lengths(wh_arr)
            flat = (wh_arr.flatten().to_numpy()
                    .astype(np.int64, copy=False).view(np.uint64))
            off = np.zeros(n + 1, dtype=np.int64)
            np.cumsum(lens, out=off[1:])
            votes = np.empty((n, 64), dtype=np.int64)
            for d0, d1 in iter_doc_chunks(off, chunk_words):
                seg = flat[off[d0]:off[d1]]
                m = len(seg)
                if m > bits.shape[0]:  # single doc longer than the chunk
                    bits = np.empty((m, 64), dtype=np.uint64)
                np.right_shift(seg[:, None], bit_idx[None, :], out=bits[:m])
                np.bitwise_and(bits[:m], np.uint64(1), out=bits[:m])
                local_off = off[d0:d1] - off[d0]
                votes[d0:d1] = np.add.reduceat(bits[:m], local_off, axis=0)
            set_bits = (2 * votes > lens[:, None]).astype(np.uint64)
            sig = (set_bits << bit_idx[None, :]).sum(
                axis=1, dtype=np.uint64).view(np.int64)
            yield pa.RecordBatch.from_arrays(
                [batch.column(0), pa.array(sig, type=pa.int64())],
                names=[id_col, "simhash"])

    return hashed.mapInArrow(run, schema)


def simhash_near_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    seed: int = 2,
    max_block_size: int | None = None,
) -> DataFrame:
    """Near-duplicate pairs at Hamming distance <= max_hamming.

    Pigeonhole: split the 64-bit signature into max_hamming+1 blocks; any
    pair within distance d agrees on >= 1 block -> join per block key, then
    verify exact Hamming distance natively (bit_count(xor)).
    ``max_block_size`` drops (block, key) groups with more members than
    the cap before the self-join — the same degenerate-bucket guard as
    ``minhash_lsh_pairs``/``lsh_cosine_topk`` (a boilerplate flood shares
    every block; its members are exact-dup fodder anyway)."""
    blocks = max_hamming + 1
    width = 64 // blocks
    sigs = simhash_signatures(df, text_col, id_col, seed).select(
        F.col(id_col).alias("id"), "simhash")
    pieces = sigs.select(
        "id", "simhash",
        F.explode(F.array(*[
            F.struct(
                F.lit(blk).alias("blk"),
                F.shiftrightunsigned(F.col("simhash"), blk * width)
                .bitwiseAND(F.lit((1 << width) - 1)).alias("key"),
            )
            for blk in range(blocks)
        ])).alias("p"),
    ).select("id", "simhash", "p.blk", "p.key")
    if max_block_size is not None:
        small = (pieces.groupBy("blk", "key")
                 .agg(F.count(F.lit(1)).alias("_bn"))
                 .where(F.col("_bn") <= max_block_size).drop("_bn"))
        pieces = pieces.join(small, ["blk", "key"], "inner")
    a = pieces.alias("a")
    b = pieces.alias("b")
    dist = F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash")))
    return (
        a.join(b, (F.col("a.blk") == F.col("b.blk")) & (F.col("a.key") == F.col("b.key"))
               & (F.col("a.id") < F.col("b.id")))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"),
                dist.alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)
        .dropDuplicates(["id_a", "id_b"])
    )


# ---------------------------------------------------------------------------
# Connected components + semantic (embedding-cosine) dedup
# ---------------------------------------------------------------------------


def _driver_min_label(pdf):
    """Min-label connected components of a collected edge list (pandas
    columns ``a``, ``b``): returns (nodes, comps) arrays with comp = min
    node id reachable, or None when any node id is NULL (the caller
    falls back to the distributed rounds rather than guessing at pandas'
    NULL coercions).

    Vectorized NumPy contraction: nodes are ranked so index order = id
    order (argsort; Python string order == Spark's UTF8String binary
    order — UTF-8 encoding preserves codepoint order), labels start as
    self-indices, and each round takes the min label across every edge
    in both directions (``np.minimum.at``, unbuffered so duplicate
    indices accumulate) followed by pointer jumping
    (``labels = labels[labels]``) to a round-local fixpoint — O(E) work
    per round, rounds ~ log(diameter). At the fixpoint every edge has
    equal labels and every label is a self-labeled node, which forces
    label = component min (any smaller member would have kept a smaller
    self-label)."""
    import pandas as pd

    both = pd.concat([pdf["a"], pdf["b"]], ignore_index=True)
    if both.isna().any():
        return None
    codes, uniques = pd.factorize(both.to_numpy())
    m = len(pdf)
    n = len(uniques)
    if n == 0:
        return uniques, uniques
    order = np.argsort(uniques, kind="stable")
    rank = np.empty(n, dtype=np.int64)
    rank[order] = np.arange(n, dtype=np.int64)
    ids_sorted = uniques[order]
    ea = rank[codes[:m]]
    eb = rank[codes[m:]]
    labels = np.arange(n, dtype=np.int64)
    while True:
        new = labels.copy()
        np.minimum.at(new, ea, labels[eb])
        np.minimum.at(new, eb, labels[ea])
        while True:
            jumped = new[new]
            if np.array_equal(jumped, new):
                break
            new = jumped
        if np.array_equal(new, labels):
            break
        labels = new
    return ids_sorted, ids_sorted[labels]


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 25,
    checkpoint_dir: str | None = None,
    driver_collect_edges: int | None = 2_000_000,
) -> DataFrame:
    """Connected components of an undirected edge list -> (node, component),
    component = min node id reachable.

    Min-label propagation: each round every node takes the min of its own
    label and its neighbors' labels. Converges in O(graph diameter) rounds —
    near-dup graphs are unions of small dense clusters, so 2-4 rounds in
    practice. Each round is two native shuffles (join + min-aggregate) over
    (node, label) int rows only; ``localCheckpoint`` truncates the lineage so
    the plan stays flat at any round count (the iterative-algorithm pattern
    Catalyst cannot unroll). The convergence check rides the SAME aggregate
    that builds the new labels: the node's own row is tagged, so the
    round's groupBy emits (new comp, old comp) together and the changed
    count is a trivial scan of the checkpointed rows — no second join per
    round (round-2 verdict #7).

    Fault tolerance: by default the per-round truncation is
    ``localCheckpoint`` — blocks live on EXECUTORS, so on a real cluster
    an executor loss mid-iteration kills the job (lineage is gone; Spark
    cannot recompute). Pass ``checkpoint_dir`` (any Hadoop-FS path:
    HDFS/S3A/local) to switch to reliable dir-based ``checkpoint()`` —
    each round's (node, label) rows are written to the FS, so lost
    executors recompute from the last round instead of failing. Trade-off:
    one FS write + read per round (labels are two ints/row, so the volume
    is tiny next to the round's own shuffles) vs surviving a 100-TB dedup
    run's worth of executor churn. Sets the session's checkpoint dir as a
    side effect (Spark has one global checkpoint location per context).

    ``driver_collect_edges``: near-dup pair graphs are tiny next to their
    corpora (KB-scale per TB of text), so edge lists at or under this
    many rows — a bounded ``limit(n+1).count()`` probe on the persisted
    edge projection — are collected ONCE and labeled on the driver with
    a vectorized min-label contraction (NumPy pointer jumping), replacing
    the per-round join + checkpoint + convergence-count jobs with one
    collect and one small local result relation. Labels are identical:
    min reachable node id, with string nodes compared in the same
    (UTF-8-order-preserving) order Spark uses. The driver path is
    skipped when ``checkpoint_dir`` is set (the caller asked for
    fault-tolerant distributed rounds) or when a node id is NULL; above
    the gate the distributed plan runs unchanged."""
    if checkpoint_dir is not None:
        edges.sparkSession.sparkContext.setCheckpointDir(checkpoint_dir)

    def _save(df: DataFrame) -> DataFrame:
        return (df.checkpoint() if checkpoint_dir is not None
                else df.localCheckpoint())

    spark = edges.sparkSession
    n_parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    sym = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    pinned_e = None
    if driver_collect_edges is not None and checkpoint_dir is None:
        from pyspark import StorageLevel

        e = sym.persist(StorageLevel.MEMORY_AND_DISK)
        if e.limit(driver_collect_edges + 1).count() <= driver_collect_edges:
            pdf = e.toPandas()
            labeled = _driver_min_label(pdf)
            if labeled is not None:
                e.unpersist()
                nodes, comps = labeled
                node_t = edges.schema[src].dataType
                out_schema = StructType([StructField("node", node_t),
                                         StructField("comp", node_t)])
                import pandas as pd

                return spark.createDataFrame(
                    pd.DataFrame({"node": nodes, "comp": comps}), out_schema)
            # NULL node ids: fall through to the distributed path, which
            # reuses the probe's cache instead of recomputing the edges
            sym = e
            pinned_e = e
        else:
            sym = e  # reuse the probe's cache for the sym union below
            pinned_e = e
    # hash-partition the (deduplicated) edge list by join key ONCE before
    # the checkpoint: every round's join then reuses this partitioning
    # instead of re-shuffling the edges per round (the checkpointed frame
    # keeps its outputPartitioning)
    # repartition FIRST: identical (a, b) rows land in one a-partition, so
    # the dedup reuses that clustering (ClusteredDistribution(a, b) is
    # satisfied by HashPartitioning(a)) — one exchange, not two
    sym = (sym.union(sym.select(F.col("b").alias("a"), F.col("a").alias("b")))
           .repartition(n_parts, "a").dropDuplicates())
    sym = _save(sym)
    if pinned_e is not None:  # _save is eager; the probe cache is done
        pinned_e.unpersist()
    # seed labels one round ahead: min(node, min neighbor) is exactly the
    # state after round 1 of plain min-label propagation, computed in the
    # same aggregate that would otherwise just build the distinct node
    # list — one fewer join round for the same fixpoint
    labels = (sym.groupBy(F.col("a").alias("node"))
              .agg(F.min("b").alias("_mn"))
              .select("node", F.least(F.col("node"), F.col("_mn"))
                      .alias("comp")))
    changed = -1
    for _ in range(max_iter):
        msgs = sym.join(labels, sym["a"] == labels["node"]).select(
            F.col("b").alias("node"), F.col("comp"), F.lit(False).alias("_own"))
        own = labels.select("node", "comp", F.lit(True).alias("_own"))
        new = _save(own.unionByName(msgs)
                    .groupBy("node")
                    .agg(F.min("comp").alias("comp"),
                         F.max(F.when(F.col("_own"), F.col("comp")))
                         .alias("_old")))
        changed = new.filter(F.col("comp") != F.col("_old")).count()
        labels = new.drop("_old")
        if changed == 0:
            break
    if changed != 0:
        raise RuntimeError(
            f"connected_components did not converge in max_iter={max_iter} "
            f"rounds ({changed} labels still changing); the graph diameter "
            f"exceeds max_iter — raise it (labels would be silently wrong)")
    return labels


def cosine_near_pairs(
    df: DataFrame,
    threshold: float,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    method: str = "exact",
    k: int = 32,
    **lsh_kw,
) -> DataFrame:
    """Undirected near-duplicate pairs (src < dst) with cosine >= threshold.

    method="exact": all-pairs self-join — the oracle baseline, O(n^2), test
    scale only. method="lsh": random-hyperplane LSH candidates scored
    against a broadcast normalized matrix (see ``lsh_cosine_topk``); ``k``
    caps per-node degree, which is what a dedup graph wants anyway."""
    # NaN guard: Spark orders NaN above every number, so `NaN >= threshold`
    # is TRUE — one NaN-poisoned embedding would link the whole corpus into
    # a single cluster without it
    if method == "exact":
        from .similarity import cosine_expr

        v = df.select(F.col(id_col).alias("id"),
                      F.col(vec_col).cast("array<double>").alias("vec"))
        a, b = v.alias("a"), v.alias("b")
        return (a.join(b, F.col("a.id") < F.col("b.id"))
                .select(F.col("a.id").alias("src"), F.col("b.id").alias("dst"),
                        cosine_expr(F.col("a.vec"), F.col("b.vec")).alias("cos"))
                .filter(~F.isnan(F.col("cos")) & (F.col("cos") >= threshold)))
    if method == "lsh":
        from .similarity import lsh_cosine_topk

        topk = lsh_cosine_topk(df, vec_col=vec_col, id_col=id_col, k=k, **lsh_kw)
        from .cache import cached_deps, tag_cached_deps

        # canonicalize BEFORE dedup: a pair truncated out of the lower id's
        # top-k may still appear as (hi, lo) in the higher id's list
        return tag_cached_deps(
            topk.filter(~F.isnan(F.col("cos")) & (F.col("cos") >= threshold))
            .select(F.least("id", "neighbor").alias("src"),
                    F.greatest("id", "neighbor").alias("dst"), "cos")
            .dropDuplicates(["src", "dst"]), cached_deps(topk))
    raise ValueError(f"unknown method {method!r}")


def _keep_canonical(df: DataFrame, id_col: str, comp: DataFrame,
                    keep_by: str | None = None) -> DataFrame:
    """(id_col, component, keep) from a node->component labeling: cluster
    members get the cluster's min id as component; the canonical survivor
    is the min-id member, or — with ``keep_by`` (a column of ``df``, e.g.
    a quality score) — the member with the HIGHEST ``keep_by`` value
    (ties and all-NULL scores fall back to min id, so the choice is
    always deterministic). Singletons keep themselves. Rows with NULL ids
    cannot be canonicalized (they can never appear in the pair graph) —
    they pass through with keep=TRUE and component = NULL, never a NULL
    boolean (NULL booleans sort non-deterministically in the oracle
    comparator and silently vanish under ``.where("keep")``).

    Scale shape of the ``keep_by`` path: two extra map-side-combining
    aggregates over (component, score[, id]) rows — max score per
    component, then min id among the maximal members — never text, never
    a window (a billion-member boilerplate cluster combines in partials
    instead of pinning one task)."""
    cols = [F.col(id_col)] + ([F.col(keep_by).alias("_kb")] if keep_by else [])
    ids = df.select(*cols)
    joined = ids.join(comp, ids[id_col] == comp["node"], "left")
    component = F.coalesce(F.col("comp"), F.col(id_col))
    if keep_by is None:
        return joined.select(
            F.col(id_col),
            component.alias("component"),
            F.coalesce(component == F.col(id_col), F.lit(True)).alias("keep"),
        )
    labeled = joined.select(F.col(id_col), component.alias("component"),
                            F.col("_kb"))
    best = labeled.groupBy("component").agg(F.max("_kb").alias("_maxkb"))
    winners = (labeled.join(best, "component")
               .where(F.col("_kb").eqNullSafe(F.col("_maxkb")))
               .groupBy("component").agg(F.min(id_col).alias("_win")))
    return (labeled.join(winners, "component", "left")
            .select(F.col(id_col), "component",
                    F.coalesce(F.col(id_col) == F.col("_win"),
                               F.lit(True)).alias("keep")))


def dedup_near_text(
    df: DataFrame,
    threshold: float = 0.8,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 128,
    bands: int = 32,
    shingle_k: int = 3,
    seed: int = 1,
    verify: str = "auto",
    max_bucket_size: int | None = None,
    checkpoint_dir: str | None = None,
    keep_by: str | None = None,
) -> DataFrame:
    """End-to-end text near-duplicate dedup — the 100-TB training-data
    pipeline composition: MinHash-LSH candidate pairs (``verify="local"``
    is fully distributed: no driver collect, no broadcast matrix, no
    corpus-size ceiling), thresholded on estimated Jaccard, clustered with
    min-label connected components, min id kept as the canonical survivor.

    Returns (id_col, component, keep): component = cluster id (min member
    id), keep = this row is the cluster's canonical representative.
    Singletons keep themselves. Exact duplicates (Jaccard 1.0) always land
    in one cluster: every signature slot agrees, so every band agrees, so
    they are LSH candidates with est_jaccard 1.0 >= any threshold <= 1.

    Every stage shuffles int/id rows only (never text): bands*n banded
    rows, |pairs| verification rows, O(diameter) rounds of (node, label)
    rows. Degenerate boilerplate buckets can be capped with
    ``max_bucket_size`` — their members are caught by exact dedup anyway."""
    from .cache import cached_deps, tag_cached_deps

    raw = minhash_lsh_pairs(
        df, text_col=text_col, id_col=id_col, num_perm=num_perm,
        bands=bands, shingle_k=shingle_k, seed=seed, verify=verify,
        max_bucket_size=max_bucket_size,
    )
    pairs = raw.filter(F.col("est_jaccard") >= threshold)
    comp = connected_components(pairs, "id_a", "id_b",
                                checkpoint_dir=checkpoint_dir)
    return tag_cached_deps(_keep_canonical(df, id_col, comp, keep_by),
                           cached_deps(raw))


def dedup_semantic(
    df: DataFrame,
    threshold: float = 0.9,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    method: str = "exact",
    checkpoint_dir: str | None = None,
    keep_by: str | None = None,
    **kw,
) -> DataFrame:
    """Embedding-cosine near-duplicate dedup: rows whose vectors are
    transitively connected by cosine >= threshold form one duplicate
    cluster; the minimum id is the kept canonical representative
    (``keep_by`` switches the survivor to the highest-scoring member,
    ties -> min id).

    Returns (id_col, component, keep): component = cluster id (min member),
    keep = this row is the cluster's canonical survivor. Singletons keep
    themselves."""
    from .cache import cached_deps, tag_cached_deps

    pairs = cosine_near_pairs(df, threshold, vec_col, id_col, method, **kw)
    comp = connected_components(pairs, "src", "dst",
                                checkpoint_dir=checkpoint_dir)
    return tag_cached_deps(_keep_canonical(df, id_col, comp, keep_by),
                           cached_deps(pairs))


def substring_overlap_pairs(
    df: DataFrame,
    min_len: int = 64,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_fp_docs: int | None = None,
) -> DataFrame:
    """Candidate document pairs sharing a long VERBATIM character run —
    the span-level dedup signal of Lee et al. 2021 ("Deduplicating
    Training Data Makes Language Models Better", ExactSubstr), built on
    the package's winnowing fingerprints rather than a global suffix
    array: returns (id_a, id_b, n_shared_fps) with id_a < id_b.

    Guarantee (Schleimer et al. 2003, thm. in §2): with k = min_len // 2
    and window = min_len - k + 1, winnowing selects at least one common
    fingerprint from ANY shared run of >= min_len characters (lowercased;
    byte == char for ASCII) — so every such pair IS reported. Conversely
    a reported pair shares at least one selected k-gram hash: k is
    min_len/2 so false signals need a verbatim k-char match (or a 61-bit
    rolling-hash collision) — ``n_shared_fps`` (distinct shared selected
    fingerprints) is the strength to threshold on.

    Scale shape — the LSH-bucket family: fingerprint construction is the
    zero-per-doc-Python winnowing pass; candidates come from a self-join
    on fp confined to fingerprint buckets, shuffling (id, fp) rows only,
    never text; ``max_fp_docs`` caps degenerate fingerprints (site
    boilerplate — their members are caught by paragraph/exact dedup) the
    way minhash buckets cap. The pair aggregate is a map-side-combining
    count."""
    if min_len < 8:
        raise ValueError(f"min_len must be >= 8, got {min_len}")
    from .text import winnowing_fingerprints

    k = min_len // 2
    window = min_len - k + 1
    fps = (winnowing_fingerprints(df, text_col=text_col, id_col=id_col,
                                  k=k, window=window)
           .select(F.col(id_col).alias("_id"), "fp").dropDuplicates())
    if max_fp_docs is not None:
        ok = (fps.groupBy("fp").agg(F.count(F.lit(1)).alias("_n"))
              .where(F.col("_n") <= max_fp_docs).drop("_n"))
        fps = fps.join(ok, "fp")
    a, b = fps.alias("a"), fps.alias("b")
    return (a.join(b, (F.col("a.fp") == F.col("b.fp"))
                   & (F.col("a._id") < F.col("b._id")))
            .groupBy(F.col("a._id").alias("id_a"),
                     F.col("b._id").alias("id_b"))
            .agg(F.count(F.lit(1)).alias("n_shared_fps")))


def dedup_substring(
    df: DataFrame,
    min_len: int = 64,
    min_shared_fps: int = 1,
    text_col: str = "text",
    id_col: str = "doc_id",
    keep_by: str | None = None,
    max_fp_docs: int | None = None,
    checkpoint_dir: str | None = None,
    rewrite: bool = False,
) -> DataFrame:
    """Document-level dedup on the span signal: cluster docs linked by
    ``substring_overlap_pairs`` with >= ``min_shared_fps`` shared
    fingerprints (connected components, min-label), keep one canonical
    doc per cluster (min id, or best ``keep_by``). Same (id, component,
    keep) row contract as ``dedup_near_text`` — NULL ids pass through.

    This is the doc-level policy over span evidence (drop near-verbatim
    re-posts); ``rewrite=True`` switches to SPAN-LEVEL removal instead —
    Lee et al. 2021's ExactSubstr behavior: every verified maximal shared
    byte run >= ``min_len`` is CUT from the pair's later document and both
    documents are kept (see ``rewrite_shared_spans``; ``min_shared_fps`` /
    ``keep_by`` / ``checkpoint_dir`` do not apply in that mode)."""
    if rewrite:
        return rewrite_shared_spans(df, min_len=min_len, text_col=text_col,
                                    id_col=id_col, max_fp_docs=max_fp_docs)
    pairs = substring_overlap_pairs(df, min_len=min_len, text_col=text_col,
                                    id_col=id_col, max_fp_docs=max_fp_docs)
    strong = pairs.where(F.col("n_shared_fps") >= min_shared_fps)
    comp = connected_components(strong, "id_a", "id_b",
                                checkpoint_dir=checkpoint_dir)
    return _keep_canonical(df, id_col, comp, keep_by)


def substring_shared_spans(
    df: DataFrame,
    min_len: int = 64,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_fp_docs: int | None = None,
) -> DataFrame:
    """VERIFIED maximal shared byte spans per document pair — the span
    recovery stage of Lee et al. 2021's ExactSubstr
    (``/root/reference`` has no counterpart; published-algorithm law):
    returns (id_a, id_b, a_start, b_start, length) with id_a < id_b, one
    row per maximal byte-equal run of length >= ``min_len`` between the
    two documents' RAW texts (case-sensitive, byte offsets, 0-based).

    Law (each stage deterministic and DuckDB-re-derivable):

    1. winnowing fingerprints at k = min_len//2, window = min_len-k+1,
       ``lowercase=False`` (positions must map onto the original bytes);
       optional ``max_fp_docs`` cap on a fingerprint's distinct-doc count
       (degenerate boilerplate, as in ``substring_overlap_pairs``).
    2. matched fingerprints joined per pair; a match at (pos_a, pos_b)
       lies on diagonal d = pos_b - pos_a. Matches on one diagonal whose
       gaps are <= G chain together (G below).
    3. each chain examines one REGION of the pair:
       [reg_lo, reg_hi) = [max(a_lo - E, 0, -d),
       min(a_hi + k + E, len_a, len_b - d)) in a-coordinates, with
       E = 2*(window + k) and G = k + 2E. Winnowing's guarantee (any
       shared run >= window + k - 1 = min_len contains a shared selected
       fingerprint, and in-run selected fingerprints sit <= window apart)
       makes every TRUE maximal run >= min_len lie wholly inside exactly
       one region: a run poking more than E beyond its chain's ends, or
       bridging two chains > G apart, would contain shared fingerprints
       there — contradiction. Regions of distinct chains are disjoint by
       construction (gap > G = k + 2E), so no span is found twice.
    4. both regions' bytes are compared position-by-position (exact, no
       hash trust); maximal equality runs >= min_len are the spans.

    Scale shape: stages 1-3 shuffle only (id, pos, fp) / span-geometry
    rows; the TEXT is scanned once and joined once — both sides' regions
    extract from a single join against the (id, binary) projection, and
    only the extracted regions (bounded by span extent + 2E bytes) flow
    into the vectorized comparison kernel."""
    if min_len < 8:
        raise ValueError(f"min_len must be >= 8, got {min_len}")
    from pyspark.sql import Window

    from .text import winnowing_fingerprints

    k = min_len // 2
    window = min_len - k + 1
    E = 2 * (window + k)
    G = k + 2 * E

    id_field = df.schema[id_col]
    base = df.where(F.col(id_col).isNotNull() & F.col(text_col).isNotNull())
    fps = (winnowing_fingerprints(base, text_col=text_col, id_col=id_col,
                                  k=k, window=window, lowercase=False)
           .select(F.col(id_col).alias("_id"), "pos", "fp").dropDuplicates())
    if max_fp_docs is not None:
        ok = (fps.select("_id", "fp").dropDuplicates()
              .groupBy("fp").agg(F.count(F.lit(1)).alias("_n"))
              .where(F.col("_n") <= max_fp_docs).drop("_n"))
        fps = fps.join(ok, "fp")
    a, b = fps.alias("a"), fps.alias("b")
    m = (a.join(b, (F.col("a.fp") == F.col("b.fp"))
                & (F.col("a._id") < F.col("b._id")))
         .select(F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b"),
                 F.col("a.pos").alias("pa"),
                 (F.col("b.pos") - F.col("a.pos")).alias("diag"))
         .dropDuplicates(["id_a", "id_b", "pa", "diag"]))
    # diagonal chains: window over narrow match rows (NOT over documents)
    wlag = Window.partitionBy("id_a", "id_b", "diag").orderBy("pa")
    gap = F.col("pa") - F.lag("pa").over(wlag)
    chained = m.withColumn(
        "_chain",
        F.sum(F.when(gap.isNull() | (gap <= G), F.lit(0)).otherwise(F.lit(1)))
        .over(wlag.rowsBetween(Window.unboundedPreceding, 0)))
    spans0 = (chained.groupBy("id_a", "id_b", "diag", "_chain")
              .agg(F.min("pa").alias("a_lo"),
                   (F.max("pa") + F.lit(k)).alias("a_hi")))
    lens = base.select(F.col(id_col).alias("_lid"),
                       F.octet_length(text_col).alias("_bl"))
    sp = (spans0
          .join(lens.select(F.col("_lid").alias("id_a"),
                            F.col("_bl").alias("_bla")), "id_a")
          .join(lens.select(F.col("_lid").alias("id_b"),
                            F.col("_bl").alias("_blb")), "id_b")
          .withColumn("reg_lo",
                      F.greatest(F.col("a_lo") - F.lit(E), F.lit(0),
                                 -F.col("diag")))
          .withColumn("reg_hi",
                      F.least(F.col("a_hi") + F.lit(E), F.col("_bla"),
                              F.col("_blb") - F.col("diag")))
          .where(F.col("reg_hi") - F.col("reg_lo") >= min_len)
          # distinct chains clamped to the same doc edge collapse here
          .select("id_a", "id_b", "diag", "reg_lo", "reg_hi")
          .dropDuplicates(["id_a", "id_b", "diag", "reg_lo", "reg_hi"]))
    # ONE text scan, ONE text shuffle: both sides' regions come from a
    # single join against the (id, binary) projection
    span_cols = ["id_a", "id_b", "diag", "reg_lo", "reg_hi"]
    sides = (sp.select(F.col("id_a").alias("_tid"), *span_cols,
                       F.col("reg_lo").alias("_off"),
                       F.lit(0).alias("_side"))
             .unionByName(
                 sp.select(F.col("id_b").alias("_tid"), *span_cols,
                           (F.col("reg_lo") + F.col("diag")).alias("_off"),
                           F.lit(1).alias("_side"))))
    txt = base.select(F.col(id_col).alias("_tid"),
                      F.col(text_col).cast("binary").alias("_bin"))
    ext = (sides.join(txt, "_tid")
           .select(*span_cols, "_side",
                   F.expr("substring(_bin, _off + 1, reg_hi - reg_lo)")
                   .alias("_seg")))
    paired = (ext.groupBy(*span_cols)
              .agg(F.first(F.when(F.col("_side") == 0, F.col("_seg")),
                           ignorenulls=True).alias("_sa"),
                   F.first(F.when(F.col("_side") == 1, F.col("_seg")),
                           ignorenulls=True).alias("_sb")))
    out_schema = StructType([
        StructField("id_a", id_field.dataType),
        StructField("id_b", id_field.dataType),
        StructField("a_start", LongType()),
        StructField("b_start", LongType()),
        StructField("length", LongType())])
    mlen = min_len

    def verify(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            n = batch.num_rows
            if not n:
                continue
            diag = batch.column(2).to_numpy()
            reg_lo = batch.column(3).to_numpy()
            sa, sb = batch.column(5), batch.column(6)
            out_idx: list[int] = []
            out_astart: list[int] = []
            out_len: list[int] = []
            for i in range(n):
                ra, rb = sa[i].as_py(), sb[i].as_py()
                if ra is None or rb is None:
                    continue
                ba = np.frombuffer(ra, dtype=np.uint8)
                bb = np.frombuffer(rb, dtype=np.uint8)
                L = min(len(ba), len(bb))
                if L < mlen:
                    continue
                eq = np.concatenate(
                    ([False], ba[:L] == bb[:L], [False])).astype(np.int8)
                d = np.diff(eq)
                for s, e in zip(np.flatnonzero(d == 1),
                                np.flatnonzero(d == -1)):
                    if e - s >= mlen:
                        out_idx.append(i)
                        out_astart.append(int(reg_lo[i]) + int(s))
                        out_len.append(int(e - s))
            if not out_idx:
                continue
            idx = pa.array(out_idx, type=pa.int32())
            astart = np.asarray(out_astart, dtype=np.int64)
            yield pa.RecordBatch.from_arrays(
                [batch.column(0).take(idx), batch.column(1).take(idx),
                 pa.array(astart),
                 pa.array(astart + diag[np.asarray(out_idx, dtype=np.int64)]),
                 pa.array(np.asarray(out_len, dtype=np.int64))],
                names=["id_a", "id_b", "a_start", "b_start", "length"])

    return paired.mapInArrow(verify, out_schema)


def rewrite_shared_spans(
    df: DataFrame,
    min_len: int = 64,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_fp_docs: int | None = None,
) -> DataFrame:
    """ExactSubstr span REMOVAL (Lee et al. 2021, "Deduplicating Training
    Data Makes Language Models Better"): every verified maximal shared
    byte run >= ``min_len`` (``substring_shared_spans``) is CUT from the
    pair's LATER document (keep-first law — the smaller id keeps its
    copy, like ``dedup_paragraphs`` at paragraph granularity but at
    arbitrary byte offsets); both documents survive.

    Returns ``df`` with ``text_col`` rewritten plus ``n_cut_spans`` /
    ``n_cut_bytes`` (counted AFTER overlapping cuts merge: cuts of one
    doc against several earlier docs union; intervals merge when
    start <= previous end). Cut boundaries snap inward to UTF-8 char
    boundaries so a byte-equal run ending mid-codepoint can never emit
    invalid text (a no-op for ASCII). NULL-id / NULL-text / untouched
    rows pass through byte-identical with zero counters.

    Scale shape: span discovery as in ``substring_shared_spans``; the
    cut list aggregates to ONE row per affected doc and joins back (a
    small fraction — AQE broadcasts it, the ``dedup_paragraphs``
    pattern); only affected documents flow through the rewrite kernel,
    untouched rows never leave the JVM."""
    spans = substring_shared_spans(df, min_len=min_len, text_col=text_col,
                                   id_col=id_col, max_fp_docs=max_fp_docs)
    cuts = (spans.groupBy(F.col("id_b").alias(id_col))
            .agg(F.sort_array(F.collect_list(
                F.struct(F.col("b_start").alias("s"),
                         F.col("length").alias("l")))).alias("_cuts")))
    untouched = (df.join(cuts.select(id_col), id_col, "left_anti")
                 .withColumn("n_cut_spans", F.lit(0).cast("long"))
                 .withColumn("n_cut_bytes", F.lit(0).cast("long")))
    joined = df.join(cuts, id_col).select(*df.columns, "_cuts")
    ti = df.columns.index(text_col)
    out_schema = StructType(list(df.schema.fields)
                            + [StructField("n_cut_spans", LongType()),
                               StructField("n_cut_bytes", LongType())])

    def cut_rows(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            n = batch.num_rows
            if not n:
                continue
            tcol = batch.column(ti)
            ccol = batch.column(batch.num_columns - 1)
            texts: list[str | None] = []
            n_spans: list[int] = []
            n_bytes: list[int] = []
            for i in range(n):
                raw = tcol[i].as_py()
                ivs = ccol[i].as_py()
                if raw is None or not ivs:
                    texts.append(raw)
                    n_spans.append(0)
                    n_bytes.append(0)
                    continue
                b = raw.encode("utf-8")
                merged: list[list[int]] = []
                for iv in ivs:  # sorted by (s, l)
                    s, e = iv["s"], iv["s"] + iv["l"]
                    if merged and s <= merged[-1][1]:
                        merged[-1][1] = max(merged[-1][1], e)
                    else:
                        merged.append([s, e])
                out = bytearray()
                prev = removed = kept = 0
                for s, e in merged:
                    s, e = min(s, len(b)), min(e, len(b))
                    while s < e and (b[s] & 0xC0) == 0x80:
                        s += 1  # keep the partial char whose start survives
                    while e > s and e < len(b) and (b[e] & 0xC0) == 0x80:
                        e -= 1  # cut may not end mid-codepoint
                    if e <= s:
                        continue
                    out += b[prev:s]
                    prev = e
                    removed += e - s
                    kept += 1
                out += b[prev:]
                texts.append(out.decode("utf-8"))
                n_spans.append(kept)
                n_bytes.append(removed)
            arrays = [batch.column(j) for j in range(batch.num_columns - 1)]
            arrays[ti] = pa.array(texts, type=pa.string())
            yield pa.RecordBatch.from_arrays(
                arrays + [pa.array(np.asarray(n_spans, dtype=np.int64)),
                          pa.array(np.asarray(n_bytes, dtype=np.int64))],
                names=[f.name for f in out_schema.fields])

    rewritten = joined.mapInArrow(cut_rows, out_schema)
    return untouched.unionByName(rewritten)
