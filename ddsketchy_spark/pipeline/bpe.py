"""Distributed BPE merge training over token arrays.

Byte-pair-encoding tokenizer training (Sennrich et al. 2016, "Neural
Machine Translation of Rare Words with Subword Units") is greedy
coordinate ascent: each round finds the corpus's most frequent ADJACENT
symbol pair and fuses it into a new symbol everywhere, repeated
``n_merges`` times. ``text.array_pair_counts`` already computes the
per-round statistic; this module closes the loop with the trainer
(``train_bpe_merges``) and the learned tokenizer (``apply_bpe_merges``).

The Spark-first trick that keeps every round JVM-side: sequences live as
a DELIMITED STRING, ``SEP + tok + SEP+SEP + tok + ... + SEP`` (SEP =
``\\x1f``, the ASCII unit separator — validated absent from the input
symbols). Fusing pair (a, b) is then one literal
``F.replace(s, SEP+a+SEP+SEP+b+SEP, SEP+a+JOIN+b+SEP)`` — a whole-stage-
codegen projection whose left-to-right non-overlapping scan IS the BPE
merge law (a run ``a a a`` fuses its first two symbols only, exactly
like the sequential reference; pinned by the parity test and re-derived
verbatim by DuckDB's ``replace``, which shares the scan semantics).
Merged symbols join their parts with ``\\x1e`` so they stay unique
strings and re-splitting on ``SEP+SEP`` is always exact.

Per round the cluster does exactly: one pair-count pass over the cached
corpus (codegen zip-slice pairs, map-side-combining hash aggregate —
shuffle volume is O(distinct pairs), Zipf-concentrated), one
``LIMIT 1`` argmax collect (a single driver row), and one lazy
``replace`` projection. Stacked projections re-execute earlier rounds'
replaces against the cache, so every ``checkpoint_every`` rounds the
string column re-materializes (persist + count, previous generation
unpersisted) — expression depth and per-round recompute both stay
bounded by the window, and total work is O(n_merges / k) extra corpus
materializations, the same shape a sequential BPE trainer pays in
memory rewrites. At 100-TB scale, train on a deterministic sample
(``pipeline.mix`` md5-uniform selection) — merge ranks converge long
before full-corpus counts do; the trainer itself never materializes
more than one increment of driver state (one merge row per round).

The reference sketch library has no tokenizer-training analogue — this
is pipeline scope (tokens payload), same family as
``text.array_pair_counts`` (its oracle twin ``token_pairs_documents``).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pyarrow as pa

from pyspark.sql import DataFrame, Window, functions as F
from pyspark.sql.types import (
    ArrayType,
    ByteType,
    IntegerType,
    LongType,
    ShortType,
    StructField,
    StructType,
)

SEP = "\x1f"   # unit separator: symbol boundary
JOIN = "\x1e"  # record separator: glues the two halves of a merged symbol

_MERGE_SCHEMA = ("merge_round int, left_tok string, right_tok string, "
                 "pair_count bigint")


def _to_string_form(df: DataFrame, arr_col: str) -> DataFrame:
    """(arr_col) -> one-column frame ``s`` = SEP-delimited string form.

    Arrays shorter than 2 carry no adjacent pairs and no symbol of
    theirs can ever fuse, so they are excluded from training (the
    tokenizer ``apply_bpe_merges`` builds handles them fine)."""
    a = F.col(arr_col)
    return (df.where(a.isNotNull() & (F.size(a) >= 2))
            .select(F.concat(
                F.lit(SEP),
                F.array_join(a.cast("array<string>"), SEP + SEP),
                F.lit(SEP)).alias("s")))


def _make_pair_merge(ca: int, cb: int, mcode: int, col_name: str):
    """mapInArrow kernel fusing every greedy left-to-right non-overlapping
    adjacent ``(ca, cb)`` occurrence in an integer token array into the
    fresh code ``mcode`` — the BPE merge law on the native representation.

    Greedy parity with the string engine's ``F.replace`` (which scans
    left to right and never rescans replaced output): when ``ca != cb``
    two matches can never overlap (a match at p and p+1 would force
    ``flat[p+1] == cb == ca``), and when ``ca == cb`` runs of consecutive
    match positions keep alternate members starting from the run head
    (``a a a`` fuses its first two symbols only, like the sequential
    reference). Cross-row positions are masked via the list offsets, so
    a pair never fuses across documents — exactly the per-string scan.

    All vectorized: one boolean match pass, one overlap-parity pass over
    the (sparse) match list, one masked copy-out; per-task temps are a
    few flat-token-sized arrays."""

    def run(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            col = batch.column(0)
            n_rows = batch.num_rows
            if not n_rows:
                continue
            lens = np.diff(col.offsets.to_numpy().astype(np.int64))
            flat_pa = col.flatten()
            flat = flat_pa.to_numpy(zero_copy_only=False)
            nf = len(flat)
            if nf < 2:
                yield batch
                continue
            m = np.empty(nf - 1, dtype=bool)
            np.equal(flat[:-1], ca, out=m)
            m &= flat[1:] == cb
            cum = np.cumsum(lens)
            # a pair at position p spans flat[p], flat[p+1]; p+1 must not
            # be a row start (cum[i] is row i+1's start)
            m[cum[:-1] - 1] = False
            idx = np.flatnonzero(m)
            if ca == cb and len(idx) > 1:
                newrun = np.empty(len(idx), dtype=bool)
                newrun[0] = True
                np.not_equal(np.diff(idx), 1, out=newrun[1:])
                run_start = idx[newrun][np.cumsum(newrun) - 1]
                idx = idx[((idx - run_start) & 1) == 0]
            if not len(idx):
                yield batch
                continue
            out_vals = flat.copy()
            out_vals[idx] = mcode
            keep = np.ones(nf, dtype=bool)
            keep[idx + 1] = False
            out_vals = out_vals[keep]
            row_of = np.searchsorted(cum, idx, side="right")
            new_lens = lens - np.bincount(row_of, minlength=n_rows)
            offs = np.empty(n_rows + 1, dtype=np.int64)
            offs[0] = 0
            np.cumsum(new_lens, out=offs[1:])
            arr2 = pa.ListArray.from_arrays(
                pa.array(offs, type=pa.int32()),
                pa.array(out_vals, type=flat_pa.type))
            yield pa.RecordBatch.from_arrays([arr2], names=[col_name])

    return run


def _train_int_native(spark, base: DataFrame, arr_col: str, n_merges: int,
                      min_count: int) -> DataFrame:
    """All rounds over the NATIVE integer arrays — no string-form corpus.

    Per round: one codegen pair-count pass over the cached int arrays
    (the hash aggregate groups narrow native pairs) and one vectorized
    ``_make_pair_merge`` transform persisted for the next round. Merged
    symbols get fresh NEGATIVE codes ``-round`` (collision-free: the
    caller gates this engine on ``min(element) >= 0``), and the argmax
    tie order translates codes back to their string-form symbols with a
    literal map (original code -> its decimal cast; merged code -> the
    ``left + JOIN + right`` composite), so the selected merges — counts,
    symbols, tie-breaks — are exactly the string engine's.

    Equivalence sketch (pinned by ``test_bpe_int_native_parity``): the
    translation code->string is injective (decimal strings never contain
    JOIN; a pair merges at most once, so composites are distinct), hence
    pair multisets and their count orders coincide; and the transform's
    greedy scan is ``F.replace``'s (see ``_make_pair_merge``). Induction
    over rounds gives identical merge tables. This is the engine that
    fixes the 32k-vocabulary cost model: a round costs one pass over
    int arrays (4 bytes/token) instead of the delimited string corpus
    (~7 bytes/token plus a split per round), with no checkpoint-window
    replace stacking — each round's corpus is materialized int arrays."""
    from pyspark import StorageLevel

    from .text import array_pair_counts

    arr = F.col(arr_col)
    orig = base  # the caller's persisted frame — always released below
    elem_dt = base.schema[arr_col].dataType.elementType
    if isinstance(elem_dt, (ByteType, ShortType)):
        # negative merge codes -round would overflow int8/int16 past 127
        # (resp. 32767) merges — silent wraparound on NumPy 1.x. Upcast
        # the working corpus to int once (a cache-fed projection); the
        # pair counts and string casts are value-identical.
        base = base.select(arr.cast("array<int>").alias(arr_col))
        elem_dt = IntegerType()
    schema_str = f"{arr_col} array<{elem_dt.simpleString()}>"
    merges: list[tuple] = []
    merged_strs: dict[int, str] = {}
    pinned = [orig]
    cur = base
    try:
        for r in range(1, n_merges + 1):
            if merged_strs:
                mp = F.create_map(*[F.lit(v) for kv in merged_strs.items()
                                    for v in kv])

                def trans(c, _mp=mp):
                    return F.coalesce(_mp[c.cast("long")], c.cast("string"))
            else:
                def trans(c):
                    return c.cast("string")
            best = (array_pair_counts(cur, arr_col)
                    .orderBy(F.desc("cnt"), trans(F.col("a")).asc(),
                             trans(F.col("b")).asc())
                    .limit(1)
                    .select(F.col("a").cast("long").alias("ca"),
                            F.col("b").cast("long").alias("cb"),
                            trans(F.col("a")).alias("a"),
                            trans(F.col("b")).alias("b"), "cnt")
                    .collect())
            if not best or best[0]["cnt"] < min_count:
                break
            ca, cb = int(best[0]["ca"]), int(best[0]["cb"])
            merges.append((r, best[0]["a"], best[0]["b"],
                           int(best[0]["cnt"])))
            if r == n_merges:
                break
            mcode = -r
            merged_strs[mcode] = best[0]["a"] + JOIN + best[0]["b"]
            nxt = (cur.mapInArrow(_make_pair_merge(ca, cb, mcode, arr_col),
                                  schema_str)
                   .persist(StorageLevel.MEMORY_AND_DISK))
            nxt.count()
            for p in pinned:
                p.unpersist()
            pinned, cur = [nxt], nxt
    finally:
        for p in pinned:
            p.unpersist()
    return spark.createDataFrame(merges, _MERGE_SCHEMA)


def _validate_symbols(df: DataFrame, arr_col: str) -> None:
    """One aggregate pass: reject NULL elements (unrepresentable as a
    string symbol) and symbols containing the delimiters (would corrupt
    the string form). The HOF lambdas reference only their own variable
    — safe per the package's self-join rule (this frame never joins)."""
    a = F.col(arr_col)
    row = (df.where(a.isNotNull()).select(
        F.max(F.exists(a, lambda x: x.isNull())).alias("has_null"),
        F.max(F.exists(a, lambda x: x.cast("string").contains(SEP)
                       | x.cast("string").contains(JOIN))).alias("has_sep"),
        F.max(F.exists(a, lambda x: x.cast("string") == "")
              ).alias("has_empty"),
    ).first())
    if row is not None and row["has_null"]:
        raise ValueError(
            f"{arr_col!r} contains NULL elements — a NULL symbol cannot "
            "be represented; filter or fill them first")
    if row is not None and row["has_sep"]:
        raise ValueError(
            f"{arr_col!r} contains symbols with \\x1f or \\x1e — these "
            "delimit the internal string form; remap such symbols first")
    if row is not None and row["has_empty"]:
        raise ValueError(
            f"{arr_col!r} contains empty-string symbols — the delimited "
            "string form cannot represent them unambiguously (a merge "
            "pattern over empties matches across symbol boundaries); "
            "filter them first (e.g. F.filter(col, x -> x != ''))")


def train_bpe_merges(
    df: DataFrame,
    arr_col: str = "tokens",
    n_merges: int = 10,
    min_count: int = 2,
    checkpoint_every: int = 8,
    validate: bool = True,
    n_partitions: int | None = None,
) -> DataFrame:
    """Learn ``n_merges`` BPE merges from the corpus's token arrays.

    Returns a small driver-built DataFrame (one row per learned merge,
    at most ``n_merges`` rows):
    ``(merge_round, left_tok, right_tok, pair_count)`` — merge r fused
    adjacent pair (left_tok, right_tok), which occurred ``pair_count``
    times in the corpus AFTER merges 1..r-1 were applied. Ties break
    deterministically (count desc, left asc, right asc — binary string
    order on both engines). Training stops early when the best pair
    falls below ``min_count`` (Sennrich's stopping rule).

    Symbols are the array's elements cast to string (int token ids and
    word strings both work); a merged symbol is ``left + "\\x1e" +
    right``. ``validate=False`` skips the one-pass delimiter/NULL check
    when the caller guarantees the contract (e.g. int token ids).

    The string form REBALANCES once before the first round
    (``repartition(n_partitions)``, default the cluster's
    defaultParallelism): training inputs are typically filtered samples
    whose surviving rows cluster in a few input splits, and an
    unbalanced cache would serialize every round on those few tasks
    (measured 5x on a 2-of-32-splits sample). One round-robin shuffle of
    the compact one-column corpus, amortized over all rounds."""
    from pyspark import StorageLevel

    from .text import array_pair_counts

    if n_merges < 0:
        raise ValueError("n_merges must be >= 0")
    if checkpoint_every < 1:
        raise ValueError("checkpoint_every must be >= 1")
    spark = df.sparkSession
    if validate:
        _validate_symbols(df, arr_col)
    arr = F.col(arr_col)
    # the rebalance shuffle moves the NARROW native arrays, not the wider
    # delimited strings; the string form is then a shuffle-free projection
    # of this cached frame, first materialized (and persisted) only when a
    # round >= 2 needs it — a 1-merge train (or an early stop) never
    # builds the string form at all
    base = (df.where(arr.isNotNull() & (F.size(arr) >= 2))
            .select(arr.alias(arr_col))
            .repartition(n_partitions
                         or spark.sparkContext.defaultParallelism)
            .persist(StorageLevel.MEMORY_AND_DISK))
    elem = df.schema[arr_col].dataType
    if (n_merges and isinstance(elem, ArrayType) and isinstance(
            elem.elementType, (ByteType, ShortType, IntegerType, LongType))):
        # non-negative int corpora train fully natively (negative codes
        # are then free for merged symbols); the gate aggregate doubles
        # as the eager materialization of the persist. Negative symbols
        # fall through to the string engine below (identical results —
        # the cast-invariance law).
        mn = base.agg(F.min(F.array_min(arr)).alias("mn")).first()["mn"]
        if mn is not None and mn >= 0:
            return _train_int_native(spark, base, arr_col, n_merges,
                                     min_count)
    cur = (_to_string_form(base, arr_col)
           .persist(StorageLevel.MEMORY_AND_DISK))
    pinned = [base, cur]
    merges: list[tuple] = []
    try:
        for r in range(1, n_merges + 1):
            if r == 1:
                # Round 1 counts pairs straight off the ORIGINAL arrays:
                # same symbols (the string cast is applied after the
                # aggregate, and tie order uses that cast, so the result
                # is identical), but the hash aggregate groups on the
                # narrow native element type and never splits a string.
                n = F.size(arr)
                prs = F.when(n >= 2, F.arrays_zip(
                    F.slice(arr, 1, n - 1).alias("a"),
                    F.slice(arr, 2, n - 1).alias("b")))
                best = (base
                        .select(F.explode(prs).alias("p"))
                        .select(F.col("p.a").alias("a"),
                                F.col("p.b").alias("b"))
                        .groupBy("a", "b")
                        .agg(F.count(F.lit(1)).alias("cnt"))
                        .orderBy(F.desc("cnt"),
                                 F.col("a").cast("string").asc(),
                                 F.col("b").cast("string").asc())
                        .limit(1)
                        .select(F.col("a").cast("string").alias("a"),
                                F.col("b").cast("string").alias("b"),
                                "cnt")
                        .collect())
            else:
                toks = F.split(
                    F.expr("substring(s, 2, length(s) - 2)"), SEP + SEP)
                best = array_pair_counts(
                    cur.select(toks.alias("t")), "t", top_k=1).collect()
            if not best or best[0]["cnt"] < min_count:
                break
            a, b, cnt = best[0]["a"], best[0]["b"], int(best[0]["cnt"])
            merges.append((r, a, b, cnt))
            cur = cur.select(F.replace(
                F.col("s"),
                F.lit(SEP + a + SEP + SEP + b + SEP),
                F.lit(SEP + a + JOIN + b + SEP)).alias("s"))
            if r % checkpoint_every == 0 and r < n_merges:
                nxt = cur.persist(StorageLevel.MEMORY_AND_DISK)
                nxt.count()
                for p in pinned:
                    p.unpersist()
                pinned, cur = [nxt], nxt
    finally:
        for p in pinned:
            p.unpersist()
    return spark.createDataFrame(merges, _MERGE_SCHEMA)


def _merge_pairs(merges) -> list[tuple[str, str]]:
    """Normalize a merge table (``train_bpe_merges``'s DataFrame — rank
    order restored by ``merge_round`` — or a list of ``(left, right)``
    pairs already in rank order) to a bounded driver-side pair list."""
    if isinstance(merges, DataFrame):
        rows = merges.orderBy("merge_round").collect()
        return [(r["left_tok"], r["right_tok"]) for r in rows]
    return [(str(a), str(b)) for a, b in merges]


def apply_bpe_merges(
    df: DataFrame,
    merges,
    arr_col: str = "tokens",
    out_col: str = "bpe_tokens",
    validate: bool = True,
) -> DataFrame:
    """Tokenize with a learned merge table: apply every merge, in rank
    order, to ``arr_col`` and append ``out_col`` (array<string> of
    post-merge symbols; fused symbols are ``left + "\\x1e" + right``,
    nested for multi-round fusions).

    ``merges`` is ``train_bpe_merges``'s DataFrame (collected here —
    bounded at n_merges rows) or a list of ``(left_tok, right_tok)``
    pairs in rank order. The whole application is ONE stacked codegen
    projection — string-form build, n_merges literal replaces, re-split
    — no shuffle, no Python; the same left-to-right scan the trainer
    used, so re-applying a trainer's merges to its own training corpus
    reproduces the trainer's final sequences exactly (round-trip test).
    Rows whose array is NULL get NULL; arrays shorter than 2 pass
    through unfused (cast to string symbols)."""
    pairs = _merge_pairs(merges)
    if validate:
        _validate_symbols(df, arr_col)
    a = F.col(arr_col)
    s = F.concat(F.lit(SEP),
                 F.array_join(a.cast("array<string>"), SEP + SEP),
                 F.lit(SEP))
    for lt, rt in pairs:
        s = F.replace(s, F.lit(SEP + lt + SEP + SEP + rt + SEP),
                      F.lit(SEP + lt + JOIN + rt + SEP))
    fused = F.split(F.substring(s, 2, F.length(s) - 2), SEP + SEP)
    return df.withColumn(
        out_col, F.when(a.isNull(), F.lit(None).cast("array<string>"))
                  .when(F.size(a) == 0, F.array().cast("array<string>"))
                  .otherwise(fused))


def bpe_vocab(
    df: DataFrame,
    merges,
    arr_col: str = "tokens",
    validate: bool = True,
) -> DataFrame:
    """Deterministic BPE vocabulary ``(tok_id int, symbol string, kind)``
    for a learned merge table: ids ``0..B-1`` are the corpus's distinct
    BASE symbols in ascending binary order (Spark and DuckDB both compare
    strings bytewise, so the numbering is cross-engine exact), ids
    ``B..B+M-1`` are the merged symbols (``left + "\\x1e" + right``) in
    merge-rank order — the id layout real BPE tokenizers ship (base
    alphabet first, merges by rank). Merged symbols always contain the
    ``\\x1e`` glue and base symbols never do (validated), so the two
    ranges can never collide.

    Scale shape: one explode + map-side-combining distinct (shuffle is
    O(distinct symbols)); the dense numbering is a single-task
    ``row_number`` over the distinct-symbol frame — a vocabulary is a
    bounded artifact by definition (it is about to be collected into
    every encoder task), so the one-task final is the honest cost, not a
    bottleneck. ``kind`` is 'base' or 'merge' — never NULL."""
    if validate:
        _validate_symbols(df, arr_col)
    pairs = _merge_pairs(merges)
    spark = df.sparkSession
    a = F.col(arr_col)
    base = (df.where(a.isNotNull())
            .select(F.explode(a.cast("array<string>")).alias("symbol"))
            .distinct())
    basev = base.select(
        (F.row_number().over(Window.orderBy("symbol")) - 1)
        .cast("int").alias("tok_id"),
        "symbol", F.lit("base").alias("kind"))
    if not pairs:
        return basev
    nb = base.agg(F.count(F.lit(1)).cast("int").alias("_b"))
    mdf = spark.createDataFrame(
        [(i, lt + JOIN + rt) for i, (lt, rt) in enumerate(pairs)],
        "rank int, symbol string")
    mergev = (mdf.crossJoin(F.broadcast(nb))
              .select((F.col("_b") + F.col("rank")).cast("int")
                      .alias("tok_id"),
                      "symbol", F.lit("merge").alias("kind")))
    return basev.unionByName(mergev)


def encode_bpe(
    df: DataFrame,
    merges,
    arr_col: str = "tokens",
    out_col: str = "tok_ids",
    vocab: DataFrame | None = None,
    unk_id: int | None = None,
    validate: bool = True,
) -> DataFrame:
    """Encode token arrays to ``array<int>`` BPE ids — the full tokenizer
    loop closed: ``train_bpe_merges`` -> ``bpe_vocab`` -> ``encode_bpe``
    produces exactly the pre-tokenized table shape this engine's north
    rule consumes (``tokens: array<int32>``).

    Appends ``out_col``: ``arr_col`` fused by every merge in rank order
    (``apply_bpe_merges``'s single stacked codegen projection — no
    shuffle) then mapped symbol -> id through the vocabulary. The id
    lookup is one vectorized mapInArrow projection: the bounded vocab
    broadcasts as a plain dict, each Arrow batch's flattened symbols are
    dictionary-encoded so only the batch's DISTINCT symbols (bounded by
    the vocab, not the token count) touch Python, and ids come from one
    NumPy gather — no join, no shuffle, no per-token Python. The corpus
    never leaves its input partitioning.

    ``vocab`` defaults to ``bpe_vocab(df, merges, arr_col)`` (self-
    trained corpora never see OOV); pass a persisted vocabulary to encode
    NEW text, with ``unk_id`` the id for symbols outside it (default
    None = raise, the safe mode for training-corpus encoding). NULL
    arrays stay NULL; empty arrays encode to empty."""
    spark = df.sparkSession
    if vocab is None:
        # apply_bpe_merges below validates the same frame — skip the
        # duplicate one-pass check here
        vocab = bpe_vocab(df, merges, arr_col, validate=False)
    vrows = vocab.select("symbol", "tok_id").collect()  # bounded artifact
    vmap = {r["symbol"]: int(r["tok_id"]) for r in vrows}
    if len(vmap) != len(vrows):
        raise ValueError("vocabulary contains duplicate symbols")
    fused_col = "_bpe_fused"
    if fused_col in df.columns or out_col in df.columns:
        raise ValueError(f"df already has a {fused_col!r}/{out_col!r} column")
    with_f = apply_bpe_merges(df, merges, arr_col, out_col=fused_col,
                              validate=validate)
    with_f = with_f.withColumn(
        fused_col, F.coalesce(F.col(fused_col),
                              F.array().cast("array<string>")))
    names = df.columns
    fi = len(names)  # fused column appended last
    out_schema = StructType(list(df.schema.fields)
                            + [StructField(out_col,
                                           ArrayType(IntegerType()))])
    bc = spark.sparkContext.broadcast(vmap)
    unk = None if unk_id is None else int(unk_id)

    def run(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        vm = bc.value
        for batch in batches:
            if not batch.num_rows:
                continue
            fc = batch.column(fi)
            offs = fc.offsets.to_numpy().astype(np.int64)
            offs = offs - offs[0]
            flat = fc.flatten()
            if len(flat):
                de = flat.dictionary_encode()
                dic = de.dictionary.to_pylist()
                lut = np.empty(len(dic), dtype=np.int32)
                for j, sym in enumerate(dic):
                    v = vm.get(sym, unk)
                    if v is None:
                        raise ValueError(
                            f"symbol {sym!r} is not in the vocabulary and "
                            "no unk_id was given")
                    lut[j] = v
                ids = lut[de.indices.to_numpy().astype(np.int64)]
            else:
                ids = np.empty(0, dtype=np.int32)
            out = pa.ListArray.from_arrays(
                pa.array(offs, type=pa.int32()),
                pa.array(ids, type=pa.int32()))
            yield pa.RecordBatch.from_arrays(
                [batch.column(i) for i in range(fi)] + [out],
                names=names + [out_col])

    res = with_f.mapInArrow(run, out_schema)
    return res.withColumn(
        out_col, F.when(F.col(arr_col).isNull(),
                        F.lit(None).cast("array<int>"))
                  .otherwise(F.col(out_col)))
