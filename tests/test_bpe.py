"""Distributed BPE merge training (pipeline/bpe.py).

The law under test: train_bpe_merges's merge table equals a sequential
reference BPE trainer's (greedy most-frequent adjacent pair, ties by
(count desc, left asc, right asc), left-to-right non-overlapping
fusion) on the same corpus; apply_bpe_merges replays the merges as one
codegen projection and reproduces the trainer's final sequences.
"""

import random
from collections import Counter

import pytest

from pyspark.sql import functions as F

from ddsketchy_spark.pipeline.bpe import (
    JOIN,
    apply_bpe_merges,
    bpe_vocab,
    encode_bpe,
    train_bpe_merges,
)


def _ref_fuse(seq, a, b, joined):
    """Left-to-right non-overlapping fusion of adjacent pair (a, b)."""
    out, i = [], 0
    while i < len(seq):
        if i + 1 < len(seq) and seq[i] == a and seq[i + 1] == b:
            out.append(joined)
            i += 2
        else:
            out.append(seq[i])
            i += 1
    return out


def _ref_train(seqs, n_merges, min_count=2):
    """Sequential reference BPE trainer (Sennrich et al. 2016)."""
    seqs = [[str(t) for t in s] for s in seqs if s is not None and len(s) >= 2]
    merges = []
    for r in range(1, n_merges + 1):
        cnt = Counter()
        for s in seqs:
            for i in range(len(s) - 1):
                cnt[(s[i], s[i + 1])] += 1
        if not cnt:
            break
        best = min(cnt.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        (a, b), c = best
        if c < min_count:
            break
        merges.append((r, a, b, c))
        joined = a + JOIN + b
        seqs = [_ref_fuse(s, a, b, joined) for s in seqs]
    return merges, seqs


def _train_rows(mdf):
    return [(r["merge_round"], r["left_tok"], r["right_tok"],
             r["pair_count"]) for r in mdf.orderBy("merge_round").collect()]


def test_bpe_matches_reference_on_words(spark):
    texts = [
        "the cat sat on the mat and the cat ran",
        "the cat sat on the hat",
        "a cat and a dog and a cat",
        "the the the the",
        "one token",           # 2 symbols: participates
        "single",              # 1 symbol: excluded from training
    ]
    seqs = [t.split(" ") for t in texts]
    df = spark.createDataFrame([(s,) for s in seqs], "w array<string>")
    got = _train_rows(train_bpe_merges(df, "w", n_merges=5, min_count=2))
    want, _ = _ref_train(seqs, 5, min_count=2)
    assert got == want
    assert len(got) >= 3  # ('the','cat') etc. actually fused


def test_bpe_matches_reference_randomized(spark):
    """Fuzz: skewed random int-token corpora (runs included — the
    overlap-resolution law is exactly what runs stress)."""
    rng = random.Random(20260818)
    for trial in range(3):
        seqs = []
        for _ in range(60):
            n = rng.randint(2, 30)
            s = []
            for _ in range(n):
                t = rng.choice([1, 1, 1, 2, 2, 3, 4, 5])
                s.append(t)
                if rng.random() < 0.3:  # inject runs
                    s.append(t)
            seqs.append(s[:30])
        df = spark.createDataFrame(
            [(s,) for s in seqs], "t array<int>")
        got = _train_rows(
            train_bpe_merges(df, "t", n_merges=6, min_count=2,
                             checkpoint_every=2, validate=False))
        want, _ = _ref_train(seqs, 6, min_count=2)
        assert got == want, f"trial {trial}"


def test_apply_roundtrip_and_passthrough(spark):
    texts = ["the cat sat on the mat and the cat ran",
             "the cat sat on the hat", "a cat and a dog and a cat"]
    seqs = [t.split(" ") for t in texts]
    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(seqs)] + [(99, None), (98, [])],
        "i int, w array<string>")
    mdf = train_bpe_merges(df, "w", n_merges=4)
    out = {r["i"]: r["bpe"] for r in
           apply_bpe_merges(df, mdf, "w", out_col="bpe").collect()}
    _, want_seqs = _ref_train(seqs, 4)
    for i, ws in enumerate(want_seqs):
        assert out[i] == ws
    assert out[99] is None and out[98] == []
    # list-of-pairs form matches the DataFrame form
    pairs = [(r["left_tok"], r["right_tok"])
             for r in mdf.orderBy("merge_round").collect()]
    out2 = {r["i"]: r["bpe"] for r in
            apply_bpe_merges(df, pairs, "w", out_col="bpe").collect()}
    assert out2 == out
    # single-symbol arrays pass through as string symbols
    df1 = spark.createDataFrame([(0, ["lonely"])], "i int, w array<string>")
    assert apply_bpe_merges(df1, pairs, "w", out_col="bpe"
                            ).first()["bpe"] == ["lonely"]


def test_early_stop_and_empty(spark):
    # all pairs unique -> best count 1 < min_count 2 -> zero merges
    df = spark.createDataFrame(
        [(["a", "b"],), (["c", "d"],), (["e", "f"],)], "w array<string>")
    mdf = train_bpe_merges(df, "w", n_merges=5, min_count=2)
    assert mdf.count() == 0
    assert mdf.columns == ["merge_round", "left_tok", "right_tok",
                           "pair_count"]
    # n_merges=0 is a no-op with the same schema
    assert train_bpe_merges(df, "w", n_merges=0).count() == 0


def _ref_vocab(seqs, merges):
    """Reference vocab law: base symbols ascending, then merges by rank."""
    base = sorted({str(t) for s in seqs if s is not None for t in s})
    ids = {sym: i for i, sym in enumerate(base)}
    for _r, a, b, _c in merges:
        ids[a + JOIN + b] = len(ids)
    return ids


def test_bpe_vocab_and_encode_roundtrip(spark):
    texts = ["the cat sat on the mat and the cat ran",
             "the cat sat on the hat", "a cat and a dog and a cat"]
    seqs = [t.split(" ") for t in texts]
    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(seqs)]
        + [(99, None), (98, []), (97, ["lonely"])],
        "i int, w array<string>")
    mdf = train_bpe_merges(df, "w", n_merges=4)
    merges, _ = _ref_train(seqs, 4)
    want_ids = _ref_vocab(seqs + [["lonely"]], merges)

    vdf = bpe_vocab(df, mdf, "w")
    got_vocab = {r["symbol"]: r["tok_id"]
                 for r in vdf.collect()}
    assert got_vocab == want_ids
    kinds = {r["symbol"]: r["kind"] for r in vdf.collect()}
    assert all(k == ("merge" if JOIN in s else "base")
               for s, k in kinds.items())
    # dense contiguous ids
    assert sorted(got_vocab.values()) == list(range(len(got_vocab)))

    enc = encode_bpe(df, mdf, "w", out_col="ids")
    got = {r["i"]: r["ids"] for r in enc.collect()}
    # reference: fuse every merge in rank order, then map to vocab ids
    for i, s in enumerate(seqs):
        cur = [str(t) for t in s]
        for _r, a, b, _c in merges:
            cur = _ref_fuse(cur, a, b, a + JOIN + b)
        assert got[i] == [want_ids[sym] for sym in cur], f"doc {i}"
    assert got[99] is None and got[98] == []
    assert got[97] == [want_ids["lonely"]]
    # original columns survive; output type is array<int>
    assert dict(enc.dtypes)["ids"] == "array<int>"
    assert set(enc.columns) == {"i", "w", "ids"}


def test_encode_bpe_oov_and_guards(spark):
    df = spark.createDataFrame([(0, ["a", "b", "a", "b"])],
                               "i int, w array<string>")
    mdf = train_bpe_merges(df, "w", n_merges=1)
    vocab = bpe_vocab(df, mdf, "w")
    new = spark.createDataFrame([(1, ["a", "zzz"])], "i int, w array<string>")
    # OOV without unk_id -> loud failure
    with pytest.raises(Exception, match="not in the vocabulary"):
        encode_bpe(new, mdf, "w", vocab=vocab).collect()
    # OOV with unk_id -> mapped
    got = encode_bpe(new, mdf, "w", out_col="ids", vocab=vocab,
                     unk_id=-1).first()["ids"]
    vm = {r["symbol"]: r["tok_id"] for r in vocab.collect()}
    assert got == [vm["a"], -1]
    # duplicate vocab symbols refused
    dup = vocab.unionByName(vocab)
    with pytest.raises(ValueError, match="duplicate"):
        encode_bpe(new, mdf, "w", vocab=dup, unk_id=-1)
    # column-collision guard
    clash = df.withColumn("tok_ids", F.lit(1))
    with pytest.raises(ValueError, match="column"):
        encode_bpe(clash, mdf, "w")


def test_validation_rejects_bad_symbols(spark):
    df = spark.createDataFrame([(["a", None, "b"],)], "w array<string>")
    with pytest.raises(ValueError, match="NULL elements"):
        train_bpe_merges(df, "w", n_merges=1)
    df2 = spark.createDataFrame([(["a", "b\x1fc"],)], "w array<string>")
    with pytest.raises(ValueError, match="delimit"):
        train_bpe_merges(df2, "w", n_merges=1)
    with pytest.raises(ValueError, match="n_merges"):
        train_bpe_merges(df2, "w", n_merges=-1)
    df3 = spark.createDataFrame([(["a", "b"],)], "w array<string>")
    with pytest.raises(ValueError, match="checkpoint_every"):
        train_bpe_merges(df3, "w", n_merges=1, checkpoint_every=0)
    # empty-string symbols are unrepresentable in the delimited form
    df4 = spark.createDataFrame([(["a", "", "b"],)], "w array<string>")
    with pytest.raises(ValueError, match="empty-string"):
        train_bpe_merges(df4, "w", n_merges=1)
    with pytest.raises(ValueError, match="empty-string"):
        apply_bpe_merges(df4, [("a", "b")], "w")


def test_bpe_int_native_parity(spark):
    """r6: the all-native integer training rounds (negative merge codes,
    NumPy pair-merge transform, translated tie order) must produce
    exactly the string engine's merge table — counts, symbols, order —
    on randomized tiny-vocab corpora where same-symbol runs force the
    greedy-overlap law, and on a negative-token corpus (which must fall
    back to the string engine)."""
    import numpy as np

    rng = np.random.default_rng(11)
    for trial in range(4):
        rows = []
        for _ in range(int(rng.integers(3, 30))):
            ln = int(rng.integers(2, 20))
            rows.append(([int(x) for x in rng.integers(0, 4, ln)],))
        ints = spark.createDataFrame(rows, "tokens array<int>")
        strs = ints.withColumn("tokens",
                               F.col("tokens").cast("array<string>"))
        nm = int(rng.integers(1, 6))
        mi = [tuple(r) for r in train_bpe_merges(
            ints, "tokens", n_merges=nm, min_count=1,
            validate=False).collect()]
        ms = [tuple(r) for r in train_bpe_merges(
            strs, "tokens", n_merges=nm, min_count=1,
            validate=False).collect()]
        assert mi == ms, (trial, nm)
    negs = spark.createDataFrame(
        [([-1, 2, -1, 2, 3],), ([2, -1, 2, -1],)], "tokens array<int>")
    negs_s = negs.withColumn("tokens", F.col("tokens").cast("array<string>"))
    a = [tuple(r) for r in train_bpe_merges(
        negs, "tokens", n_merges=2, min_count=1, validate=False).collect()]
    b = [tuple(r) for r in train_bpe_merges(
        negs_s, "tokens", n_merges=2, min_count=1, validate=False).collect()]
    assert a == b and len(a) == 2
    # byte/short corpora upcast (negative merge codes would overflow the
    # narrow dtype): identical merges to the string twin
    for t in ("tinyint", "smallint"):
        bt = spark.createDataFrame(
            [([1, 2, 1, 2, 1, 1, 1],), ([2, 1, 2, 2],)], f"tokens array<{t}>")
        bs = bt.withColumn("tokens", F.col("tokens").cast("array<string>"))
        mi = [tuple(r) for r in train_bpe_merges(
            bt, "tokens", n_merges=3, min_count=1, validate=False).collect()]
        ms = [tuple(r) for r in train_bpe_merges(
            bs, "tokens", n_merges=3, min_count=1, validate=False).collect()]
        assert mi == ms and len(mi) == 3, t
