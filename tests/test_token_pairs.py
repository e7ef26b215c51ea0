"""array_pair_counts: the BPE merge-candidate statistic — brute-force
parity on the input_hint token table, edge cases, string arrays."""

import numpy as np
import pyarrow.dataset as ds
import pytest

from pyspark.sql import functions as F


def _brute_top_pairs(path, k):
    tbl = ds.dataset(path).to_table(columns=["tokens"])
    counts = {}
    for chunk in tbl.column("tokens").chunks:
        flat = chunk.flatten().to_numpy(zero_copy_only=False).astype(np.int64)
        offs = chunk.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        offs = offs - offs[0]
        code = flat[:-1] * (1 << 32) + flat[1:]
        # drop the cross-document seams (positions offs[i]-1 for i >= 1)
        seams = offs[1:-1] - 1
        mask = np.ones(len(code), dtype=bool)
        mask[seams[(seams >= 0) & (seams < len(code))]] = False
        vals, cnts = np.unique(code[mask], return_counts=True)
        for v, c in zip(vals, cnts):
            counts[int(v)] = counts.get(int(v), 0) + int(c)
    rows = [((v >> 32), v & 0xFFFFFFFF, c) for v, c in counts.items()]
    rows.sort(key=lambda r: (-r[2], r[0], r[1]))
    return rows[:k]


def test_token_pairs_match_brute_force(spark, token_table_path):
    from ddsketchy_spark.data.synth import read_tokens
    from ddsketchy_spark.pipeline.text import array_pair_counts

    df = read_tokens(spark, token_table_path)
    got = [(r["a"], r["b"], r["cnt"]) for r in
           array_pair_counts(df, "tokens", top_k=100).collect()]
    want = _brute_top_pairs(token_table_path, 100)
    assert got == want
    assert got[0][2] >= got[-1][2] > 0


def test_token_pairs_edges(spark):
    from ddsketchy_spark.pipeline.text import array_pair_counts

    df = spark.createDataFrame(
        [([1, 2, 1, 2],), ([2, 1],), ([7],), ([],), (None,)],
        "tokens array<int>")
    got = {(r["a"], r["b"]): r["cnt"]
           for r in array_pair_counts(df, "tokens").collect()}
    assert got == {(1, 2): 2, (2, 1): 2}


def test_token_pairs_null_elements_and_strings(spark):
    from ddsketchy_spark.pipeline.text import array_pair_counts

    df = spark.createDataFrame(
        [(["x", None, "x", "y"],), (["x", "y"],)], "tokens array<string>")
    got = {(r["a"], r["b"]): r["cnt"]
           for r in array_pair_counts(df, "tokens").collect()}
    assert got == {("x", None): 1, (None, "x"): 1, ("x", "y"): 2}


def test_token_pairs_equals_word_bigrams(spark, sf001_dir):
    """On word arrays the pair law must agree with ngram_counts(n=2) —
    the two kernels (zip-slice pairs vs transform-join grams) can never
    diverge on shared input."""
    from ddsketchy_spark.pipeline.text import array_pair_counts, ngram_counts

    docs = spark.read.parquet(f"{sf001_dir}/documents.parquet")
    pairs = array_pair_counts(
        docs.where(F.col("text").isNotNull())
            .select(F.split("text", " ").alias("w")), "w")
    via_pairs = {(r["a"] + " " + r["b"]): r["cnt"]
                 for r in pairs.collect() if r["a"] is not None}
    via_grams = {r["ngram"]: r["cnt"] for r in ngram_counts(docs, n=2).collect()}
    assert via_pairs == via_grams


def test_vocab_coverage_bruteforce(spark):
    """vocab_coverage == a Python-counter reference, in both the top-k
    and explicit-vocab-DataFrame forms, grouped and global."""
    from collections import Counter

    from ddsketchy_spark.pipeline.text import vocab_coverage

    rows = [
        ("s1", ["a", "b", "a", "c"]),
        ("s1", ["a", "a"]),
        ("s2", ["b", "d", "e"]),
        ("s2", None),                 # NULL array: contributes nothing
        ("s3", ["f"]),
    ]
    df = spark.createDataFrame(rows, "source string, w array<string>")
    # top-2 vocab: a(4), b(2) — ties impossible here; c,d,e,f are OOV
    got = {r["source"]: (r["n_tokens"], r["n_oov"], r["oov_rate_r6"])
           for r in vocab_coverage(df, "w", 2, by=["source"]).collect()}
    cnt = Counter(t for _, ws in rows if ws for t in ws)
    vocab = {t for t, _ in sorted(cnt.items(),
                                  key=lambda kv: (-kv[1], kv[0]))[:2]}
    assert vocab == {"a", "b"}
    want = {}
    for s, ws in rows:
        if not ws:
            continue
        n, oov = len(ws), sum(t not in vocab for t in ws)
        pn, po, _ = want.get(s, (0, 0, 0.0))
        want[s] = (pn + n, po + oov, 0.0)
    want = {s: (n, o, round(o / n, 6)) for s, (n, o, _) in want.items()}
    assert got == want
    # explicit vocab DataFrame (with a NULL entry, which is ignored)
    vdf = spark.createDataFrame([("a",), ("b",), (None,)], "tok string")
    got2 = {r["source"]: (r["n_tokens"], r["n_oov"], r["oov_rate_r6"])
            for r in vocab_coverage(df, "w", vdf, by=["source"]).collect()}
    assert got2 == got
    # global (no by): one row over all tokens
    g = vocab_coverage(df, "w", 2).collect()
    assert len(g) == 1
    tot_n = sum(n for n, _, _ in want.values())
    tot_o = sum(o for _, o, _ in want.values())
    assert (g[0]["n_tokens"], g[0]["n_oov"]) == (tot_n, tot_o)
    # int token arrays work too
    di = spark.createDataFrame([([1, 2, 1],), ([3],)], "t array<int>")
    gi = vocab_coverage(di, "t", 1).collect()[0]
    assert (gi["n_tokens"], gi["n_oov"]) == (4, 2)
    # vocab frame must be one column
    import pytest as _pt
    with _pt.raises(ValueError, match="one column"):
        vocab_coverage(df, "w", df)


def test_vocab_coverage_null_elements_and_empty(spark):
    """NULL elements count as always-OOV tokens but never occupy a top-k
    vocab slot; the zero-token global row uses the -1.0 sentinel."""
    from ddsketchy_spark.pipeline.text import vocab_coverage

    df = spark.createDataFrame(
        [([None, None, "a"],), ([None, "b"],)], "w array<string>")
    g = vocab_coverage(df, "w", 1).collect()[0]
    # top-1 vocab is 'a' or 'b' by count tie -> 'a' (asc); NULLs are OOV
    assert (g["n_tokens"], g["n_oov"]) == (5, 4)
    assert g["oov_rate_r6"] == 0.8
    # zero-token corpus: global row with sentinel rate, zero counts
    dz = spark.createDataFrame([(None,)], "w array<string>")
    z = vocab_coverage(dz, "w", 3).collect()[0]
    assert (z["n_tokens"], z["n_oov"], z["oov_rate_r6"]) == (0, 0, -1.0)
