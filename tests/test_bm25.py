"""BM25: hand-computed reference scores, the regexp-tf == split-tf law on
adversarial texts, NULL handling, top-k determinism, and guards."""

import math

import pytest

from pyspark.sql import functions as F

from ddsketchy_spark.pipeline.search import bm25_scores, bm25_topk
from ddsketchy_spark.pipeline.text import _token_count_regex


def _ref_bm25(docs, terms, k1=1.2, b=0.75):
    """Pure-python reference: identical formula, identical token law."""
    toks = {i: [w for w in t.split(" ") if w] for i, t in docs.items()}
    n = len(docs)
    avgdl = sum(len(v) for v in toks.values()) / n
    out = {}
    for i, tk in toks.items():
        dl = len(tk)
        s = 0.0
        for t in terms:
            tf = sum(1 for w in tk if w == t)
            df = sum(1 for v in toks.values() if t in v)
            idf = math.log(1 + (n - df + 0.5) / (df + 0.5))
            s += idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))
        out[i] = (dl, round(s, 6))
    return out


def test_bm25_matches_hand_reference(spark):
    docs = {
        1: "the cat sat on the mat",
        2: "the dog  sat",                      # doubled space -> empty token
        3: "cat cat cat scan",
        4: "nothing relevant here\n",           # trailing newline
        5: "sat",
    }
    df = spark.createDataFrame(
        [(i, t) for i, t in docs.items()] + [(None, "cat"), (9, None)],
        "doc_id long, text string")
    got = {r["doc_id"]: r for r in bm25_scores(df, "cat sat").collect()}
    ref = _ref_bm25(docs, ["cat", "sat"])
    assert set(got) == set(docs)  # NULL id / NULL text excluded
    for i, (dl, score) in ref.items():
        assert got[i]["dl"] == dl
        assert got[i]["bm25"] == pytest.approx(score, abs=1e-6)
    assert got[4]["bm25"] == 0.0 and got[4]["matched_terms"] == 0
    assert got[3]["matched_terms"] == 1
    assert got[1]["matched_terms"] == 2


def test_regexp_tf_equals_split_tf_law(spark):
    """Per-term regexp_count == count of equal split-tokens, on texts
    engineered at the boundaries of the law."""
    texts = [
        "cat", " cat", "cat ", " cat ", "catcat", "cat cat", "cat  cat",
        "a cat", "cat\n", "cat\ncat", "scat cat cats", "", "  ",
        "cat cat cat", "the cat", "cat.", "cat, cat",
    ]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                               "i long, text string")
    pat = _token_count_regex(["cat"])
    out = df.select(
        "i",
        F.regexp_count("text", F.lit(pat)).alias("re_tf"),
        F.size(F.filter(F.split("text", " "),
                        lambda x: x == "cat")).alias("split_tf")).collect()
    for r in out:
        assert r["re_tf"] == r["split_tf"], texts[r["i"]]


def test_bm25_query_forms_and_dedup(spark):
    df = spark.createDataFrame(
        [(1, "x y z"), (2, "x x q")], "doc_id long, text string")
    a = {r["doc_id"]: r["bm25"]
         for r in bm25_scores(df, "x y").collect()}
    b = {r["doc_id"]: r["bm25"]
         for r in bm25_scores(df, ["x", "y", "x"]).collect()}
    assert a == b  # string form tokenizes; duplicate terms collapse


def test_bm25_topk_deterministic_tiebreak(spark):
    df = spark.createDataFrame(
        [(i, "same text") for i in (5, 3, 9, 1)], "doc_id long, text string")
    got = bm25_topk(df, "same", k=3).collect()
    assert [r["doc_id"] for r in got] == [1, 3, 5]  # equal score -> id ASC
    assert len({r["bm25"] for r in got}) == 1


def test_bm25_guards(spark):
    df = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    with pytest.raises(ValueError, match="at least one term"):
        bm25_scores(df, "")
    with pytest.raises(ValueError, match="space-free"):
        bm25_scores(df, ["two words"])
    with pytest.raises(ValueError, match="space-free"):
        bm25_scores(df, [""])
    with pytest.raises(ValueError, match="k must be"):
        bm25_topk(df, "a", k=0)


# ---------------------------------------------------------------------------
# TF-IDF keywords
# ---------------------------------------------------------------------------


def _ref_tfidf(docs, k):
    toks = {i: [w for w in t.split(" ") if w] for i, t in docs.items()}
    toks = {i: tk for i, tk in toks.items()}
    n = len(docs)
    dfreq = {}
    for tk in toks.values():
        for t in set(tk):
            dfreq[t] = dfreq.get(t, 0) + 1
    out = {}
    for i, tk in toks.items():
        if not tk:
            continue
        scores = {}
        for t in set(tk):
            tf = sum(1 for w in tk if w == t)
            scores[t] = tf * (math.log((1.0 + n) / (1.0 + dfreq[t])) + 1.0)
        ranked = sorted(scores.items(), key=lambda x: (-x[1], x[0]))[:k]
        out[i] = [(r + 1, t, s) for r, (t, s) in enumerate(ranked)]
    return out


def test_tfidf_matches_hand_reference(spark):
    from ddsketchy_spark.pipeline.search import tfidf_keywords

    docs = {
        1: "apple apple banana cherry",
        2: "banana banana banana",
        3: "cherry apple  date",          # doubled space
        4: "",                            # no tokens -> absent
        5: "unique",
    }
    df = spark.createDataFrame(
        [(i, t) for i, t in docs.items()] + [(None, "x"), (9, None)],
        "doc_id long, text string")
    got = {}
    for r in tfidf_keywords(df, k=2).collect():
        got.setdefault(r["doc_id"], []).append(
            (r["rank"], r["term"], r["score"]))
    ref = _ref_tfidf(docs, 2)
    assert set(got) == set(ref)  # doc 4 absent, NULLs excluded
    for i in ref:
        got[i].sort()
        assert [(r, t) for r, t, _ in got[i]] == [(r, t) for r, t, _ in ref[i]]
        for (_, _, s_got), (_, _, s_ref) in zip(got[i], ref[i]):
            assert s_got == pytest.approx(s_ref, rel=1e-12)


def test_tfidf_tiebreak_and_k_overrun(spark):
    from ddsketchy_spark.pipeline.search import tfidf_keywords

    # both terms appear once in both docs: identical scores -> term ASC
    df = spark.createDataFrame(
        [(1, "zeta alpha"), (2, "alpha zeta")], "doc_id long, text string")
    got = {}
    for r in tfidf_keywords(df, k=10).collect():
        got.setdefault(r["doc_id"], []).append((r["rank"], r["term"]))
    for i in (1, 2):
        assert sorted(got[i]) == [(1, "alpha"), (2, "zeta")]
    with pytest.raises(ValueError, match="k must be"):
        tfidf_keywords(df, k=0)


def test_tfidf_persist_parity_and_release(spark):
    from ddsketchy_spark.pipeline.cache import (
        cached_deps, release_cached_deps)
    from ddsketchy_spark.pipeline.search import tfidf_keywords

    df = spark.createDataFrame(
        [(i, "w%d common shared" % (i % 7)) for i in range(60)],
        "doc_id long, text string")
    base = {(r["doc_id"], r["rank"]): (r["term"], round(r["score"], 9))
            for r in tfidf_keywords(df, k=3).collect()}
    p = tfidf_keywords(df, k=3, persist=True)
    got = {(r["doc_id"], r["rank"]): (r["term"], round(r["score"], 9))
           for r in p.collect()}
    assert got == base
    # the persisted tf frame is reused by both branches...
    assert "InMemoryTableScan" in p._jdf.queryExecution().executedPlan().toString() or \
           len(cached_deps(p)) == 1
    # ...and releasable through the registry
    release_cached_deps(p)
    assert all(not d.is_cached for d in cached_deps(p))
