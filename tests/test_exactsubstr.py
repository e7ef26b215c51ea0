"""Span-level substring dedup — ExactSubstr rewrite (pipeline/dedup.py:
substring_shared_spans / rewrite_shared_spans / dedup_substring(rewrite=True)).

The law under test: every maximal byte-equal run >= min_len between two
documents' raw texts is found (winnowing guarantee) and verified exactly
(byte comparison, never hash trust), and the rewrite cuts exactly those
runs from the pair's later document (keep-first). The fuzz test pins the
span set against a brute-force all-diagonals scan.
"""

import random

import pytest

from pyspark.sql import functions as F


def _brute_force_spans(ta: str, tb: str, min_len: int):
    """All maximal byte-equal runs >= min_len between ta and tb, by
    scanning every diagonal. Returns {(a_start, b_start, length)}."""
    a, b = ta.encode(), tb.encode()
    out = set()
    for diag in range(-(len(a) - 1), len(b)):
        lo = max(0, -diag)
        hi = min(len(a), len(b) - diag)
        run = 0
        for p in range(lo, hi + 1):
            if p < hi and a[p] == b[p + diag]:
                run += 1
                continue
            if run >= min_len:
                out.add((p - run, p - run + diag, run))
            run = 0
    return out


def _mk_docs(seed: int, n_docs: int = 14):
    """Docs assembled from a shared sentence pool: same consecutive
    sentence subsequences => genuine long shared runs at many diagonals."""
    rng = random.Random(seed)
    pool = [f"sentence {i} with some filler words number {i * 37} here."
            for i in range(9)]
    docs = []
    for d in range(n_docs):
        parts = [pool[rng.randrange(len(pool))]
                 for _ in range(rng.randrange(3, 9))]
        docs.append((d + 1, " ".join(parts) + f" tail{d}"))
    return docs


def test_spans_match_brute_force_fuzz(spark):
    """Fuzz parity: the distributed span pipeline reports EXACTLY the
    maximal shared runs >= min_len that a brute-force all-diagonals byte
    scan finds, across several seeds."""
    from ddsketchy_spark.pipeline.dedup import substring_shared_spans

    min_len = 40
    for seed in (3, 11, 29):
        docs = _mk_docs(seed)
        df = spark.createDataFrame(docs, "doc_id long, text string")
        got = {(r["id_a"], r["id_b"], r["a_start"], r["b_start"], r["length"])
               for r in substring_shared_spans(df, min_len=min_len).collect()}
        want = set()
        for i in range(len(docs)):
            for j in range(i + 1, len(docs)):
                ia, ta = docs[i]
                ib, tb = docs[j]
                for a_s, b_s, ln in _brute_force_spans(ta, tb, min_len):
                    want.add((ia, ib, a_s, b_s, ln))
        assert got == want, f"seed {seed}: {got ^ want}"


def test_rewrite_cuts_exact_span_keep_first(spark):
    """A planted verbatim span: the earlier doc keeps its copy
    byte-identical, the later doc loses EXACTLY the maximal shared run."""
    from ddsketchy_spark.pipeline.dedup import dedup_substring

    shared = ("the shared span of text that was copied verbatim between "
              "two documents and must be cut from the later one exactly")
    d1 = "first document intro X" + shared + "X first outro"
    d2 = "second doc with a longer different intro Y" + shared + "Y other"
    df = spark.createDataFrame(
        [(1, d1), (2, d2), (3, "an unrelated document with its own words"),
         (None, "null id passes through"), (4, None)],
        "doc_id long, text string")
    out = {r["doc_id"]: r for r in
           dedup_substring(df, min_len=32, rewrite=True).collect()}
    assert out[1]["text"] == d1 and out[1]["n_cut_spans"] == 0
    assert out[2]["text"] == d2.replace(shared, "")
    assert out[2]["n_cut_spans"] == 1
    assert out[2]["n_cut_bytes"] == len(shared)
    assert out[3]["text"].startswith("an unrelated")
    assert out[3]["n_cut_spans"] == 0
    assert out[None]["text"] == "null id passes through"
    assert out[4]["text"] is None and out[4]["n_cut_spans"] == 0
    assert len(out) == 5


def test_rewrite_merges_overlapping_cuts(spark):
    """One later doc sharing overlapping spans with TWO earlier docs:
    cuts merge into one interval; counters reflect the merge."""
    from ddsketchy_spark.pipeline.dedup import rewrite_shared_spans

    s1 = "alpha beta gamma delta epsilon zeta eta theta iota kappa "
    s2 = "epsilon zeta eta theta iota kappa lambda mu nu xi omicron pi "
    # doc 3 contains s1 followed by the tail of s2 that overlaps s1's end
    t3 = "C-doc prefix Q" + s1 + s2[len("epsilon zeta eta theta iota kappa "):] + "Q tail"
    df = spark.createDataFrame(
        [(1, "one A" + s1 + "A end"), (2, "two B" + s2 + "B end"), (3, t3)],
        "doc_id long, text string")
    out = {r["doc_id"]: r for r in
           rewrite_shared_spans(df, min_len=24).collect()}
    assert out[1]["n_cut_spans"] == 0  # keep-first: smallest id untouched
    # docs 1 and 2 themselves share the 34-byte "epsilon..kappa " overlap
    assert out[2]["n_cut_spans"] == 1
    assert "epsilon zeta eta theta iota kappa" not in out[2]["text"]
    # doc 3's two cuts (vs doc 1, vs doc 2) overlap -> merged into ONE
    assert out[3]["n_cut_spans"] == 1
    assert out[3]["n_cut_bytes"] > len(s1)
    # no fragment of either shared sentence chain survives in doc 3
    assert "epsilon zeta eta theta iota kappa" not in out[3]["text"]
    assert out[3]["text"].startswith("C-doc prefix ")
    assert out[3]["text"].endswith(" tail")


def test_rewrite_utf8_boundary_snap(spark):
    """A shared run whose byte boundary would split a multi-byte char:
    the cut snaps inward and the rewritten text stays valid UTF-8."""
    from ddsketchy_spark.pipeline.dedup import rewrite_shared_spans

    # shared run ends inside the 2-byte char 'é' context: doc2 continues
    # with é after the shared part, doc1 with a plain char
    shared = "completely identical stretch of forty-eight bytes!"
    d1 = "first – intro A" + shared + "Z épilogue un"
    d2 = "second — other intro B" + shared + "é suite deux"
    df = spark.createDataFrame([(1, d1), (2, d2)],
                               "doc_id long, text string")
    rows = rewrite_shared_spans(df, min_len=32).collect()
    out = {r["doc_id"]: r for r in rows}
    assert out[1]["text"] == d1
    # rewritten text decodes (mapInArrow already decoded it) and dropped
    # the shared stretch
    assert shared not in out[2]["text"]
    assert out[2]["text"].encode("utf-8").decode("utf-8") == out[2]["text"]
    assert out[2]["n_cut_bytes"] >= len(shared) - 3


def test_below_min_len_not_cut(spark):
    from ddsketchy_spark.pipeline.dedup import rewrite_shared_spans

    shared = "short shared piece"  # 18 bytes < min_len=32
    df = spark.createDataFrame(
        [(1, "aa X" + shared + "X bb cccccccccccccccccccc"),
         (2, "dd Y" + shared + "Y ee fffffffffffffffffffff")],
        "doc_id long, text string")
    out = {r["doc_id"]: r for r in
           rewrite_shared_spans(df, min_len=32).collect()}
    assert out[1]["n_cut_spans"] == 0 and out[2]["n_cut_spans"] == 0
    assert shared in out[2]["text"]


def test_doc_level_mode_unchanged(spark):
    """rewrite=False keeps the r4 doc-level contract (id, component,
    keep) — the two modes coexist."""
    from ddsketchy_spark.pipeline.dedup import dedup_substring

    shared = ("a long enough verbatim overlap that links the documents "
              "into one duplicate cluster for the doc-level policy mode")
    df = spark.createDataFrame(
        [(1, "p " + shared + " q"), (2, "r " + shared + " s"),
         (3, "totally different text without any overlap at all here")],
        "doc_id long, text string")
    out = {r["doc_id"]: (r["component"], r["keep"]) for r in
           dedup_substring(df, min_len=32).collect()}
    assert out[1] == (1, True)
    assert out[2] == (1, False)
    assert out[3] == (3, True)
