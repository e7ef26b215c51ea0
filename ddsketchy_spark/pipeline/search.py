"""BM25 corpus search — query-relevance scoring over a document table.

The retrieval primitive every corpus-curation loop eventually needs
(find the documents most relevant to a probe query: eval-set leakage
triage, topical subcorpus extraction, quality spot-checks). Classic
Okapi BM25 (Robertson & Walker 1994; the exact formula below is the
standard one from Robertson & Zaragoza 2009, "The Probabilistic
Relevance Framework: BM25 and Beyond").

Law (deterministic, fully DuckDB-re-derivable):
  - tokens are the non-empty ``split(text, ' ')`` words — the module-wide
    token law shared with ``pipeline/text.py`` (token_stats, unigram LM).
  - scoreable docs: ``id_col`` and ``text_col`` both non-NULL. N = their
    count; ``dl`` = the doc's non-empty token count; ``avgdl`` = avg(dl).
  - per query term t: ``tf_t`` = number of tokens equal to t,
    ``df_t`` = number of scoreable docs with tf_t > 0,
    ``idf_t = ln(1 + (N - df_t + 0.5) / (df_t + 0.5))``  (>= ln 1 = 0).
  - ``bm25 = sum_t idf_t * tf_t*(k1+1) / (tf_t + k1*(1 - b + b*dl/avgdl))``
    summed in the query's term order (fixed-order arithmetic so an
    independent engine reproduces the double exactly).

Scale shape (100 TB document table):
  - tf_t is ONE ``regexp_count`` per term under the proven
    split-equivalence law (`text._token_count_regex`, single-token
    alternative) — whole-stage codegen, zero explode, zero shuffle.
  - corpus statistics (N, avgdl, every df_t) collapse into ONE scalar
    aggregate (map-side partial -> 1 row), broadcast back via crossJoin.
  - scoring is then a pure projection; total cost = 2 scans of (id, text)
    and a 1-row shuffle. Top-k uses orderBy+limit (TakeOrdered: per
    partition heaps, no global sort shuffle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .text import _token_count_regex, _words


def _check_terms(terms: list[str]) -> list[str]:
    out: list[str] = []
    for t in terms:
        if not t or " " in t:
            raise ValueError(
                f"query terms must be non-empty and space-free under the "
                f"split-on-space token law, got {t!r}")
        if t not in out:  # dedup, preserve first-seen order
            out.append(t)
    if not out:
        raise ValueError("query must contain at least one term")
    return out


def bm25_scores(
    df: DataFrame,
    query: str | list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Score every scoreable document against ``query``.

    Returns (id_col, dl, matched_terms, bm25): dl = non-empty token
    count, matched_terms = number of distinct query terms present,
    bm25 rounded to 6 dp (oracle convention). Docs matching no term
    score exactly 0.0 (kept — the caller filters or top-ks).
    """
    terms = _check_terms(
        [t for t in query.split(" ") if t] if isinstance(query, str)
        else list(query))
    k1 = float(k1)
    b = float(b)

    toks = _words(text_col)
    # dl under the non-empty token law: per-row HOF filter is fine in a
    # projection (CodegenFallback only hurts on pair-expanded frames),
    # and this frame never self-joins.
    dl = F.size(F.filter(toks, lambda x: x != ""))
    base = (df.where(F.col(id_col).isNotNull() & F.col(text_col).isNotNull())
            .select(F.col(id_col),
                    dl.alias("dl"),
                    *[F.regexp_count(F.col(text_col),
                                     F.lit(_token_count_regex([t])))
                      .alias(f"_tf{i}")
                      for i, t in enumerate(terms)]))

    # ONE scalar aggregate carries every corpus statistic.
    stats = base.agg(
        F.count(F.lit(1)).alias("_n"),
        F.avg("dl").alias("_avgdl"),
        *[F.sum((F.col(f"_tf{i}") > 0).cast("long")).alias(f"_df{i}")
          for i in range(len(terms))])

    scored = base.crossJoin(F.broadcast(stats))
    norm = F.col("dl").cast("double") / F.col("_avgdl")
    score = F.lit(0.0)
    for i in range(len(terms)):
        tf = F.col(f"_tf{i}").cast("double")
        dfc = F.col(f"_df{i}").cast("double")
        idf = F.log(F.lit(1.0) + (F.col("_n") - dfc + F.lit(0.5))
                    / (dfc + F.lit(0.5)))
        score = score + idf * tf * F.lit(k1 + 1.0) / (
            tf + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * norm))
    matched = sum(
        (F.col(f"_tf{i}") > 0).cast("int") for i in range(len(terms)))
    return scored.select(
        id_col, "dl",
        matched.alias("matched_terms"),
        F.round(score, 6).alias("bm25"))


def tfidf_keywords(
    df: DataFrame,
    k: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
    persist: bool = False,
) -> DataFrame:
    """Top-k characteristic terms per document by TF-IDF — the corpus
    summarization / topical-tagging primitive (what is each doc about,
    relative to THIS corpus?).

    Law (deterministic, fully DuckDB-re-derivable):
      - tokens: non-empty ``split(text, ' ')`` (the shared token law);
        scoreable docs have non-NULL id and text; N = their count.
      - ``tf(d,t)`` = tokens of d equal to t; ``df_t`` = docs containing
        t; ``idf_t = ln((1 + N) / (1 + df_t)) + 1`` (the smoothed,
        never-negative variant) — ``score = tf * idf`` in that exact
        arithmetic order.
      - per doc: top-k by (score DESC, term ASC) — a total order, so the
        selection is bit-reproducible.

    Output: one row per kept term — (id, rank 1..k, term, score).
    Docs with no non-empty tokens emit nothing.

    Scale shape: one explode into a map-side-combining (doc, term) count
    (shuffle O(doc-term pairs) — inherent to the statistic), a term-keyed
    aggregate for df (shuffle O(distinct terms), Zipf-friendly), one
    term-keyed join back (AQE picks broadcast when the vocabulary is
    small), and the per-doc top-k is collect_list + sort_array + slice
    inside ONE aggregate — no window, no per-doc full sort of anything
    but its own term list. The df branch and the score branch both
    derive from the tf frame; with the default ``persist=False`` Spark
    recomputes tf's explode for each (two scans of (id, text), plus a
    cheap 2-column count for N — the ``unigram_logprob_scores``
    multi-pass precedent). ``persist=True`` caches the tf frame so the
    corpus text is scanned ONCE; release it afterwards via
    ``pipeline.cache.release_cached_deps(result)``."""
    from .cache import tag_cached_deps

    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    toks = (df.where(F.col(id_col).isNotNull() & F.col(text_col).isNotNull())
            .select(id_col, F.explode(_words(text_col)).alias("_t"))
            .where(F.col("_t") != ""))
    tf = toks.groupBy(id_col, "_t").agg(F.count(F.lit(1)).alias("_tf"))
    if persist:
        tf = tf.persist()
    n = (df.where(F.col(id_col).isNotNull()
                  & F.col(text_col).isNotNull())
         .agg(F.count(F.lit(1)).alias("_n")))
    dfreq = tf.groupBy("_t").agg(F.count(F.lit(1)).alias("_df"))
    idf = (F.log((F.lit(1.0) + F.col("_n"))
                 / (F.lit(1.0) + F.col("_df"))) + F.lit(1.0))
    scored = (tf.join(dfreq, "_t").crossJoin(F.broadcast(n))
              .select(id_col,
                      F.struct(
                          (-(F.col("_tf").cast("double") * idf)).alias("s"),
                          F.col("_t").alias("t")).alias("_st")))
    top = scored.groupBy(id_col).agg(
        F.slice(F.sort_array(F.collect_list("_st")), 1, int(k)).alias("_ks"))
    ex = top.select(id_col, F.posexplode("_ks").alias("_pos", "_kw"))
    out = ex.select(
        id_col, (F.col("_pos") + 1).cast("long").alias("rank"),
        F.col("_kw.t").alias("term"),
        (-F.col("_kw.s")).alias("score"))
    return tag_cached_deps(out, [tf]) if persist else out


def bm25_topk(
    df: DataFrame,
    query: str | list[str],
    k: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Top-k most relevant documents, deterministic tie-break
    (bm25 DESC, id ASC) so independent engines select the same set."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    s = bm25_scores(df, query, text_col=text_col, id_col=id_col, k1=k1, b=b)
    return s.orderBy(F.desc("bm25"), F.asc(id_col)).limit(int(k))
