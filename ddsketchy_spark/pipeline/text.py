"""Text-analysis operators for training-data pipelines.

All hot paths are native Spark SQL expressions (whole-stage codegen); the
only Python is the winnowing fingerprint (vectorized NumPy over Arrow
batches). Designed for 100 TB document tables: every operator is a pure
row-wise projection (no shuffle) except the aggregations the caller adds.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pyarrow as pa

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import LongType, StructField, StructType

from .chunking import iter_doc_chunks

# Small public stopword marker sets per language (language-ID heuristic).
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "a", "in", "is", "that", "it", "for"),
    "de": ("der", "die", "und", "das", "ist", "nicht", "ein", "mit", "sich", "auf"),
    "es": ("el", "la", "de", "que", "y", "en", "un", "por", "con", "para"),
    "fr": ("le", "la", "et", "les", "des", "un", "une", "est", "pour", "dans"),
    "zh": ("de", "shi", "bu", "le", "zai", "ren", "you", "wo", "ta", "zhe"),
}

STOPWORDS = ("the", "a", "and", "of", "to", "in", "is", "it")


def _words(text_col: str):
    return F.split(F.col(text_col), " ")


def _token_count_regex(tokens) -> str:
    """Java regex counting occurrences of any of ``tokens`` under the
    split-on-single-space law: a match is a token bounded by start-of-input
    or one space on the left and one space or end-of-input on the right.
    ``\\z`` (not ``$``) so a trailing newline is NOT a boundary — exactly
    like ``split(text, ' ')`` equality; the right bound is a zero-width
    lookahead so consecutive stopwords ("of the") both count; empty tokens
    from doubled spaces never match. One regexp_count stays inside
    whole-stage codegen, where the equivalent filter() HOF lambda is a
    CodegenFallback evaluated interpreted per element (measured: 316k vs
    226k docs/s on the 50k bench corpus for the stopword count)."""
    import re as _re

    alt = "|".join(_re.escape(t) for t in tokens)
    return f"(?:^| )(?:{alt})(?= |\\z)"


def token_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-row token counts: whitespace tokens and a BPE-ish regex count
    (alpha runs + digit runs), plus character length."""
    return df.withColumns(
        {
            "n_ws_tokens": F.size(_words(text_col)),
            "n_re_tokens": F.size(F.regexp_extract_all(F.col(text_col), F.lit("[a-z]+|[0-9]+"), 0)),
            "n_chars_calc": F.length(F.col(text_col)),
        }
    )


def quality_scores(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic quality features: mean word length, stopword ratio,
    punctuation ratio. Pure whole-stage-codegen projections — the total
    stopword count is a single regexp_count under the split-on-space
    token law (``_token_count_regex``; r4: replaced the filter() HOF
    lambda, which was interpreted per element as a CodegenFallback —
    row-for-row identical on the 50k bench corpus, ~1.4x faster)."""
    words = _words(text_col)
    n = F.size(words)
    stop_arr = F.array(*[F.lit(w) for w in STOPWORDS])
    n_stop = F.size(F.array_intersect(words, stop_arr))  # distinct-hit count
    n_stop_total = F.regexp_count(F.col(text_col),
                                  F.lit(_token_count_regex(STOPWORDS)))
    punct = F.length(F.regexp_replace(F.col(text_col), "[^.,;:!?]", ""))
    return df.withColumns(
        {
            "n_words": n,
            "mean_word_len": (F.length(F.col(text_col)) - (n - 1)) / n,
            "stopword_ratio": n_stop_total / n,
            "distinct_stopwords": n_stop,
            "punct_ratio": punct / F.length(F.col(text_col)),
        }
    )


def quality_filter(
    df: DataFrame,
    text_col: str = "text",
    min_words: int = 5,
    max_words: int = 50_000,
    min_mean_word_len: float = 2.0,
    max_mean_word_len: float = 12.0,
    min_stopword_ratio: float = 0.0,
    max_punct_ratio: float = 0.5,
    max_dup_ngram_frac: dict[int, float] | None = None,
    max_dup_line_frac: float | None = None,
) -> DataFrame:
    """Gopher/C4-style heuristic corpus filter: the keep/drop stage of a
    training-data pipeline, with an auditable drop reason.

    Appends ``drop_reason`` (first tripped rule in fixed precedence:
    null_text > too_few_words > too_many_words > short_words > long_words >
    low_stopword > high_punct > dup_ngram_{n} (ascending n) > dup_line >
    kept) and ``keep``. A pure projection over ``quality_scores`` — no
    shuffle, whole-stage codegen, fully SQL-expressible for oracle parity.
    Ratios are compared at 6 dp so the decision is reproducible
    bit-for-bit across engines.

    The Gopher REPETITION rules are opt-in (they add per-doc n-gram
    construction to the projection — still row-local codegen, but not
    free): ``max_dup_ngram_frac={n: frac, ...}`` drops docs whose
    ``dup_ngram_frac_{n}`` (``repetition_scores``) exceeds ``frac`` with
    reason ``dup_ngram_{n}``; ``max_dup_line_frac`` does the same for
    ``dup_line_frac`` with reason ``dup_line``. ``clean_corpus`` forwards
    both via its ``quality_kw``."""
    scored = quality_scores(df, text_col)
    rep_ns = tuple(sorted(max_dup_ngram_frac)) if max_dup_ngram_frac else ()
    if rep_ns or max_dup_line_frac is not None:
        scored = repetition_scores(scored, text_col, ns=rep_ns)

    def r6(c):
        return F.round(c, 6)

    rules = [
        (F.col(text_col).isNull(), "null_text"),
        (F.col("n_words") < min_words, "too_few_words"),
        (F.col("n_words") > max_words, "too_many_words"),
        (r6(F.col("mean_word_len")) < min_mean_word_len, "short_words"),
        (r6(F.col("mean_word_len")) > max_mean_word_len, "long_words"),
        (r6(F.col("stopword_ratio")) < min_stopword_ratio, "low_stopword"),
        (r6(F.col("punct_ratio")) > max_punct_ratio, "high_punct"),
    ]
    for n in rep_ns:
        # repetition_scores already rounds to 6 dp — compare as-is
        rules.append((F.col(f"dup_ngram_frac_{n}") > max_dup_ngram_frac[n],
                      f"dup_ngram_{n}"))
    if max_dup_line_frac is not None:
        rules.append((F.col("dup_line_frac") > max_dup_line_frac,
                      "dup_line"))
    reason = F.when(rules[0][0], rules[0][1])
    for cond, label in rules[1:]:
        reason = reason.when(cond, label)
    reason = reason.otherwise("kept")
    return (scored.withColumn("drop_reason", reason)
            .withColumn("keep", F.col("drop_reason") == "kept"))


def clean_lines(
    df: DataFrame,
    text_col: str = "text",
    line_sep: str = "\n",
    min_line_words: int = 5,
    require_terminal_punct: bool = True,
    line_blocklist: tuple[str, ...] = ("javascript",),
    min_kept_lines: int = 3,
    page_blocklist: tuple[str, ...] = ("lorem ipsum", "{"),
    out_col: str = "clean_text",
) -> DataFrame:
    """C4-style LINE-level cleaning (Raffel et al. 2020 §2.2): rewrite each
    document by dropping bad lines, then drop pages that no longer have
    enough substance — the published cleaning stage between raw crawl text
    and the doc-level ``quality_filter``.

    Line rules (a line survives only if ALL hold):

    - ends in a terminal punctuation mark (``. ! ? "`` after right-trim)
      when ``require_terminal_punct``;
    - has at least ``min_line_words`` words under the package-wide
      split-on-spaces law (``trim`` then split on space runs);
    - contains no ``line_blocklist`` phrase (case-insensitive — C4 drops
      any line with the word "javascript").

    Page rules (fixed precedence for ``drop_reason``): ``null_text`` >
    ``page_blocklist:<phrase>`` (case-insensitive substring of the
    ORIGINAL text — C4 drops pages containing "lorem ipsum" or "{") >
    ``too_few_lines`` (< ``min_kept_lines`` surviving lines — C4's
    three-sentence floor applied to kept lines) > ``kept``.

    Appends ``out_col`` (the surviving lines re-joined with ``line_sep``;
    empty string for NULL text — never a NULL string next to ``keep``),
    ``n_lines``, ``n_kept_lines``, ``drop_reason``, ``keep``. A pure
    row-wise projection — no shuffle, no Python. The line predicate is a
    ``filter`` HOF whose lambda references only its own variable and
    literals, the form that is safe on later self-joining frames
    (CLAUDE.md HOF law); it evaluates interpreted per LINE, which is fine
    in a per-row projection (lines/doc is small and bounded, unlike the
    per-candidate-pair HOFs dedup avoids). Expressible identically in
    ANSI SQL (``list_filter`` + the same regexes) for oracle parity.
    """
    import re as _re

    lines = F.split(F.col(text_col), _re.escape(line_sep))

    def line_ok(x):
        conds = []
        if require_terminal_punct:
            conds.append(F.rtrim(x).rlike('[.!?"]\\z'))
        conds.append(
            F.size(F.split(F.trim(x), " +")) >= F.lit(min_line_words))
        for phrase in line_blocklist:
            conds.append(~F.lower(x).contains(phrase.lower()))
        out = conds[0]
        for c in conds[1:]:
            out = out & c
        return out

    kept = F.filter(lines, line_ok)
    n_kept = F.coalesce(F.size(kept), F.lit(0))

    reason = F.when(F.col(text_col).isNull(), "null_text")
    for phrase in page_blocklist:
        reason = reason.when(
            F.lower(F.col(text_col)).contains(phrase.lower()),
            f"page_blocklist:{phrase}")
    reason = (reason.when(n_kept < min_kept_lines, "too_few_lines")
              .otherwise("kept"))
    return df.withColumns(
        {
            out_col: F.coalesce(F.array_join(kept, line_sep), F.lit("")),
            "n_lines": F.coalesce(F.size(lines), F.lit(0)),
            "n_kept_lines": n_kept,
            "drop_reason": reason,
            "keep": reason == "kept",
        }
    )


def remove_boilerplate_lines(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    line_sep: str = "\n",
    min_docs: int = 10,
    min_chars: int = 5,
    group_col: str | None = None,
    engine: str = "auto",
    max_broadcast_lines: int = 500_000,
) -> DataFrame:
    """Corpus-FREQUENCY boilerplate removal (the RefinedWeb/CCNet
    line-dedup stage): any line that appears in >= ``min_docs`` DISTINCT
    documents (matched on ``md5(lower(trim(line)))``) is treated as
    navigation/cookie/footer boilerplate and EVERY occurrence is removed
    from every document — unlike ``dedup.dedup_paragraphs``, whose
    keep-first law preserves one copy of duplicated CONTENT. Lines
    shorter than ``min_chars`` trimmed characters are never candidates
    (blank/spacing lines survive). ``line_sep`` is a literal (regex-
    escaped). Requires ``min_docs >= 2`` — a threshold of 1 would delete
    every eligible line.

    ``group_col`` scopes the frequency count WITHIN each group — the
    RefinedWeb formulation, where a line repeated across one SITE
    (domain) is boilerplate but the same sentence appearing on unrelated
    sites may be legitimate content: a line is removed from a document
    only when it reaches ``min_docs`` distinct documents in that
    document's own group. Rows with a NULL group can never reach a
    within-group threshold and pass through untouched.

    Returns ``df`` with ``text_col`` rewritten (surviving lines re-joined
    with ``line_sep``; a doc whose every line was boilerplate becomes "")
    plus ``n_boiler_removed``. NULL-text and NULL-id rows pass through
    untouched.

    Scale shape — the document TEXT never shuffles in either engine: only
    (hash, doc_id, pos) rows (~28 B each) explode; the per-hash document
    frequency is distinct-then-count (both map-side combining —
    ``countDistinct`` per group or a window would pin a
    billion-occurrence cookie banner's hash partition to one task).

    ``engine`` picks how removals reach the text:

    - ``"broadcast"`` (what ``"auto"`` picks when the boiler-LINE count
      is <= ``max_broadcast_lines``): the distinct boilerplate hashes —
      small by construction, bounded by total_lines/min_docs and in
      practice a few thousand banners — are collected once and broadcast
      as a plain set; the rewrite is one mapInArrow projection over
      ``df`` that re-hashes each doc's lines locally. NO join, NO
      shuffle, NO HOF — the returned frame is a single narrow map stage,
      safe to self-join. This is the 100-TB shape: a banner on every one
      of 1B docs is still just one broadcast hash.
    - ``"join"``: positions-to-remove are joined back per doc. Correct
      at any boiler-set size, but when boilerplate is PERVASIVE the
      losers frame is one row per affected doc — corpus-cardinality —
      and the join back plans as a sort-merge that shuffles the text.
      Use only when the boiler set itself exceeds driver memory. The
      rewrite is a HOF lambda over the joined loser array, so do not
      SELF-JOIN the returned frame directly (the DeduplicateRelations/
      HOF binding trap, CLAUDE.md); materialize or localCheckpoint
      first.
    - ``"auto"``: bounded probe (``limit(max_broadcast_lines+1)``) on
      the boiler frame, then broadcast if it fits, else join (the probe
      is one extra small aggregate in that rare fallback).

    Both engines implement the identical law bit-for-bit (md5 of
    space-trimmed, lowercased UTF-8 lines; parity is fuzz-tested)."""
    import re as _re

    if min_docs < 2:
        raise ValueError(f"min_docs must be >= 2, got {min_docs} — "
                         "1 would remove every eligible line")
    if engine not in ("auto", "broadcast", "join"):
        raise ValueError(f"unknown engine {engine!r}: "
                         "expected 'auto', 'broadcast', or 'join'")
    sep_re = _re.escape(line_sep)
    eligible = F.col(text_col).isNotNull() & F.col(id_col).isNotNull()
    gcols = [group_col] if group_col else []
    if group_col:
        eligible = eligible & F.col(group_col).isNotNull()
    lines = (df.where(eligible)
             .select(id_col, *gcols,
                     F.posexplode(F.split(F.col(text_col), sep_re))
                     .alias("_pos", "_l"))
             .where(F.length(F.trim(F.col("_l"))) >= min_chars)
             .select(id_col, *gcols, "_pos",
                     F.md5(F.lower(F.trim(F.col("_l")))).alias("_h")))
    boiler = (lines.select("_h", *gcols, id_col).distinct()
              .groupBy("_h", *gcols)
              .agg(F.count(F.lit(1)).alias("_docs"))
              .where(F.col("_docs") >= min_docs)
              .select("_h", *gcols))

    if engine != "join":
        probe = boiler.limit(max_broadcast_lines + 1).collect()
        if len(probe) <= max_broadcast_lines:
            return _boiler_broadcast_rewrite(
                df, probe, text_col, id_col, group_col, line_sep, min_chars)
        if engine == "broadcast":
            raise ValueError(
                f"remove_boilerplate_lines: boiler-line count exceeds "
                f"max_broadcast_lines={max_broadcast_lines}; raise the cap "
                "or use engine='join'")

    losers = (lines.join(boiler, ["_h", *gcols])
              .groupBy(id_col)
              .agg(F.collect_set("_pos").alias("_boiler_pos")))
    joined = df.join(losers, id_col, "left")
    parts = F.split(F.col(text_col), sep_re)
    pos_arr = F.col("_boiler_pos")
    kept = F.filter(parts, lambda x, i: ~F.array_contains(pos_arr, i))
    new_text = (F.when(pos_arr.isNull() | ~eligible, F.col(text_col))
                .otherwise(F.array_join(kept, line_sep)))
    return (joined
            .withColumn("n_boiler_removed",
                        F.coalesce(F.size("_boiler_pos"),
                                   F.lit(0)).cast("long"))
            .withColumn(text_col, new_text)
            .drop("_boiler_pos")
            .select(*df.columns, "n_boiler_removed"))


def _boiler_broadcast_rewrite(
    df: DataFrame,
    boiler_rows,
    text_col: str,
    id_col: str,
    group_col: str | None,
    line_sep: str,
    min_chars: int,
) -> DataFrame:
    """Broadcast-set rewrite engine for ``remove_boilerplate_lines``: the
    collected boiler rows (``_h`` [, group]) become a broadcast frozenset
    and the rewrite is ONE mapInArrow projection over ``df`` — the text
    is re-split and re-hashed locally per task, so nothing ever shuffles
    and the result frame is self-join-safe (no HOF, no join).

    The Python-side normalization reproduces the JVM law exactly:
    Spark ``trim`` strips 0x20 spaces only -> ``str.strip(' ')``;
    ``lower``/``length``/``md5(utf-8)`` agree between Java and Python on
    Unicode default case conversion (parity fuzz-tested alongside the
    join engine)."""
    from pyspark.sql.types import LongType, StructField, StructType

    if group_col:
        bset = frozenset((r[1], r[0]) for r in boiler_rows)
    else:
        bset = frozenset(r[0] for r in boiler_rows)
    bc = df.sparkSession.sparkContext.broadcast(bset)
    names = df.columns
    out_schema = StructType(list(df.schema.fields)
                            + [StructField("n_boiler_removed", LongType())])
    ti = names.index(text_col)
    ii = names.index(id_col)
    gi = names.index(group_col) if group_col else None
    sep, mc, grouped = line_sep, min_chars, group_col is not None

    def rewrite(batches):
        import hashlib

        import pyarrow as pa

        bs = bc.value
        for batch in batches:
            texts = batch.column(ti).to_pylist()
            ids_null = batch.column(ii).is_null().to_pylist()
            groups = batch.column(gi).to_pylist() if grouped else None
            new_texts = []
            removed = []
            for i, t in enumerate(texts):
                g = groups[i] if grouped else None
                if t is None or ids_null[i] or (grouped and g is None):
                    new_texts.append(t)
                    removed.append(0)
                    continue
                kept = []
                n_rm = 0
                for line in t.split(sep):
                    s = line.strip(" ")
                    if len(s) >= mc:
                        h = hashlib.md5(
                            s.lower().encode("utf-8")).hexdigest()
                        if ((g, h) if grouped else h) in bs:
                            n_rm += 1
                            continue
                    kept.append(line)
                new_texts.append(sep.join(kept) if n_rm else t)
                removed.append(n_rm)
            arrs = list(batch.columns)
            arrs[ti] = pa.array(new_texts, type=batch.column(ti).type)
            arrs.append(pa.array(removed, type=pa.int64()))
            yield pa.RecordBatch.from_arrays(
                arrs, names=names + ["n_boiler_removed"])

    return df.mapInArrow(rewrite, out_schema)


def lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Marker-word language ID: count hits per language, fixed-precedence
    argmax (en > de > es > fr > zh on ties). Deterministic and expressible
    identically in ANSI SQL for oracle parity. Hit counts are one
    regexp_count per language under the split-on-space token law
    (``_token_count_regex``; r4: replaced the interpreted filter() HOF
    lambdas — row-for-row identical on the 50k bench corpus)."""
    hit_cols = {}
    for lang, markers in LANG_MARKERS.items():
        hit_cols[f"hits_{lang}"] = F.regexp_count(
            F.col(text_col), F.lit(_token_count_regex(markers)))
    out = df.withColumns(hit_cols)
    langs = list(LANG_MARKERS)
    # fixed precedence CASE: first listed language wins ties
    pred = None
    for lang in langs:
        conds = [F.col(f"hits_{lang}") >= F.col(f"hits_{o}") for o in langs if o != lang]
        allc = conds[0]
        for c in conds[1:]:
            allc = allc & c
        pred = F.when(allc, F.lit(lang)) if pred is None else pred.when(allc, F.lit(lang))
    pred = pred.otherwise(F.lit(langs[0]))
    return out.withColumn("pred_lang", pred)


def _gram_rows(df: DataFrame, text_col: str, n: int, gram_col: str,
               *extra_cols) -> DataFrame:
    """One row per word n-gram: the single codegen gram-build law
    (``transform(sequence(...), i -> array_join(slice(words, i+1, n)))``
    with NULL-text and too-short-doc guards) shared by ``ngram_counts``
    and ``contamination_pairs`` — their gram sets must never diverge."""
    words = _words(text_col)
    grams = F.transform(
        F.sequence(F.lit(0), F.size(words) - n),
        lambda i: F.array_join(F.slice(words, i + 1, n), " "))
    return (df.where(F.col(text_col).isNotNull())
            .where(F.size(words) >= n)
            .select(*extra_cols, F.explode(grams).alias(gram_col)))


def ngram_counts(
    df: DataFrame,
    n: int = 2,
    text_col: str = "text",
    top_k: int | None = None,
) -> DataFrame:
    """Corpus word-n-gram frequencies — (ngram, cnt), all native.

    n-grams are built inside codegen (``_gram_rows``), exploded, and
    counted with a map-side-combining hash aggregate; ``top_k`` adds a
    deterministic (cnt desc, ngram asc) TakeOrdered — no global sort.
    Shuffle volume is O(distinct n-grams), never O(rows x n-grams)."""
    out = (_gram_rows(df, text_col, n, "ngram")
           .groupBy("ngram").agg(F.count(F.lit(1)).alias("cnt")))
    if top_k is not None:
        out = out.orderBy(F.desc("cnt"), F.asc("ngram")).limit(top_k)
    return out


def array_pair_counts(
    df: DataFrame,
    arr_col: str,
    top_k: int | None = None,
) -> DataFrame:
    """Adjacent-pair frequencies over an array column — (a, b, cnt), the
    BPE merge-candidate statistic (Sennrich et al. 2016: the next merge is
    the corpus's most frequent adjacent symbol pair) computed over the
    input_hint token table's ``tokens: array<int32>``, or over word arrays
    for the DuckDB-oracled twin (``token_pairs_documents``).

    All native: pairs are built inside codegen — ``arrays_zip`` of the two
    shifted slices, so no per-element HOF lambda — then exploded and
    counted with a map-side-combining hash aggregate. Shuffle volume is
    O(distinct pairs) (Zipf-concentrated, never rows x length); ``top_k``
    adds a deterministic (cnt desc, a, b) TakeOrdered, no global sort.
    NULL arrays and arrays shorter than 2 contribute nothing. Element
    type is generic (int tokens and strings both work; NULL elements
    inside an array count like any other value)."""
    a = F.col(arr_col)
    n = F.size(a)
    pairs = F.when(n >= 2, F.arrays_zip(
        F.slice(a, 1, n - 1).alias("a"),
        F.slice(a, 2, n - 1).alias("b")))
    out = (df.where(a.isNotNull()).where(n >= 2)
           .select(F.explode(pairs).alias("p"))
           .select(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
           .groupBy("a", "b").agg(F.count(F.lit(1)).alias("cnt")))
    if top_k is not None:
        out = out.orderBy(F.desc("cnt"), F.asc("a"), F.asc("b")).limit(top_k)
    return out


def vocab_coverage(
    df: DataFrame,
    arr_col: str,
    vocab,
    by: list | None = None,
) -> DataFrame:
    """Vocabulary coverage / OOV-rate report over an array column —
    the tokenizer-fit statistic: of each group's tokens, how many fall
    outside ``vocab``? Returns one row per ``by`` group (or one global
    row) with ``n_tokens``, ``n_oov``, ``oov_rate_r6``.

    ``vocab`` is either a one-column DataFrame of in-vocab symbols or an
    int k — then the vocab is the corpus's own top-k most frequent
    symbols (ties broken symbol-ascending, deterministic on both
    engines), the usual "how well would a k-symbol vocab fit this
    corpus" question asked before committing a tokenizer (pairs with
    ``bpe.train_bpe_merges``, whose merge table's symbols can seed it).

    Scale shape: tokens explode once (pipeline-local, never a row
    shuffle), stream through ONE broadcast hash join against the
    bounded vocab (marked ``F.broadcast`` — k rows), and collapse in a
    map-side-combining aggregate, so the only exchange carries O(groups)
    rows. The top-k derivation is the same explode feeding a distinct-
    symbol count (shuffle = distinct symbols) + TakeOrdered. NULL arrays
    contribute nothing; NULL ``by`` keys group like any other value.
    NULL elements count as tokens and are always OOV (a NULL can never
    match a vocab entry) but never occupy a top-k vocab slot. The global
    form's single row reports ``oov_rate_r6 = -1.0`` (the package's
    no-NULL-doubles sentinel) when the corpus has zero tokens."""
    by = list(by or [])
    a = F.col(arr_col)
    toks = (df.where(a.isNotNull())
            .select(*by, F.explode(a).alias("_tok")))
    if isinstance(vocab, int):
        vocab_df = (toks.where(F.col("_tok").isNotNull())
                    .groupBy("_tok").agg(F.count(F.lit(1)).alias("_c"))
                    .orderBy(F.desc("_c"), F.asc("_tok")).limit(vocab)
                    .select("_tok"))
    else:
        if len(vocab.columns) != 1:
            raise ValueError("vocab DataFrame must have exactly one column")
        vocab_df = vocab.toDF("_tok").where(F.col("_tok").isNotNull())
    marked = toks.join(
        F.broadcast(vocab_df.distinct().withColumn("_inv", F.lit(1))),
        "_tok", "left")
    return (marked.groupBy(*by).agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.coalesce(
            F.sum(F.when(F.col("_inv").isNull(), 1).otherwise(0)),
            F.lit(0)).alias("n_oov"))
        .select(*by, "n_tokens", "n_oov",
                F.when(F.col("n_tokens") > 0,
                       F.round(F.col("n_oov") / F.col("n_tokens"), 6))
                 .otherwise(F.lit(-1.0)).alias("oov_rate_r6")))


# (placeholder, pattern) — ordered: emails first (an address would
# otherwise have its digit runs partially eaten by the phone pattern).
# Patterns stay in the common Java-regex/RE2 subset (no backreferences, no
# lookaround) so the DuckDB oracle can run them verbatim.
PII_PATTERNS: tuple[tuple[str, str], ...] = (
    ("EMAIL", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"),
    ("IP", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"),
    ("PHONE", r"\+\d[\d\- ]{7,}\d"),
)


def redact_pii(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Corpus PII scrubbing: emails, IPv4 addresses, and international
    phone numbers replaced with ``[EMAIL]``/``[IP]``/``[PHONE]`` tokens.

    Appends ``text_redacted`` plus per-type match counts
    (``n_email``/``n_ip``/``n_phone``, counted BEFORE replacement) and
    ``n_pii``. Pure regexp projections — whole-stage codegen, no shuffle,
    NULL text passes through as NULL. Heuristic patterns (the
    deterministic, oracle-checkable core of a PII pass); a production
    pipeline layers NER on top for names/addresses."""
    redacted = F.col(text_col)
    counts = {}
    for name, pat in PII_PATTERNS:
        counts[f"n_{name.lower()}"] = F.coalesce(
            F.size(F.regexp_extract_all(redacted, F.lit(pat), 0)), F.lit(0))
        redacted = F.regexp_replace(redacted, pat, f"[{name}]")
    total = None
    for c in counts.values():
        total = c if total is None else total + c
    return df.withColumns({**counts, "n_pii": total,
                           "text_redacted": redacted})


def contamination_pairs(
    corpus: DataFrame,
    benchmark: DataFrame,
    n: int = 13,
    text_col: str = "text",
    corpus_id: str = "doc_id",
    bench_id: str = "doc_id",
) -> DataFrame:
    """(corpus_id, bench_id) pairs sharing at least one word n-gram — the
    GPT-3-style contamination criterion (13-gram overlap by default).

    All native: both sides build n-grams inside codegen (same transform/
    slice law as ``ngram_counts``), hash them to one BIGINT with xxhash64,
    and inner-join on the hash. The benchmark side is tiny by construction
    (eval sets are small) — mark it broadcast-able and Spark ships only
    its distinct gram hashes; the corpus side streams through the join
    with no shuffle. Output deduplicates to one row per (corpus doc,
    benchmark doc)."""
    def grams(df, id_col, out_id):
        # the SAME gram-build law as ngram_counts (_gram_rows), hashed to
        # one BIGINT so the join key is 8 bytes, deduped per doc
        return (_gram_rows(df, text_col, n, "gram",
                           F.col(id_col).alias(out_id))
                .withColumn("gram", F.xxhash64("gram"))
                .dropDuplicates([out_id, "gram"]))

    cg = grams(corpus, corpus_id, "corpus_id")
    bg = grams(benchmark, bench_id, "bench_id")
    return (cg.join(F.broadcast(bg), "gram")
            .select("corpus_id", "bench_id")
            .dropDuplicates(["corpus_id", "bench_id"]))


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    n: int = 13,
    text_col: str = "text",
    corpus_id: str = "doc_id",
    bench_id: str = "doc_id",
) -> DataFrame:
    """Drop every corpus document sharing an n-gram with the benchmark —
    test-set decontamination for training data. Left-anti join against the
    contaminated id set; rows with NULL text pass through (they cannot
    contain benchmark text)."""
    bad = (contamination_pairs(corpus, benchmark, n, text_col,
                               corpus_id, bench_id)
           .select(F.col("corpus_id").alias(corpus_id)).distinct())
    return corpus.join(bad, corpus_id, "left_anti")


def repetition_scores(
    df: DataFrame,
    text_col: str = "text",
    ns: tuple[int, ...] = (2, 3),
    line_sep: str = "\n",
) -> DataFrame:
    """Gopher-style intra-document repetition metrics — the quality
    signals that catch degenerate/boilerplate generations:

    - ``dup_ngram_frac_{n}`` for each n in ``ns``: fraction of the
      document's word n-grams that are repeats
      (``1 - distinct/total``; 0.0 when the doc has no n-grams).
    - ``dup_line_frac``: same over ``line_sep``-separated lines.

    Pure codegen projections (per-doc ``transform``/``array_distinct`` on
    the words array — no explode, no shuffle, no Python), rounded to 6 dp
    so the decision is bit-reproducible across engines; NULL text yields
    0.0 everywhere (never NULL doubles — oracle-comparator convention)."""
    words = _words(text_col)

    def frac(total_expr, distinct_expr):
        return F.coalesce(
            F.round(F.lit(1.0) - distinct_expr / total_expr, 6), F.lit(0.0))

    def gram_lambda(n):
        # a closure, NOT a default arg: pyspark counts the lambda's
        # parameters to pick the (element) vs (element, index) transform
        # form, so `lambda i, _n=n` would silently become the 2-arg form
        return lambda i: F.array_join(F.slice(words, i + 1, n), " ")

    cols = {}
    for n in ns:
        grams = F.transform(
            F.sequence(F.lit(0), F.size(words) - n), gram_lambda(n))
        grams = F.when(F.col(text_col).isNotNull()
                       & (F.size(words) >= n), grams)
        cols[f"dup_ngram_frac_{n}"] = frac(
            F.size(grams).cast("double"),
            F.size(F.array_distinct(grams)).cast("double"))
    import re as _re

    # LITERAL separator, exactly like dedup_paragraphs' sep: F.split takes
    # a Java regex, so an unescaped ". " or "|" would silently split per
    # character and produce garbage fractions
    lines = F.split(F.col(text_col), _re.escape(line_sep))
    cols["dup_line_frac"] = frac(
        F.size(lines).cast("double"),
        F.size(F.array_distinct(lines)).cast("double"))
    return df.withColumns(cols)


def unigram_logprob_scores(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    vocab_size: int = 65536,
) -> DataFrame:
    """Unigram language-model quality score, self-trained on the corpus —
    the perplexity-proxy filter of CCNet/CC-cleaning pipelines (published:
    Wenzek et al. 2020 train a LM and keep low-perplexity docs), reduced
    to its deterministic, fully SQL-re-derivable core: a unigram model
    estimated from the corpus itself.

    Law: tokens are the non-empty ``split(text, ' ')`` words (the module's
    shared token law). The model is the top ``vocab_size`` words by
    ``(count DESC, word ASC)`` — a total order, so the vocabulary cut is
    bit-reproducible; ``p(w) = count(w) / total_tokens`` for vocabulary
    words (``total_tokens`` counts ALL tokens, in- and out-of-vocabulary)
    and the out-of-vocabulary floor is ``1 / total_tokens``. Per document:
    ``unigram_nll = round(-mean(ln p(w)), 6)`` (nats — higher = more
    surprising = lower quality), ``oov_frac = round(mean(w not in V), 6)``,
    ``n_scored_tokens``. Unscoreable rows (NULL id/text, no tokens) keep
    sentinels ``(-1.0, -1.0, 0)`` — never NULL doubles (oracle-comparator
    convention).

    Scale shape — two corpus passes (inherent: train, then score), all
    narrow shuffles: pass 1 explodes tokens into a map-side-combining
    word-count aggregate (shuffle is O(distinct words), Zipf-friendly) and
    a deterministic TakeOrdered vocabulary cut; pass 2 broadcast-joins the
    O(vocab_size) model onto the exploded tokens — the per-doc aggregate
    collapses map-side because a document's exploded rows are contiguous,
    so the shuffle is one row per document — then left-joins scores back
    on the id. No window, no Python, no cartesian (the 1-row total is a
    broadcast scalar attach)."""
    toks = (df.where(F.col(id_col).isNotNull())
            .select(id_col, F.explode(_words(text_col)).alias("_w"))
            .where(F.col("_w") != ""))
    counts = toks.groupBy("_w").agg(F.count(F.lit(1)).alias("_cnt"))
    tot = counts.agg(F.sum("_cnt").cast("double").alias("_tot"))
    vocab = counts.orderBy(F.desc("_cnt"), F.asc("_w")).limit(int(vocab_size))
    lp = (toks.join(F.broadcast(vocab), "_w", "left")
          .crossJoin(F.broadcast(tot))
          .select(id_col,
                  (F.log(F.coalesce(F.col("_cnt"), F.lit(1)).cast("double"))
                   - F.log(F.col("_tot"))).alias("_lp"),
                  F.col("_cnt").isNull().cast("double").alias("_oov")))
    per_doc = lp.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_scored_tokens"),
        F.round(-F.avg("_lp"), 6).alias("unigram_nll"),
        F.round(F.avg("_oov"), 6).alias("oov_frac"))
    return (df.join(per_doc, id_col, "left")
            .withColumns({
                "n_scored_tokens": F.coalesce(F.col("n_scored_tokens"),
                                              F.lit(0).cast("long")),
                "unigram_nll": F.coalesce(F.col("unigram_nll"), F.lit(-1.0)),
                "oov_frac": F.coalesce(F.col("oov_frac"), F.lit(-1.0)),
            }))


def bigram_logprob_scores(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    vocab_size: int = 65536,
    bigram_size: int = 1 << 18,
    backoff: float = 0.4,
) -> DataFrame:
    """Stupid-backoff bigram language-model quality score, self-trained
    on the corpus — the web-scale LM scheme of Brants et al. 2007 ("Large
    Language Models in Machine Translation": score s(w2|w1) =
    count(w1,w2)/count(w1) when the bigram is known, else a fixed
    backoff factor times the unigram score; no normalization, designed
    exactly for corpus-sized models), layered on
    ``unigram_logprob_scores``'s deterministic unigram core.

    Law: tokens are the non-empty ``split(text, ' ')`` words. Scoreable
    positions are the ADJACENT pairs of the raw split array whose two
    words are both non-empty (adjacency is defined on the raw array, so
    a doubled space breaks it — the cross-engine-exact form). The bigram
    model is the top ``bigram_size`` pairs by ``(count DESC, w1 ASC,
    w2 ASC)`` — a total order, bit-reproducible — scored as
    ``count(w1,w2)/count(w1)`` with the FULL unigram count in the
    denominator; pairs outside it back off to ``backoff * p_uni(w2)``
    where ``p_uni`` is the unigram scorer's law (top ``vocab_size``
    vocabulary, ``count/total`` inside it, ``1/total`` OOV floor). Per
    document: ``bigram_nll = round(-mean(ln s), 6)`` (nats, higher =
    more surprising), ``backoff_frac = round(mean(pair not in model),
    6)``, ``n_bigrams``. Unscoreable rows (NULL id/text, < 2 tokens, no
    non-empty adjacent pair) keep sentinels ``(0, -1.0, -1.0)`` — never
    NULL doubles (oracle-comparator convention).

    Scale shape — two corpus passes (train, then score), every model
    table bounded: word counts shuffle O(distinct words), pair counts
    shuffle O(distinct pairs) (both map-side-combining, Zipf-friendly;
    pairs are built by the codegen zip-slice, no HOF lambda); the
    ``bigram_size``-row model joins its denominators once at build time
    and then BROADCASTS, as does the vocabulary, so the scoring pass is
    the exploded pair stream flowing through two broadcast hash joins
    into a per-doc aggregate that collapses map-side (one shuffle row
    per document). No window, no Python, no unbounded join side."""
    if not (0.0 < backoff <= 1.0):
        raise ValueError("backoff must be in (0, 1]")
    toks = (df.where(F.col(id_col).isNotNull())
            .select(id_col, F.explode(_words(text_col)).alias("_w"))
            .where(F.col("_w") != ""))
    counts = toks.groupBy("_w").agg(F.count(F.lit(1)).alias("_cnt"))
    tot = counts.agg(F.sum("_cnt").cast("double").alias("_tot"))
    vocab = counts.orderBy(F.desc("_cnt"), F.asc("_w")).limit(int(vocab_size))
    l = _words(text_col)
    n = F.size(l)
    pr = F.arrays_zip(F.slice(l, 1, n - 1).alias("a"),
                      F.slice(l, 2, n - 1).alias("b"))
    pairs = (df.where(F.col(id_col).isNotNull() & F.col(text_col).isNotNull())
             .where(n >= 2)
             .select(id_col, F.explode(pr).alias("_p"))
             .select(id_col, F.col("_p.a").alias("_w1"),
                     F.col("_p.b").alias("_w2"))
             .where((F.col("_w1") != "") & (F.col("_w2") != "")))
    bigrams = (pairs.groupBy("_w1", "_w2").agg(F.count(F.lit(1)).alias("_c12"))
               .orderBy(F.desc("_c12"), F.asc("_w1"), F.asc("_w2"))
               .limit(int(bigram_size)))
    model = (bigrams
             .join(counts.select(F.col("_w").alias("_w1"),
                                 F.col("_cnt").alias("_c1")), "_w1")
             .select("_w1", "_w2",
                     (F.col("_c12").cast("double") / F.col("_c1"))
                     .alias("_s12")))
    v2 = vocab.select(F.col("_w").alias("_w2"), F.col("_cnt").alias("_cv2"))
    lp = (pairs.join(F.broadcast(model), ["_w1", "_w2"], "left")
          .join(F.broadcast(v2), "_w2", "left")
          .crossJoin(F.broadcast(tot))
          .select(id_col,
                  F.when(F.col("_s12").isNotNull(), F.log("_s12"))
                   .otherwise(F.log(F.lit(float(backoff)))
                              + F.log(F.coalesce(F.col("_cv2"), F.lit(1))
                                      .cast("double"))
                              - F.log(F.col("_tot"))).alias("_lp"),
                  F.col("_s12").isNull().cast("double").alias("_bo")))
    per_doc = lp.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.round(-F.avg("_lp"), 6).alias("bigram_nll"),
        F.round(F.avg("_bo"), 6).alias("backoff_frac"))
    return (df.join(per_doc, id_col, "left")
            .withColumns({
                "n_bigrams": F.coalesce(F.col("n_bigrams"),
                                        F.lit(0).cast("long")),
                "bigram_nll": F.coalesce(F.col("bigram_nll"), F.lit(-1.0)),
                "backoff_frac": F.coalesce(F.col("backoff_frac"),
                                           F.lit(-1.0)),
            }))


def exact_fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Deterministic whole-document fingerprint (md5 of normalized text) —
    the exact-dedup key, portable across engines."""
    return df.withColumn("fingerprint", F.md5(F.lower(F.trim(F.col(text_col)))))


# Doc-boundary chunk size for the winnowing byte stream: keeps every
# NumPy temp ~1 MB (see pipeline/dedup.py's chunk-size note — large fresh
# per-batch temps fault pages pathologically under concurrent workers).
_WINNOW_CHUNK_BYTES = 1 << 17


def _string_buffers(arr: pa.Array) -> tuple[np.ndarray, np.ndarray]:
    """(absolute int64 offsets, uint8 data buffer) of an Arrow string
    array — the raw UTF-8 bytes, zero-copy. No nulls expected."""
    if pa.types.is_large_string(arr.type):
        odt: type = np.int64
    else:
        if not pa.types.is_string(arr.type):
            arr = arr.cast(pa.string())
        odt = np.int32
    bufs = arr.buffers()
    offs = (np.frombuffer(bufs[1], dtype=odt)
            [arr.offset: arr.offset + len(arr) + 1].astype(np.int64))
    return offs, np.frombuffer(bufs[2], dtype=np.uint8)


def _winnow_chunk(data: np.ndarray, offs: np.ndarray, d0: int, d1: int,
                  k: int, window: int, powers: np.ndarray, mask: np.int64):
    """Winnow docs [d0, d1) of one Arrow batch (bytes in ``data`` at
    absolute ``offs``): returns (batch row idx, pos, fp) arrays, or None.
    Every doc is guaranteed >= k bytes (char-length guard upstream)."""
    base, end = int(offs[d0]), int(offs[d1])
    seg = data[base:end].astype(np.int64)
    lens = np.diff(offs[d0:d1 + 1])
    nd = d1 - d0
    nw = int(end - base) - k + 1
    # rolling k-gram hash over the whole chunk: shifted in-place
    # accumulation (mod 2^64 wraparound, masked to 2^61 at the end — 2^61
    # divides 2^64 so the masked result equals the true mod)
    with np.errstate(over="ignore"):
        h = seg[:nw] * powers[0]
        tmp = np.empty(nw, dtype=np.int64)
        for j in range(1, k):
            np.multiply(seg[j:j + nw], powers[j], out=tmp)
            h += tmp
    h &= mask
    # gram at byte p is intra-document iff bytes p and p+k-1 share a doc
    doc_of = np.repeat(np.arange(nd, dtype=np.int64), lens)
    valid = doc_of[:nw] == doc_of[k - 1:]
    hg = h[valid]
    gd = doc_of[:nw][valid]
    ngrams = (lens - k + 1).astype(np.int64)
    gstart = np.zeros(nd + 1, dtype=np.int64)
    np.cumsum(ngrams, out=gstart[1:])
    sel_parts = []
    wn = len(hg) - window + 1
    if wn > 0:
        # leftmost-min of every window-wide hash window, all docs at once;
        # windows crossing a doc boundary are masked out. Docs with
        # exactly `window` grams have one window == the whole doc, which
        # equals the v1 short-branch argmin.
        wins = np.lib.stride_tricks.sliding_window_view(hg, window)
        amin = wins.argmin(axis=1)
        winvalid = gd[:wn] == gd[window - 1:]
        sel_parts.append(np.unique(amin[winvalid] + np.flatnonzero(winvalid)))
    shorts = np.flatnonzero(ngrams < window)
    if len(shorts):
        picks = np.empty(len(shorts), dtype=np.int64)
        for i, d in enumerate(shorts):  # rare: docs under k+window-1 bytes
            s0 = int(gstart[d])
            picks[i] = s0 + int(np.argmin(hg[s0:s0 + int(ngrams[d])]))
        sel_parts.append(picks)
    if not sel_parts:
        return None
    sel = np.unique(np.concatenate(sel_parts))
    if not len(sel):
        return None
    sd = gd[sel]
    return sd + d0, sel - gstart[sd], hg[sel]


def winnowing_fingerprints(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
    window: int = 4,
    lowercase: bool = True,
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer et al. 2003): rolling
    polynomial hash over k-grams of UTF-8 bytes, leftmost minimum per
    hash window; output one row per selected fingerprint (id, pos, fp).

    Round-3 execution rewrite (law unchanged — the full-table DuckDB
    HUGEINT re-derivation oracle stays green): ``lower()`` and the
    CHARACTER-length >= k guard run JVM-side, and the worker reads the
    Arrow string buffers directly — Arrow strings ARE the UTF-8 bytes, so
    no per-document Python materializes at all. The whole batch's byte
    stream is hashed and window-minimized in doc-boundary chunks (~1 MB
    temps, see ``_WINNOW_CHUNK_BYTES``). One honest boundary: ``lower()``
    is now the JVM's (v1 used Python ``str.lower()``) — identical for
    ASCII and all common scripts, but a code point whose case mapping
    differs between the JVM's and CPython's Unicode tables (rare,
    version-skew characters) can fingerprint differently than v1 did.

    ``lowercase=False`` fingerprints the RAW text — the span-rewrite path
    (``dedup_substring(rewrite=True)``) needs it so byte positions map
    onto the original text exactly (lowercasing can change UTF-8 byte
    lengths) and "verbatim" means verbatim."""
    id_field = df.schema[id_col]
    schema = StructType([id_field, StructField("pos", LongType()),
                         StructField("fp", LongType())])
    t = F.lower(F.col(text_col)) if lowercase else F.col(text_col)
    pruned = (df.where(F.col(text_col).isNotNull()
                       & (F.length(F.col(text_col)) >= k))
              .select(id_col, t.alias("_t")))
    chunk = _WINNOW_CHUNK_BYTES  # captured by value for tests

    def run(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        mask = np.int64((1 << 61) - 1)
        # k-gram position weights, hoisted: identical for every document
        powers = np.array([pow(1000003, k - 1 - j, 1 << 61) for j in range(k)],
                          dtype=np.int64)
        for batch in batches:
            nrows = batch.num_rows
            if not nrows:
                continue
            offs, data = _string_buffers(batch.column(1))
            parts = []
            for d0, d1 in iter_doc_chunks(offs, chunk):
                res = _winnow_chunk(data, offs, d0, d1, k, window, powers,
                                    mask)
                if res is not None:
                    parts.append(res)
            if not parts:
                continue
            rows = np.concatenate([p[0] for p in parts])
            pos = np.concatenate([p[1] for p in parts])
            fp = np.concatenate([p[2] for p in parts])
            yield pa.RecordBatch.from_arrays(
                [batch.column(0).take(pa.array(rows)),
                 pa.array(pos, type=pa.int64()),
                 pa.array(fp, type=pa.int64())],
                names=[id_col, "pos", "fp"],
            )

    return pruned.mapInArrow(run, schema)
