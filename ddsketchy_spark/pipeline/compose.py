"""One-call training-corpus cleaning: the standard pipeline composition.

Each stage is an independently tested + oracled operator; this module only
wires them in the canonical order (cheap row-local filters first, the
joins/shuffles last, on the already-shrunk corpus):

    redact PII -> quality filter -> exact dedup -> near dedup ->
    benchmark decontamination

Spark-first: the whole composition is ONE lazy DataFrame plan — Catalyst
fuses the projection stages (redaction + quality features + filter) into a
single codegen pass over the scan, and only survivors reach the dedup
shuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .dedup import dedup_near_text
from .text import decontaminate, quality_filter, redact_pii


def clean_corpus(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    benchmark: DataFrame | None = None,
    redact: bool = True,
    line_clean_kw: dict | None = None,
    quality_kw: dict | None = None,
    boilerplate_kw: dict | None = None,
    para_dedup_kw: dict | None = None,
    near_dedup_kw: dict | None = None,
    decontam_n: int = 13,
    domain_cut_kw: dict | None = None,
    mix_budgets: dict | None = None,
    mix_kw: dict | None = None,
) -> DataFrame:
    """Run the standard corpus-cleaning pipeline; returns the SURVIVING
    rows of ``df`` (original columns, with ``text_col`` replaced by its
    redacted form when ``redact``).

    Stages (each skippable):
    1. ``redact_pii`` — emails/IPs/phones -> placeholder tokens (pure
       projection; NULL text passes through).
    1b. OPTIONAL C4 line-level cleaning — pass ``line_clean_kw`` (e.g.
       ``{}`` or ``{"min_line_words": 3}``) to run ``clean_lines`` on the
       redacted text BEFORE the doc-level filter: bad lines are cut and
       ``text_col`` replaced by the rejoined survivors, pages tripping
       the C4 page rules (blocklist phrase / too few surviving lines)
       drop. Off by default (None) — the synthetic testdata corpus is
       single-line, but real crawl text is where C4's line rules do the
       heavy lifting.
    2. ``quality_filter`` — Gopher/C4-style keep/drop on the redacted
       text (``quality_kw`` forwards thresholds). Drops NULL-text rows
       (``null_text`` is a drop reason).
    2a. OPTIONAL corpus-frequency boilerplate removal — pass
       ``boilerplate_kw`` (e.g. ``{"min_docs": 50}``) to cut every line
       that appears in >= ``min_docs`` distinct surviving documents
       (``remove_boilerplate_lines`` — the RefinedWeb/CCNet line-dedup
       stage: cookie banners / nav / footers repeated across a site).
       Runs AFTER the quality filter (frequencies are counted over
       surviving docs only) and before paragraph dedup, whose keep-first
       law would otherwise preserve one copy of each banner. Off by
       default (None).
    2b. OPTIONAL paragraph dedup — pass ``para_dedup_kw`` (e.g. ``{}`` or
       ``{"min_chars": 30}``) to cut corpus-wide duplicate paragraphs
       (``dedup_paragraphs``) from the surviving text BEFORE document
       near-dedup: boilerplate paragraphs stop gluing unrelated docs
       into near-dup clusters. Off by default (None).
    3. near dedup — ``dedup_near_text`` (MinHash-LSH -> connected
       components; exact duplicates are Jaccard-1.0 members of the same
       clusters, so a separate exact pass is redundant), keeping each
       cluster's min-id canonical doc. Rows with a NULL id cannot be
       canonicalized — they bypass this stage and survive (mirroring
       ``_keep_canonical``'s NULL-id pass-through; an equi-join would
       silently drop them). Ids should be UNIQUE: duplicate ids are kept
       or dropped as one unit (the keep set is distinct on id).
       ``near_dedup_kw`` forwards num_perm/bands/threshold/verify (and
       ``keep_by=<column of df>`` for quality-aware survivor selection);
       use ``near_dedup_kw={"skip": True}`` to skip.
    4. decontamination — drop docs sharing a gram with the benchmark.
       ``benchmark`` is EITHER a DataFrame (exact ``decontaminate`` join,
       ``decontam_n`` grams) OR a ``write_ngram_bloom_index`` path
       (``novelty.decontaminate_against_index``: the benchmark was
       indexed ONCE as a Bloom blob; this run probes a broadcast bitmap
       with zero benchmark I/O — no false negatives, so every
       contaminated doc still drops; the index's own ``n`` applies).
       Skipped when None.
    4b. OPTIONAL per-domain quality cut — pass ``domain_cut_kw`` (at
       least ``{"frac": ..., "rank_col": ...}``; ``by`` defaults to
       ``"source"``, ``key_col`` to the pipeline's ``id_col``) to keep
       only each domain's top-``frac`` rows by the rank column
       (``take_top_frac_by_group``) before mixing — the RefinedWeb-style
       cap that stops one spammy domain's tail from dominating.
    5. OPTIONAL mixture sampling — pass ``mix_budgets`` (per-source token
       budgets; see ``sample_to_token_budget``) to mix the cleaned
       survivors to the target composition as the final stage.
       ``mix_kw`` forwards token_col/source_col/seed/explode_copies; the
       result gains the mixer's ``n_copies`` column (and ``copy`` when
       exploded).
    """
    quality_kw = dict(quality_kw or {})
    near_kw = dict(near_dedup_kw or {})
    skip_near = near_kw.pop("skip", False)

    out = df
    if redact:
        keep_cols = [c for c in df.columns if c != text_col]
        out = (redact_pii(out, text_col)
               .select(*keep_cols, F.col("text_redacted").alias(text_col)))
    if line_clean_kw is not None:
        from .text import clean_lines

        keep_cols = [c for c in df.columns if c != text_col]
        lc = dict(line_clean_kw)
        oc = lc.setdefault("out_col", "clean_text")
        out = (clean_lines(out, text_col, **lc)
               .where("keep")
               .select(*keep_cols, F.col(oc).alias(text_col)))
    out = (quality_filter(out, text_col, **quality_kw)
           .where("keep").select(*df.columns))
    if boilerplate_kw is not None:
        from .text import remove_boilerplate_lines

        out = (remove_boilerplate_lines(out, text_col=text_col,
                                        id_col=id_col, **boilerplate_kw)
               .select(*df.columns))
    if para_dedup_kw is not None:
        from .dedup import dedup_paragraphs

        out = (dedup_paragraphs(out, text_col=text_col, id_col=id_col,
                                **para_dedup_kw)
               .select(*df.columns))
    cached = []
    if not skip_near:
        from .cache import cached_deps

        labels = dedup_near_text(out, text_col=text_col, id_col=id_col,
                                 **near_kw)
        cached = cached_deps(labels)
        # marker LEFT join, not inner: NULL-id rows can never equi-match
        # (dedup_near_text already passes them through with keep=TRUE), so
        # they bypass via the IS NULL arm instead of being silently
        # dropped; distinct() keeps duplicate ids as one unit. One left
        # join also evaluates the redact+quality projection chain once
        # here (a null/nonnull split would scan it twice).
        keep_ids = (labels.where("keep").select(id_col).distinct()
                    .withColumn("_keep_hit", F.lit(1)))
        out = (out.join(keep_ids, id_col, "left")
               .where(F.col("_keep_hit").isNotNull()
                      | F.col(id_col).isNull())
               .drop("_keep_hit"))
    if benchmark is not None:
        if isinstance(benchmark, str):
            from .novelty import decontaminate_against_index

            out = decontaminate_against_index(out, benchmark,
                                              text_col=text_col,
                                              id_col=id_col)
        else:
            out = decontaminate(out, benchmark, n=decontam_n,
                                text_col=text_col, corpus_id=id_col,
                                bench_id=id_col if id_col in benchmark.columns
                                else benchmark.columns[0])
    if domain_cut_kw is not None:
        from ..spark.skew import take_top_frac_by_group

        cut = dict(domain_cut_kw)
        out = take_top_frac_by_group(
            out, cut.pop("frac"), cut.pop("rank_col"),
            cut.pop("by", "source"), key_col=cut.pop("key_col", id_col),
            **cut)
    if mix_budgets is not None:
        from .mix import sample_to_token_budget

        out = sample_to_token_budget(out, mix_budgets,
                                     id_col=id_col, **(mix_kw or {}))
    from .cache import tag_cached_deps

    return tag_cached_deps(out, cached)
