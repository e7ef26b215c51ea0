"""The incremental-crawl recipe: one call per crawl, every layer wired.

Round 4 built each piece — persistent exact/MinHash dedup indexes, Bloom
decontamination, per-domain quality cuts, token-budget mixing,
leakage-safe splits, sequence packing, training-shard sinks, and rollup
drift — each independently tested and oracled. This module is the
PRODUCT: the composition a 100-TB corpus operator actually runs when a
new crawl lands:

    clean (redact -> [C4 line clean] -> quality) ->
    dedup against the persistent exact index -> against the MinHash
    index -> [decontaminate against the benchmark Bloom index] ->
    [per-domain quality cut] -> [weighted eval picks held OUT of
    training but INTO the dedup indexes, so future crawls cannot leak
    near-copies of eval docs] -> [token-budget mixture] ->
    [leakage-safe split] -> pack into training sequences ->
    training shards for this crawl ->
    append survivors to both indexes + fold the crawl into the rollup ->
    drift report vs the previous crawl.

State layout under ``workdir`` (any Hadoop-addressable URI):

    exact_idx/    write_exact_index artifact (grows by append)
    minhash_idx/  write_minhash_index artifact (grows by append)
    rollup/       update_rollup snapshots (one version per crawl)
    shards/crawl=<v>/  this crawl's training shards + manifest
    eval_picks/crawl=<v>/  held-out eval docs (when eval_picks_k is set)

The FIRST crawl bootstraps: batch within-crawl dedup (``dedup_exact`` +
``dedup_near_text`` — the same laws the index probes replay
incrementally) and index WRITES instead of probes+appends. Every later
crawl only ever STREAMS the persistent corpus side (the r4 index
designs); the crawl increment is the broadcast/small side throughout.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from . import fsio


def _apply_keep_labels(df: DataFrame, labels: DataFrame,
                       id_col: str) -> DataFrame:
    """Keep ``df`` rows whose id is in the labels' keep set; NULL-id rows
    pass through (the package-wide law — an equi-join would drop them)."""
    keep_ids = (labels.where("keep").select(id_col).distinct()
                .withColumn("_keep_hit", F.lit(1)))
    return (df.join(keep_ids, id_col, "left")
            .where(F.col("_keep_hit").isNotNull() | F.col(id_col).isNull())
            .drop("_keep_hit"))


def incremental_crawl_update(
    crawl_df: DataFrame,
    workdir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    source_col: str = "source",
    token_col: str = "n_tok",
    redact: bool = True,
    line_clean_kw: dict | None = None,
    boilerplate_kw: dict | None = None,
    quality_kw: dict | None = None,
    near_threshold: float = 0.8,
    num_perm: int = 128,
    bands: int = 32,
    keep_by: str | None = None,
    benchmark_index: str | None = None,
    decontam_max_seen: int = 0,
    domain_cut_kw: dict | None = None,
    eval_picks_k: int | None = None,
    eval_picks_seed: int = 0,
    mix_budgets: dict | None = None,
    mix_kw: dict | None = None,
    splits: dict | None = None,
    split_group_col: str | None = None,
    split_seed: int = 0,
    seq_len: int = 2048,
    n_shards: int = 4,
    shard_mode: str = "hash",
    rollup_quantiles: tuple = (0.5, 0.99),
    alpha: float = 0.01,
    compact_every: int | None = None,
) -> dict:
    """Process one crawl increment end to end (module docstring has the
    stage order); returns a report dict with per-stage surviving counts,
    the shard manifest, packed-sequence totals per split, the new rollup
    version, and the per-source drift rows vs the previous crawl.

    ``line_clean_kw`` activates C4 line-level cleaning between redaction
    and the doc-level quality filter (``clean_corpus`` stage 1b);
    ``boilerplate_kw`` activates corpus-frequency boilerplate line
    removal after it (stage 2a — pass ``group_col=<source_col>`` for the
    RefinedWeb per-site frequency law). Both count frequencies within
    THIS crawl only; cross-crawl repetition is what the persistent
    indexes below catch at document granularity.

    ``crawl_df`` needs (id_col, text_col, source_col, token_col) at
    minimum; all other columns ride along into the shards. Stage knobs
    forward to the underlying operators (each has its own docstring and
    oracle). Optional stages activate when their argument is given:
    ``benchmark_index`` (a ``write_ngram_bloom_index`` path),
    ``domain_cut_kw`` (needs ``frac``; ``rank_col`` defaults to
    ``token_col``, ``by`` to ``source_col``), ``eval_picks_k``
    (weighted holdout of k docs: out of the shards, INTO the dedup
    indexes — see stage 5b), ``mix_budgets``, ``splits`` (e.g.
    ``{"train": 0.95, "val": 0.05}``), ``compact_every`` (every Nth
    crawl rewrites the exact AND minhash indexes' accumulated append
    generations back to one range-sorted layout each — stage 10b)."""
    from ..spark.ddsketch_agg import DDSketchAggregator
    from ..spark.rollup import latest_version, rollup_drift, update_rollup
    from .compose import clean_corpus
    from .dedup import dedup_exact, dedup_near_text
    from .dedup_index import (
        _EXACT_SIDECAR,
        _SIDECAR,
        append_to_exact_index,
        append_to_minhash_index,
        dedup_against_exact_index,
        dedup_against_index,
        write_exact_index,
        write_minhash_index,
    )
    from .mix import pack_sequences, sample_to_token_budget
    from .shards import write_training_shards
    from .split import split_corpus

    spark = crawl_df.sparkSession
    root = workdir.rstrip("/")
    exact_path = f"{root}/exact_idx"
    minhash_path = f"{root}/minhash_idx"
    rollup_root = f"{root}/rollup"
    report: dict = {"workdir": root, "n_input": crawl_df.count()}
    persisted: list[DataFrame] = []

    def _persist(frame: DataFrame) -> DataFrame:
        persisted.append(frame.persist())
        return frame

    # 1. clean: redaction + quality as the canonical composed projection
    # (near dedup skipped here — the index probes below replay its law
    # incrementally against the whole accumulated corpus, not just this
    # crawl)
    cur = clean_corpus(crawl_df, text_col=text_col, id_col=id_col,
                       redact=redact, line_clean_kw=line_clean_kw,
                       boilerplate_kw=boilerplate_kw,
                       quality_kw=quality_kw,
                       near_dedup_kw={"skip": True})
    cur = _persist(cur)
    report["n_after_quality"] = cur.count()

    # 2. exact dedup: against the persistent digest index when it exists
    # (pushed-IN scan pruning; corpus side streams), else batch bootstrap
    # driver-side sidecar probes go through the JVM Hadoop gateway (sees
    # spark.hadoop.* — s3a credentials, HDFS HA), matching how the
    # sidecars themselves are read/written; fsio.fs_exists (pyarrow.fs)
    # is the EXECUTOR-side layer and can mis-resolve such URIs here
    have_exact = fsio.hadoop_exists(spark, f"{exact_path}/{_EXACT_SIDECAR}")
    if have_exact:
        labels = dedup_against_exact_index(cur, exact_path,
                                           text_col=text_col)
        cur = _apply_keep_labels(cur, labels, id_col)
    else:
        # dedup_exact returns surviving ROWS (not labels); NULL-id rows
        # cannot win a min-id group, so route them around it — the same
        # NULL-id pass-through the index probe gives
        nullid = cur.where(F.col(id_col).isNull())
        cur = (dedup_exact(cur.where(F.col(id_col).isNotNull()),
                           text_col=text_col, id_col=id_col)
               .unionByName(nullid))
    cur = _persist(cur)
    report["n_after_exact"] = cur.count()

    # 3. near dedup: against the persistent MinHash index (increment
    # buckets broadcast, corpus bands stream) or batch bootstrap — the
    # same signature law either way (the index sidecar pins it)
    have_minhash = fsio.hadoop_exists(spark, f"{minhash_path}/{_SIDECAR}")
    if have_minhash:
        labels = dedup_against_index(cur, minhash_path,
                                     threshold=near_threshold,
                                     text_col=text_col, keep_by=keep_by)
    else:
        labels = dedup_near_text(cur, threshold=near_threshold,
                                 num_perm=num_perm, bands=bands,
                                 text_col=text_col, id_col=id_col,
                                 keep_by=keep_by)
    cur = _persist(_apply_keep_labels(cur, labels, id_col))
    report["n_after_near"] = cur.count()

    # 4. benchmark decontamination via the Bloom n-gram index (no false
    # negatives: every truly contaminated doc drops)
    if benchmark_index is not None:
        from .novelty import decontaminate_against_index

        cur = decontaminate_against_index(cur, benchmark_index,
                                          text_col=text_col, id_col=id_col,
                                          max_seen=decontam_max_seen)
        cur = _persist(cur)
        report["n_after_decontam"] = cur.count()

    # 5. per-domain quality cut (RefinedWeb-style spam-tail cap)
    if domain_cut_kw is not None:
        from ..spark.skew import take_top_frac_by_group

        kw = dict(domain_cut_kw)
        kw.setdefault("rank_col", token_col)
        kw.setdefault("by", source_col)
        kw.setdefault("key_col", id_col)
        cur = _persist(take_top_frac_by_group(cur, **kw))
        report["n_after_domain_cut"] = cur.count()

    # 5b. weighted eval picks: hold out k docs (inclusion probability ~
    # token mass, Efraimidis-Spirakis — deterministic in (id, seed), so a
    # re-run picks the identical holdout). Picked docs never reach
    # mixture/split/shards but DO enter the dedup indexes below, so later
    # crawls cannot train on near-copies of eval documents.
    eval_df = None
    if eval_picks_k is not None:
        from ..spark.sampling import weighted_sample_native

        picks = weighted_sample_native(
            cur, id_col, token_col, k=eval_picks_k,
            seed=eval_picks_seed).select("key")
        eval_df = _persist(cur.join(
            F.broadcast(picks),
            cur[id_col].cast("string") == F.col("key")).drop("key"))
        cur = _persist(cur.join(
            F.broadcast(picks),
            cur[id_col].cast("string") == F.col("key"), "left_anti"))
        report["n_eval_picks"] = eval_df.count()
        report["n_after_eval_picks"] = cur.count()

    # 6. token-budget mixture to the target composition
    if mix_budgets is not None:
        cur = _persist(sample_to_token_budget(
            cur, mix_budgets, token_col=token_col, source_col=source_col,
            id_col=id_col, **(mix_kw or {})))
        report["n_after_mix"] = cur.count()

    kept = cur
    report["n_kept"] = report[[k for k in report
                               if k.startswith("n_after")][-1]]

    # 7. leakage-safe split + 8. sequence packing per split
    if splits is not None:
        kept = split_corpus(kept, splits, id_col=id_col,
                            group_col=split_group_col, seed=split_seed)
        split_names = list(splits)
    else:
        kept = kept.withColumn("split", F.lit("all"))
        split_names = ["all"]
    kept = _persist(kept)
    seqs = {}
    for name in split_names:
        part = kept.where(F.col("split") == name)
        packed = pack_sequences(part, seq_len, token_col=token_col,
                                id_col=id_col)
        total = packed.agg(
            F.max(F.col("start_seq") + F.col("n_seqs"))).collect()[0][0]
        seqs[name] = int(total) if total is not None else 0
    report["sequences_per_split"] = seqs
    report["seq_len"] = seq_len

    # 9. durable sinks FIRST: the shards (and eval picks) ARE the
    # product — they must be on disk before any cross-crawl state
    # (indexes, rollup) advances. Crash before this point: nothing was
    # mutated, a re-run recomputes identically. Crash after the shard
    # write but before the index appends: the data is durable and the
    # re-run recomputes the same survivors (indexes unchanged) and
    # overwrites the same shard dir byte-for-byte before appending once.
    # Crash after the appends: the re-run's increment drops entirely at
    # the exact index (n_kept 0) — the guard below then REFUSES to
    # overwrite the already-written shard generation with an empty one
    # (a genuinely all-duplicate crawl never trips it: its version is
    # fresh, so its shard dir does not exist yet). The version is
    # pre-derived from the rollup (the last stage to advance), so a
    # partially-completed crawl re-runs under the SAME version.
    version = latest_version(spark, rollup_root) + 1
    shards_path = f"{root}/shards/crawl={version}"
    if report["n_kept"] == 0 and fsio.hadoop_exists(spark, shards_path):
        report["shards_path"] = shards_path
        report["shards_preserved_from_prior_run"] = True
    else:
        manifest = write_training_shards(
            kept.where(F.col(id_col).isNotNull()),
            shards_path, n_shards, id_col=id_col, mode=shard_mode)
        report["shards"] = {k: manifest[k] for k in
                            ("n_shards", "n_rows", "mode") if k in manifest}
        report["shards_path"] = shards_path
    if eval_df is not None:
        eval_path = f"{root}/eval_picks/crawl={version}"
        eval_df.write.mode("overwrite").parquet(eval_path)
        report["eval_picks_path"] = eval_path

    # 10. index maintenance (survivors are final and durable above)
    surv = kept.drop("split")
    if eval_df is not None:
        # eval picks join the indexes (leakage fence for future crawls)
        # even though they never reach the shards; allowMissingColumns
        # covers mixture-added columns (n_copies) the picks predate
        surv = surv.unionByName(eval_df, allowMissingColumns=True)
    if have_exact:
        append_to_exact_index(surv, exact_path, text_col=text_col)
    else:
        write_exact_index(surv, exact_path, text_col=text_col,
                          id_col=id_col)
    if have_minhash:
        append_to_minhash_index(surv, minhash_path, text_col=text_col)
    else:
        write_minhash_index(surv, minhash_path, text_col=text_col,
                            id_col=id_col, num_perm=num_perm, bands=bands)

    # 10a. rollup update (one snapshot per crawl) + drift vs previous
    agg = DDSketchAggregator(token_col, alpha=alpha,
                             quantiles=rollup_quantiles)
    v_rolled = update_rollup(spark, rollup_root,
                             kept.select(source_col, token_col), agg,
                             [source_col])
    if v_rolled != version:
        raise RuntimeError(
            f"rollup advanced to v{v_rolled} but this crawl's sinks were "
            f"written under v{version} — another writer ran concurrently; "
            "single-writer per workdir is required")
    report["rollup_version"] = version
    if version >= 1:
        drift = rollup_drift(spark, rollup_root, agg, [source_col])
        report["drift"] = [r.asDict() for r in
                           drift.orderBy(source_col).collect()]

    # 10b. periodic index compaction: every append adds a file
    # generation per table; every compact_every-th crawl rewrites the
    # digest table and the minhash bands/sigs back to ONE globally
    # range-sorted layout each (file count bounded, probe min-max
    # skipping back to one file per key interval)
    if compact_every and version > 0 and version % compact_every == 0:
        from .dedup_index import compact_exact_index, compact_minhash_index

        compact_exact_index(spark, exact_path)
        compact_minhash_index(spark, minhash_path)
        report["indexes_compacted"] = ["exact", "minhash"]

    for frame in persisted:
        frame.unpersist()
    return report
