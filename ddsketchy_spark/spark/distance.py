"""Distribution distances between per-group DDSketches — KS and
1-Wasserstein, computed entirely from the sketch's bucket law.

The drift question `rollup_drift` answers per-quantile ("did p99 move?")
has a distribution-level counterpart: HOW FAR apart are two groups'
value distributions? Both classic distances are exact functionals of
the sketch state (the bucket atoms), so they inherit DDSketch's
relative-error guarantee and cost nothing beyond the bucket rows:

  - atoms: the sketch stores (region, key, count); each bucket is an
    atom of mass count at the reference reconstruction value
    ``value(key) = exp(key*ln_gamma) * 2/(1+gamma)``
    (`/root/reference/src/mapping.rs:14-20` reconstruction law; region
    -1 negates, the zero bucket sits at 0.0).
  - KS  = max over the merged support of |F_a(v) - F_b(v)|.
  - W1  = integral of |F_a - F_b| dv = sum over merged support of
    |F_a(v) - F_b(v)| * (next(v) - v).

Because every true value x is within alpha-relative distance of its
bucket atom, the sketch W1 is within ``alpha * E|X|``-ish of the exact
W1 (each atom moves mass by at most alpha*|x|); KS is exact whenever
the two distributions' CDFs differ by more than one bucket's mass
(same-bucket collisions are invisible by construction).

Scale shape: ``_native_key_counts`` reduces the table to one row per
occupied (group, region, key) bucket in whole-stage codegen with a
map-side combine — the ONLY data-sized stage. Everything after runs on
O(groups x buckets) rows (a few hundred per group at alpha=0.01):
a broadcast pair fan-out and one window per pair. G groups produce
G*(G-1)/2 pairs — meant for drift matrices over dimension-like keys
(event types, sources, crawls), not high-cardinality ids.
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import DataFrame, Window, functions as F

from ..core.ddsketch import DDSketch
from ..core.mapping import LogMapping
from .ddsketch_agg import _native_key_counts

DEFAULT_ALPHA = 0.01


def _atom_value_expr(alpha: float):
    """(region, key) -> atom value, matching ``LogMapping.value`` exactly
    (same double arithmetic the DuckDB oracle uses)."""
    m = LogMapping(alpha)
    gl = 1.0 / m.inv_ln_gamma
    coef = 2.0 / (1.0 + m.gamma)
    mag = F.exp(F.col("key").cast("double") * F.lit(gl)) * F.lit(coef)
    return (F.when(F.col("region") == 0, F.lit(0.0))
            .otherwise(F.col("region").cast("double") * mag))


def ddsketch_distance(
    df: DataFrame,
    value_col: str,
    by: str,
    alpha: float = DEFAULT_ALPHA,
) -> DataFrame:
    """Pairwise KS and W1 distances between every two groups of ``by``.

    Returns (g_a, g_b, n_a, n_b, ks, w1) with g_a < g_b (each unordered
    pair once), ks/w1 rounded to 6 dp; groups are the non-NULL ``by``
    values with at least one finite value. Native SQL end to end.
    """
    buckets = (_native_key_counts(df, value_col, [by], alpha)
               .where(F.col(by).isNotNull())
               .select(F.col(by).alias("_g"),
                       _atom_value_expr(alpha).alias("_v"),
                       F.col("c")))
    # distinct (region, key) can never collide on _v (sign separates the
    # stores, the zero bucket sits strictly inside (-min_idx, min_idx)),
    # but aggregate defensively so the window sees unique _v per group.
    atoms = buckets.groupBy("_g", "_v").agg(F.sum("c").alias("_c"))
    totals = atoms.groupBy("_g").agg(F.sum("_c").alias("_n"))

    pairs = (totals.select(F.col("_g").alias("g_a"), F.col("_n").alias("n_a"))
             .crossJoin(F.broadcast(
                 totals.select(F.col("_g").alias("g_b"),
                               F.col("_n").alias("n_b"))))
             .where(F.col("g_a") < F.col("g_b")))

    ev_a = (F.broadcast(pairs).join(atoms, atoms["_g"] == F.col("g_a"))
            .select("g_a", "g_b", "n_a", "n_b", "_v",
                    F.col("_c").alias("da"), F.lit(0).alias("db")))
    ev_b = (F.broadcast(pairs).join(atoms, atoms["_g"] == F.col("g_b"))
            .select("g_a", "g_b", "n_a", "n_b", "_v",
                    F.lit(0).alias("da"), F.col("_c").alias("db")))
    ev = (ev_a.unionByName(ev_b)
          .groupBy("g_a", "g_b", "n_a", "n_b", "_v")
          .agg(F.sum("da").alias("da"), F.sum("db").alias("db")))

    w = (Window.partitionBy("g_a", "g_b").orderBy("_v")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    wlead = Window.partitionBy("g_a", "g_b").orderBy("_v")
    stepped = ev.select(
        "g_a", "g_b", "n_a", "n_b", "_v",
        (F.sum("da").over(w).cast("double") / F.col("n_a")).alias("_fa"),
        (F.sum("db").over(w).cast("double") / F.col("n_b")).alias("_fb"),
        (F.lead("_v", 1, None).over(wlead)).alias("_vn"))
    diff = F.abs(F.col("_fa") - F.col("_fb"))
    gap = F.coalesce(F.col("_vn") - F.col("_v"), F.lit(0.0))
    return (stepped.groupBy("g_a", "g_b")
            .agg(F.any_value(F.col("n_a")).alias("n_a"),
                 F.any_value(F.col("n_b")).alias("n_b"),
                 F.round(F.max(diff), 6).alias("ks"),
                 F.round(F.sum(diff * gap), 6).alias("w1"))
            .orderBy("g_a", "g_b"))


def ddsketch_distance_between(
    df_a: DataFrame,
    df_b: DataFrame,
    value_col: str,
    alpha: float = DEFAULT_ALPHA,
    labels: tuple[str, str] = ("a", "b"),
) -> DataFrame:
    """KS / W1 between the SAME column of two tables (old crawl vs new
    crawl, train vs eval, before vs after a filter) — the two-frame face
    of ``ddsketch_distance``: tag each side with a literal group label
    and run the grouped engine on the union, so both scans feed one
    bucket aggregate and the distance math is shared. Returns one row
    (g_a, g_b, n_a, n_b, ks, w1) with g_a/g_b = ``labels``."""
    la, lb = labels
    if la == lb:
        raise ValueError(f"labels must differ, got {labels!r}")
    a = df_a.select(F.lit(la).alias("_side"),
                    F.col(value_col).alias("_val"))
    b = df_b.select(F.lit(lb).alias("_side"),
                    F.col(value_col).alias("_val"))
    return ddsketch_distance(a.unionByName(b), "_val", "_side", alpha)


# ---------------------------------------------------------------------------
# Blob-level twin (two sketches in hand, e.g. rollup snapshot states)
# ---------------------------------------------------------------------------


def _sketch_atoms(sk: DDSketch) -> tuple[np.ndarray, np.ndarray]:
    """(values, counts) atom representation of one sketch, same law as
    the SQL engine (LogMapping.value reconstruction, zero bucket at 0)."""
    m = sk._m
    vs: list[np.ndarray] = []
    cs: list[np.ndarray] = []
    for store, sign in ((sk.negative_store, -1.0), (sk.positive_store, 1.0)):
        nz = np.nonzero(store.bins)[0]
        if len(nz):
            keys = nz + store.offset
            vs.append(sign * m.values_for(keys.astype(np.int64)))
            cs.append(store.bins[nz])
    if sk.zero_count:
        vs.append(np.array([0.0]))
        cs.append(np.array([sk.zero_count], dtype=np.int64))
    if not vs:
        return np.zeros(0), np.zeros(0, dtype=np.int64)
    v = np.concatenate(vs)
    c = np.concatenate(cs)
    order = np.argsort(v, kind="stable")
    return v[order], c[order]


def ddsketch_rollup_distance(
    spark,
    root: str,
    agg,
    by,
    v_old: int | None = None,
    v_new: int | None = None,
    other_root: str | None = None,
) -> DataFrame:
    """Per-key (ks, w1) between two DDSketch rollup snapshots — corpus
    drift between crawls as ONE number per key, from the snapshots' state
    blobs alone (no data rescan; the complement of ``rollup_drift``'s
    per-quantile deltas: KS/W1 see the WHOLE distribution move, not just
    the probed quantiles).

    ``agg`` must be a ``DDSketchAggregator`` (its states are the bucket
    atoms the distance is defined on). ``v_new`` defaults to the latest
    version of ``root``; the old side reads ``other_root`` at its latest
    (cross-lineage comparison) when given, else ``root`` at ``v_new - 1``.
    Output per key: ``status`` ('added'/'removed'/'both' — like
    ``rollup_drift``), ``n_old``/``n_new``, and ``ks``/``w1`` rounded to
    6 dp for 'both' keys with two non-empty sketches, else the ``-1.0``
    sentinel (never NULL doubles — oracle-comparator convention).

    Scale shape: two state-table reads, one key-only full-outer join,
    one vectorized pass decoding two KB-scale blobs per key."""
    import pyarrow as pa

    from pyspark.sql.types import (
        DoubleType, LongType, StringType, StructField, StructType)

    from .agg import to_arrow_schema
    from .ddsketch_agg import DDSketchAggregator
    from .rollup import latest_version, read_rollup_version

    if not isinstance(agg, DDSketchAggregator):
        # fail driver-side with the real reason — any other aggregator's
        # blobs would only die executor-side inside DDSketch.from_bytes
        raise TypeError(
            f"ddsketch_rollup_distance needs a DDSketchAggregator (the "
            f"distance is defined on its bucket atoms), got "
            f"{type(agg).__name__}")
    by = list(by)
    if v_new is None:
        v_new = latest_version(spark, root)
        if v_new < 0:
            raise FileNotFoundError(f"no rollup snapshots under {root!r}")
    old_root = other_root or root
    if v_old is None:
        v_old = (latest_version(spark, old_root) if other_root
                 else v_new - 1)
    if v_old < 0:
        raise ValueError(
            f"v_old={v_old}: need two snapshots to compare (update the "
            "rollup at least twice, or pass other_root)")
    if other_root is None and v_old == v_new:
        raise ValueError("v_old == v_new — nothing to compare")
    old = (read_rollup_version(spark, old_root, v_old)
           .select(*by, F.col("state").alias("_s_old")))
    new = (read_rollup_version(spark, root, v_new)
           .select(*by, F.col("state").alias("_s_new")))
    j = old.join(new, by, "full_outer") if by else old.crossJoin(new)

    key_fields = [f for f in j.schema.fields if f.name in by]
    out_schema = StructType(key_fields + [
        StructField("status", StringType()),
        StructField("n_old", LongType()),
        StructField("n_new", LongType()),
        StructField("ks", DoubleType()),
        StructField("w1", DoubleType()),
    ])
    out_arrow = to_arrow_schema(out_schema)
    in_cols = list(j.columns)  # the DataFrame itself must not be captured

    def dist(batches):
        for batch in batches:
            n = batch.num_rows
            if not n:
                continue
            olds = batch.column(in_cols.index("_s_old")).to_pylist()
            news = batch.column(in_cols.index("_s_new")).to_pylist()
            cols: dict[str, list] = {f.name: [] for f in out_schema.fields}
            for i in range(n):
                a = (DDSketch.from_bytes(olds[i])
                     if olds[i] is not None else None)
                b = (DDSketch.from_bytes(news[i])
                     if news[i] is not None else None)
                status = ("added" if a is None
                          else "removed" if b is None else "both")
                cols["status"].append(status)
                cols["n_old"].append(a.count if a is not None else 0)
                cols["n_new"].append(b.count if b is not None else 0)
                if (a is not None and b is not None
                        and a.count > 0 and b.count > 0):
                    ks, w1 = sketch_distance(a, b)
                    cols["ks"].append(round(ks, 6))
                    cols["w1"].append(round(w1, 6))
                else:
                    cols["ks"].append(-1.0)
                    cols["w1"].append(-1.0)
            for kf in key_fields:
                cols[kf.name] = batch.column(
                    in_cols.index(kf.name)).to_pylist()
            yield pa.RecordBatch.from_arrays(
                [pa.array(cols[f.name], type=out_arrow.field(f.name).type)
                 for f in out_schema.fields],
                schema=out_arrow)

    return j.mapInArrow(dist, out_schema)


def sketch_distance(a: DDSketch, b: DDSketch) -> tuple[float, float]:
    """(ks, w1) between two DDSketches — the NumPy twin of the SQL
    engine, bit-compatible modulo summation order (parity pinned in
    tests at round-6). Use on rollup snapshot state blobs to quantify
    corpus drift between versions as ONE number."""
    va, ca = _sketch_atoms(a)
    vb, cb = _sketch_atoms(b)
    if len(va) == 0 or len(vb) == 0:
        raise ValueError("sketch_distance requires two non-empty sketches")
    v = np.concatenate([va, vb])
    d = np.concatenate([np.stack([ca, np.zeros_like(ca)], axis=1),
                        np.stack([np.zeros_like(cb), cb], axis=1)])
    order = np.argsort(v, kind="stable")
    v = v[order]
    d = d[order]
    # collapse duplicate support points before cumulating
    uniq, idx = np.unique(v, return_inverse=True)
    acc = np.zeros((len(uniq), 2), dtype=np.int64)
    np.add.at(acc, idx, d)
    fa = np.cumsum(acc[:, 0]) / ca.sum()
    fb = np.cumsum(acc[:, 1]) / cb.sum()
    diff = np.abs(fa - fb)
    ks = float(diff.max())
    w1 = float(np.sum(diff[:-1] * np.diff(uniq))) if len(uniq) > 1 else 0.0
    return ks, w1
