"""Production job entry point — run via spark-submit:

    spark-submit --py-files ddsketchy_spark.zip tools/submit_job.py \
        --input /path/to/tokens_parquet_or_iceberg_table \
        --checkpoint /shared/ckpt/run1 \
        --by source --alpha 0.01 --quantiles 0.5,0.9,0.99,0.999

Builds DDSketch quantile summaries of n_tok (global and per `by` key) over
the Iceberg-shaped token table, with stage-1 per-partition checkpointing so
a preempted job resumes where it stopped. Prints one JSON line per result.

Build the zip with:  python tools/submit_job.py --make-zip ddsketchy_spark.zip
(get_spark also auto-ships the package when run as a plain script.)
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_zip(path: str) -> None:
    import zipfile

    pkg = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "ddsketchy_spark")
    with zipfile.ZipFile(path, "w") as zf:
        for root, _d, files in os.walk(pkg):
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    zf.write(full, os.path.relpath(full, os.path.dirname(pkg)))
    print(f"wrote {path}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--make-zip", metavar="PATH")
    ap.add_argument("--input")
    ap.add_argument("--value-col", default="n_tok")
    ap.add_argument("--by", default=None)
    ap.add_argument("--alpha", type=float, default=0.01)
    ap.add_argument("--max-bins", type=int, default=4096)
    ap.add_argument("--quantiles", default="0.5,0.9,0.99,0.999")
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--engine", default="native",
                    choices=["native", "arrow", "direct"])
    ap.add_argument("--master", default=None)
    args = ap.parse_args()

    if args.make_zip:
        make_zip(args.make_zip)
        return
    if not args.input:
        ap.error("--input is required")

    from ddsketchy_spark.data.synth import read_tokens
    from ddsketchy_spark.spark.ddsketch_agg import (
        DDSketchAggregator,
        ddsketch_quantiles,
    )
    from ddsketchy_spark.spark.session import get_spark

    qs = tuple(float(x) for x in args.quantiles.split(","))
    spark = get_spark("ddsketchy-job", master=args.master)
    t0 = time.perf_counter()

    if args.engine == "direct":
        # pyarrow-direct row-group scan, optional split-level resume
        if args.by:
            ap.error("--engine direct supports global aggregation only")
        from ddsketchy_spark.spark.arrow_scan import sketch_aggregate_parquet

        agg = DDSketchAggregator(args.value_col, alpha=args.alpha,
                                 max_bins=args.max_bins, quantiles=qs)
        out = sketch_aggregate_parquet(spark, args.input, agg,
                                       ckpt_dir=args.checkpoint)
        out["seconds"] = round(time.perf_counter() - t0, 3)
        print(json.dumps({"scope": "global", "engine": "direct", **out}))
        spark.stop()
        return

    df = read_tokens(spark, args.input)

    if args.checkpoint and not args.by:
        from ddsketchy_spark.spark.checkpoint import (
            checkpoint_summary,
            checkpointed_sketch_aggregate,
        )

        agg = DDSketchAggregator(args.value_col, alpha=args.alpha,
                                 max_bins=args.max_bins, quantiles=qs)
        out = checkpointed_sketch_aggregate(df, agg, args.checkpoint)
        out.pop("state", None)
        out["lineage"] = checkpoint_summary(args.checkpoint)
        out["seconds"] = round(time.perf_counter() - t0, 3)
        print(json.dumps({"scope": "global", **out}))
    else:
        by = [args.by] if args.by else None
        res = ddsketch_quantiles(df, args.value_col, by=by, alpha=args.alpha,
                                 max_bins=args.max_bins, quantiles=qs,
                                 engine=args.engine)
        if by:
            for row in res.collect():
                print(json.dumps({"scope": args.by, **row.asDict()}))
        else:
            print(json.dumps({"scope": "global", "seconds":
                              round(time.perf_counter() - t0, 3), **res}))
    spark.stop()


if __name__ == "__main__":
    main()
