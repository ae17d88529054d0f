"""spark-submit entry point: run (or resume) the tiered rollup job.

    spark-submit --py-files engine.zip scripts/run_rollup_job.py \
        <input-path> <output-root> [options]

Options (all optional):
    --max-partitions N     process at most N pending input days (resume
                           by re-submitting; state lives in the output)
    --hist-bin-width W     also maintain mergeable histogram tiers
    --distinct-col COL     also maintain HLL distinct-count tiers of COL
    --compact              run the compaction maintenance pass after the
                           rollup (rewrite fragmented day partitions)
    --expire-snapshots N   keep only the newest N snapshot manifests per
                           table and remove orphan data dirs
    --query FROM TO STEP   after the run, serve a range query (epoch
                           seconds, step-aligned) via the tier router
                           and print the first rows

The job summary (and any query result sample) prints as JSON lines, so
a scheduler can parse progress from stdout.
"""

from __future__ import annotations

import argparse
import json

from pyspark.sql import SparkSession

from getml_community_spark.plans import RollupJob, RollupSpec


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("input_path")
    ap.add_argument("out_root")
    ap.add_argument("--max-partitions", type=int, default=None)
    ap.add_argument("--hist-bin-width", type=float, default=None)
    ap.add_argument("--distinct-col", default=None)
    ap.add_argument("--compact", action="store_true")
    ap.add_argument("--expire-snapshots", type=int, default=None)
    ap.add_argument("--query", nargs=3, type=int, metavar=("FROM", "TO", "STEP"))
    args = ap.parse_args()

    spark = SparkSession.builder.getOrCreate()
    # engine-required session confs (runtime-settable): the overflow-
    # wrapping xxhash64 fingerprint sums and NaN aggregation semantics
    # need ANSI off (Spark 4 defaults on); timestamps are UTC epochs;
    # the Gorilla codec path is Arrow-vectorized
    spark.conf.set("spark.sql.ansi.enabled", "false")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.execution.arrow.pyspark.enabled", "true")
    spec = RollupSpec(
        hist_bin_width=args.hist_bin_width, distinct_col=args.distinct_col
    )
    job = RollupJob(spark, spec, args.input_path, args.out_root)
    summary = job.run(max_partitions=args.max_partitions)
    print(json.dumps(summary, default=str))

    if args.compact:
        print(json.dumps({"compact": job.compact()}, default=str))
    if args.expire_snapshots is not None:
        reports = {}
        for name, table in job._all_tables().items():
            reports[name] = table.expire_snapshots(
                keep_last=args.expire_snapshots, remove_orphan_data=True
            )
        print(json.dumps({"expire_snapshots": reports}, default=str))
    if args.query:
        t_from, t_to, step = args.query
        sample = job.query_range(t_from, t_to, step).limit(20).collect()
        print(
            json.dumps(
                {"query_range": [r.asDict() for r in sample]}, default=str
            )
        )


if __name__ == "__main__":
    main()
