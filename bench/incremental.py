"""Incremental-reconcile cost evidence (north rule: resumable jobs over
snapshot inputs).

Scenario: a day-partitioned SnapshotTable holds the full corpus and the
RollupJob store is caught up. A small late batch lands in ONE day (the
streaming-ingest steady state). The job must detect and re-roll exactly
that day; the question is what the DETECTION costs:

- incremental path (default for snapshot inputs): ``changes()`` lists
  the appended dirs, one small scan finds the touched days, and only
  those days are re-fingerprinted;
- full path (what a plain-directory input has to do): one fingerprint
  aggregation over the ENTIRE input.

Both paths then do identical re-roll work, so the wall difference is
pure reconcile cost — the part that grows with TABLE size instead of
DELTA size, i.e. the part that decides whether a 10^12-row table can
run a catch-up job every few minutes.

Usage: python bench/incremental.py [N_ROWS]   (default 100M)
Prints one JSON line; paste the table into BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    from pyspark.sql import functions as F

    from getml_community_spark.checkpoint import SnapshotTable
    from getml_community_spark.datagen import write_corpus_parquet
    from getml_community_spark.plans import RollupJob, RollupSpec
    from getml_community_spark.session import get_spark

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000_000
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    work = "/tmp/gcs_bench/incremental"
    shutil.rmtree(work, ignore_errors=True)
    spark = get_spark(
        master=f"local[{cpus}]",
        shuffle_partitions=2 * cpus,
        extra_conf={"spark.driver.memory": "48g"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    corpus_path = f"/tmp/gcs_bench/corpus_{n}"
    if not os.path.exists(corpus_path):
        write_corpus_parquet(spark, n, corpus_path, with_tokens=False)
    df = spark.read.parquet(corpus_path)

    ing = SnapshotTable(f"{work}/ing", partition_by=["event_date"])
    t0 = time.time()
    ing.append(df)
    ingest_s = time.time() - t0

    job = RollupJob(spark, RollupSpec(), ing.root, f"{work}/out")
    t0 = time.time()
    s0 = job.run()
    build_s = time.time() - t0
    assert s0["days_processed"] == s0["days_total"]

    day = sorted(
        str(r[0]) for r in df.select("event_date").distinct().collect()
    )[3]
    late = df.where(F.col("event_date").cast("string") == day).limit(100_000)

    def catch_up(force_full: bool) -> dict:
        ing.append(late)  # same-size late batch into the same day
        j = RollupJob(spark, RollupSpec(), ing.root, f"{work}/out")
        fp_days = {}
        orig = j._day_stats

        def spy(d):
            fp_days["n"] = d.select("event_date").distinct().count()
            return orig(d)

        j._day_stats = spy
        if force_full:
            def full(inp, last, in_snap=None):
                ds = spy(inp)
                return ds, {k: [v[0], v[1]] for k, v in ds.items()}, sorted(ds)

            j._refresh_day_stats = full
        # time the DETECTION phase (reconcile) separately from the
        # re-roll: at constant delta it is the only part that grows
        # with table size
        orig_refresh = j._refresh_day_stats

        def timed_refresh(inp, last, in_snap=None):
            t0 = time.time()
            out = orig_refresh(inp, last, in_snap=in_snap)
            fp_days["reconcile_s"] = round(time.time() - t0, 2)
            return out

        j._refresh_day_stats = timed_refresh
        t = time.time()
        s = j.run()
        return {
            "wall_s": round(time.time() - t, 2),
            "reconcile_s": fp_days.get("reconcile_s", 0.0),
            "days_rerolled": s["days_processed"],
            "days_fingerprinted": fp_days.get("n", 0),
        }

    inc = catch_up(force_full=False)
    full = catch_up(force_full=True)

    print(
        json.dumps(
            {
                "metric": "incremental_reconcile",
                "rows": n,
                "cpus": cpus,
                "ingest_s": round(ingest_s, 1),
                "initial_build_s": round(build_s, 1),
                "late_rows": 100_000,
                "incremental": inc,
                "full_rescan": full,
                "reconcile_speedup": round(full["reconcile_s"] / max(inc["reconcile_s"], 1e-9), 2),
            }
        )
    )


if __name__ == "__main__":
    main()
