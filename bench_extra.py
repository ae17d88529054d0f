"""Per-query isolation bench (guide §1.4) — NOT the driver contract.

Times individual queries() entries with the noop sink and optionally
dumps .explain("formatted") to plans/r06/<name>_<tag>.txt.

Usage:
  python bench_extra.py [--sf DIR] [--reps N] [--plan TAG] q1 q2 ...
  python bench_extra.py --hotpath          # time the bench.py hot path only

Env: SPARK_GRAFT_SF_DIR / SPARK_GRAFT_CPUS as in bench.py.
Prints one JSON line per query: {"query": ..., "walls": [...], "best": ...}.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="*")
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0"))
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--plan", default=None, help="dump explain to plans/r06/<q>_<TAG>.txt")
    ap.add_argument("--hotpath", action="store_true")
    args = ap.parse_args()

    from getml_community_spark.session import get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(app_name="bench_extra", cores=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    if args.hotpath:
        import bench as benchmod

        bench_n = int(os.environ.get("SPARK_GRAFT_BENCH_N", "2000000"))
        bench_dir = os.environ.get("SPARK_GRAFT_BENCH_DIR", "/tmp/gcs_bench")
        corpus_path = os.path.join(bench_dir, f"corpus_{bench_n}")
        benchmod._ensure_corpus(spark, bench_n, corpus_path)
        hot = benchmod.run_hot_path(spark, corpus_path)
        print(json.dumps({"hotpath_wall": hot["wall_sec"], "walls": hot["walls"],
                          "converged": hot["converged"]}))
        return

    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    os.makedirs(os.path.join(os.path.dirname(os.path.abspath(__file__)), "plans", "r06"), exist_ok=True)
    for name in args.queries:
        fn = qs[name]
        if args.plan:
            plan = fn(spark, args.sf)._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
            )
            with open(f"plans/r06/{name}_{args.plan}.txt", "w") as f:
                f.write(plan)
        spark.sparkContext.setJobDescription(f"bench_extra: {name} warm")
        fn(spark, args.sf).write.format("noop").mode("overwrite").save()
        walls = []
        for i in range(args.reps):
            spark.sparkContext.setJobDescription(f"bench_extra: {name} rep{i}")
            t0 = time.time()
            fn(spark, args.sf).write.format("noop").mode("overwrite").save()
            walls.append(round(time.time() - t0, 3))
        spark.sparkContext.setJobDescription(None)
        print(json.dumps({"query": name, "walls": walls, "best": min(walls)}),
              flush=True)


if __name__ == "__main__":
    main()
