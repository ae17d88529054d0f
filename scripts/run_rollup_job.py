"""spark-submit entry point: run (or resume) the tiered rollup job.

    spark-submit --py-files engine.zip scripts/run_rollup_job.py \
        <input-path> <output-root> [max_partitions]
"""

from __future__ import annotations

import json
import sys

from pyspark.sql import SparkSession

from getml_community_spark.plans import RollupJob, RollupSpec


def main() -> None:
    input_path, out_root = sys.argv[1], sys.argv[2]
    max_partitions = int(sys.argv[3]) if len(sys.argv) > 3 else None
    spark = SparkSession.builder.getOrCreate()
    job = RollupJob(spark, RollupSpec(), input_path, out_root)
    summary = job.run(max_partitions=max_partitions)
    print(json.dumps(summary, default=str))


if __name__ == "__main__":
    main()
