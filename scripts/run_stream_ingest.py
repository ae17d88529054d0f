"""spark-submit entry point: continuously ingest a growing corpus
directory into the durable 1m tier store (exactly-once).

    spark-submit --py-files engine.zip scripts/run_stream_ingest.py \
        <input-path> <output-root> [options]

The streaming counterpart of run_rollup_job.py: a file-source stream →
watermarked 1m rollup (append mode: each bucket emits once, when the
watermark passes its end) → ``stream_into_snapshot`` into
``<output-root>/agg_1m`` — the same snapshot table the batch job
maintains, so cascades, the range router and compaction run unchanged
on it. Restarts resume from the checkpoint; replayed micro-batches are
no-ops (the manifest commit is the batch registry).

Options:
    --watermark S        late-data allowance (default "2 minutes")
    --trigger-seconds N  micro-batch cadence (default: availableNow —
                         drain what's there and exit, cron-friendly)
    --distinct-col COL   also stream an HLL distinct 1m tier into
                         <output-root>/dist_1m
"""

from __future__ import annotations

import argparse
import json

from pyspark.sql import SparkSession


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("input_path")
    ap.add_argument("out_root")
    ap.add_argument("--watermark", default="2 minutes")
    ap.add_argument("--trigger-seconds", type=int, default=None)
    ap.add_argument("--distinct-col", default=None)
    args = ap.parse_args()

    spark = SparkSession.builder.getOrCreate()
    spark.conf.set("spark.sql.ansi.enabled", "false")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.execution.arrow.pyspark.enabled", "true")

    from getml_community_spark.checkpoint import SnapshotTable
    from getml_community_spark.streaming.stream_rollup import (
        stream_corpus_reader,
        stream_distinct,
        stream_into_snapshot,
        stream_rollup,
    )

    def start(tier_stream, table_name, key):
        table = SnapshotTable(
            f"{args.out_root}/{table_name}", partition_by=["day"]
        )
        writer = stream_into_snapshot(
            tier_stream,
            table,
            f"{args.out_root}/ckpt_{key}",
            stream_key=key,
        )
        if args.trigger_seconds:
            writer = writer.trigger(processingTime=f"{args.trigger_seconds} seconds")
        else:
            writer = writer.trigger(availableNow=True)
        return table, writer.start()

    stream = stream_corpus_reader(spark, args.input_path)
    agg = stream_rollup(stream, "1m", watermark=args.watermark)
    t1, q1 = start(agg, "agg_1m", "agg_1m")
    queries = [q1]
    if args.distinct_col:
        dist = stream_distinct(
            stream_corpus_reader(spark, args.input_path),
            "1m",
            distinct_col=args.distinct_col,
            watermark=args.watermark,
        )
        _, q2 = start(dist, "dist_1m", "dist_1m")
        queries.append(q2)
    for q in queries:
        q.awaitTermination()
    print(
        json.dumps(
            {
                "ingested_snapshot": t1.current_snapshot_id(),
                "agg_1m_partitions": len(t1.partitions()),
            }
        )
    )


if __name__ == "__main__":
    main()
