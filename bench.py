"""Benchmark harness (driver contract).

Prints ONE JSON line:
  {"metric": "...", "value": <hot-path wall sec>, "unit": "sec",
   "queries": {<name>: sec, ...}, "sf": <sf>, "tokens_per_sec": ...}

Two parts:
1. HOT PATH — the north-rule pipeline over the synthesized tokenized
   corpus (datagen, FIXTURES.md §1): parquet scan → 1m rollup →
   1h/1d cascade → gap-fill → Gorilla-encode — timed end-to-end;
   throughput reported as tokens/sec (Σ n_tok / wall).
2. HEADLINE QUERIES — a subset of __spark_entry__.queries() at
   $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), per-query wall
   seconds.

Env knobs: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS (local[n]),
SPARK_GRAFT_BENCH_N (corpus rows, default 2_000_000),
SPARK_GRAFT_BENCH_DIR (corpus cache dir, default /tmp/gcs_bench).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "rollup_1m",
    "rollup_1h_cascade",
    "rollup_1d_cascade",
    "gapfill_1h",
    "battery_1h",
    "gorilla_roundtrip_1m",
    "asof_orders_events",
    "fastprop_features",
    "pricing_summary",
    "exact_dedup",
    "text_stats",
    "brute_topk",
    "minhash_dedup",
    "simhash_pairs",
    "lag_rolling_1h",
    "sliding_window",
    "pack_stats",
    "gopher_quality",
    "decontamination",
    "tfidf_topk",
    "lttb_6h",
    "anomaly_1h",
    "stratified_sample",
    "sax_daily",
    "pii_redact",
    "png_decode",
    "seasonal_decompose",
    "token_budget_sample",
    "cusum_1h",
    "deseasonal_anomaly",
    "m4_6h",
    "jpeg_decode",
    "sessions_30m",
    "lm_perplexity",
    "repetition_stats",
    "line_dedup",
    "hist_quantile_1h",
    "mjpeg_frames",
    "counter_rate_1h",
    "range_rebucket_2h",
    "distinct_hll_1h",
    "exactsubstr_spans",
    "token_neardup",
    "token_chunks",
    "semdedup",
    "text_normalize",
    "bm25",
]


def _ensure_corpus(spark, n: int, path: str) -> None:
    marker = os.path.join(path, "_SUCCESS_N")
    if os.path.exists(marker):
        with open(marker) as f:
            if f.read().strip() == str(n):
                return
    from getml_community_spark.datagen import write_corpus_parquet

    write_corpus_parquet(spark, n, path, with_tokens=False)
    with open(marker, "w") as f:
        f.write(str(n))


def run_hot_path(spark, corpus_path: str) -> dict:
    """The Gorilla-encode + windowed-aggregate hot path, timed."""
    from pyspark.sql import functions as F

    from getml_community_spark.functions.gorilla import compress_rollup
    from getml_community_spark.operators.gapfill import gapfill
    from getml_community_spark.operators.rollup import (
        rollup_cascade,
        rollup_from_raw,
    )

    df = spark.read.parquet(corpus_path)

    from concurrent.futures import ThreadPoolExecutor

    def pipeline():
        # Materialize the shared tiers once, then run the three
        # independent sinks (Gorilla stats, 1d tier, gap-filled 1h) as
        # CONCURRENT jobs — the production shape for independent
        # outputs, and it keeps the executor pool full through each
        # job's few-partition tail stages (measured: 8.7 s → 5.4 s at
        # 2M rows, with far lower run-to-run spread).
        agg1m = rollup_from_raw(df, "1m")
        agg1m.persist().count()
        agg1h = rollup_cascade(agg1m, "1h").persist()  # reused by 1d + gapfill
        agg1h.count()
        segs = compress_rollup(agg1m, value_col="rate")
        with ThreadPoolExecutor(3) as ex:
            f_stats = ex.submit(
                lambda: segs.agg(
                    F.sum("n_points").alias("pts"),
                    F.sum("bytes_compressed").alias("bc"),
                    F.sum("bytes_raw").alias("br"),
                ).collect()[0]
            )
            f_1d = ex.submit(lambda: rollup_cascade(agg1h, "1d").count())
            f_dense = ex.submit(lambda: gapfill(agg1h, 3600).count())
            stats, n_1d, n_dense = f_stats.result(), f_1d.result(), f_dense.result()
        agg1m.unpersist()
        agg1h.unpersist()
        return stats, n_1d, n_dense

    # Warmup: spin up Python UDF workers + JIT the codegen once, so the
    # timed runs measure steady-state throughput (the regime that matters
    # at 100 TB), not one-time JVM/Python process startup. Then take the
    # min of timed runs (min filters scheduler noise) — but REFUSE to
    # publish an unconverged headline: on a loaded box the walls keep
    # falling monotonically because warmup never finished (round-4
    # driver run: [28.7, 15.5, 13.6] published as 13.6 — a 2.3x phantom
    # regression). Keep timing (<= 6 reps) until the two BEST walls
    # agree within 15%; otherwise flag "converged": false in the JSON.
    pipeline()
    walls = []
    converged = False
    for rep in range(6):
        t0 = time.time()
        stats, n_1d, n_dense = pipeline()
        walls.append(time.time() - t0)
        if rep >= 2:
            best, second = sorted(walls)[:2]
            if second <= best * 1.15:
                converged = True
                break
    wall = min(walls)
    toks = df.agg(F.sum("n_tok")).collect()[0][0]
    # untimed: the production-shaped Gorilla ratio. The hot path encodes
    # `rate` (continuous doubles — the codec's WORST case: XOR of
    # unequal doubles never zeroes, so value entropy floors the ratio
    # near 1.7x). Monitoring tiers store counters/gauges where values
    # repeat — encode the cnt tier too and report both ratios.
    cnt_stats = (
        compress_rollup(rollup_from_raw(df, "1m"), value_col="cnt")
        .agg(
            F.sum("bytes_compressed").alias("bc"),
            F.sum("bytes_raw").alias("br"),
        )
        .collect()[0]
    )
    return {
        "wall_sec": wall,
        "tokens": int(toks),
        "tokens_per_sec": toks / wall,
        "rows_1d": n_1d,
        "rows_dense_1h": n_dense,
        "walls": [round(w, 3) for w in walls],
        "converged": converged,
        "gorilla_points": int(stats["pts"]),
        "gorilla_bytes": int(stats["bc"]),
        "gorilla_ratio": float(stats["br"]) / float(stats["bc"]),
        "gorilla_ratio_cnt": float(cnt_stats["br"]) / float(cnt_stats["bc"]),
    }


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    bench_n = int(os.environ.get("SPARK_GRAFT_BENCH_N", "2000000"))
    bench_dir = os.environ.get("SPARK_GRAFT_BENCH_DIR", "/tmp/gcs_bench")
    corpus_path = os.path.join(bench_dir, f"corpus_{bench_n}")

    from getml_community_spark.session import get_spark

    spark = get_spark(app_name="bench", cores=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    _ensure_corpus(spark, bench_n, corpus_path)
    hot = run_hot_path(spark, corpus_path)

    import __spark_entry__ as entrymod

    qtimes: dict[str, float] = {}
    qs = entrymod.queries() if not os.environ.get("SPARK_GRAFT_SKIP_QUERIES") else {}
    for name in (HEADLINE if qs else []):
        fn = qs[name]
        # warm once (JVM/py-worker buffer first-touch on this host costs
        # seconds and lands on whichever query allocates first), then
        # report the best of two steady-state runs — single timings on
        # this host carry multi-second scheduler/page-fault jitter
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        best = float("inf")
        for _ in range(2):
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            best = min(best, time.time() - t0)
        qtimes[name] = round(best, 3)

    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0.1)
    print(
        json.dumps(
            {
                "metric": "rollup_hot_path_wall_sec",
                "value": round(hot["wall_sec"], 3),
                "unit": "sec",
                "queries": qtimes,
                "sf": sf,
                "tokens_per_sec": round(hot["tokens_per_sec"]),
                "tokens": hot["tokens"],
                "bench_rows": bench_n,
                "cpus": cpus,
                "gorilla_ratio": round(hot["gorilla_ratio"], 3),
                "gorilla_ratio_cnt": round(hot["gorilla_ratio_cnt"], 3),
                "walls": hot.get("walls"),
                "converged": hot.get("converged"),
            }
        )
    )


if __name__ == "__main__":
    main()
