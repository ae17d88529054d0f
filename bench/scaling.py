"""Scaling-efficiency evidence (north rule: ≥0.8 between N and 4N).

No real cluster exists in this sandbox, so the same hot-path job runs
at local[8] and local[32] (fresh JVM each, identical input) and we
report tokens/sec at both plus efficiency = (T8 / T32) / 4 — the
two-cluster-size criterion mapped onto parallelism levels, as specified
in BASELINE.md. Writes BENCH/BASELINE.md.

Usage: python bench/scaling.py [N_ROWS]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_at(cpus: int, bench_n: int) -> dict:
    env = dict(os.environ)
    env.update(
        SPARK_GRAFT_CPUS=str(cpus),
        SPARK_GRAFT_BENCH_N=str(bench_n),
        SPARK_GRAFT_SF_DIR=env.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"),
    )
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        capture_output=True,
        text=True,
        env=env,
        check=True,
    )
    line = [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    bench_n = int(sys.argv[1]) if len(sys.argv) > 1 else int(
        os.environ.get("SPARK_GRAFT_BENCH_N", "2000000")
    )
    results = {}
    for cpus in (8, 32):
        t0 = time.time()
        results[cpus] = run_at(cpus, bench_n)
        results[cpus]["harness_sec"] = round(time.time() - t0, 1)

    t8 = results[8]["value"]
    t32 = results[32]["value"]
    eff = (t8 / t32) / 4.0
    tps8 = results[8]["tokens_per_sec"]
    tps32 = results[32]["tokens_per_sec"]

    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as f:
        f.write(
            f"""# BENCH baseline — scaling evidence

Hot path: parquet scan -> 1m rollup -> 1h/1d cascade -> gap-fill ->
Gorilla encode, over the synthetic tokenized corpus
(N={bench_n:,} rows, {results[32]['tokens']:,} tokens), identical input
at both parallelism levels (the sandbox's stand-in for N vs 4N
executor clusters).

| parallelism | wall (s) | tokens/sec |
|---|---|---|
| local[8]  (N)  | {t8:.2f} | {tps8:,.0f} |
| local[32] (4N) | {t32:.2f} | {tps32:,.0f} |

**speedup 8->32:** {t8 / t32:.2f}x
**scaling efficiency (T8/T32)/4:** {eff:.3f} (target >= 0.8)

Gorilla compression ratio at 1m tier: {results[32]['gorilla_ratio']:.2f}x.

Per-query seconds at local[32], sf dir {os.environ.get('SPARK_GRAFT_SF_DIR', '/root/testdata/sf0.01')}:

| query | sec |
|---|---|
"""
            + "\n".join(
                f"| {k} | {v} |" for k, v in results[32]["queries"].items()
            )
            + "\n"
        )
    print(json.dumps({"efficiency": round(eff, 3), "t8": t8, "t32": t32,
                      "tokens_per_sec_32": tps32}))


if __name__ == "__main__":
    main()
