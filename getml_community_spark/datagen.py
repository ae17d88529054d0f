"""Deterministic tokenized-corpus generator (FIXTURES.md §1).

Schema (BASELINE.json input_hint):
    doc_id string, tokens array<int>, n_tok int, source string,
    event_time timestamp

Every row is independently reproducible from ``numpy.default_rng(42+i)``
so a distributed generator (``spark.range(N)`` split across executors)
and the local pandas oracle generator produce byte-identical rows —
the per-row invariant tests depend on this.

Per-source structure: ``source`` is Zipf(a=1.3) over 200 names (so
``src-000`` carries ~25% of rows — the hot key the skew machinery must
handle), and each source has 2 deterministic dead windows of 1–6 h
inside the 14-day span (2025-01-01..2025-01-15) to exercise gap-fill.
Arrival times are uniform over the source's allowed (non-dead) time —
equivalent to a Poisson process conditioned on N arrivals.

Design note (scale): generation is embarrassingly parallel over the id
range; ``spark.range`` gives splittable, locality-free input so this
scales linearly with executors — that is what lets the same generator
back the 5M-row bench and the 10k-row unit tests.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

EPOCH_START = np.datetime64("2025-01-01T00:00:00", "s").astype("int64")  # 1735689600
SPAN_SECONDS = 14 * 24 * 3600
N_SOURCES = 200
VOCAB = 50257
SEED = 42

CORPUS_SCHEMA = (
    "doc_id string, tokens array<int>, n_tok int, source string, event_time timestamp"
)


def _source_allowed_intervals(k: int) -> np.ndarray:
    """Allowed (non-dead) [start, end) second-offsets for source k.

    Two dead windows of 1–6 h at deterministic positions from
    ``default_rng(1000+k)``. Returns array of shape (m, 2).
    """
    rng = np.random.default_rng(1000 + k)
    starts = np.sort(rng.uniform(0, SPAN_SECONDS - 6 * 3600, size=2))
    durs = rng.uniform(3600, 6 * 3600, size=2)
    dead: list[tuple[float, float]] = []
    for s, d in zip(starts, durs):
        e = min(s + d, SPAN_SECONDS)
        if dead and s <= dead[-1][1]:  # merge overlap
            dead[-1] = (dead[-1][0], max(dead[-1][1], e))
        else:
            dead.append((s, e))
    allowed = []
    cur = 0.0
    for s, e in dead:
        if s > cur:
            allowed.append((cur, s))
        cur = max(cur, e)
    if cur < SPAN_SECONDS:
        allowed.append((cur, SPAN_SECONDS))
    return np.asarray(allowed, dtype=np.float64)


class _SourceMeta:
    """Precomputed per-source allowed intervals + cumulative lengths."""

    __slots__ = ("intervals", "cum", "total")

    def __init__(self, k: int):
        self.intervals = _source_allowed_intervals(k)
        lens = self.intervals[:, 1] - self.intervals[:, 0]
        self.cum = np.concatenate([[0.0], np.cumsum(lens)])
        self.total = float(self.cum[-1])

    def map_uniform(self, u: float) -> float:
        """Map u ∈ [0, total) onto allowed time (second offset)."""
        j = int(np.searchsorted(self.cum, u, side="right")) - 1
        j = min(max(j, 0), len(self.intervals) - 1)
        return float(self.intervals[j, 0] + (u - self.cum[j]))


_SOURCE_META: list[_SourceMeta] | None = None


def _source_meta() -> list[_SourceMeta]:
    global _SOURCE_META
    if _SOURCE_META is None:
        _SOURCE_META = [_SourceMeta(k) for k in range(N_SOURCES)]
    return _SOURCE_META


def gen_rows(ids: np.ndarray, with_tokens: bool = True) -> pd.DataFrame:
    """Generate corpus rows for the given ids (vector of int64)."""
    meta = _source_meta()
    n = len(ids)
    doc_id = np.empty(n, dtype=object)
    n_tok = np.empty(n, dtype=np.int32)
    source = np.empty(n, dtype=object)
    epoch = np.empty(n, dtype=np.float64)
    tokens: list | None = [None] * n if with_tokens else None
    for j, i in enumerate(ids):
        i = int(i)
        rng = np.random.default_rng(SEED + i)
        nt = int(np.clip(np.round(rng.lognormal(5.5, 0.8)), 1, 8192))
        k = int((rng.zipf(1.3) - 1) % N_SOURCES)
        u = rng.uniform(0.0, meta[k].total)
        doc_id[j] = f"doc-{i:012d}"
        n_tok[j] = nt
        source[j] = f"src-{k:03d}"
        epoch[j] = EPOCH_START + meta[k].map_uniform(u)
        if tokens is not None:
            tokens[j] = rng.integers(0, VOCAB, size=nt, dtype=np.int32)
    out = pd.DataFrame(
        {
            "doc_id": doc_id,
            "tokens": tokens
            if tokens is not None
            else [np.empty(0, dtype=np.int32)] * n,
            "n_tok": n_tok,
            "source": source,
            # microsecond precision (Spark TimestampType is µs; keeping the
            # generator at µs makes pandas and Spark rows byte-identical)
            "event_time": pd.to_datetime(
                np.round(epoch * 1e6).astype("int64"), unit="us"
            ),
        }
    )
    return out


def corpus_pandas(n: int, with_tokens: bool = True) -> pd.DataFrame:
    """Local (driver-side) corpus — the oracle's copy."""
    return gen_rows(np.arange(n, dtype=np.int64), with_tokens=with_tokens)


def corpus_spark(spark, n: int, with_tokens: bool = True, parallelism: int | None = None):
    """Distributed corpus as a Spark DataFrame.

    ``spark.range`` is splittable, so generation parallelizes across all
    cores/executors; each task regenerates only its id slice.
    """
    parallelism = parallelism or spark.sparkContext.defaultParallelism

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield gen_rows(pdf["id"].to_numpy(), with_tokens=with_tokens)

    return (
        spark.range(0, n, numPartitions=parallelism)
        .mapInPandas(gen, schema=CORPUS_SCHEMA)
    )


def write_corpus_parquet(spark, n: int, path: str, with_tokens: bool = True) -> None:
    """Materialize the corpus partitioned by event date (the layout the
    engine's partition-pruning + resume logic assumes)."""
    from pyspark.sql import functions as F

    df = corpus_spark(spark, n, with_tokens=with_tokens)
    (
        df.withColumn("event_date", F.to_date("event_time"))
        .write.mode("overwrite")
        .partitionBy("event_date")
        .parquet(path)
    )
