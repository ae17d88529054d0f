"""Deterministic (reproducible) corpus sampling.

Training pipelines sample by CONTENT-STABLE hash, not rand(): the same
document gets the same keep/drop decision on every run, on any cluster
layout, under retries — rand()-based sampling breaks exact-resume and
ablation reproducibility (the reference pins sampling the same way:
random.hpp seeded per column, SURVEY §2.2 'random').

The hash is the first 8 hex chars of md5(id || seed) — chosen over
xxhash64 because md5 exists in every engine, so the SAME sample is
reproducible in DuckDB/Trino/Postgres for audits (and in this repo's
oracle gate). Uniformity of md5 prefixes is textbook; 32 bits of hash
against per-million rates is plenty.

Pure map — no shuffle, no state; Catalyst pushes the filter to the
scan when the id column is available there.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

__all__ = ["hash_sample", "stratified_sample"]

_M = 1_000_000


def sample_bucket(id_col: Column, seed: str = "") -> Column:
    """Deterministic per-row bucket in [0, 1e6): md5-prefix mod 1e6."""
    h = F.conv(
        F.substring(F.md5(F.concat(id_col.cast("string"), F.lit(seed))), 1, 8),
        16,
        10,
    ).cast("long")
    return h % _M


def hash_sample(
    df: DataFrame, id_col: str, rate: float, seed: str = ""
) -> DataFrame:
    """Keep ~``rate`` of rows, deterministically by ``id_col``."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError("rate must be in [0, 1]")
    return df.where(sample_bucket(F.col(id_col), seed) < int(rate * _M))


def stratified_sample(
    df: DataFrame,
    id_col: str,
    strata_col: str,
    rates: dict[str, float],
    default_rate: float = 0.0,
    seed: str = "",
) -> DataFrame:
    """Per-stratum deterministic sampling: stratum s keeps ~rates[s] of
    its rows (``default_rate`` for strata not listed). The per-source
    mixing-weight primitive of corpus curation (upsample code, downsample
    crawl) with exact reproducibility."""
    for s, r in rates.items():
        if not 0.0 <= r <= 1.0:
            raise ValueError(f"rate for stratum {s!r} must be in [0, 1]")
    thresh: Column = F.lit(int(default_rate * _M))
    for s, r in sorted(rates.items()):
        thresh = F.when(F.col(strata_col) == s, int(r * _M)).otherwise(thresh)
    return df.where(sample_bucket(F.col(id_col), seed) < thresh)
