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

__all__ = ["hash_sample", "stratified_sample", "token_budget_sample"]

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


def token_budget_sample(
    df: DataFrame,
    id_col: str,
    strata_col: str,
    token_col: str,
    budgets: dict[str, int],
    default_budget: int = 0,
    seed: str = "",
    audit_cols: bool = False,
) -> DataFrame:
    """Mixture construction by TOKEN budget instead of row rate: for each
    stratum, take documents in deterministic ``sample_bucket`` order
    (ties broken by id) until the stratum's cumulative token count
    reaches its budget — the last document that crosses the budget is
    still included, so every stratum with a positive budget and any data
    contributes at least one document.

    This is how pre-training mixtures are actually specified ("30B
    tokens of code, 10B of news"): a per-source ROW rate over-samples
    sources with long documents; budgeting the running token sum hits
    the target directly, reproducibly (same hash order every run).

    Scale shape: one shuffle (window partitioned by stratum, ordered by
    bucket) carrying (id, stratum, n_tok) only via the window's
    projection; the running sum is streaming window state — no
    collect, no per-stratum driver loop. Skewed strata parallelize
    across their window partition like any other windowed op; for a
    stratum holding most of the corpus, pre-filter with
    :func:`stratified_sample` at a generous rate first to cut the
    window's input.
    """
    for s, b in budgets.items():
        if b < 0:
            raise ValueError(f"budget for stratum {s!r} must be >= 0")
    from pyspark.sql import Window

    budget: Column = F.lit(int(default_budget))
    for s, b in sorted(budgets.items()):
        budget = F.when(F.col(strata_col) == s, F.lit(int(b))).otherwise(budget)
    # collision-safe working names (round-4 advice): an input frame may
    # legitimately carry 'sample_bucket'/'cum_tok' already — never
    # overwrite or silently drop caller columns; only the audit_cols
    # aliasing claims the public names, and loudly
    if audit_cols:
        clash = {"sample_bucket", "cum_tok"} & set(df.columns)
        if clash:
            raise ValueError(
                f"audit_cols=True would overwrite input column(s) "
                f"{sorted(clash)}; rename them or pass audit_cols=False"
            )
    bucket = sample_bucket(F.col(id_col), seed)
    w = Window.partitionBy(strata_col).orderBy(bucket, F.col(id_col))
    running = F.sum(F.col(token_col).cast("long")).over(w)
    prev = running - F.col(token_col).cast("long")
    # keep while the PREVIOUS cumulative sum is under budget: the
    # crossing document is included, everything after it drops
    out = (
        df.withColumn("__sample_bucket", bucket)
        .withColumn("__cum_tok", running)
        .withColumn("__prev_tok", prev)
        .where((F.col("__prev_tok") < budget) & (budget > 0))
        .drop("__prev_tok")
    )
    if not audit_cols:
        return out.drop("__sample_bucket", "__cum_tok")
    # audit_cols exposes (sample_bucket, cum_tok) for reproducibility
    # audits and the oracle gate
    return out.withColumnRenamed(
        "__sample_bucket", "sample_bucket"
    ).withColumnRenamed("__cum_tok", "cum_tok")
