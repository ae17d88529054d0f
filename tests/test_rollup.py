"""Tier-exactness: Spark rollups vs the pandas/numpy oracle, exactly."""

from __future__ import annotations

import numpy as np
import pandas as pd

from getml_community_spark.operators.gapfill import gapfill
from getml_community_spark.operators.rollup import (
    TIER_SECONDS,
    rollup_cascade,
    rollup_from_raw,
    salted_rollup,
)

from .conftest import assert_frames_equal_unordered


def golden_rollup(pdf: pd.DataFrame, tier_seconds: int) -> pd.DataFrame:
    epoch = pdf["event_time"].astype("int64") // 10**9
    bucket = (epoch // tier_seconds) * tier_seconds
    g = (
        pdf.assign(bucket=pd.to_datetime(bucket, unit="s"))
        .groupby(["source", "bucket"])["n_tok"]
        .agg(cnt="count", sum_n_tok="sum", min_n_tok="min", max_n_tok="max")
        .reset_index()
        .rename(columns={"bucket": "bucket_start"})
    )
    g["rate"] = g["sum_n_tok"] / float(tier_seconds)
    g["cnt"] = g["cnt"].astype("int64")
    g["sum_n_tok"] = g["sum_n_tok"].astype("int64")
    g["min_n_tok"] = g["min_n_tok"].astype("int32")
    g["max_n_tok"] = g["max_n_tok"].astype("int32")
    return g


def test_rollup_1m_exact(spark, corpus_df, corpus_pdf):
    got = rollup_from_raw(corpus_df, "1m").toPandas()
    want = golden_rollup(corpus_pdf, 60)
    assert_frames_equal_unordered(got, want, ["source", "bucket_start"])


def test_cascade_1h_1d_exact(spark, corpus_df, corpus_pdf):
    agg_1m = rollup_from_raw(corpus_df, "1m").cache()
    agg_1h = rollup_cascade(agg_1m, "1h")
    agg_1d = rollup_cascade(agg_1h, "1d")
    assert_frames_equal_unordered(
        agg_1h.toPandas(), golden_rollup(corpus_pdf, 3600), ["source", "bucket_start"]
    )
    assert_frames_equal_unordered(
        agg_1d.toPandas(), golden_rollup(corpus_pdf, 86400), ["source", "bucket_start"]
    )


def test_salted_equals_plain(spark, corpus_df):
    plain = rollup_from_raw(corpus_df, "1m").toPandas()
    salted = salted_rollup(corpus_df, "1m", salt_buckets=8).toPandas()
    assert_frames_equal_unordered(salted, plain, ["source", "bucket_start"])


def test_gapfill_dense_and_zeroed(spark, corpus_df, corpus_pdf):
    agg = rollup_from_raw(corpus_df, "1h")
    dense = gapfill(agg, 3600).toPandas()
    # dense: every source covers every hour between its min and max
    for src, grp in dense.groupby("source"):
        lo, hi = grp["bucket_start"].min(), grp["bucket_start"].max()
        expect_n = int((hi - lo).total_seconds() // 3600) + 1
        assert len(grp) == expect_n, src
        assert grp["bucket_start"].is_unique
    gaps = dense[dense["cnt"] == 0]
    assert len(gaps) > 0  # dead windows guarantee gaps exist
    assert (gaps["sum_n_tok"] == 0).all()
    assert (gaps["rate"] == 0.0).all()
    assert gaps["min_n_tok"].isna().all() and gaps["max_n_tok"].isna().all()
    # non-gap rows identical to the sparse rollup
    want = golden_rollup(corpus_pdf, 3600)
    got = dense[dense["cnt"] > 0].reset_index(drop=True)
    got = got.astype({"cnt": "int64", "sum_n_tok": "int64"})
    want = want.astype({"min_n_tok": "float", "max_n_tok": "float"})
    got = got.astype({"min_n_tok": "float", "max_n_tok": "float"})
    assert_frames_equal_unordered(got, want, ["source", "bucket_start"])


def test_gapfill_windowed_equals_join_spine(spark, corpus_df):
    """r6 optimization: the lag-window gap generator must produce the
    EXACT row set and values of the spine-join path (same [min, max]
    span per source, typed zero/NULL gap literals)."""
    agg = rollup_from_raw(corpus_df, "1h")
    join_form = gapfill(agg, 3600, windowed=False).toPandas()
    win_form = gapfill(agg, 3600, windowed=True).toPandas()
    assert_frames_equal_unordered(
        win_form, join_form, ["source", "bucket_start"]
    )


def test_corpus_invariants(corpus_pdf):
    # FIXTURES.md §1: n_tok == len(tokens); hot source ~25%
    assert (corpus_pdf["tokens"].map(len) == corpus_pdf["n_tok"]).all()
    frac = (corpus_pdf["source"] == "src-000").mean()
    assert 0.15 < frac < 0.35
    assert corpus_pdf["doc_id"].is_unique
    span_ok = (
        corpus_pdf["event_time"] >= pd.Timestamp("2025-01-01")
    ) & (corpus_pdf["event_time"] < pd.Timestamp("2025-01-15"))
    assert span_ok.all()


def test_spark_pandas_generators_identical(corpus_df, corpus_pdf):
    got = corpus_df.toPandas().sort_values("doc_id").reset_index(drop=True)
    want = corpus_pdf.sort_values("doc_id").reset_index(drop=True)
    assert (got["doc_id"] == want["doc_id"]).all()
    assert (got["n_tok"].to_numpy() == want["n_tok"].to_numpy()).all()
    assert (got["source"] == want["source"]).all()
    # token arrays byte-identical row by row (per-row invariant)
    for a, b in zip(got["tokens"], want["tokens"]):
        assert np.array_equal(np.asarray(a), np.asarray(b))
    # timestamps equal to the microsecond
    dt = (got["event_time"] - want["event_time"]).abs()
    assert (dt <= pd.Timedelta(microseconds=1)).all()


# ---- property-based: tier choice + step nesting (pure python) -------- #
try:
    from hypothesis import given, settings, strategies as st

    from getml_community_spark.operators.rollup import TIER_SECONDS, choose_tier

    @settings(max_examples=300, deadline=None)
    @given(
        mult=st.integers(min_value=1, max_value=10_000),
        base=st.sampled_from(["1m", "1h", "1d"]),
        epoch=st.integers(min_value=0, max_value=4_102_444_800),
    )
    def test_choose_tier_widest_divisor_and_nesting(mult, base, epoch):
        step = TIER_SECONDS[base] * mult
        tier = choose_tier(step)
        sec = TIER_SECONDS[tier]
        # the choice divides the step and is the WIDEST divisor
        assert step % sec == 0
        assert all(
            TIER_SECONDS[t] <= sec
            for t in TIER_SECONDS
            if step % TIER_SECONDS[t] == 0
        )
        # nesting: bucketing to the tier then to the step == direct step
        # bucketing (the identity rollup_to_step relies on, in the same
        # floor(epoch/sec)*sec integer form as _bucket_epoch)
        tier_bucket = epoch // sec * sec
        assert tier_bucket // step * step == epoch // step * step

except ImportError:  # pragma: no cover — hypothesis not installed
    pass
