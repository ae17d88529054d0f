"""Gorilla codec: decode∘encode == identity (the per-row invariant),
compression actually compresses, and the Spark plumbing round-trips."""

from __future__ import annotations

import numpy as np
import pytest

from getml_community_spark.functions.gorilla import (
    compress_rollup,
    decode_segment,
    decompress_segments,
    encode_segment,
)


def _roundtrip(ts, vals):
    blob = encode_segment(np.asarray(ts, np.int64), np.asarray(vals, np.float64))
    ts2, v2 = decode_segment(blob)
    assert np.array_equal(ts2, np.asarray(ts, np.int64))
    # bit-exact float equality including NaN payloads
    assert np.array_equal(
        np.asarray(vals, np.float64).view(np.uint64), v2.view(np.uint64)
    )
    return blob


def test_empty_and_single():
    _roundtrip([], [])
    _roundtrip([1735689600], [3.14])


def test_regular_series_compresses_well():
    n = 1440
    ts = 1735689600 + 60 * np.arange(n)
    vals = np.full(n, 123.25)
    blob = _roundtrip(ts, vals)
    # constant deltas + constant values → ~2 bits/point
    assert len(blob) < n * 16 / 20, len(blob)


def test_irregular_series_roundtrip():
    rng = np.random.default_rng(7)
    ts = np.sort(rng.integers(0, 10**9, size=5000))
    vals = rng.normal(size=5000) * rng.choice([1.0, 1e-12, 1e12], size=5000)
    _roundtrip(ts, vals)


def test_edge_values():
    ts = np.arange(8, dtype=np.int64)
    vals = [0.0, -0.0, np.inf, -np.inf, np.nan, 1e-308, 1.7976931348623157e308, 1.0]
    _roundtrip(ts, vals)


def test_large_dod():
    # force every dod class incl. 32-bit fallback
    ts = np.cumsum([0, 1, 1, 65, 2, 300, 2, 3000, 5, 10**7, 1]).astype(np.int64)
    vals = np.arange(len(ts), dtype=np.float64)
    _roundtrip(ts, vals)


def test_identical_values_run():
    ts = np.arange(100, dtype=np.int64) * 60
    vals = np.concatenate([np.full(50, 7.0), np.full(50, 9.5)])
    _roundtrip(ts, vals)


@pytest.mark.usefixtures("spark")
def test_spark_compress_decompress_roundtrip(spark, corpus_df):
    from getml_community_spark.operators.rollup import rollup_from_raw

    agg = rollup_from_raw(corpus_df, "1m")
    segs = compress_rollup(agg, value_col="rate").cache()
    stats = segs.toPandas()
    # Compression wins need non-trivial segments; tiny (source, day)
    # segments pay the 24-byte header. Assert on the hot source, whose
    # segments are dense.
    hot = stats[stats["source"] == "src-000"]
    assert hot["bytes_compressed"].sum() < hot["bytes_raw"].sum()
    back = decompress_segments(segs).toPandas()
    want = (
        agg.selectExpr(
            "source", "cast(bucket_start as long) as ts", "rate as value"
        ).toPandas()
    )
    got = back.sort_values(["source", "ts"]).reset_index(drop=True)
    want = want.sort_values(["source", "ts"]).reset_index(drop=True)
    assert len(got) == len(want)
    assert (got["source"] == want["source"]).all()
    assert np.array_equal(got["ts"].to_numpy(), want["ts"].to_numpy())
    assert np.array_equal(
        got["value"].to_numpy().view(np.uint64),
        want["value"].to_numpy().view(np.uint64),
    )
