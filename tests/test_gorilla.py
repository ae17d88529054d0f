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


def test_dod_overflow_raises_not_corrupts():
    """A |dod| >= 2^31 must raise (round-1 ADVICE: the 32-bit escape
    class silently truncated and decoded wrong timestamps)."""
    import numpy as np
    import pytest

    from getml_community_spark.functions.gorilla import encode_segment

    ts = np.array([0, 10, 20 + (1 << 31) + 10], dtype=np.int64)
    vals = np.array([1.0, 2.0, 3.0])
    with pytest.raises(ValueError, match="delta-of-delta"):
        encode_segment(ts, vals)
    # just below the limit still round-trips
    from getml_community_spark.functions.gorilla import decode_segment

    ts_ok = np.array([0, 10, 20 + (1 << 31) - 1], dtype=np.int64)
    t, v = decode_segment(encode_segment(ts_ok, vals))
    assert (t == ts_ok).all() and (v == vals).all()


def test_foreign_10_control_stream_falls_back():
    """A hand-built stream using the paper's '10' reuse-window control
    (which our encoder never emits) must still decode via the stateful
    fallback."""
    import numpy as np

    from getml_community_spark.functions.gorilla import (
        _HEADER,
        _MAGIC,
        decode_segment,
    )

    # values: v0 = 1.0 (xor vs 0), v1 identical ('0'), v2 = '10' reusing
    # v0's (L, M) window with xor of the same shape
    b0 = np.array([1.0], dtype=np.float64).view(np.uint64)[0]
    L = 64 - int(b0).bit_length()  # leading zeros
    # meaningful bits of b0: strip trailing zeros
    T = (int(b0) & -int(b0)).bit_length() - 1
    M = 64 - L - T
    xor2 = int(b0)  # same window shape → flips back to 0.0... use same xor
    bits = []
    bits += [1, 1] + [int(x) for x in format(L, "05b")] + [
        int(x) for x in format(M % 64, "06b")
    ] + [int(x) for x in format(int(b0) >> T, f"0{M}b")]
    bits += [0]
    bits += [1, 0] + [int(x) for x in format(xor2 >> T, f"0{M}b")]
    val_bits = len(bits)
    packed = np.packbits(np.array(bits, dtype=np.uint8)).tobytes()
    ts = np.array([100, 160, 220], dtype=np.int64)
    # ts stream: delta0=60 ('10'+7b: 60+63=123), dod=0 ('0')
    tbits = [1, 0] + [int(x) for x in format(60 + 63, "07b")] + [0]
    tpacked = np.packbits(np.array(tbits, dtype=np.uint8)).tobytes()
    blob = _HEADER.pack(_MAGIC, 3, 100, len(tbits), val_bits) + tpacked + packed
    t, v = decode_segment(blob)
    assert (t == ts).all()
    assert v[0] == 1.0 and v[1] == 1.0 and v[2] == 0.0


def test_batch_encoder_bit_identical_to_scalar():
    """encode_segments_batch must produce byte-for-byte the same blobs
    as per-segment encode_segment, across the hybrid dispatch boundary
    (tiny batch-kernel segments AND >=256-point scalar-kernel segments),
    empty and single-point segments included."""
    from getml_community_spark.functions.gorilla import encode_segments_batch

    rng = np.random.default_rng(123)
    ts_list, val_list = [], []
    for i in range(300):
        n = int(rng.integers(1, 12)) if i % 2 else int(rng.integers(250, 1500))
        base = int(rng.integers(1_700_000_000, 1_700_050_000))
        ts_list.append(np.sort(base + rng.integers(0, 86400, n)).astype(np.int64))
        v = rng.normal(0, 100, n)
        v[rng.random(n) < 0.3] = 42.0  # identical-value runs → '0' codeword
        val_list.append(v)
    ts_list += [np.zeros(0, np.int64), np.array([123], np.int64)]
    val_list += [np.zeros(0, np.float64), np.array([1.5])]

    batch = encode_segments_batch(ts_list, val_list)
    scalar = [encode_segment(t, v) for t, v in zip(ts_list, val_list)]
    assert all(a == b for a, b in zip(batch, scalar))
    # and the decoder closes the loop on a sample
    for i in (0, 1, 300, 301):
        t, v = decode_segment(batch[i])
        assert np.array_equal(t, ts_list[i])
        assert np.array_equal(v.view(np.uint64), val_list[i].view(np.uint64))


# ---- property-based fuzz (hypothesis) ------------------------------- #
try:
    from hypothesis import given, settings, strategies as st

    _pair = st.tuples(
        st.integers(min_value=0, max_value=2_000_000_000),
        st.one_of(
            st.floats(allow_nan=True, allow_infinity=True, width=64),
            st.integers(min_value=-(10**12), max_value=10**12).map(float),
        ),
    )

    @settings(max_examples=200, deadline=None)
    @given(st.lists(_pair, min_size=0, max_size=300))
    def test_roundtrip_fuzz(pairs):
        """decode∘encode == identity bitwise for arbitrary sorted series
        (NaN payloads, infinities, huge/denormal doubles included), and
        the batch encoder stays bit-identical to the scalar one."""
        from getml_community_spark.functions.gorilla import (
            encode_segments_batch,
        )

        pairs = sorted(pairs, key=lambda p: p[0])
        ts = np.array([p[0] for p in pairs], dtype=np.int64)
        vals = np.array([p[1] for p in pairs], dtype=np.float64)
        blob = encode_segment(ts, vals)
        t2, v2 = decode_segment(blob)
        assert np.array_equal(t2, ts)
        assert np.array_equal(v2.view(np.uint64), vals.view(np.uint64))
        assert encode_segments_batch([ts], [vals])[0] == blob

except ImportError:  # pragma: no cover — hypothesis not installed
    pass


def test_segment_stats_and_pruned_query(spark):
    """with_stats chunk-index columns + query_segments: pruned query
    equals decompress-everything-then-filter, and the metadata filter
    actually prunes (fewer blobs reach the decode UDF)."""
    from pyspark.sql import functions as F

    from getml_community_spark.functions.gorilla import (
        compress_rollup,
        decompress_segments,
        query_segments,
    )

    # 6 sources x 10 days of hourly points, values = source-dependent band
    rows = []
    base = 1_700_000_000 - 1_700_000_000 % 86400
    for si in range(6):
        for d in range(10):
            for h in range(24):
                t = base + d * 86400 + h * 3600
                rows.append((f"s{si}", t, float(si * 100 + h)))
    agg = spark.createDataFrame(rows, "source string, epoch long, rate double").select(
        "source", F.timestamp_seconds("epoch").alias("bucket_start"), "rate"
    )
    segs = compress_rollup(agg, with_stats=True).cache()
    assert {"t_min", "t_max", "v_min", "v_max"} <= set(segs.columns)

    # stats are exact per segment
    chk = segs.where((F.col("source") == "s2")).orderBy("day").first()
    assert chk["v_min"] == 200.0 and chk["v_max"] == 223.0
    assert chk["t_max"] - chk["t_min"] == 23 * 3600

    # a 2-day, one-band query
    t_from, t_to = base + 3 * 86400, base + 5 * 86400 - 1
    v_from, v_to = 300.0, 310.0
    got = (
        query_segments(segs, t_from, t_to, v_from, v_to)
        .toPandas()
        .sort_values(["source", "ts"])
        .reset_index(drop=True)
    )
    want = (
        decompress_segments(segs)
        .where(
            (F.col("ts") >= t_from)
            & (F.col("ts") <= t_to)
            & (F.col("value") >= v_from)
            & (F.col("value") <= v_to)
        )
        .toPandas()
        .sort_values(["source", "ts"])
        .reset_index(drop=True)
    )
    assert got.equals(want)
    assert len(got) == 2 * 11  # 2 days x hours 0..10 of source s3

    # pruning really happened: only s3's 2 overlapping days survive
    pred_surviving = segs.where(
        (F.col("t_max") >= t_from)
        & (F.col("t_min") <= t_to)
        & (F.col("v_max") >= v_from)
        & (F.col("v_min") <= v_to)
    ).count()
    assert pred_surviving == 2
    assert segs.count() == 60

    # no-predicate query == full decode
    assert query_segments(segs).count() == decompress_segments(segs).count()
    segs.unpersist()
