"""SAX symbolization vs a pure-numpy oracle (independent of both Spark
and DuckDB), plus shape edges: constant series, short series, duplicate
timestamps."""

from __future__ import annotations

import numpy as np
import pytest

from getml_community_spark.operators.sax import BREAKPOINTS, sax_symbolize

LETTERS = "abcdefgh"


def _numpy_sax(values, n_segments=8, alphabet=4):
    v = np.asarray(values, dtype=np.float64)
    n = len(v)
    sd = v.std()  # population
    # micro-unit integer z, exact long-sum PAA (engine arithmetic)
    z_u = (
        np.zeros(n, dtype=np.int64)
        if sd == 0
        else np.floor((v - v.mean()) / sd * 1e6 + 0.5).astype(np.int64)
    )
    segs = (np.arange(n) * n_segments) // n
    word = ""
    for s in sorted(set(segs)):
        grp = z_u[segs == s]
        paa = np.floor(grp.sum() / len(grp) + 0.5) / 1e6
        bps = BREAKPOINTS[alphabet]
        k = sum(paa >= b for b in bps)
        word += LETTERS[k]
    return word


def _run(spark, rows):
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, value double")
    out = sax_symbolize(df, window_seconds=86400, n_segments=8, alphabet=4)
    return {
        (r["key"], r["window_epoch"]): (r["n_points"], r["sax_word"])
        for r in out.collect()
    }


def test_sax_matches_numpy_oracle(spark):
    import datetime

    rng = np.random.default_rng(5)
    rows, expected = [], {}
    base = datetime.datetime(2024, 1, 1)
    for uid in range(5):
        n = int(rng.integers(3, 40))
        vals = rng.normal(size=n) * (uid + 1)
        for i, v in enumerate(vals):
            rows.append((uid, base + datetime.timedelta(minutes=7 * i), float(v)))
        key = (uid, int(base.replace(tzinfo=datetime.timezone.utc).timestamp()))
        expected[key] = (n, _numpy_sax(vals))
    got = _run(spark, rows)
    assert got == expected


def test_sax_constant_series_is_all_c(spark):
    import datetime

    base = datetime.datetime(2024, 3, 1)
    rows = [(1, base + datetime.timedelta(hours=i), 42.0) for i in range(8)]
    got = _run(spark, rows)
    (_, word), = got.values()
    # sd == 0 → z = 0 → letter index at the 0 breakpoint = 'c'
    assert word == "cccccccc"


def test_sax_short_series_fewer_segments(spark):
    import datetime

    base = datetime.datetime(2024, 3, 2)
    rows = [(7, base + datetime.timedelta(hours=i), float(i)) for i in range(3)]
    got = _run(spark, rows)
    (n, word), = got.values()
    assert n == 3 and len(word) == 3  # seg = floor(i*8/3) → {0, 2, 5}
    assert word == _numpy_sax([0.0, 1.0, 2.0])


def test_sax_duplicate_timestamps_deterministic(spark):
    import datetime

    base = datetime.datetime(2024, 3, 3)
    # two rows share a timestamp; (ts, value) ordering makes the word stable
    rows = [
        (9, base, 5.0),
        (9, base, 1.0),
        (9, base + datetime.timedelta(hours=1), 3.0),
        (9, base + datetime.timedelta(hours=2), 9.0),
    ]
    a = _run(spark, rows)
    b = _run(spark, list(reversed(rows)))
    assert a == b


def test_sax_rejects_unknown_alphabet(spark):
    import datetime

    df = spark.createDataFrame(
        [(1, datetime.datetime(2024, 1, 1), 1.0)],
        "user_id long, ts timestamp, value double",
    )
    with pytest.raises(ValueError, match="alphabet"):
        sax_symbolize(df, alphabet=7)
