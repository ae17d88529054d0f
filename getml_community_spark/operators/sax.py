"""SAX symbolic representation of time series (PAA + Gaussian-breakpoint
alphabet) — Lin, Keogh, Lonardi, Chiu, "A Symbolic Representation of
Time Series" (DMKD 2003, public).

Why it belongs in a 100 TB rollup engine: a SAX word is a tiny,
index-able surrogate for a whole (source, window) series — equal words
lower-bound similarity, so "find sources whose daily shape matches X"
becomes a string equi-join instead of a numeric scan. It composes
directly with this package's dedup machinery (exact_dedup on sax_word =
motif grouping).

Pipeline (all JVM expressions):
1. z-normalize each (key, window) series: z = (x - μ) / σ (population
   σ; constant series → all-zero z), quantized immediately to
   micro-unit INTEGERS (floor(z*1e6+0.5) as long).
2. PAA: split the (ts, value)-ordered series into ``n_segments``
   equal-count segments (segment of 0-based row i = floor(i * S / n));
   the segment mean is an exact long sum over the quantized z divided
   once — order-independent, so letters can't flip at floor boundaries
   the way a float avg() can (μ/σ over the raw doubles remain the one
   inherently order-sensitive step).
3. Symbolize each PAA mean against the standard-normal quantile
   breakpoints for the alphabet size; concatenate letters in segment
   order into the SAX word.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

__all__ = ["BREAKPOINTS", "sax_symbolize"]

# standard-normal quantiles splitting the real line into k equiprobable
# regions, k = alphabet size (values from the SAX paper's Table 3)
BREAKPOINTS = {
    3: [-0.4307272992954576, 0.4307272992954576],
    4: [-0.6744897501960817, 0.0, 0.6744897501960817],
    5: [-0.8416212335729142, -0.2533471031357997, 0.2533471031357997,
        0.8416212335729142],
    8: [-1.1503493803760079, -0.6744897501960817, -0.3186393639643751,
        0.0, 0.3186393639643751, 0.6744897501960817, 1.1503493803760079],
}

_LETTERS = "abcdefgh"


def _letter(paa: Column, alphabet: int) -> Column:
    bps = BREAKPOINTS[alphabet]
    expr = F.lit(_LETTERS[len(bps)])
    for i in range(len(bps) - 1, -1, -1):
        expr = F.when(paa < F.lit(bps[i]), F.lit(_LETTERS[i])).otherwise(expr)
    return expr


def sax_symbolize(
    df: DataFrame,
    ts_col: str = "ts",
    value_col: str = "value",
    key_col: str = "user_id",
    window_seconds: int = 86400,
    n_segments: int = 8,
    alphabet: int = 4,
) -> DataFrame:
    """SAX word per (key, window): (key, window_epoch, n_points,
    sax_word). Ordering within a series is (ts, value) so duplicate
    timestamps symbolize deterministically.

    Scale shape: one shuffle for the per-window stats/row-number
    window, then a segment groupBy and a word-assembly groupBy whose
    keys extend the window's partitioning. No UDFs, no per-row Python;
    per-group state is one (Σ, Σ², n) triple plus ``n_segments``
    partial means — windows never hold the series in memory as a list.
    """
    if alphabet not in BREAKPOINTS:
        raise ValueError(f"alphabet must be one of {sorted(BREAKPOINTS)}")
    epoch = F.col(ts_col).cast("timestamp").cast("long")
    base = df.select(
        F.col(key_col).alias("key"),
        (F.floor(epoch / window_seconds) * window_seconds)
        .cast("long")
        .alias("window_epoch"),
        F.col(ts_col).alias("__ts"),
        F.col(value_col).cast("double").alias("v"),
    )
    grp = Window.partitionBy("key", "window_epoch")
    ranked = base.select(
        "key",
        "window_epoch",
        "v",
        (F.row_number().over(grp.orderBy("__ts", "v")) - 1).alias("i"),
        F.count(F.lit(1)).over(grp).alias("n"),
        F.avg("v").over(grp).alias("mu"),
        F.sqrt(F.var_pop("v").over(grp)).alias("sd"),
    )
    # z is quantized to micro-unit INTEGERS immediately; the PAA mean
    # then comes from an exact long sum and a single exact division —
    # a float avg() of the z values re-rounds an order-dependent sum
    # and can flip a letter at a floor boundary (the decompose/cusum
    # lesson). The only remaining float aggregation is mu/sd over the
    # raw doubles, where order sensitivity is inherent to the input.
    z_u = F.when(F.col("sd") == 0, F.lit(0).cast("long")).otherwise(
        F.floor(
            (F.col("v") - F.col("mu")) / F.col("sd") * F.lit(1e6) + F.lit(0.5)
        ).cast("long")
    )
    seg = F.floor(F.col("i") * n_segments / F.col("n")).cast("int")
    segs = (
        ranked.select(
            "key", "window_epoch", "n", seg.alias("seg"), z_u.alias("z_u")
        )
        .groupBy("key", "window_epoch", "n", "seg")
        .agg(
            (
                F.floor(F.sum("z_u") / F.count(F.lit(1)) + F.lit(0.5))
                / F.lit(1e6)
            ).alias("paa")
        )
    )
    lettered = segs.select(
        "key",
        "window_epoch",
        "n",
        "seg",
        _letter(F.col("paa"), alphabet).alias("letter"),
    )
    return (
        lettered.groupBy("key", "window_epoch")
        .agg(
            F.max("n").alias("n_points"),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("seg", "letter"))
                    ),
                    lambda s: s["letter"],
                ),
                "",
            ).alias("sax_word"),
        )
        .select(
            F.col("key"),
            F.col("window_epoch"),
            F.col("n_points"),
            F.col("sax_word"),
        )
    )
