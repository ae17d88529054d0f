"""Numpy oracle: the reference engine's aggregation battery, re-implemented
semantically from /root/reference/src/engine/include/helpers/Aggregations.hpp
(cited per function). This is the golden-value source for every pytest
tier-exactness check — single-threaded, obviously-correct numpy.

Conventions copied from the reference:
- inputs are filtered to finite values first (Aggregator.hpp:449-456
  filters non-finite before aggregating);
- empty set => NaN for avg/min/max/median/quantile/stddev/var, 0.0 for
  sum/count-like (Aggregations.hpp:508-517 SUM returns 0.0 on empty);
- variance/stddev are POPULATION (÷n) (Aggregations.hpp:675-693);
- kurtosis is NON-excess (no −3) (Aggregations.hpp:302-327);
- quantiles use numpy-"linear" interpolation ix=(n−1)·q
  (Aggregations.hpp:444-469);
- mode tie → greatest value wins (Aggregations.hpp:386-402: max_element
  over an ordered map keeps the greatest key among equal counts).
"""

from __future__ import annotations

import numpy as np

__all__ = ["Oracle", "HALF_LIVES"]


def _finite(x: np.ndarray) -> np.ndarray:
    x = np.asarray(x, dtype=np.float64)
    return x[np.isfinite(x)]


def _finite_pair(x: np.ndarray, t: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    x = np.asarray(x, dtype=np.float64)
    t = np.asarray(t, dtype=np.float64)
    m = np.isfinite(x) & np.isfinite(t)
    return x[m], t[m]


# EWMA half-lives, seconds (Aggregator.hpp:168-206 half-life table).
HALF_LIVES = {
    "1s": 1.0,
    "1m": 60.0,
    "1h": 3600.0,
    "1d": 86400.0,
    "7d": 7 * 86400.0,
    "30d": 30 * 86400.0,
    "90d": 90 * 86400.0,
    "365d": 365 * 86400.0,
}


class Oracle:
    """Each method takes numpy arrays; ``t_ref`` is the population/bucket
    reference timestamp (epoch seconds) used by time-relative aggs."""

    # ---- basics -------------------------------------------------- #
    @staticmethod
    def count(x) -> float:  # Aggregations.hpp:65-74
        return float(len(_finite(x)))

    @staticmethod
    def sum(x) -> float:  # Aggregations.hpp:508-517 (0.0 on empty)
        v = _finite(x)
        return float(np.sum(v)) if len(v) else 0.0

    @staticmethod
    def avg(x) -> float:  # Aggregations.hpp:51-61
        v = _finite(x)
        return float(np.mean(v)) if len(v) else float("nan")

    @staticmethod
    def minimum(x) -> float:  # Aggregations.hpp:378-384
        v = _finite(x)
        return float(np.min(v)) if len(v) else float("nan")

    @staticmethod
    def maximum(x) -> float:  # Aggregations.hpp:351-357
        v = _finite(x)
        return float(np.max(v)) if len(v) else float("nan")

    @staticmethod
    def median(x) -> float:  # Aggregations.hpp:360-374
        v = _finite(x)
        return float(np.median(v)) if len(v) else float("nan")

    @staticmethod
    def quantile(x, q: float) -> float:  # Aggregations.hpp:444-469
        v = _finite(x)
        if not len(v):
            return float("nan")
        return float(np.quantile(v, q, method="linear"))

    @staticmethod
    def var_pop(x) -> float:  # Aggregations.hpp:675-693 (÷n)
        v = _finite(x)
        return float(np.var(v)) if len(v) else float("nan")

    @staticmethod
    def stddev_pop(x) -> float:  # Aggregations.hpp:502-504
        v = _finite(x)
        return float(np.std(v)) if len(v) else float("nan")

    @staticmethod
    def skew(x) -> float:  # Aggregations.hpp:473-498 (0.0 if all same)
        v = _finite(x)
        if not len(v):
            return float("nan")
        sd = np.std(v)
        if sd == 0.0:
            return 0.0
        return float(np.mean(((v - np.mean(v)) / sd) ** 3))

    @staticmethod
    def kurtosis(x) -> float:  # Aggregations.hpp:302-327 (non-excess)
        v = _finite(x)
        if not len(v):
            return float("nan")
        sd = np.std(v)
        if sd == 0.0:
            return 0.0
        return float(np.mean(((v - np.mean(v)) / sd) ** 4))

    @staticmethod
    def count_distinct(x) -> float:  # Aggregations.hpp:133-161
        v = _finite(x)
        return float(len(np.unique(v)))

    @staticmethod
    def count_distinct_over_count(x) -> float:  # Aggregations.hpp:164-174
        n = Oracle.count(x)
        return Oracle.count_distinct(x) / n if n else float("nan")

    @staticmethod
    def count_minus_count_distinct(x) -> float:  # Aggregator.hpp:300-302
        return Oracle.count(x) - Oracle.count_distinct(x)

    @staticmethod
    def mode(x) -> float:  # Aggregations.hpp:386-402,713-733 (tie → greatest)
        v = _finite(x)
        if not len(v):
            return float("nan")
        vals, cnts = np.unique(v, return_counts=True)  # vals sorted asc
        best = cnts.max()
        return float(vals[cnts == best][-1])  # greatest value among ties

    @staticmethod
    def num_max(x) -> float:  # Aggregations.hpp:404-421 (0.0 empty)
        v = _finite(x)
        return float(np.sum(v == np.max(v))) if len(v) else 0.0

    @staticmethod
    def num_min(x) -> float:  # Aggregations.hpp:423-440
        v = _finite(x)
        return float(np.sum(v == np.min(v))) if len(v) else 0.0

    @staticmethod
    def variation_coefficient(x) -> float:  # Aggregations.hpp:696-707 (var/mean)
        v = _finite(x)
        if not len(v):
            return float("nan")
        mu = np.mean(v)
        return float(np.var(v) / mu) if mu != 0.0 else float("nan")

    @staticmethod
    def count_above_mean(x) -> float:  # Aggregations.hpp:77-95 (strict >)
        v = _finite(x)
        return float(np.sum(v > np.mean(v))) if len(v) else 0.0

    @staticmethod
    def count_below_mean(x) -> float:  # Aggregations.hpp:98-114 (strict <)
        v = _finite(x)
        return float(np.sum(v < np.mean(v))) if len(v) else 0.0

    # ---- time-relative ------------------------------------------- #
    @staticmethod
    def first(x, ts) -> float:
        """Value at min peripheral ts; ties → first in match order
        (Aggregations.hpp:280-298 min_element keeps first)."""
        v, t = _finite_pair(x, ts)
        if not len(v):
            return float("nan")
        return float(v[np.argmin(t)])  # argmin keeps first occurrence

    @staticmethod
    def last(x, ts) -> float:  # Aggregations.hpp:329-347 (max_element: first max)
        v, t = _finite_pair(x, ts)
        if not len(v):
            return float("nan")
        return float(v[np.argmax(t)])

    @staticmethod
    def ewma(x, ts, t_ref: float, half_life: float) -> float:
        """weights exp(ln(.5)·Δt/h), Δt = t_ref − ts (Aggregations.hpp:176-206)."""
        v, t = _finite_pair(x, ts)
        if not len(v):
            return float("nan")
        w = np.exp(np.log(0.5) * (t_ref - t) / half_life)
        sw = np.sum(w)
        return float(np.sum(w * v) / sw) if sw != 0.0 else float("nan")

    @staticmethod
    def trend(x, ts, t_ref: float) -> float:
        """OLS of value on Δt = t_ref − ts; returns intercept at Δt=0,
        i.e. mean_y − mean_x·β (Aggregations.hpp:617-671); var(x)==0 → mean_y."""
        v, t = _finite_pair(x, ts)
        if not len(v):
            return float("nan")
        dt = t_ref - t
        xx = np.var(dt)
        if xx == 0.0:
            return float(np.mean(v))
        beta = np.mean((dt - dt.mean()) * (v - v.mean())) / xx
        return float(np.mean(v) - np.mean(dt) * beta)

    @staticmethod
    def ewma_trend(x, ts, t_ref: float, half_life: float) -> float:
        """Weighted least squares of value on Δt; returns weighted intercept
        (Aggregations.hpp:211-278); Σw(x−x̄)²==0 → weighted mean_y."""
        v, t = _finite_pair(x, ts)
        if not len(v):
            return float("nan")
        dt = t_ref - t
        w = np.exp(np.log(0.5) * dt / half_life)
        sw = np.sum(w)
        if sw == 0.0:
            return float("nan")
        mx = np.sum(w * dt) / sw
        my = np.sum(w * v) / sw
        sxx = np.sum(w * (dt - mx) ** 2)
        # Structural degeneracy: all Δt identical ⇒ the reference INTENDS
        # its xx==0.0 branch (Aggregations.hpp:262-264) but fp rounding of
        # mx can miss exact zero for some half-lives; detect it
        # structurally (np.var(dt)==0), same as the Spark operator.
        if sxx == 0.0 or np.var(dt) == 0.0:
            return float(my)
        beta = np.sum(w * (dt - mx) * (v - my)) / sxx
        return float(my - mx * beta)

    @staticmethod
    def avg_time_between(ts) -> float:  # Aggregator.hpp:431-446
        t = _finite(ts)
        n = len(t)
        if n <= 1:
            return 0.0
        return float((np.max(t) - np.min(t)) / (n - 1))

    @staticmethod
    def time_since_last_maximum(x, ts, t_ref: float) -> float:
        """Δt of the most recent occurrence of max value (Aggregations.hpp:519-537)."""
        v, t = _finite_pair(x, ts)
        if not len(v):
            return float("nan")
        m = v == np.max(v)
        return float(t_ref - np.max(t[m]))

    @staticmethod
    def time_since_first_maximum(x, ts, t_ref: float) -> float:
        v, t = _finite_pair(x, ts)
        if not len(v):
            return float("nan")
        m = v == np.max(v)
        return float(t_ref - np.min(t[m]))

    @staticmethod
    def time_since_last_minimum(x, ts, t_ref: float) -> float:
        v, t = _finite_pair(x, ts)
        if not len(v):
            return float("nan")
        m = v == np.min(v)
        return float(t_ref - np.max(t[m]))

    @staticmethod
    def time_since_first_minimum(x, ts, t_ref: float) -> float:
        v, t = _finite_pair(x, ts)
        if not len(v):
            return float("nan")
        m = v == np.min(v)
        return float(t_ref - np.min(t[m]))
