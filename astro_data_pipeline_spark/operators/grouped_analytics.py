"""Per-key time-series analytics via grouped-map Arrow UDF (SURVEY §2.5 W4).

Spark restatement of the reference's per-object variability analysis —
``analyzeVariability(double[] times, double[] magnitudes, double[] errors)``
(VariableStarAnalysis.java:67-98) and its statistics kernel
``calculateVariabilityStatistics`` (:104-131): each key's ordered series
is handed to a vectorized NumPy kernel as one Arrow batch via
``groupBy(key).applyInPandas`` — the idiomatic shape for per-key
algorithms Spark's built-ins can't express (Lomb–Scargle et al., W4).

The statistics chosen here ARE SQL-expressible on purpose: the DuckDB
oracle independently recomputes them, proving the grouped-map plumbing
(grouping, Arrow transfer, per-group kernel, schema contract) end-to-end.
The same harness runs non-SQL kernels (periodograms) unchanged.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from ..registry import query
from ..sources import load_table

_MIN_OBS = 5

STATS_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_obs", T.LongType()),
        T.StructField("mean_value", T.DoubleType()),
        T.StructField("std_value", T.DoubleType()),
        T.StructField("amplitude", T.DoubleType()),
        T.StructField("mean_interval_sec", T.DoubleType()),
    ]
)


def _series_stats(pdf: pd.DataFrame) -> pd.DataFrame:
    """NumPy kernel over one key's full ordered series (one Arrow batch).

    Mirrors the reference kernel's shape: sort by time, vectorized
    moments + amplitude + cadence (VariableStarAnalysis.java:104-131 —
    mean, RMS, amplitude over the per-object series).

    Moments run over EXACT integer hundredths: float summation is
    order-dependent (NumPy sums pairwise, SQL engines sequentially —
    measured 4th-decimal flips in 6/1500 groups at sf0.1, so rounding
    both sides does NOT make the hash stable), while integer sums are
    associative. Both engines convert the same exact integers to double
    and apply the identical scalar expression, so the result is
    bit-identical regardless of summation order. NULL values are
    excluded exactly as SQL aggregates exclude them (n_obs still counts
    every row, like COUNT(*))."""
    pdf = pdf.sort_values("ts", kind="stable")
    # keep EXACT integer microseconds: differencing after a /1e6 per
    # element (fl(a/1e6)-fl(b/1e6)) differs by ULPs from the oracle's
    # (a-b)/1e6 and can flip a .xx5 floor boundary — same flake class
    # the integer-cents trick below eliminates for the moments
    t_us = pdf["ts"].to_numpy(dtype="datetime64[us]").astype(np.int64)
    n = len(pdf)
    v = pdf["value"].to_numpy(dtype=np.float64)
    v = v[~np.isnan(v)]
    k = len(v)
    # exact hundredths; half away from zero like SQL ROUND
    c = (np.floor(np.abs(v) * 100.0 + 0.5) * np.sign(v)).astype(np.int64)
    s = float(c.sum()) if k else None
    mean = s / (100.0 * k) if k else None
    if k >= 2:
        ss = float((c * c).sum())
        # clamp: cancellation can round an exactly-zero variance one ulp
        # negative; sqrt(neg) is NaN here but NULL in SQL
        var_c = max((ss - s * s / k) / (k - 1), 0.0)
        std = float(np.sqrt(var_c)) / 100.0
    else:
        std = None
    amp = float(v.max() - v.min()) if k else None

    def _r(x: float, nd: int) -> float:
        # floor-based round-half-up, bit-identical to the oracle's
        # floor(x*10^n + 0.5)/10^n: python's round() is banker's AND
        # binary-exact while DuckDB's ROUND is decimal-string half-up,
        # so a mean that is an exact 4th-decimal half (integer cents /
        # 100k can be) rounds differently — 4 rows at sf0.1 did.
        scale = float(10**nd)
        return math.floor(x * scale + 0.5) / scale

    return pd.DataFrame(
        {
            "user_id": [int(pdf["user_id"].iloc[0])],
            "n_obs": [n],
            "mean_value": [None if mean is None else _r(mean, 4)],
            "std_value": [None if std is None else _r(std, 4)],
            "amplitude": [None if amp is None else _r(amp, 4)],
            # same op order as the SQL oracle: exact-integer µs span,
            # then /1e6, then /(n-1) — bit-identical left-to-right.
            # n == 1 guard: the min-obs filter runs DOWNSTREAM of this
            # kernel, so a single-observation key must yield NULL here
            # (as the oracle's x/0 does in SQL), not ZeroDivisionError
            # in the executor.
            "mean_interval_sec": [
                None
                if n < 2
                else _r(float(t_us.max() - t_us.min()) / 1e6 / (n - 1), 2)
            ],
        }
    )


def per_key_series_stats(events: DataFrame, min_obs: int = _MIN_OBS) -> DataFrame:
    """groupBy(key).applyInPandas over the event series of each key."""
    grouped = events.select("user_id", "ts", "value").groupBy("user_id")
    stats = grouped.applyInPandas(_series_stats, schema=STATS_SCHEMA)
    return stats.filter(stats.n_obs >= min_obs)


@query(
    "grouped_series_stats_per_user",
    oracle=f"""
    -- moments over EXACT integer hundredths (see _series_stats: float
    -- summation order differs between engines; integer sums do not)
    WITH c AS (
        SELECT user_id, ts, value,
               CAST(ROUND(value * 100) AS BIGINT) AS cents
        FROM events
    )
    SELECT user_id,
           COUNT(*) AS n_obs,
           floor(CAST(SUM(cents) AS DOUBLE) / (100.0 * COUNT(value))
                 * 10000.0 + 0.5) / 10000.0
               AS mean_value,
           -- guard k >= 2 explicitly: with 0/1 non-null values DuckDB's
           -- x/0 -> NULL then greatest(NULL, 0.0) -> 0.0 would emit 0.0
           -- where the kernel emits NULL
           CASE WHEN COUNT(value) >= 2 THEN
               floor(sqrt(greatest((CAST(SUM(cents * cents) AS DOUBLE)
                           - CAST(SUM(cents) AS DOUBLE) * CAST(SUM(cents) AS DOUBLE)
                             / COUNT(value))
                          / (COUNT(value) - 1), 0.0)) / 100.0
                     * 10000.0 + 0.5) / 10000.0
           END AS std_value,
           floor((MAX(value) - MIN(value)) * 10000.0 + 0.5) / 10000.0
               AS amplitude,
           floor(CAST(date_diff('microsecond', MIN(ts), MAX(ts)) AS DOUBLE)
                 / 1e6 / (COUNT(*) - 1) * 100.0 + 0.5) / 100.0
               AS mean_interval_sec
    FROM c
    GROUP BY user_id
    HAVING COUNT(*) >= {_MIN_OBS}
    """,
)
def grouped_series_stats_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Variability-style per-key series statistics through the grouped-map
    Arrow path, verified against a pure-SQL recompute."""
    return per_key_series_stats(load_table(spark, sf_dir, "events"))


PERIODOGRAM_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_obs", T.LongType()),
        T.StructField("peak_freq_hz", T.DoubleType()),
        T.StructField("peak_power", T.DoubleType()),
        T.StructField("is_periodic", T.BooleanType()),
    ]
)

_N_FREQS = 64


def _lomb_scargle(pdf: pd.DataFrame) -> pd.DataFrame:
    """Classical Lomb–Scargle periodogram over one key's irregular series
    (reference kernel: calculateLombScarglePeriodogram
    VariableStarAnalysis.java:143-220) — fully vectorized as an
    (n_freqs × n_obs) NumPy broadcast, one Arrow batch per key.

    Deterministic: fixed log-spaced frequency grid derived from the
    series' own span/cadence, no RNG."""
    pdf = pdf.sort_values("ts", kind="stable")
    v = pdf["value"].to_numpy(dtype=np.float64)
    t = pdf["ts"].to_numpy(dtype="datetime64[us]").astype(np.int64) / 1e6
    n = len(v)
    uid = int(pdf["user_id"].iloc[0])
    span = t.max() - t.min()
    if n < _MIN_OBS or span <= 0:
        return pd.DataFrame(
            {
                "user_id": [uid],
                "n_obs": [n],
                "peak_freq_hz": [np.nan],
                "peak_power": [np.nan],
                "is_periodic": [False],
            }
        )
    v = v - v.mean()
    var = v.var(ddof=1)
    if var == 0:
        var = 1.0
    # grid: 1/span (one cycle over the window) .. n/(2*span) (pseudo-Nyquist)
    freqs = np.logspace(np.log10(1.0 / span), np.log10(max(n, 4) / (2.0 * span)), _N_FREQS)
    w = 2.0 * np.pi * freqs[:, None]  # (F, 1)
    wt = w * t[None, :]  # (F, N)
    tau = np.arctan2(np.sin(2 * wt).sum(axis=1), np.cos(2 * wt).sum(axis=1)) / (
        2.0 * w[:, 0]
    )
    arg = w * (t[None, :] - tau[:, None])
    c, s = np.cos(arg), np.sin(arg)
    power = 0.5 * (
        (c @ v) ** 2 / (c * c).sum(axis=1) + (s @ v) ** 2 / (s * s).sum(axis=1)
    ) / var
    k = int(np.argmax(power))
    peak = float(power[k])
    return pd.DataFrame(
        {
            "user_id": [uid],
            "n_obs": [n],
            "peak_freq_hz": [round(float(freqs[k]), 10)],
            "peak_power": [round(peak, 6)],
            # false-alarm style cut, as the reference flags isPeriodic
            "is_periodic": [peak > np.log(n)],
        }
    )


def _periodogram_oracle() -> str:
    """Golden-sample oracle (the imaging-kernel device, VERDICT_r04 next
    #2): the kernel's per-key peaks at the driver gate's SF are frozen
    as VALUES by ``scripts/gen_periodogram_golden.py`` (generated over
    pandas straight from parquet — no Spark in the loop), while the key
    set and ``n_obs`` are recomputed independently in pure SQL and
    joined on BOTH columns, so any drift in scan, grouping, the Arrow
    boundary, kernel math, or the min-obs filter breaks the driver
    hash. Valid only for the sf0.01 gate tables (a key's series differs
    per SF — unlike the imaging catalog, which is a pure function of
    doc_id); bench.py exercises the full kernel at sf0.1 as before."""
    from ..multimodal.imaging import _values_sql
    from .periodogram_golden import PEAKS

    vals = _values_sql(
        PEAKS, "user_id, n_obs, peak_freq_hz, peak_power, is_periodic"
    )
    return f"""
    WITH k AS (
        SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_obs
        FROM events GROUP BY user_id HAVING COUNT(*) >= {_MIN_OBS}
    )
    SELECT k.user_id, k.n_obs, g.peak_freq_hz, g.peak_power, g.is_periodic
    FROM k JOIN {vals} ON k.user_id = g.user_id AND k.n_obs = g.n_obs
    """


@query("grouped_periodogram_peak", oracle=_periodogram_oracle())
def grouped_periodogram_peak(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W4 proper: per-key Lomb–Scargle periodogram peak via
    groupBy(key).applyInPandas — the genuinely non-SQL grouped kernel
    (VariableStarAnalysis.java:143-220), driver-verified end to end via
    the golden-sample oracle above; unit tests additionally pin the
    kernel against a pure-NumPy replay on a synthetic sinusoid (period
    recovered within grid resolution)."""
    ev = load_table(spark, sf_dir, "events")
    out = (
        ev.select("user_id", "ts", "value")
        .groupBy("user_id")
        .applyInPandas(_lomb_scargle, schema=PERIODOGRAM_SCHEMA)
    )
    return out.filter(out.n_obs >= _MIN_OBS)
