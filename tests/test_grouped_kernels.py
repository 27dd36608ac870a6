"""Unit tests for non-SQL grouped-map kernels (W4 periodogram)."""

from __future__ import annotations

import numpy as np
import pandas as pd

from astro_data_pipeline_spark.operators.grouped_analytics import (
    PERIODOGRAM_SCHEMA,
    _lomb_scargle,
)


def _series(uid: int, period_s: float, n: int = 200, seed: int = 42) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    # irregular sampling over ~20 periods
    t = np.sort(rng.uniform(0, 20 * period_s, n))
    v = np.sin(2 * np.pi * t / period_s) + 0.05 * rng.standard_normal(n)
    return pd.DataFrame(
        {
            "user_id": uid,
            "ts": pd.to_datetime(t * 1e6, unit="us"),
            "value": v,
        }
    )


def test_periodogram_recovers_known_period():
    period = 3600.0  # 1 hour
    out = _lomb_scargle(_series(7, period))
    assert out["user_id"].iloc[0] == 7
    peak = out["peak_freq_hz"].iloc[0]
    # recovered within the log-grid resolution (64 points over ~3 decades
    # => ~11% spacing); allow 2 grid steps
    assert abs(peak - 1.0 / period) / (1.0 / period) < 0.25
    assert bool(out["is_periodic"].iloc[0])


def test_periodogram_flat_series_not_periodic():
    pdf = _series(1, 3600.0)
    pdf["value"] = 1.0
    out = _lomb_scargle(pdf)
    assert not bool(out["is_periodic"].iloc[0])


def test_periodogram_short_series_nan():
    pdf = _series(2, 60.0, n=3)
    out = _lomb_scargle(pdf)
    assert out["n_obs"].iloc[0] == 3
    assert np.isnan(out["peak_freq_hz"].iloc[0])


def test_periodogram_spark_end_to_end(spark, sf_dir):
    from astro_data_pipeline_spark.registry import get

    df = get("grouped_periodogram_peak").fn(spark, sf_dir)
    assert df.schema == PERIODOGRAM_SCHEMA
    rows = df.limit(5).collect()
    assert all(r["n_obs"] >= 5 for r in rows)


def test_series_stats_null_heavy_group_matches_oracle(spark):
    """A group with >= MIN_OBS rows but < 2 non-null values: both the
    kernel and the oracle must emit NULL std (DuckDB's x/0 -> NULL then
    greatest(NULL, 0.0) -> 0.0 used to emit 0.0 on the oracle side)."""
    import duckdb

    from astro_data_pipeline_spark.operators.grouped_analytics import (
        per_key_series_stats,
    )
    from astro_data_pipeline_spark.registry import get

    pdf = pd.DataFrame(
        {
            "user_id": [1] * 6 + [2] * 6,
            "event_id": range(12),
            "ts": pd.date_range("2024-01-01", periods=12, freq="1h"),
            "value": [None] * 5 + [3.14] + list(np.linspace(1.0, 2.0, 6)),
            "event_type": ["x"] * 12,
            "props": [None] * 12,
        }
    )
    out = (
        per_key_series_stats(spark.createDataFrame(pdf))
        .toPandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("events", pdf)
    ora = (
        con.sql(get("grouped_series_stats_per_user").oracle)
        .df()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    assert pd.isna(out["std_value"].iloc[0]) and pd.isna(ora["std_value"].iloc[0])
    assert out["mean_value"].iloc[0] == ora["mean_value"].iloc[0] == 3.14
    assert abs(out["std_value"].iloc[1] - ora["std_value"].iloc[1]) < 1e-12


def _naive_lomb_scargle_power(t, v, freqs):
    """Independent textbook Lomb–Scargle (Scargle 1982, eq. 10) as an
    unvectorized per-frequency loop — a genuinely different code path
    from the kernel's (F×N) broadcast, serving as its quantitative
    oracle."""
    import math

    v = v - v.mean()
    var = v.var(ddof=1)
    out = []
    for f in freqs:
        w = 2.0 * math.pi * f
        s2 = sum(math.sin(2 * w * ti) for ti in t)
        c2 = sum(math.cos(2 * w * ti) for ti in t)
        tau = math.atan2(s2, c2) / (2.0 * w)
        ct = [math.cos(w * (ti - tau)) for ti in t]
        st = [math.sin(w * (ti - tau)) for ti in t]
        num_c = sum(vi * ci for vi, ci in zip(v, ct)) ** 2
        num_s = sum(vi * si for vi, si in zip(v, st)) ** 2
        den_c = sum(ci * ci for ci in ct)
        den_s = sum(si * si for si in st)
        out.append(0.5 * (num_c / den_c + num_s / den_s) / var)
    return np.array(out)


def test_periodogram_power_matches_naive_reference():
    """The vectorized kernel's peak power and frequency must equal an
    independent unvectorized textbook Lomb–Scargle evaluated on the
    kernel's own frequency grid — a value-level oracle, not a sanity
    band."""
    pdf = _series(11, 1800.0, n=120, seed=7)
    out = _lomb_scargle(pdf)
    t = pdf.sort_values("ts")["ts"].to_numpy("datetime64[us]").astype(np.int64) / 1e6
    v = pdf.sort_values("ts")["value"].to_numpy(np.float64)
    span = t.max() - t.min()
    n = len(t)
    freqs = np.logspace(
        np.log10(1.0 / span), np.log10(max(n, 4) / (2.0 * span)), 64
    )
    ref = _naive_lomb_scargle_power(t, v, freqs)
    k = int(np.argmax(ref))
    assert out["peak_freq_hz"].iloc[0] == round(float(freqs[k]), 10)
    assert out["peak_power"].iloc[0] == round(float(ref[k]), 6)


def test_periodogram_spark_path_recovers_injected_periods(spark):
    """End-to-end through groupBy().applyInPandas: three users with
    DIFFERENT injected periods each recover their own frequency within
    two log-grid steps, and all are flagged periodic — pins the
    distributed path (grouping, Arrow transfer, schema), not just the
    Python kernel."""
    from astro_data_pipeline_spark.operators.grouped_analytics import _MIN_OBS

    periods = {3: 600.0, 4: 3600.0, 5: 86400.0}
    pdf = pd.concat([_series(uid, p, n=150, seed=uid) for uid, p in periods.items()])
    sdf = spark.createDataFrame(pdf)
    out = (
        sdf.groupBy("user_id")
        .applyInPandas(_lomb_scargle, schema=PERIODOGRAM_SCHEMA)
        .toPandas()
        .set_index("user_id")
    )
    assert set(out.index) == set(periods)
    for uid, period in periods.items():
        assert out.loc[uid, "n_obs"] == 150 >= _MIN_OBS
        rel = abs(out.loc[uid, "peak_freq_hz"] - 1.0 / period) * period
        assert rel < 0.25, f"user {uid}: peak {out.loc[uid, 'peak_freq_hz']} vs {1.0/period}"
        assert bool(out.loc[uid, "is_periodic"])


def test_series_stats_single_observation_key_yields_nulls_not_crash():
    """The min-obs filter runs downstream of the kernel, so a key with
    exactly one event must produce a NULL-interval row (like the
    oracle's x/0 -> NULL), not a ZeroDivisionError in the executor."""
    from astro_data_pipeline_spark.operators.grouped_analytics import (
        _series_stats,
    )

    out = _series_stats(_series(7, 60.0, n=1))
    assert out["n_obs"].iloc[0] == 1
    assert out["mean_interval_sec"].iloc[0] is None
    assert out["std_value"].iloc[0] is None
