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
