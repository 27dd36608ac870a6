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
    """
    pdf = pdf.sort_values("ts", kind="stable")
    v = pdf["value"].to_numpy(dtype=np.float64)
    t = pdf["ts"].to_numpy(dtype="datetime64[us]").astype(np.int64) / 1e6
    n = len(v)
    return pd.DataFrame(
        {
            "user_id": [int(pdf["user_id"].iloc[0])],
            "n_obs": [n],
            "mean_value": [round(float(v.mean()), 4)],
            "std_value": [round(float(v.std(ddof=1)), 4)],
            "amplitude": [round(float(v.max() - v.min()), 4)],
            "mean_interval_sec": [round(float((t.max() - t.min()) / (n - 1)), 2)],
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
    SELECT user_id,
           COUNT(*) AS n_obs,
           ROUND(AVG(value), 4) AS mean_value,
           ROUND(STDDEV_SAMP(value), 4) AS std_value,
           ROUND(MAX(value) - MIN(value), 4) AS amplitude,
           ROUND(CAST(date_diff('microsecond', MIN(ts), MAX(ts)) AS DOUBLE)
                 / 1e6 / (COUNT(*) - 1), 2) AS mean_interval_sec
    FROM events
    GROUP BY user_id
    HAVING COUNT(*) >= {_MIN_OBS}
    """,
)
def grouped_series_stats_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Variability-style per-key series statistics through the grouped-map
    Arrow path, verified against a pure-SQL recompute."""
    return per_key_series_stats(load_table(spark, sf_dir, "events"))
