"""Local mirror of the driver's DuckDB-oracle comparison.

Runs a registered Spark query and its oracle SQL on the same parquet
tables, then compares row count, column-name set, and order-insensitive
canonicalized values — catching mismatches before the driver does.
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd

from astro_data_pipeline_spark.sources.tables import TABLES


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _canon_cell(v):
    if v is None or (isinstance(v, float) and math.isnan(v)):
        return "NULL"
    if isinstance(v, bool):
        return str(v).lower()
    if isinstance(v, float):
        # full-precision repr since round 4: the 6-significant-digit form
        # (and the int-valued-float collapse it came with) hid byte-level
        # asymmetries a hash gate sees — signed zeros, DECIMAL-literal
        # ULPs, banker's-rounding ties, HUGEINT-vs-long sum types. Every
        # oracled query is repr-exact at both driver SFs
        # (scripts/sweep_oracles_sf01.py), so pytest now holds that line.
        return repr(float(v))
    return str(v)


def canonicalize(df: pd.DataFrame) -> list[tuple]:
    cols = sorted(df.columns)
    rows = [tuple(_canon_cell(v) for v in row) for row in df[cols].itertuples(index=False)]
    return sorted(rows)


def compare_query(spark, sf_dir: str, spark_fn, oracle: str) -> None:
    sdf = spark_fn(spark, sf_dir)
    spark_pd = sdf.toPandas()
    con = duck_connection(sf_dir)
    duck_pd = con.sql(oracle).df()
    con.close()

    assert sorted(spark_pd.columns) == sorted(duck_pd.columns), (
        f"schema mismatch: spark={sorted(spark_pd.columns)} duck={sorted(duck_pd.columns)}"
    )
    assert len(spark_pd) == len(duck_pd), (
        f"row count mismatch: spark={len(spark_pd)} duck={len(duck_pd)}"
    )
    s_rows = canonicalize(spark_pd)
    d_rows = canonicalize(duck_pd)
    if s_rows != d_rows:
        diffs = [(a, b) for a, b in zip(s_rows, d_rows) if a != b][:5]
        raise AssertionError(f"value mismatch; first diffs: {diffs}")
