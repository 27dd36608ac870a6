"""Repr-level oracle sweep at the driver's own SF (default sf0.1).

Runs EVERY registered query against its DuckDB oracle and compares
row count, column names, and values canonicalized at FULL precision
(``repr`` of floats — strictly stricter than any plausible driver
hash). The round-4 lesson: numeric comparison (numpy ``!=``) and
6-significant-digit canonicalization both hide byte-level asymmetries
a hash gate sees — signed zeros, DECIMAL-vs-DOUBLE literal parsing,
banker's-vs-half-up rounding ties, int-vs-hugeint sum types. This
sweep found five of those across two rounds of queries that were
green under looser comparison.

Usage:
    python scripts/sweep_oracles_sf01.py [sf_dir] [first|rest|all]
"""

from __future__ import annotations

import math
import os
import sys
import time

import duckdb

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def canon(df, level: str):
    cols = sorted(df.columns)

    def c(v):
        if v is None or (isinstance(v, float) and math.isnan(v)):
            return "NULL"
        if isinstance(v, bool):
            return str(v).lower()
        if isinstance(v, float):
            return repr(float(v)) if level == "repr" else f"{v:.6g}"
        return str(v)

    return sorted(tuple(c(v) for v in row) for row in df[cols].itertuples(index=False))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    which = sys.argv[2] if len(sys.argv) > 2 else "all"

    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", os.path.join(REPO, "__spark_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    from astro_data_pipeline_spark.session import get_spark
    from astro_data_pipeline_spark.sources.tables import TABLES

    spark = get_spark(app_name="oracle-sweep", cpus=16)
    qs, os_ = mod.queries(), mod.oracle_sql()
    names = list(qs)
    # Oracles scoped to ONE dataset (their VALUES freeze per-key outputs
    # of the sf0.01 gate tables; the same key's data differs per SF) —
    # skip them at any other sf_dir instead of reporting a false fail.
    from astro_data_pipeline_spark.operators.periodogram_golden import (
        GOLDEN_SF_DIR,
    )

    if os.path.normpath(sf_dir) != os.path.normpath(GOLDEN_SF_DIR):
        skipped = [n for n in names if n == "grouped_periodogram_peak"]
        names = [n for n in names if n not in skipped]
        for n in skipped:
            print(f"[sweep] SKIP {n}: oracle scoped to {GOLDEN_SF_DIR}")
    if which == "first":
        names = names[:50]
    elif which == "rest":
        names = names[50:]
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    fails = []
    for name in names:
        try:
            t0 = time.time()
            spd = qs[name](spark, sf_dir).toPandas()
            if name not in os_:
                print(f"{name}: rows-only ({len(spd)}) [{time.time()-t0:.1f}s]", flush=True)
                continue
            dpd = con.sql(os_[name]).df()
            status = []
            if len(spd) != len(dpd):
                status.append(f"ROWS {len(spd)}!={len(dpd)}")
            if sorted(spd.columns) != sorted(dpd.columns):
                status.append("SCHEMA")
            if not status and canon(spd, "repr") != canon(dpd, "repr"):
                status.append(
                    "VALUES-6g" if canon(spd, "6g") != canon(dpd, "6g") else "VALUES-repr-only"
                )
            msg = ",".join(status) if status else "ok"
            if status:
                fails.append((name, msg))
            print(f"{name}: {msg} ({len(spd)}) [{time.time()-t0:.1f}s]", flush=True)
        except Exception as ex:  # noqa: BLE001 — a sweep must finish
            fails.append((name, f"ERROR {type(ex).__name__}"))
            print(f"{name}: ERROR {str(ex)[:160]}", flush=True)
    con.close()
    spark.stop()
    print("== FAILS ==", fails)
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
