#!/usr/bin/env python
"""Scaling evidence for the north rule: identical CDC replay job at N and
4N cores, throughput at both + scaling efficiency (target >= 0.8).

The north rule's two-cluster-size criterion (N vs 4N *executors*) cannot
use a real cluster in this sandbox, so this harness runs the SAME job on
the SAME input at two local parallelism levels (default local[8] vs
local[32]) — each in a fresh JVM launched via ``spark-submit --py-files``
(the deployment shape BASELINE.json mandates) — and reports

    efficiency = (events_per_sec@4N / events_per_sec@N) / 4

into ``BENCH/BASELINE.md``. Caveat (documented there): both levels share
one memory bus and page cache, so this understates true multi-node
scaling for shuffle-light, CPU-bound work like this job (sha256 over
content dominates per-task cost).

Usage:
    python scripts/bench_scaling.py                 # full run -> BENCH/BASELINE.md
    python scripts/bench_scaling.py --pair 8 32     # choose N and 4N
    python scripts/bench_scaling.py --worker --cpus 8 --sf 0.1 --out /tmp/r.json
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


# --------------------------------------------------------------- worker

def run_worker(cpus: int, sf: float, n_batches: int, out_path: str, trials: int = 2) -> None:
    """One timed replay at local[cpus]; executed inside spark-submit."""
    from astro_data_pipeline_spark.session import get_spark
    from bench import bench_cdc_replay

    spark = get_spark(app_name=f"adps-scale-{cpus}", cpus=cpus)
    res = bench_cdc_replay(spark, sf, n_batches=n_batches, trials=trials)
    res["cpus"] = cpus
    spark.stop()
    with open(out_path, "w") as f:
        json.dump(res, f)


# --------------------------------------------------------------- driver

def _spark_submit() -> str:
    import pyspark

    return os.path.join(os.path.dirname(pyspark.__file__), "bin", "spark-submit")


def _build_pyfiles_zip() -> str:
    """Package the engine for --py-files (north_rule deployment shape)."""
    out = os.path.join(REPO, ".bench", "adps.zip")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    pkg = os.path.join(REPO, "astro_data_pipeline_spark")
    with zipfile.ZipFile(out, "w") as z:
        for dirpath, _dirs, files in os.walk(pkg):
            for fn in files:
                if fn.endswith(".py"):
                    full = os.path.join(dirpath, fn)
                    z.write(full, os.path.relpath(full, REPO))
        z.write(os.path.join(REPO, "bench.py"), "bench.py")
    return out


def submit_one(cpus: int, sf: float, n_batches: int, trials: int = 2) -> dict:
    out_json = os.path.join(REPO, ".bench", f"scale-{cpus}.json")
    if os.path.exists(out_json):
        os.remove(out_json)
    zip_path = _build_pyfiles_zip()
    env = dict(os.environ)
    env["PYSPARK_PYTHON"] = sys.executable
    env["PYSPARK_DRIVER_PYTHON"] = sys.executable
    cmd = [
        _spark_submit(),
        "--master", f"local[{cpus}]",
        "--py-files", zip_path,
        "--conf", "spark.driver.memory=48g",
        os.path.abspath(__file__),
        "--worker", "--cpus", str(cpus), "--sf", str(sf),
        "--n-batches", str(n_batches), "--trials", str(trials),
        "--out", out_json,
    ]
    print(f"[scaling] spark-submit local[{cpus}] ...", file=sys.stderr)
    subprocess.run(cmd, check=True, env=env, cwd=REPO,
                   stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
    with open(out_json) as f:
        return json.load(f)


def write_report(lo: dict, hi: dict, sf: float, path: str) -> dict:
    ratio = hi["cdc_events_per_sec"] / lo["cdc_events_per_sec"]
    factor = hi["cpus"] / lo["cpus"]
    eff = ratio / factor
    summary = {
        "metric": "cdc_scaling_efficiency",
        "sf": sf,
        "n_cores": lo["cpus"],
        "4n_cores": hi["cpus"],
        "events_per_sec_n": lo["cdc_events_per_sec"],
        "events_per_sec_4n": hi["cdc_events_per_sec"],
        "speedup": round(ratio, 3),
        "efficiency": round(eff, 3),
        "pass": eff >= 0.8,
    }
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        f.write(
            "# Scaling evidence — CDC replay at N vs 4N parallelism\n\n"
            "North-rule criterion: throughput scaling efficiency >= 0.8 from N to 4N\n"
            "executors. Sandbox stand-in (no real cluster available): the identical\n"
            "replay job, identical input, run at two local parallelism levels, each in\n"
            "a fresh JVM via `spark-submit --py-files .bench/adps.zip` —\n"
            "the deployment shape BASELINE.json specifies.\n\n"
            f"Job: merge-on-read CDC replay + final compaction at sf={sf}\n"
            f"({lo['cdc_events']:,} change events -> committed, compacted snapshot;\n"
            f"final state {lo['cdc_final_rows']:,} rows). Per-task work is dominated\n"
            "by vectorized sha256-over-content + parquet encode (CPU-bound), so\n"
            "parallel efficiency reflects parallelizability, not I/O wait.\n\n"
            "| cores | wall (s) | events/sec |\n"
            "|---|---|---|\n"
            f"| local[{lo['cpus']}] (N) | {lo['cdc_replay_sec']} | {lo['cdc_events_per_sec']:,} |\n"
            f"| local[{hi['cpus']}] (4N) | {hi['cdc_replay_sec']} | {hi['cdc_events_per_sec']:,} |\n\n"
            f"**Speedup N->4N: {summary['speedup']}x; efficiency = {summary['speedup']}/{int(factor)} = "
            f"{summary['efficiency']}** ({'PASS' if summary['pass'] else 'BELOW TARGET'} vs >= 0.8).\n\n"
            "Caveats: both runs share one memory bus, page cache, and GC domain —\n"
            "a single-machine 4x-thread scale-up is strictly harsher than adding\n"
            "executors on separate hosts (memory bandwidth saturates; no extra\n"
            "cache). On a real 4N-executor cluster the same plan shape (no\n"
            "cross-batch shuffle growth, bucket-pruned merges, map-side LWW\n"
            "collapse) scales by partition count.\n\n"
            "```json\n" + json.dumps(summary, indent=2) + "\n```\n"
        )
    return summary


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--worker", action="store_true")
    ap.add_argument("--cpus", type=int, default=8)
    ap.add_argument("--sf", type=float, default=0.1)
    ap.add_argument("--n-batches", type=int, default=4)
    ap.add_argument("--trials", type=int, default=2)
    ap.add_argument("--out", default="")
    ap.add_argument("--pair", nargs=2, type=int, default=[8, 32])
    args = ap.parse_args()

    if args.worker:
        run_worker(args.cpus, args.sf, args.n_batches, args.out, trials=args.trials)
        return

    # pre-generate the fixture once so neither timed run pays for it
    from bench import cdc_fixture_dir

    cdc_fixture_dir(args.sf)
    n, n4 = args.pair
    lo = submit_one(n, args.sf, args.n_batches, trials=args.trials)
    hi = submit_one(n4, args.sf, args.n_batches, trials=args.trials)
    summary = write_report(lo, hi, args.sf, os.path.join(REPO, "BENCH", "BASELINE.md"))
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
