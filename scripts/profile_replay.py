"""Phase-profile one CDC replay: where does driver-side serial time go?

Usage::

    SPARK_GRAFT_PROFILE=1 python scripts/profile_replay.py --sf 0.1 --cpus 32

Prints total wall, per-phase driver timings, and the residual (wall not
covered by any instrumented phase — plan construction, scheduling, misc
driver work). Compare --cpus 8 vs 32: phases that don't shrink are the
Amdahl serial fraction capping scaling efficiency.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

os.environ.setdefault("SPARK_GRAFT_PROFILE", "1")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", type=float, default=0.1)
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--n-batches", type=int, default=4)
    ap.add_argument("--compact", action="store_true")
    ap.add_argument("--trials", type=int, default=1)
    args = ap.parse_args()

    from astro_data_pipeline_spark import perf
    from astro_data_pipeline_spark.cdc import apply as A
    from astro_data_pipeline_spark.cdc.runner import CdcRunner, read_event_log
    from astro_data_pipeline_spark.lakehouse import LakeTable
    from astro_data_pipeline_spark.session import get_spark, scratch_tmpdir_base
    from pyspark.sql import types as T

    from bench import cdc_fixture_dir

    meta = cdc_fixture_dir(args.sf)
    spark = get_spark(
        app_name="profile-replay",
        cpus=args.cpus,
        extra_conf={"spark.ui.enabled": "true"},
    )
    events = read_event_log(spark, meta["v1_path"], meta["v2_path"])

    for trial in range(args.trials):
        with tempfile.TemporaryDirectory(dir=scratch_tmpdir_base()) as td:
            table = LakeTable.create(
                spark, os.path.join(td, "lake"), T.StructType(A.BASE_TABLE_FIELDS),
                A.KEY_COLS, n_buckets=64,
            )
            perf.reset()
            t0 = time.time()
            CdcRunner(spark, table, run_id="prof", mode="mor").replay(
                events, n_batches=args.n_batches
            )
            t1 = time.time()
            if args.compact:
                table.compact()
            t2 = time.time()

        timings = perf.dump()
        covered = sum(v["total_s"] for v in timings.values())
        out = {
            "trial": trial,
            "cpus": args.cpus,
            "sf": args.sf,
            "replay_wall_s": round(t1 - t0, 3),
            "compact_wall_s": round(t2 - t1, 3),
            "events_per_sec": round(meta["n_events"] / (t1 - t0), 1),
            "phase_covered_s": round(covered, 3),
            "residual_s": round((t1 - t0) - covered, 3),
            "phases": timings,
        }
        print(json.dumps(out, indent=2))

    # Job/stage walls from the UI REST API: the gap between an action's
    # wall and its jobs' walls is driver think time (analysis/optimize/
    # plan); within a job, submission->firstTaskLaunched is scheduling.
    try:
        import urllib.request

        base = spark.sparkContext.uiWebUrl
        app = spark.sparkContext.applicationId
        with urllib.request.urlopen(f"{base}/api/v1/applications/{app}/jobs") as r:
            jobs = json.loads(r.read())
        from datetime import datetime

        def ts(s):
            return datetime.strptime(s[:23], "%Y-%m-%dT%H:%M:%S.%f").timestamp()

        rows = []
        for j in sorted(jobs, key=lambda j: j["jobId"]):
            if "completionTime" not in j:
                continue
            rows.append(
                {
                    "job": j["jobId"],
                    "wall_s": round(ts(j["completionTime"]) - ts(j["submissionTime"]), 3),
                    "submitted": j["submissionTime"][11:23],
                    "tasks": j["numCompletedTasks"],
                    "name": j.get("name", "")[:60],
                }
            )
        total_job_wall = sum(r["wall_s"] for r in rows)
        print(json.dumps({"total_job_wall_s": round(total_job_wall, 3), "jobs": rows}, indent=2))
    except Exception as e:  # UI may be disabled
        print(f"(no UI metrics: {e})", file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()
