"""One arm of the replay-throughput A/B (VERDICT_r03 item 2).

Run from the repo checkout whose engine code should be measured:

    cd <checkout> && python scripts/ab_replay_xcommit.py <tag> [trials] [cpus] [sf]

Prints one JSON line {"tag":..., "trials_sec":[...], "best_sec":...,
"events_per_sec":...}.  The harness (bench.bench_cdc_replay) is
byte-identical between the r2 worktree and HEAD, so any delta is engine
code, not harness.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.getcwd())


def main() -> None:
    tag = sys.argv[1]
    trials = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    cpus = int(sys.argv[3]) if len(sys.argv) > 3 else 32
    sf = float(sys.argv[4]) if len(sys.argv) > 4 else 0.1

    import bench
    from astro_data_pipeline_spark.session import get_spark

    spark = get_spark(app_name=f"ab-replay-{tag}", cpus=cpus)
    if os.environ.get("SPARK_GRAFT_BLOOM") == "0":
        spark.conf.set("spark.adps.parquet.bloom.enabled", "false")
    res = bench.bench_cdc_replay(spark, sf, trials=trials)
    spark.stop()
    print(
        json.dumps(
            {
                "tag": tag,
                "sf": sf,
                "cpus": cpus,
                "trials_sec": res["cdc_replay_trials_sec"],
                "best_sec": res["cdc_replay_sec"],
                "events_per_sec": res["cdc_events_per_sec"],
            }
        )
    )


def main_profiled() -> None:
    """Variant that dumps perf-phase totals for the LAST trial only
    (reset between trials), isolating warmed-up per-batch driver cost."""
    tag = sys.argv[2]
    cpus = int(sys.argv[3]) if len(sys.argv) > 3 else 32
    sf = float(sys.argv[4]) if len(sys.argv) > 4 else 1.0

    import tempfile
    import time

    import bench
    from astro_data_pipeline_spark import perf
    from astro_data_pipeline_spark.cdc import apply as A
    from astro_data_pipeline_spark.cdc.runner import CdcRunner, read_event_log
    from astro_data_pipeline_spark.lakehouse import LakeTable
    from astro_data_pipeline_spark.session import get_spark, scratch_tmpdir_base
    from pyspark.sql import types as T

    spark = get_spark(app_name=f"ab-prof-{tag}", cpus=cpus)
    meta = bench.cdc_fixture_dir(sf)
    events = read_event_log(spark, meta["v1_path"], meta["v2_path"])
    out = []
    for trial in range(2):
        perf.reset()
        with tempfile.TemporaryDirectory(dir=scratch_tmpdir_base()) as td:
            table = LakeTable.create(
                spark, os.path.join(td, "lake"),
                T.StructType(A.BASE_TABLE_FIELDS), A.KEY_COLS, n_buckets=64,
            )
            t0 = time.time()
            CdcRunner(spark, table, run_id=f"p{trial}", mode="mor").replay(
                events, n_batches=4
            )
            dt = time.time() - t0
        out.append({"trial_sec": round(dt, 3), "phases": perf.dump()})
    spark.stop()
    print(json.dumps({"tag": tag, "sf": sf, "runs": out}))


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--profile":
        main_profiled()
    else:
        main()
