"""spark-submit entry point for the CDC replay engine.

The north-rule deployment shape (BASELINE.json: "spark-submit --py-files
on a multi-executor cluster"). Usage::

    spark-submit --py-files adps.zip astro_data_pipeline_spark/cdc/demo.py \
        --events 'wal/change_events_*.parquet' --table /lake/repos \
        --n-batches 8 --mode mor --compact-every 4

or locally (builds its own session)::

    python -m astro_data_pipeline_spark.cdc.demo --sf 0.01

With ``--sf`` and no ``--events``, a deterministic fixture log is
generated under ``.bench/`` (bench.py's cache) and replayed into a temp
table — a self-contained smoke run.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile


def _repo_root() -> str:
    return os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )


def main() -> None:
    ap = argparse.ArgumentParser(description="CDC replay: WAL tail -> lake table")
    ap.add_argument("--events", help="parquet glob/paths of the change log", nargs="*")
    ap.add_argument("--table", help="lake table root dir (created if absent)")
    ap.add_argument("--sf", type=float, help="generate+replay a fixture log at this SF")
    ap.add_argument("--n-batches", type=int, default=4)
    ap.add_argument("--mode", choices=["mor", "cow"], default="mor")
    ap.add_argument("--compact-every", type=int, default=None)
    ap.add_argument("--run-id", default=None)
    ap.add_argument("--cpus", type=int, default=None)
    ap.add_argument(
        "--wap-branch",
        default=None,
        metavar="NAME",
        help="write-audit-publish: replay into this branch, audit "
        "(row-count + null-sha checks on the branch view), then "
        "fast_forward main only if the audit passes",
    )
    ap.add_argument(
        "--matview-dir",
        default=None,
        metavar="DIR",
        help="maintain a per-repo aggregate materialized view at DIR "
        "(created on first run, O(changed rows) refresh after the "
        "replay; survives across invocations for incremental tails)",
    )
    ap.add_argument(
        "--replica-dir",
        default=None,
        metavar="DIR",
        help="maintain a logical replica of the lake table at DIR "
        "(sha+lsn columns only; net-diff sync after the replay)",
    )
    args = ap.parse_args()
    if args.mode == "cow" and (args.matview_dir or args.replica_dir):
        # incremental consumers follow the table's row-level changelog,
        # which only merge-on-read commits keep (changes() docstring)
        ap.error("--matview-dir/--replica-dir need --mode mor")

    from pyspark.sql import types as T

    # Absolute imports so the file works BOTH as a module
    # (python -m astro_data_pipeline_spark.cdc.demo) and as a
    # spark-submit primary resource (run as __main__ with no package
    # context; the engine then comes from --py-files adps.zip on the
    # driver's PYTHONPATH, or — bare-script dev runs — from the repo
    # root three levels up from this file).
    try:
        from astro_data_pipeline_spark.cdc import apply as A
        from astro_data_pipeline_spark.cdc.runner import CdcRunner, read_event_log
        from astro_data_pipeline_spark.lakehouse import LakeTable
        from astro_data_pipeline_spark.session import get_spark
    except ModuleNotFoundError:
        sys.path.insert(0, _repo_root())
        from astro_data_pipeline_spark.cdc import apply as A
        from astro_data_pipeline_spark.cdc.runner import CdcRunner, read_event_log
        from astro_data_pipeline_spark.lakehouse import LakeTable
        from astro_data_pipeline_spark.session import get_spark

    spark = get_spark(app_name="adps-cdc-replay", cpus=args.cpus)

    if args.events:
        paths = args.events
    elif args.sf is not None:
        sys.path.insert(0, _repo_root())
        from bench import cdc_fixture_dir

        meta = cdc_fixture_dir(args.sf)
        paths = [meta["v1_path"], meta["v2_path"]]
    else:
        ap.error("need --events or --sf")

    events = read_event_log(spark, *paths)

    tmp = None
    table_dir = args.table
    if table_dir is None:
        tmp = tempfile.TemporaryDirectory()
        table_dir = os.path.join(tmp.name, "lake")
    if os.path.exists(os.path.join(table_dir, "metadata", "version-hint.txt")):
        table = LakeTable.load(spark, table_dir)
    else:
        table = LakeTable.create(
            spark, table_dir, T.StructType(A.BASE_TABLE_FIELDS), A.KEY_COLS, n_buckets=64
        )

    sink = table
    if args.wap_branch:
        sink = table.create_branch(args.wap_branch)

    runner = CdcRunner(
        spark,
        sink,
        run_id=args.run_id,
        mode=args.mode,
        compact_every=args.compact_every,
    )
    reports = runner.replay(events, n_batches=args.n_batches)
    summary = {
        "batches": [
            {"batch_id": r.batch_id, "status": r.status, **r.totals} for r in reports
        ],
    }
    if args.wap_branch:
        # the audit half of WAP: validate the BRANCH view, publish on pass
        from pyspark.sql import functions as F

        n = sink.read().count()
        n_null_sha = sink.read().filter(F.col("content_sha256").isNull()).count()
        audit_pass = n > 0 and n_null_sha == 0
        summary["wap"] = {
            "branch": args.wap_branch,
            "rows": n,
            "null_sha_rows": n_null_sha,
            "audit": "pass" if audit_pass else "fail",
        }
        if audit_pass:
            table.fast_forward(args.wap_branch)
            table.drop_branch(args.wap_branch)
            summary["wap"]["published_snapshot"] = table.current_snapshot().snapshot_id
        else:
            table.drop_branch(args.wap_branch)
            summary["wap"]["published_snapshot"] = None
    if args.matview_dir:
        # downstream consumer 1: per-repo aggregate view, created on the
        # first run and refreshed in O(changed rows) on every later one
        from astro_data_pipeline_spark.lakehouse.matview import (
            AggSpec,
            IncrementalAggView,
        )

        if os.path.exists(os.path.join(args.matview_dir, "mv.json")):
            view = IncrementalAggView.load(spark, args.matview_dir, base=table)
            stats = view.refresh()
        else:
            view = IncrementalAggView.create(
                spark,
                args.matview_dir,
                table,
                ["repo"],
                [
                    AggSpec("count", None, "n_files"),
                    AggSpec("sum", "last_lsn", "sum_lsn"),
                    AggSpec("max", "last_lsn", "max_lsn"),
                ],
                n_buckets=16,
            )
            stats = {"created": True}
        summary["matview"] = {
            "groups": view.read().count(),
            **{k: v for k, v in stats.items() if isinstance(v, (int, bool, str))},
        }
    if args.replica_dir:
        # downstream consumer 2: column-pruned logical replica
        from astro_data_pipeline_spark.lakehouse.replicate import Replicator

        if os.path.exists(
            os.path.join(args.replica_dir, "metadata", "version-hint.txt")
        ):
            replica = LakeTable.load(spark, args.replica_dir)
            repl = Replicator(table, replica, columns=["content_sha256", "last_lsn"])
            stats = repl.sync()
        else:
            repl = Replicator.create_replica(
                table,
                args.replica_dir,
                columns=["content_sha256", "last_lsn"],
                n_buckets=16,
            )
            stats = {"created": True}
        summary["replica"] = {
            "rows": repl.replica.read().count(),
            **{k: v for k, v in stats.items() if isinstance(v, (int, bool, str))},
        }
    if args.mode == "mor":
        table.compact()
    summary["final_rows"] = table.read().count()
    summary["snapshot_id"] = table.current_snapshot().snapshot_id
    print(json.dumps(summary))
    spark.stop()
    if tmp is not None:
        tmp.cleanup()


if __name__ == "__main__":
    main()
