"""Structured Streaming tail of the change log (SURVEY.md §2.11).

The reference ingests two ways: event-push (S3 ObjectCreated → Lambda →
DAG trigger, terraform/01-data/lambda/s3_trigger.py:6-55) and hourly
micro-batch discovery with a 1-hour lookback
(telescope_data_processing.py:62-101). This module is the Spark-native
restatement of the event-push path: a file-source ``readStream`` over
WAL segment files feeding ``foreachBatch`` into the same exactly-once
``CdcRunner.apply_batch`` the batch loop uses — one apply code path,
two trigger modes (reference analog: the DAG body is shared between the
event trigger and the hourly schedule).

Ordering contract: WAL segments arrive in LSN order (standard binlog
property — segment N is sealed before N+1 is published), so the file
source's in-order file pickup preserves cross-batch LSN order; bounded
intra-segment disorder is collapsed by the in-batch LWW window. The
1-hour-lookback data loss of the reference (files older than the window
are silently missed) is replaced by the streaming checkpoint: the source
tracks consumed files, so nothing is ever missed — same contract,
strictly stronger (SURVEY.md §2.11 "late-data / lookback window").

Late data in *event time* is handled where it matters — the windowed
monitoring aggregation uses ``withWatermark`` so state is bounded while
late events still merge into their window (reference analog: the
quality-monitoring DAG's 24h lookback windows,
data_quality_monitoring.py:137-141).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..lakehouse import LakeTable
from .runner_bridge import StreamApplier

EVENT_SCHEMA = T.StructType(
    [
        T.StructField("lsn", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("op", T.StringType()),
        T.StructField("repo", T.StringType()),
        T.StructField("path", T.StringType()),
        T.StructField("commit", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("content", T.StringType()),
        T.StructField("lang_meta", T.StringType()),
    ]
)


def event_log_stream(
    spark: SparkSession,
    glob_path: str,
    schema: T.StructType = EVENT_SCHEMA,
    max_files_per_trigger: int = 1,
) -> DataFrame:
    """File-source stream over WAL segment files.

    The explicit schema is the evolved (superset) schema: pre-evolution
    segments null-fill the new columns — the streaming twin of
    ``read_event_log``'s by-name alignment. ``maxFilesPerTrigger`` is
    the backpressure knob (reference analog: MAX_PARALLEL_JOBS=10,
    batch_processing_dag.py:55).
    """
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(glob_path)
    )


def stream_replay_available_now(
    spark: SparkSession,
    glob_path: str,
    table: LakeTable,
    checkpoint_dir: str,
    run_id: str = "stream",
    mode: str = "mor",
    schema: T.StructType = EVENT_SCHEMA,
    strict_order: bool = True,
    max_files_per_trigger: int = 1,
    views=None,
) -> list[dict]:
    """Drain all currently-available WAL segments into the lake table via
    ``foreachBatch`` (Trigger.AvailableNow), exactly-once.

    Two dedupe layers make restarts safe: the streaming checkpoint skips
    already-consumed files, and the table's committed-batch-id manifest
    skips a batch that was applied but whose checkpoint write was lost
    (the classic foreachBatch at-least-once gap). Batch identity is
    ``{run_id}:epoch:{N}`` — Spark keeps the epoch id stable across
    retries of the same epoch, and the run_id scopes it to THIS stream
    (pair run_id 1:1 with the checkpoint dir; see StreamApplier).

    ``views``: optional :class:`IncrementalAggView` list maintained
    continuously — each epoch's apply is followed by ``refresh()``, so
    the aggregates are a Flink-style dynamic table over the stream. The
    coupling is crash-safe WITHOUT any cross-table transaction: a view
    refresh is idempotent under its own batch ledger (keyed by the base
    snapshot range, not the epoch), so a retried epoch no-ops at both
    layers, and a crash between the base commit and the refresh is
    healed by the NEXT epoch's refresh, whose ``changes()`` range simply
    spans both commits."""
    reports: list[dict] = []
    # strict_order / max_files_per_trigger are forwarded — the order
    # guard's own error message tells the operator to pass
    # strict_order=False, so the public entrypoint must accept it
    applier = StreamApplier(table, run_id, mode, strict_order=strict_order)

    def handle(batch_df: DataFrame, epoch_id: int) -> None:
        rep = applier(batch_df, epoch_id)
        if rep is not None:
            reports.append(rep)
        for v in views or ():
            # refresh even on a ledger-skipped epoch: a prior crash may
            # have left the view one range behind the base
            v.refresh()

    q = (
        event_log_stream(
            spark, glob_path, schema=schema,
            max_files_per_trigger=max_files_per_trigger,
        )
        .writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # post-drain catch-up: "healed by the next epoch" needs a next epoch —
    # a restart after a crash between the final base commit and its view
    # refresh may find NO new files (zero epochs fire), so sweep once
    # after the drain; a current view no-ops here (one snapshot compare)
    for v in views or ():
        v.refresh()
    return reports


def stream_windowed_op_counts(
    events: DataFrame, window: str = "1 minute", watermark: str = "2 minutes"
) -> DataFrame:
    """Event-time windowed op-mix monitoring with a watermark bound.

    Streaming twin of the reference's scheduled quality SQL (op counts
    over a lookback window, data_quality_monitoring.py:123-142): state
    for windows older than the watermark is dropped, late events within
    it still merge — bounded state at unbounded input.
    """
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "op")
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("w.start").alias("window_start"),
            "op",
            "n_events",
        )
    )
