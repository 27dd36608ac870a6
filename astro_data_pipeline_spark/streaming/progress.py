"""Streaming progress surface (SURVEY.md §2.11 monitor/poll loop).

The reference polls job status every 30 s and logs per-job progress
(telescope_data_processing.py:210-293, ``monitor_processing_jobs``). The
Spark-native analog is push, not poll: a ``StreamingQueryListener``
receives one progress event per micro-batch epoch with source offsets,
row counts, and stage durations — the same ledger `BatchReport` gives
the batch path, emitted by the engine instead of scraped over HTTP.
"""

from __future__ import annotations

import time

from pyspark.sql import SparkSession
from pyspark.sql.streaming import StreamingQueryListener


class ProgressRecorder(StreamingQueryListener):
    """Records one row per micro-batch epoch from the streaming engine.

    Rows land in ``self.progress`` (driver-side list — progress metadata
    is tiny and bounded by epoch count, never row count). Listener
    callbacks arrive on Spark's listener-bus thread; ``wait_for`` blocks
    until the bus has drained the expected number of epochs, since
    delivery is asynchronous w.r.t. ``awaitTermination``.
    """

    def __init__(self) -> None:
        self.started: list[dict] = []
        self.progress: list[dict] = []
        self.terminated: list[dict] = []

    # -- StreamingQueryListener interface --------------------------------
    def onQueryStarted(self, event) -> None:
        self.started.append({"id": str(event.id), "run_id": str(event.runId)})

    def onQueryProgress(self, event) -> None:
        p = event.progress
        self.progress.append(
            {
                "run_id": str(p.runId),
                "epoch": p.batchId,
                "timestamp": p.timestamp,
                "num_input_rows": p.numInputRows,
                "input_rows_per_sec": p.inputRowsPerSecond,
                "process_rows_per_sec": p.processedRowsPerSecond,
                "duration_ms": dict(p.durationMs or {}),
            }
        )

    def onQueryIdle(self, event) -> None:
        pass

    def onQueryTerminated(self, event) -> None:
        self.terminated.append(
            {"id": str(event.id), "exception": event.exception}
        )

    # -- helpers ---------------------------------------------------------
    def wait_for(
        self, n_epochs: int, timeout_s: float = 30.0, run_id: str | None = None
    ) -> list[dict]:
        """Block until ≥ n_epochs progress rows arrived (listener bus is
        async); returns the progress rows.

        Listeners are session-global: with another streaming query live
        in the same session its epochs land in this recorder too. Pass
        ``run_id`` (``str(query.runId)``) to count and return only THIS
        query's rows — otherwise a concurrent stream both satisfies the
        wait early and pollutes the returned metrics."""

        def rows() -> list[dict]:
            if run_id is None:
                return self.progress
            return [r for r in self.progress if r["run_id"] == run_id]

        deadline = time.monotonic() + timeout_s
        while len(rows()) < n_epochs and time.monotonic() < deadline:
            time.sleep(0.05)
        return rows()


class recording_listener:
    """Context manager: attach a ProgressRecorder for the duration of a
    streaming run and detach it afterwards (listeners are session-global,
    leaking one would double-count the next query's epochs)."""

    def __init__(self, spark: SparkSession):
        self.spark = spark
        self.recorder = ProgressRecorder()

    def __enter__(self) -> ProgressRecorder:
        self.spark.streams.addListener(self.recorder)
        return self.recorder

    def __exit__(self, *exc) -> None:
        self.spark.streams.removeListener(self.recorder)
