"""Bridge a streaming micro-batch into the batch-path apply.

Kept separate from ``replay.py`` so the foreachBatch closure stays tiny
and the apply logic is the SAME code the LSN-range batch loop uses
(CdcRunner.apply_batch) — one semantics, two triggers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..cdc.runner import CdcRunner
from ..lakehouse import LakeTable


def apply_stream_batch(
    batch_df: DataFrame,
    epoch_id: int,
    table: LakeTable,
    run_id: str,
    mode: str,
) -> dict | None:
    """Apply one foreachBatch micro-batch exactly-once.

    Batch identity = stream epoch id (stable across epoch retries), so
    the table-side committed-batch-id check closes the foreachBatch
    at-least-once gap: if the merge committed but the stream checkpoint
    write was lost, the replayed epoch is skipped.
    """
    # One WAL segment per epoch is bounded — pin it so the apply path's
    # multiple jobs (emptiness+lsn bounds, hot-key sample, merge write)
    # read the source ONCE instead of re-scanning the segment per job.
    batch_df = batch_df.persist()
    try:
        return _apply_pinned(batch_df, epoch_id, table, run_id, mode)
    finally:
        batch_df.unpersist()


def _apply_pinned(
    batch_df: DataFrame,
    epoch_id: int,
    table: LakeTable,
    run_id: str,
    mode: str,
) -> dict | None:
    runner = CdcRunner(batch_df.sparkSession, table, run_id=run_id, mode=mode)
    # single bounds-and-emptiness job; it also materializes the cache
    lo_hi = batch_df.agg(F.min("lsn"), F.max("lsn"), F.count("*")).collect()[0]
    if int(lo_hi[2]) == 0:
        return None
    if lo_hi[0] is None:
        # Non-empty batch whose lsn values are all null: every event fails
        # the validity predicate — run it through apply anyway (quarantine
        # metrics fire, nothing merges) under an epoch-derived identity
        # instead of crashing the whole stream on int(None).
        rep = runner.apply_batch(
            batch_df, batch_id=f"epoch:{epoch_id}", lsn_lo=-1, lsn_hi=-1
        )
        return {
            "batch_id": rep.batch_id,
            "status": rep.status,
            "totals": rep.totals,
            "snapshot_id": rep.snapshot_id,
            "n_quarantined": rep.n_quarantined,
        }
    rep = runner.apply_batch(
        batch_df,
        batch_id=f"epoch:{epoch_id}",
        lsn_lo=int(lo_hi[0]),
        lsn_hi=int(lo_hi[1]),
    )
    return {
        "batch_id": rep.batch_id,
        "status": rep.status,
        "totals": rep.totals,
        "snapshot_id": rep.snapshot_id,
        "n_quarantined": rep.n_quarantined,
    }
