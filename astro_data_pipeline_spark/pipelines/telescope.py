"""The reference's main Airflow DAG restated over this engine's tables.

Task-for-task mirror of ``airflow/dags/telescope_data_processing.py``
(discover :62 → validate :103 → TaskGroup(submit :158 → monitor :210)
→ [update_catalog :295, archive :356, quality_check :443] → cleanup
:458, plus the trigger_rule='one_failed' notification :470-483), with
each task's data plane expressed as a DataFrame count/aggregate over
the engine's tables instead of S3 listings and REST calls:

- discover: the event log replaces the raw-FITS bucket listing;
- validate: schema/domain validation of discovered events (the FITS
  header checks :115-140);
- image_processing group: the P1-P6 image catalog stands in for the
  processing-job submit/monitor pair;
- update_catalog: LWW current-state keys (the catalog upsert :320-340);
- quality_check: the reference's type-count SQL (:443-455) over events;
- archive + cleanup: bookkeeping over the processed image set.

Every task returns its ``rows_out`` scalar, so the run manifest is a
deterministic function of the input tables — which is what lets the
whole control plane sit under the DuckDB oracle gate: the oracle
recomputes each task's count in SQL and pins (task, status, attempts,
rows_out) exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..registry import query
from ..sources import load_table
from .orchestrator import ALL_DONE, ONE_FAILED, Pipeline, PipelineContext

EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


def _discover(ctx: PipelineContext) -> int:
    """discover_new_fits_files analog: size of the incoming event log."""
    return load_table(ctx.spark, ctx.sf_dir, "events").count()


def _validate(ctx: PipelineContext) -> int:
    """validate_fits_files analog: events passing domain validation."""
    ev = load_table(ctx.spark, ctx.sf_dir, "events")
    return ev.filter(
        F.col("user_id").isNotNull()
        & F.col("event_type").isin(*EVENT_TYPES)
        & (F.col("value") >= 0)
    ).count()


def _submit_jobs(ctx: PipelineContext) -> int:
    """submit_processing_jobs analog: images queued for the P1-P6 chain."""
    from ..multimodal.imaging import image_catalog

    return image_catalog(ctx.spark, ctx.sf_dir).count()


def _monitor_jobs(ctx: PipelineContext) -> int:
    """monitor_processing_jobs analog: distinct instruments reporting
    completed work (the per-job status poll rolled up)."""
    from ..multimodal.imaging import image_catalog

    cat = image_catalog(ctx.spark, ctx.sf_dir)
    return cat.agg(F.count_distinct("instrument")).first()[0]


def _update_catalog(ctx: PipelineContext) -> int:
    """update_catalog analog: current-state catalog keys after the LWW
    collapse (one row per user, reference upsert :320-340)."""
    ev = load_table(ctx.spark, ctx.sf_dir, "events")
    # count_distinct, not distinct().count(): the oracle's
    # count(DISTINCT user_id) excludes NULL ids, and the events table
    # legitimately carries them (quality.py treats a null id as a
    # validity defect, not malformed input)
    return ev.agg(F.count_distinct("user_id")).first()[0]


def _archive(ctx: PipelineContext) -> int:
    """archive_processed_data analog: every submitted image archives."""
    return int(ctx.pull("submit_processing_jobs"))


def _quality_check(ctx: PipelineContext) -> int:
    """quality_check analog (the reference's type-count SQL :443-455):
    distinct event types observed in the freshly loaded window."""
    ev = load_table(ctx.spark, ctx.sf_dir, "events")
    return ev.agg(F.count_distinct("event_type")).first()[0]


def _cleanup(ctx: PipelineContext) -> int:
    """cleanup_temp_files analog — nothing to reclaim in a green run."""
    return 0


def _notify_failure(ctx: PipelineContext) -> int:
    """send_failure_notification analog; trigger_rule=one_failed keeps
    it skipped unless an upstream task failed."""
    return 1


def telescope_pipeline() -> Pipeline:
    """The wired DAG (telescope_data_processing.py:490-497)."""
    p = Pipeline("telescope_data_processing", parallelism=4)
    p.add_task("discover_new_events", _discover)
    p.add_task("validate_events", _validate, upstream=["discover_new_events"])
    p.add_task("submit_processing_jobs", _submit_jobs, upstream=["validate_events"])
    p.add_task(
        "monitor_processing_jobs", _monitor_jobs, upstream=["submit_processing_jobs"]
    )
    fan_in = ["monitor_processing_jobs"]
    p.add_task("update_catalog", _update_catalog, upstream=fan_in)
    p.add_task("archive_processed_data", _archive, upstream=fan_in)
    p.add_task("quality_check", _quality_check, upstream=fan_in)
    p.add_task(
        "cleanup_temp_files",
        _cleanup,
        upstream=["update_catalog", "archive_processed_data", "quality_check"],
        trigger_rule=ALL_DONE,
    )
    p.add_task(
        "send_failure_notification",
        _notify_failure,
        upstream=[
            "discover_new_events",
            "validate_events",
            "monitor_processing_jobs",
            "update_catalog",
            "archive_processed_data",
            "quality_check",
        ],
        trigger_rule=ONE_FAILED,
    )
    return p


_MANIFEST_SCHEMA = T.StructType(
    [
        T.StructField("task", T.StringType(), False),
        T.StructField("status", T.StringType(), False),
        T.StructField("attempts", T.LongType(), False),
        T.StructField("rows_out", T.LongType(), True),
    ]
)


@query(
    "pipeline_telescope_run",
    oracle=f"""
    SELECT * FROM (
        SELECT 'archive_processed_data' AS task, 'success' AS status,
               CAST(1 AS BIGINT) AS attempts,
               (SELECT count(*) FROM documents WHERE (doc_id % 3) = 0) AS rows_out
        UNION ALL SELECT 'cleanup_temp_files', 'success', 1, 0
        UNION ALL SELECT 'discover_new_events', 'success', 1,
               (SELECT count(*) FROM events)
        UNION ALL SELECT 'monitor_processing_jobs', 'success', 1,
               (SELECT count(DISTINCT ['WFC3','NIRCAM','MIRI','GENERIC'][(doc_id % 4) + 1])
                  FROM documents WHERE (doc_id % 3) = 0)
        UNION ALL SELECT 'quality_check', 'success', 1,
               (SELECT count(DISTINCT event_type) FROM events)
        UNION ALL SELECT 'send_failure_notification', 'skipped', 0,
               CAST(NULL AS BIGINT)
        UNION ALL SELECT 'submit_processing_jobs', 'success', 1,
               (SELECT count(*) FROM documents WHERE (doc_id % 3) = 0)
        UNION ALL SELECT 'update_catalog', 'success', 1,
               (SELECT count(DISTINCT user_id) FROM events)
        UNION ALL SELECT 'validate_events', 'success', 1,
               (SELECT count(*) FROM events
                 WHERE user_id IS NOT NULL
                   AND event_type IN {EVENT_TYPES!r}
                   AND value >= 0)
    ) ORDER BY task
    """,
)
def pipeline_telescope_run(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Run the full control-plane DAG and return its deterministic run
    manifest — the oracle recomputes every task's rows_out from the raw
    tables and pins statuses/attempts, so a retry, a mis-wired trigger
    rule, or a task computing the wrong count all break the row hash."""
    run = telescope_pipeline().run(spark, sf_dir)
    return spark.createDataFrame(
        [
            (r["task"], r["status"], r["attempts"], r["rows_out"])
            for r in run.manifest_rows()
        ],
        schema=_MANIFEST_SCHEMA,
    ).orderBy("task")
