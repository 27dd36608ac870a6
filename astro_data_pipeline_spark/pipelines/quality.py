"""The reference's data-quality-monitoring DAG restated over this engine.

Task-for-task mirror of ``airflow/dags/data_quality_monitoring.py``:
service health probe (:74) → TaskGroup of three parallel analyzers
(processing :123, catalog :214, consistency :321) → a
**BranchPythonOperator** (:384-429, :525) that routes to exactly one of
{critical alert, warning alert, healthy log} (:533-563) → a report task
fanning the mutually-exclusive branches back in under
``trigger_rule='none_failed_or_skipped'`` (:567-572).

Each metric is a DataFrame aggregate over the engine's tables with the
reference's threshold semantics (QUALITY_THRESHOLDS :57-64:
``max_error_rate`` 0.15, ``max_duplicate_objects`` 0.05) and PASS /
WARNING / CRITICAL banding; the branch decision reimplements
``evaluate_overall_quality`` exactly (any CRITICAL → critical alert;
WARNINGs over 30% of metrics → warning alert; else healthy, :405-412).

Everything — metric values, statuses, the branch taken, which alert
tasks skip — is a deterministic function of the input tables, so BOTH
registered queries carry full DuckDB oracles that *recompute* the rates
in SQL and re-derive the statuses and branch with the same CASE logic:
a wrong rate, a mis-banded status, or a mis-routed branch all break the
row hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..registry import query
from ..sources import load_table
from .orchestrator import NONE_FAILED, Pipeline, PipelineContext

# (metric, warning_above, critical_above) — rates in [0, 1]; the two
# named thresholds come from QUALITY_THRESHOLDS (:57-64)
BANDS = {
    "error_event_rate": (0.12, 0.15),  # max_error_rate 0.15
    "null_props_rate": (0.01, 0.05),
    "duplicate_doc_rate": (0.04, 0.05),  # max_duplicate_objects 0.05
    "short_doc_rate": (0.08, 0.10),
    "orphan_event_rate": (0.04, 0.05),
}

HEALTH_SOURCES = ("events", "documents", "customer", "orders")


def _status(metric: str, value: float) -> str:
    warn, crit = BANDS[metric]
    if value > crit:
        return "CRITICAL"
    if value > warn:
        return "WARNING"
    return "PASS"


def _metric(name: str, value: float) -> dict:
    value = float(value)
    return {"metric": name, "value": value, "status": _status(name, value)}


def check_service_health(ctx: PipelineContext) -> int:
    """check_service_health analog (:74): every source table must be
    readable and non-empty; returns the number of healthy sources.
    The four independent probes union into ONE job — sequential
    limit(1).count() calls would serialize four scheduling round-trips
    on the critical path that gates all three analyzers."""
    from functools import reduce

    probes = [
        load_table(ctx.spark, ctx.sf_dir, name)
        .limit(1)
        .select(F.lit(name).alias("src"))
        for name in HEALTH_SOURCES
    ]
    healthy = reduce(DataFrame.unionByName, probes).count()
    if healthy < len(HEALTH_SOURCES):
        raise RuntimeError(f"unhealthy sources: {healthy}/{len(HEALTH_SOURCES)}")
    return healthy


def analyze_processing_performance(ctx: PipelineContext) -> list[dict]:
    """analyze_processing_performance analog (:123): event-log error and
    null-payload rates (one aggregate job, both rates in one pass)."""
    row = (
        load_table(ctx.spark, ctx.sf_dir, "events")
        .agg(
            F.round(F.avg(F.when(F.col("event_type") == "error", 1.0).otherwise(0.0)), 6)
            .alias("err"),
            F.round(F.avg(F.when(F.col("props").isNull(), 1.0).otherwise(0.0)), 6)
            .alias("nulls"),
        )
        .collect()[0]
    )
    return [
        _metric("error_event_rate", row["err"]),
        _metric("null_props_rate", row["nulls"]),
    ]


def analyze_catalog_quality(ctx: PipelineContext) -> list[dict]:
    """analyze_catalog_quality analog (:214): duplicate fraction
    (max_duplicate_objects) and truncated-document fraction."""
    row = (
        load_table(ctx.spark, ctx.sf_dir, "documents")
        .agg(
            F.round(
                1.0 - F.count_distinct(F.col("text")) / F.count(F.lit(1)), 6
            ).alias("dups"),
            F.round(F.avg(F.when(F.col("n_chars") < 50, 1.0).otherwise(0.0)), 6)
            .alias("short"),
        )
        .collect()[0]
    )
    return [
        _metric("duplicate_doc_rate", row["dups"]),
        _metric("short_doc_rate", row["short"]),
    ]


def check_data_consistency(ctx: PipelineContext) -> list[dict]:
    """check_data_consistency analog (:321): events referencing users
    absent from the customer dim (broadcast anti-join, one job)."""
    ev = load_table(ctx.spark, ctx.sf_dir, "events")
    cust = load_table(ctx.spark, ctx.sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), F.lit(1).alias("_present")
    )
    # one job: broadcast left join + miss-rate aggregate (F.round on the
    # JVM matches the oracle's half-away rounding; Python round doesn't).
    # An orphan is a NON-NULL user_id absent from the dim: a null id is
    # a validity problem, not a referential one. The oracle uses
    # NOT EXISTS (not NOT IN, whose three-valued logic would mark every
    # event non-orphan if customer ever carried a NULL c_custkey) so
    # both engines share anti-join semantics; the isNotNull guard keeps
    # both on the same null-id definition.
    orphan = F.col("user_id").isNotNull() & F.col("_present").isNull()
    row = (
        ev.join(F.broadcast(cust), "user_id", "left")
        .agg(
            F.round(F.avg(F.when(orphan, 1.0).otherwise(0.0)), 6).alias("orph")
        )
        .collect()[0]
    )
    return [_metric("orphan_event_rate", row["orph"])]


ANALYZERS = (
    "analyze_processing_performance",
    "analyze_catalog_quality",
    "check_data_consistency",
)


def evaluate_overall_quality(ctx: PipelineContext) -> str:
    """The branch decision, exactly evaluate_overall_quality :405-412:
    any CRITICAL → critical alert; WARNINGs > 30% of all metrics →
    warning alert; else healthy."""
    metrics = [m for t in ANALYZERS for m in ctx.pull(t)]
    n_crit = sum(1 for m in metrics if m["status"] == "CRITICAL")
    n_warn = sum(1 for m in metrics if m["status"] == "WARNING")
    if n_crit > 0:
        return "send_critical_alert"
    if n_warn > len(metrics) * 0.3:
        return "send_warning_alert"
    return "log_healthy_status"


def _alert(ctx: PipelineContext) -> int:
    """Alert-sink analog — one notification row emitted."""
    return 1


def generate_quality_report(ctx: PipelineContext) -> int:
    """generate_quality_report analog (:431): total metrics reported."""
    return sum(len(ctx.pull(t)) for t in ANALYZERS)


def quality_pipeline() -> Pipeline:
    """The wired DAG (data_quality_monitoring.py:574-576)."""
    p = Pipeline("data_quality_monitoring", parallelism=4)
    p.add_task("check_service_health", check_service_health)
    for t, fn in (
        ("analyze_processing_performance", analyze_processing_performance),
        ("analyze_catalog_quality", analyze_catalog_quality),
        ("check_data_consistency", check_data_consistency),
    ):
        p.add_task(t, fn, upstream=["check_service_health"])
    p.add_task(
        "evaluate_overall_quality",
        evaluate_overall_quality,
        upstream=list(ANALYZERS),
        branch=True,
    )
    for t in ("send_critical_alert", "send_warning_alert", "log_healthy_status"):
        p.add_task(t, _alert, upstream=["evaluate_overall_quality"])
    p.add_task(
        "generate_quality_report",
        generate_quality_report,
        upstream=["send_critical_alert", "send_warning_alert", "log_healthy_status"],
        trigger_rule=NONE_FAILED,
    )
    return p


# ----------------------------------------------------------------- oracles

# rate recomputation shared by both oracles (DuckDB SQL)
_RATES_CTE = """
    WITH m AS (
        SELECT
            (SELECT round(avg(CASE WHEN event_type = 'error' THEN 1.0 ELSE 0 END), 6)
               FROM events) AS err_rate,
            (SELECT round(avg(CASE WHEN props IS NULL THEN 1.0 ELSE 0 END), 6)
               FROM events) AS null_rate,
            (SELECT round(1.0 - count(DISTINCT text) * 1.0 / count(*), 6)
               FROM documents) AS dup_rate,
            (SELECT round(avg(CASE WHEN n_chars < 50 THEN 1.0 ELSE 0 END), 6)
               FROM documents) AS short_rate,
            (SELECT round(avg(CASE WHEN user_id IS NOT NULL
                               AND NOT EXISTS (SELECT 1 FROM customer
                                               WHERE c_custkey = user_id)
                              THEN 1.0 ELSE 0 END), 6)
               FROM events) AS orphan_rate
    ), s AS (
        SELECT
            CASE WHEN err_rate > 0.15 THEN 'CRITICAL'
                 WHEN err_rate > 0.12 THEN 'WARNING' ELSE 'PASS' END AS s_err,
            CASE WHEN null_rate > 0.05 THEN 'CRITICAL'
                 WHEN null_rate > 0.01 THEN 'WARNING' ELSE 'PASS' END AS s_null,
            CASE WHEN dup_rate > 0.05 THEN 'CRITICAL'
                 WHEN dup_rate > 0.04 THEN 'WARNING' ELSE 'PASS' END AS s_dup,
            CASE WHEN short_rate > 0.10 THEN 'CRITICAL'
                 WHEN short_rate > 0.08 THEN 'WARNING' ELSE 'PASS' END AS s_short,
            CASE WHEN orphan_rate > 0.05 THEN 'CRITICAL'
                 WHEN orphan_rate > 0.04 THEN 'WARNING' ELSE 'PASS' END AS s_orph,
            err_rate, null_rate, dup_rate, short_rate, orphan_rate
        FROM m
    ), agg AS (
        SELECT *,
            (CASE WHEN s_err = 'CRITICAL' THEN 1 ELSE 0 END
           + CASE WHEN s_null = 'CRITICAL' THEN 1 ELSE 0 END
           + CASE WHEN s_dup = 'CRITICAL' THEN 1 ELSE 0 END
           + CASE WHEN s_short = 'CRITICAL' THEN 1 ELSE 0 END
           + CASE WHEN s_orph = 'CRITICAL' THEN 1 ELSE 0 END) AS n_crit,
            (CASE WHEN s_err = 'WARNING' THEN 1 ELSE 0 END
           + CASE WHEN s_null = 'WARNING' THEN 1 ELSE 0 END
           + CASE WHEN s_dup = 'WARNING' THEN 1 ELSE 0 END
           + CASE WHEN s_short = 'WARNING' THEN 1 ELSE 0 END
           + CASE WHEN s_orph = 'WARNING' THEN 1 ELSE 0 END) AS n_warn
        FROM s
    )
"""

_METRICS_SCHEMA = T.StructType(
    [
        T.StructField("metric", T.StringType(), False),
        T.StructField("value", T.DoubleType(), True),
        T.StructField("status", T.StringType(), False),
    ]
)


@query(
    "pipeline_quality_metrics",
    oracle=_RATES_CTE
    + """
    SELECT metric, value, status FROM (
        SELECT 'duplicate_doc_rate' AS metric, dup_rate AS value, s_dup AS status FROM agg
        UNION ALL SELECT 'error_event_rate', err_rate, s_err FROM agg
        UNION ALL SELECT 'null_props_rate', null_rate, s_null FROM agg
        UNION ALL SELECT 'orphan_event_rate', orphan_rate, s_orph FROM agg
        UNION ALL SELECT 'short_doc_rate', short_rate, s_short FROM agg
    ) ORDER BY metric
    """,
)
def pipeline_quality_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Run the monitoring DAG and emit the metric table its analyzers
    produced — value and PASS/WARNING/CRITICAL band per metric, each
    recomputed independently by the oracle."""
    run = quality_pipeline().run(spark, sf_dir)
    if not run.ok:
        errs = {
            n: r.error for n, r in run.records.items() if r.status == "failed"
        }
        raise RuntimeError(f"quality DAG failed: {errs}")
    metrics = sorted(
        (m for t in ANALYZERS for m in run.xcom[t]),
        key=lambda m: m["metric"],
    )
    return spark.createDataFrame(
        [(m["metric"], m["value"], m["status"]) for m in metrics],
        schema=_METRICS_SCHEMA,
    ).orderBy("metric")


@query(
    "pipeline_quality_monitoring",
    oracle=_RATES_CTE
    + """
    SELECT task, status, attempts, rows_out FROM (
        SELECT 'analyze_catalog_quality' AS task, 'success' AS status,
               CAST(1 AS BIGINT) AS attempts, CAST(2 AS BIGINT) AS rows_out
        UNION ALL SELECT 'analyze_processing_performance', 'success', 1, 2
        UNION ALL SELECT 'check_data_consistency', 'success', 1, 1
        UNION ALL SELECT 'check_service_health', 'success', 1, 4
        UNION ALL SELECT 'evaluate_overall_quality', 'success', 1, NULL
        UNION ALL SELECT 'generate_quality_report', 'success', 1, 5
        UNION ALL SELECT 'log_healthy_status',
               CASE WHEN (SELECT n_crit FROM agg) = 0
                     AND (SELECT n_warn FROM agg) * 10 <= 15
                    THEN 'success' ELSE 'skipped' END,
               CASE WHEN (SELECT n_crit FROM agg) = 0
                     AND (SELECT n_warn FROM agg) * 10 <= 15
                    THEN 1 ELSE 0 END,
               CASE WHEN (SELECT n_crit FROM agg) = 0
                     AND (SELECT n_warn FROM agg) * 10 <= 15
                    THEN 1 ELSE NULL END
        UNION ALL SELECT 'send_critical_alert',
               CASE WHEN (SELECT n_crit FROM agg) > 0
                    THEN 'success' ELSE 'skipped' END,
               CASE WHEN (SELECT n_crit FROM agg) > 0 THEN 1 ELSE 0 END,
               CASE WHEN (SELECT n_crit FROM agg) > 0 THEN 1 ELSE NULL END
        UNION ALL SELECT 'send_warning_alert',
               CASE WHEN (SELECT n_crit FROM agg) = 0
                     AND (SELECT n_warn FROM agg) * 10 > 15
                    THEN 'success' ELSE 'skipped' END,
               CASE WHEN (SELECT n_crit FROM agg) = 0
                     AND (SELECT n_warn FROM agg) * 10 > 15
                    THEN 1 ELSE 0 END,
               CASE WHEN (SELECT n_crit FROM agg) = 0
                     AND (SELECT n_warn FROM agg) * 10 > 15
                    THEN 1 ELSE NULL END
    ) ORDER BY task
    """,
)
def pipeline_quality_monitoring(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Run the full monitoring DAG (branch included) and return its
    deterministic run manifest; the oracle recomputes the rates,
    re-bands the statuses, and re-derives WHICH alert branch ran with
    the same >30%-warnings rule — a mis-routed branch, a spuriously
    retried task, or a wrong metric count all break the row hash."""
    run = quality_pipeline().run(spark, sf_dir)
    schema = T.StructType(
        [
            T.StructField("task", T.StringType(), False),
            T.StructField("status", T.StringType(), False),
            T.StructField("attempts", T.LongType(), False),
            T.StructField("rows_out", T.LongType(), True),
        ]
    )
    return spark.createDataFrame(
        [
            (r["task"], r["status"], r["attempts"], r["rows_out"])
            for r in run.manifest_rows()
        ],
        schema=schema,
    ).orderBy("task")
