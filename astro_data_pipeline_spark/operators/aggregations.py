"""Aggregation operators (SURVEY.md §2.4, A1–A8).

All hash aggregations — Catalyst gives partial (map-side) + final
aggregation for free, so these shuffle only the grouped partials, not raw
rows; that is the property that survives a 100× scale-up.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..sources import load_table


@query(
    "tpch_q1_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2)                                    AS sum_qty,
           round(sum(l_extendedprice), 2)                               AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 2)            AS sum_disc_price,
           round(avg(l_quantity), 4)                                    AS avg_qty,
           round(avg(l_extendedprice), 4)                               AS avg_price,
           count(*)                                                     AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def tpch_q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2 multi-agg group-by (reference: db_performance_test.py:228-271,
    batch result validation batch_processing_dag.py:466-478)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "sum_disc_price"
            ),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.count("*").alias("count_order"),
        )
    )


@query(
    "agg_conditional_count_pivot",
    oracle="""
    SELECT count(CASE WHEN event_type = 'click' THEN 1 END)    AS n_click,
           count(CASE WHEN event_type = 'view' THEN 1 END)     AS n_view,
           count(CASE WHEN event_type = 'purchase' THEN 1 END) AS n_purchase,
           count(CASE WHEN event_type = 'error' THEN 1 END)    AS n_error,
           count(*)                                            AS n_total
    FROM events
    """,
)
def agg_conditional_count_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1 conditional-count pivot (reference quality check
    telescope_data_processing.py:445-453, data_quality_monitoring.py:132-142)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.agg(
        F.count(F.when(F.col("event_type") == "click", 1)).alias("n_click"),
        F.count(F.when(F.col("event_type") == "view", 1)).alias("n_view"),
        F.count(F.when(F.col("event_type") == "purchase", 1)).alias("n_purchase"),
        F.count(F.when(F.col("event_type") == "error", 1)).alias("n_error"),
        F.count("*").alias("n_total"),
    )


@query(
    "agg_histogram_value_bins",
    oracle="""
    SELECT CAST(floor(value) AS BIGINT) AS bin, count(*) AS n,
           round(avg(value), 4) AS avg_value
    FROM events
    WHERE value IS NOT NULL
    GROUP BY 1
    """,
)
def agg_histogram_value_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3 binned histogram (reference: FLOOR(magnitude) bins
    db_performance_test.py:229-237)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.filter(F.col("value").isNotNull())
        .groupBy(F.floor("value").cast("long").alias("bin"))
        .agg(F.count("*").alias("n"), F.round(F.avg("value"), 4).alias("avg_value"))
    )


@query(
    "agg_duplicate_key_detection",
    oracle="""
    SELECT round(value, 0) AS rounded_value, event_type, count(*) AS n_dup
    FROM events
    GROUP BY 1, 2
    HAVING count(*) > 1
    """,
)
def agg_duplicate_key_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4 duplicate detection: group-by rounded key HAVING count>1
    (reference: data_quality_monitoring.py:256-265). Engine analog: the
    post-MERGE key-uniqueness audit."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.round(F.col("value"), 0).alias("rounded_value"),
            F.col("event_type"),
        )
        .agg(F.count("*").alias("n_dup"))
        .filter(F.col("n_dup") > 1)
    )


@query(
    "agg_global_catalog_stats",
    oracle="""
    SELECT count(*)                               AS n_rows,
           count(DISTINCT user_id)                AS n_users,
           round(avg(value), 4)                   AS avg_value,
           round(min(value), 2)                   AS min_value,
           round(max(value), 2)                   AS max_value,
           round(stddev_samp(value), 4)           AS std_value
    FROM events
    """,
)
def agg_global_catalog_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5 global scalar aggregates (reference: getCatalogStatistics
    CatalogService.java:212-253, getProcessingMetrics ProcessingJobService.java:236-255)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.agg(
        F.count("*").alias("n_rows"),
        F.countDistinct("user_id").alias("n_users"),
        F.round(F.avg("value"), 4).alias("avg_value"),
        F.round(F.min("value"), 2).alias("min_value"),
        F.round(F.max("value"), 2).alias("max_value"),
        F.round(F.stddev_samp("value"), 4).alias("std_value"),
    )


@query(
    "agg_weighted_mean_per_group",
    oracle="""
    SELECT l_returnflag,
           round(sum(l_extendedprice * l_quantity) / sum(l_quantity), 4) AS weighted_avg_price,
           round(sum(l_quantity), 2) AS total_weight
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_weighted_mean_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7 weighted statistical aggregate (reference: weighted mean in
    VariableStarAnalysis.calculateVariabilityStatistics
    VariableStarAnalysis.java:104-131). Expressed as native sum-products
    (stays in whole-stage codegen) rather than a UDAF."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(
            F.sum(F.col("l_extendedprice") * F.col("l_quantity")) / F.sum("l_quantity"), 4
        ).alias("weighted_avg_price"),
        F.round(F.sum("l_quantity"), 2).alias("total_weight"),
    )


@query(
    "agg_quality_score_compound",
    oracle="""
    SELECT event_type,
           count(*) AS n,
           round(count(CASE WHEN value IS NOT NULL THEN 1 END) * 1.0 / count(*), 4)
               AS completeness,
           round(count(CASE WHEN value >= 0 THEN 1 END) * 1.0 / count(*), 4)
               AS validity,
           round((count(CASE WHEN value IS NOT NULL THEN 1 END) * 1.0 / count(*)) * 0.5
               + (count(CASE WHEN value >= 0 THEN 1 END) * 1.0 / count(*)) * 0.5, 4)
               AS overall_score
    FROM events
    GROUP BY event_type
    """,
)
def agg_quality_score_compound(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8 compound quality score (reference: CatalogQualityAssessment.java:63-461
    — completeness/reliability sub-scores combined into an overall score)."""
    ev = load_table(spark, sf_dir, "events")
    n = F.count("*")
    completeness = F.count(F.when(F.col("value").isNotNull(), 1)) / n
    validity = F.count(F.when(F.col("value") >= 0, 1)) / n
    return ev.groupBy("event_type").agg(
        n.alias("n"),
        F.round(completeness, 4).alias("completeness"),
        F.round(validity, 4).alias("validity"),
        F.round(completeness * 0.5 + validity * 0.5, 4).alias("overall_score"),
    )


@query(
    "agg_rollup_status_priority",
    oracle="""
    SELECT o_orderstatus AS status, o_orderpriority AS priority,
           count(*) AS n, round(sum(o_totalprice), 2) AS total
    FROM orders
    GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """,
)
def agg_rollup_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical rollup aggregation — SURVEY §2.4 marks grouping sets
    as NOT PRESENT in the reference (its dashboards recompute each level
    with separate queries, data_quality_monitoring.py:132-142); Spark has
    it built in as one pass with partial aggregation per grouping set."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.rollup(
        F.col("o_orderstatus").alias("status"),
        F.col("o_orderpriority").alias("priority"),
    ).agg(F.count("*").alias("n"), F.round(F.sum("o_totalprice"), 2).alias("total"))


@query(
    "agg_cube_status_priority",
    oracle="""
    SELECT o_orderstatus AS status, o_orderpriority AS priority,
           count(*) AS n, round(sum(o_totalprice), 2) AS total
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def agg_cube_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full cube over two dimensions (all 4 grouping sets in one pass,
    partial agg per set) — the dashboard cross-tab the reference computes
    with separate per-cell queries (data_quality_monitoring.py:132-142)."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.cube(
        F.col("o_orderstatus").alias("status"),
        F.col("o_orderpriority").alias("priority"),
    ).agg(F.count("*").alias("n"), F.round(F.sum("o_totalprice"), 2).alias("total"))


def approx_distinct_users_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The production shape: HyperLogLog++ approximate distinct
    (SURVEY §2.4 NOT-PRESENT row; built into Spark). At 10^10 events
    exact countDistinct shuffles every key; the sketch is constant-size
    mergeable state per partition — deliberately the ONLY aggregate
    here, so the plan never pays the exact-distinct shuffle the sketch
    exists to avoid (plan shape pinned in tests)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.agg(
        F.approx_count_distinct("user_id", rsd=0.01).alias("approx_users")
    )


@query(
    "agg_approx_distinct_users",
    oracle="""
    SELECT TRUE AS approx_within_band,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users
    FROM events
    """,
)
def agg_approx_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-gated variant of ``approx_distinct_users_sketch``: DuckDB's
    HLL is a different sketch, so the raw estimate can never hash-match —
    instead the TOLERANCE is asserted inside the oracle (VERDICT_r04 next
    #2). The query computes sketch and exact side by side and returns
    (a) the exact count — verifying scan + distinct — and (b) a boolean
    that the estimate landed within 3·rsd of it, which DuckDB answers
    with literal TRUE; an out-of-band sketch flips the hash. The
    sketch-only function above stays the scale-shape exhibit: paying the
    exact-distinct shuffle is gate-only instrumentation, not the
    production plan."""
    ev = load_table(spark, sf_dir, "events")
    agg = ev.agg(
        F.approx_count_distinct("user_id", rsd=0.01).alias("approx_users"),
        F.countDistinct("user_id").alias("exact_users"),
    )
    return agg.select(
        (
            F.abs(F.col("approx_users") - F.col("exact_users"))
            <= 0.03 * F.col("exact_users")
        ).alias("approx_within_band"),
        "exact_users",
    )


@query(
    "agg_doclen_percentiles",
    oracle="""
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           round(quantile_cont(n_chars, 0.5), 4) AS p50,
           round(quantile_cont(n_chars, 0.9), 4) AS p90,
           round(quantile_cont(n_chars, 0.99), 4) AS p99
    FROM documents GROUP BY lang
    """,
)
def agg_doclen_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-stratum percentiles of document length — the length-
    distribution audit a corpus build runs per language before choosing
    truncation/packing budgets. Spark's exact `percentile` and DuckDB's
    `quantile_cont` share the linear-interpolation definition, so the
    values hash-match at 4 dp.

    Scale note: exact percentile aggregates a value→count map per
    group, so it is safe exactly when the metric's cardinality is
    bounded — true for integer char/token lengths (~10^5 distinct
    values at any corpus size), which keeps partial-aggregate state
    tiny at 10^10 docs. For unbounded continuous metrics the same query
    shape swaps in approx_percentile (a constant-size mergeable sketch,
    the agg_approx_distinct_users trade)."""
    docs = load_table(spark, sf_dir, "documents")
    pct = F.percentile("n_chars", F.array(F.lit(0.5), F.lit(0.9), F.lit(0.99)))
    return docs.groupBy("lang").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.round(F.element_at(pct, 1), 4).alias("p50"),
        F.round(F.element_at(pct, 2), 4).alias("p90"),
        F.round(F.element_at(pct, 3), 4).alias("p99"),
    )
