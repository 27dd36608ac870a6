"""Window / per-key-ordering operators (SURVEY.md §2.5 W1–W5, §2.6 O1–O4).

W1 (top-1 per group) is the load-bearing primitive: it is the same
``row_number() OVER (PARTITION BY key ORDER BY seq DESC) = 1`` pattern the
CDC engine uses for LSN-ordered last-writer-wins dedup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import query
from ..sources import load_table


@query(
    "window_top1_order_per_customer",
    oracle="""
    SELECT o_custkey AS custkey, o_orderkey AS top_orderkey,
           round(o_totalprice, 2) AS top_price
    FROM (
        SELECT *, row_number() OVER (
            PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
        FROM orders
    ) WHERE rn = 1
    """,
)
def window_top1_order_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1 top-1-per-group (reference: nearest-match ORDER BY separation
    LIMIT 1 per probe, AstronomicalObjectRepository.java:217-236) — the
    exact primitive behind LSN last-writer-wins."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        orders.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            F.col("o_custkey").alias("custkey"),
            F.col("o_orderkey").alias("top_orderkey"),
            F.round("o_totalprice", 2).alias("top_price"),
        )
    )


@query(
    "window_topk_parts_per_brand",
    oracle="""
    SELECT p_brand AS brand, p_partkey AS partkey,
           round(p_retailprice, 2) AS retailprice, CAST(rn AS INTEGER) AS rank_in_brand
    FROM (
        SELECT *, row_number() OVER (
            PARTITION BY p_brand ORDER BY p_retailprice DESC, p_partkey) AS rn
        FROM part
    ) WHERE rn <= 3
    """,
)
def window_topk_parts_per_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1/O1 top-k per group — TakeOrdered per key, no global sort."""
    part = load_table(spark, sf_dir, "part")
    w = Window.partitionBy("p_brand").orderBy(F.desc("p_retailprice"), F.asc("p_partkey"))
    return (
        part.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select(
            F.col("p_brand").alias("brand"),
            F.col("p_partkey").alias("partkey"),
            F.round("p_retailprice", 2).alias("retailprice"),
            F.col("rn").cast("int").alias("rank_in_brand"),
        )
    )


@query(
    "window_running_spend_per_customer",
    oracle="""
    SELECT o_custkey AS custkey, o_orderkey AS orderkey,
           round(sum(o_totalprice) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_spend
    FROM orders
    """,
)
def window_running_spend_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running aggregate per key (reference analog: sequential step chaining
    with accumulated state, GranularProcessingService.java:262-393)."""
    orders = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return orders.select(
        F.col("o_custkey").alias("custkey"),
        F.col("o_orderkey").alias("orderkey"),
        F.round(F.sum("o_totalprice").over(w), 2).alias("running_spend"),
    )


@query(
    "window_sessionize_events",
    oracle="""
    WITH gaps AS (
        SELECT user_id, ts, event_id,
               CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                         > INTERVAL 30 MINUTE
                    OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                    THEN 1 ELSE 0 END AS new_session
        FROM events
    ),
    sessions AS (
        SELECT user_id,
               sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_no
        FROM gaps
    )
    SELECT user_id, CAST(session_no AS BIGINT) AS session_no, count(*) AS n_events
    FROM sessions GROUP BY 1, 2
    """,
)
def window_sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization: lag(ts) gap > 30 min starts a session, cumsum labels
    it (SURVEY.md §2.11 session-grouped state; reference sessions =
    IntermediateStorageService.java:117-137). Two windows on one shuffle —
    both partitionBy(user_id) with the same ordering, so Catalyst reuses
    the exchange + sort."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # microsecond precision, matching the oracle's full-interval compare:
    # truncating to whole seconds would misclassify a true gap in
    # (1800 s, 1801 s] as same-session and shift every later session_no
    ts_us = F.unix_micros(F.col("ts").cast("timestamp"))  # NTZ → epoch µs (UTC)
    gap = ts_us - F.unix_micros(F.lag(F.col("ts")).over(w).cast("timestamp"))
    new_session = F.when(gap.isNull() | (gap > 1800 * 1_000_000), 1).otherwise(0)
    cum = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, 0
    )
    return (
        ev.withColumn("new_session", new_session)
        .withColumn("session_no", F.sum("new_session").over(cum).cast("long"))
        .groupBy("user_id", "session_no")
        .agg(F.count("*").alias("n_events"))
    )


@query(
    "sort_topk_global_orders",
    oracle="""
    SELECT o_orderkey AS orderkey, round(o_totalprice, 2) AS totalprice
    FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 100
    """,
)
def sort_topk_global_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O1/O2 global top-k — Spark plans TakeOrderedAndProject (per-partition
    heap + driver merge), not a full sort (reference: cone-search cap 1000,
    CatalogService.java:83; recency queries db_performance_test.py:362-372)."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(100)
        .select(
            F.col("o_orderkey").alias("orderkey"),
            F.round("o_totalprice", 2).alias("totalprice"),
        )
    )


@query(
    "sort_keyset_pagination_page3",
    oracle="""
    WITH last AS (
        SELECT max(o_orderkey) AS k FROM (
            SELECT o_orderkey FROM orders ORDER BY o_orderkey LIMIT 200
        )
    )
    SELECT o_orderkey AS orderkey,
           strftime(o_orderdate, '%Y-%m-%d') AS orderdate_str
    FROM orders, last
    WHERE o_orderkey > last.k
    ORDER BY o_orderkey
    LIMIT 100
    """,
)
def sort_keyset_pagination_page3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O4 TRUE keyset pagination (reference: Pageable keyset repositories,
    AstronomicalObjectRepository.java:44-71): the client carries the last
    key of the previous page and each page is
    ``WHERE key > :last ORDER BY key LIMIT n``. Both the cursor fetch and
    the page plan as TakeOrderedAndProject (per-partition bounded heap +
    driver merge) with the key predicate pushed to the parquet scan — no
    global Window, no single-task sort, unlike an OFFSET/row_number page
    slice which funnels every row through one partition. ``o_orderkey``
    is the table's unique key, so the page is deterministic."""
    orders = load_table(spark, sf_dir, "orders")
    # cursor handshake: the 200th-smallest key = last key of page 2. One
    # tiny TakeOrderedAndProject job (200 rows to the driver), exactly
    # what a paginating client would have carried over from the prior page.
    last_seen = (
        orders.select("o_orderkey")
        .orderBy("o_orderkey")
        .limit(200)
        .agg(F.max("o_orderkey"))
        .collect()[0][0]
    )
    return (
        orders.filter(F.col("o_orderkey") > F.lit(last_seen))
        .orderBy("o_orderkey")
        .limit(100)
        .select(
            F.col("o_orderkey").alias("orderkey"),
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate_str"),
        )
    )


@query(
    "window_scd2_intervals",
    oracle="""
    SELECT user_id, event_id AS version_id,
           row_number() OVER w AS version_no,
           strftime(ts, '%Y-%m-%d %H:%M:%S') AS valid_from,
           coalesce(strftime(lead(ts) OVER w, '%Y-%m-%d %H:%M:%S'), 'current') AS valid_to,
           (lead(ts) OVER w IS NULL) AS is_current
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def window_scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W2 SCD-2 versioned registry: per-key version history with validity
    intervals and a single current version per key (reference: single-
    active-version workflow registry, unique partial index
    V2_2__Add_Workflow_Versioning_Support.sql:414-416, activation flip
    :256-283). lead() closes each interval; the open interval is the
    active version — at most one per key by construction, the invariant
    the reference enforces with a partial unique index."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    fmt = "yyyy-MM-dd HH:mm:ss"
    return ev.select(
        "user_id",
        F.col("event_id").alias("version_id"),
        F.row_number().over(w).alias("version_no"),
        F.date_format("ts", fmt).alias("valid_from"),
        F.coalesce(F.date_format(F.lead("ts").over(w), fmt), F.lit("current")).alias(
            "valid_to"
        ),
        F.lead("ts").over(w).isNull().alias("is_current"),
    )


@query(
    "window_lag_order_gap_seconds",
    oracle="""
    SELECT o_custkey AS custkey, o_orderkey AS orderkey,
           epoch(o_orderdate) - epoch(lag(o_orderdate) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
           )) AS gap_seconds
    FROM orders
    """,
)
def window_lag_order_gap_seconds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag() inter-event gap per key (reference analog: sequential step
    chaining where step N's output feeds N+1, SURVEY §2.5 W5 /
    GranularProcessingService.java:262-393, recast as the per-key
    order-to-order latency the monitoring DAG derives with epoch diffs,
    data_quality_monitoring.py:137-138)."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    ts = F.col("o_orderdate").cast("timestamp")
    prev = F.lag(ts).over(w)
    return orders.select(
        F.col("o_custkey").alias("custkey"),
        F.col("o_orderkey").alias("orderkey"),
        (F.unix_timestamp(ts) - F.unix_timestamp(prev)).alias("gap_seconds"),
    )
