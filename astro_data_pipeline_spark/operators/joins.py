"""Join operators (SURVEY.md §2.3, J1–J7).

Scale notes baked into each plan:
- dimension sides are explicitly ``F.broadcast`` when they are small by
  construction (region/nation/customer at any SF are tiny next to the
  fact tables) — no shuffle of the fact side;
- the as-of join (J5) is a window carry-forward, NOT a self-join: a
  self-join on user is O(events²/users) and dies at 10^10 rows, the
  window is one shuffle + one sort per key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import query
from ..sources import load_table


@query(
    "join_fact_dim_revenue_by_brand",
    oracle="""
    SELECT p.p_brand AS brand,
           count(*) AS n_lines,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    GROUP BY p.p_brand
    """,
)
def join_fact_dim_revenue_by_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1 equi-join fact↔dim + aggregate (reference:
    db_performance_test.py:265-271, object_summary view V1__...sql:367-385).
    Dim side broadcast: part is ~1/30 of lineitem and bounded."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy(F.col("p_brand").alias("brand"))
        .agg(
            F.count("*").alias("n_lines"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            ),
        )
    )


@query(
    "join_left_outer_order_counts",
    oracle="""
    SELECT c.c_custkey AS custkey, c.c_mktsegment AS mktsegment,
           count(o.o_orderkey) AS n_orders,
           round(coalesce(sum(o.o_totalprice), 0), 2) AS total_spend
    FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
    GROUP BY 1, 2
    """,
)
def join_left_outer_order_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2 left outer join keeping childless parents (reference:
    object_summary LEFT JOIN detections V1__...sql:381-385,
    data_quality_monitoring.py:334-341)."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy(
            F.col("c_custkey").alias("custkey"),
            F.col("c_mktsegment").alias("mktsegment"),
        )
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.round(F.coalesce(F.sum("o_totalprice"), F.lit(0.0)), 2).alias("total_spend"),
        )
    )


@query(
    "join_grid_density_map",
    oracle="""
    SELECT CAST(floor(value / 5.0) AS BIGINT) AS value_cell,
           CAST(extract(hour FROM ts) AS INTEGER) AS hour_cell,
           count(*) AS n
    FROM events
    WHERE value IS NOT NULL
    GROUP BY 1, 2
    """,
)
def join_grid_density_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J4 grid density map (reference: generate_series grid + banded range
    join db_performance_test.py:242-261). Spark-first restatement: derive
    the grid cell as a column and hash-aggregate — the cross-join + range
    predicate collapses into a groupBy, one shuffle of partial counts."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.filter(F.col("value").isNotNull())
        .groupBy(
            F.floor(F.col("value") / 5.0).cast("long").alias("value_cell"),
            F.hour("ts").cast("int").alias("hour_cell"),
        )
        .agg(F.count("*").alias("n"))
    )


@query(
    "join_asof_last_click_before_purchase",
    oracle="""
    SELECT event_id AS purchase_event_id, user_id,
           last_click_event_id
    FROM (
        SELECT event_id, user_id, event_type,
               last_value(CASE WHEN event_type = 'click' THEN event_id END IGNORE NULLS)
                   OVER (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                   AS last_click_event_id
        FROM events
    )
    WHERE event_type = 'purchase'
    """,
)
def join_asof_last_click_before_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J5 nearest/as-of match (reference: findNearestObject
    CatalogService.java:105-130 — top-1 prior match per probe).

    Implemented as a carry-forward window (last non-null over an ordered
    frame), not a self-join: one shuffle on user_id, linear per key."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    carried = ev.withColumn(
        "last_click_event_id",
        F.last(F.when(F.col("event_type") == "click", F.col("event_id")), ignorenulls=True).over(
            w
        ),
    )
    return carried.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_event_id"),
        "user_id",
        "last_click_event_id",
    )


@query(
    "join_anti_customers_without_orders",
    oracle="""
    SELECT c.c_custkey AS custkey, c.c_name AS name
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def join_anti_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J6 anti-join = the WHEN NOT MATCHED half of MERGE (reference:
    ON CONFLICT DO NOTHING db_performance_test.py:170-174)."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").select(F.col("o_custkey").alias("c_custkey"))
    return cust.join(orders, "c_custkey", "left_anti").select(
        F.col("c_custkey").alias("custkey"), F.col("c_name").alias("name")
    )


@query(
    "join_semi_customers_with_orders",
    oracle="""
    SELECT c.c_custkey AS custkey, c.c_mktsegment AS mktsegment
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def join_semi_customers_with_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J7 existence semi-join (reference: objectExists S3Service.java:75-91,
    consistency counts data_quality_monitoring.py:334-357)."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").select(F.col("o_custkey").alias("c_custkey"))
    return cust.join(orders, "c_custkey", "left_semi").select(
        F.col("c_custkey").alias("custkey"), F.col("c_mktsegment").alias("mktsegment")
    )


@query(
    "join_three_way_nation_revenue",
    oracle="""
    SELECT n.n_name AS nation, r.r_name AS region,
           count(DISTINCT o.o_orderkey) AS n_orders,
           round(sum(o.o_totalprice), 2) AS revenue
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    GROUP BY 1, 2
    """,
)
def join_three_way_nation_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1 chained star join (fact → dim → dim → dim); every dim broadcast,
    so the fact table never shuffles before aggregation."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    return (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy(F.col("n_name").alias("nation"), F.col("r_name").alias("region"))
        .agg(
            F.countDistinct("o_orderkey").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        )
    )


@query(
    "tpch_q3_shipping_priority",
    oracle="""
    SELECT l.l_orderkey AS orderkey,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
           strftime(o.o_orderdate, '%Y-%m-%d') AS orderdate,
           o.o_orderpriority AS orderpriority
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1995-03-15'
      AND l.l_shipdate > TIMESTAMP '1995-03-15'
    GROUP BY 1, 3, 4
    ORDER BY revenue DESC, orderkey
    LIMIT 10
    """,
)
def tpch_q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: selective dim filter → fact join chain → agg →
    top-k. Only the filtered customer dim is force-broadcast; the
    lineitem↔orders join shuffles on the key (AQE upgrades it to
    broadcast at small SF, and at large SF the shuffle is the correct
    plan — force-broadcasting half of orders would OOM executors). The
    top-10 is TakeOrderedAndProject (no global sort). Reference analog:
    the 'complex query' suite joins db_performance_test.py:208-271."""
    cutoff = "1995-03-15"
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit(cutoff).cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit(cutoff).cast("timestamp")
    )
    return (
        li.join(orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey),
                F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(
            F.col("l_orderkey").alias("orderkey"),
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            F.col("o_orderpriority").alias("orderpriority"),
        )
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
        .orderBy(F.desc("revenue"), F.asc("orderkey"))
        .limit(10)
        .select("orderkey", "revenue", "orderdate", "orderpriority")
    )


@query(
    "tpch_q5_local_supplier_volume",
    oracle="""
    SELECT n.n_name AS nation,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    GROUP BY 1
    """,
)
def tpch_q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: six-way star join with a non-key co-nationality
    predicate. All dimension sides (customer, supplier, nation, region)
    broadcast — the only shuffle left is lineitem↔orders, and AQE picks
    broadcast there too at small SF. Reference analog: the multi-join
    consistency SQL (data_quality_monitoring.py:334-357)."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(
            F.broadcast(supp),
            (li.l_suppkey == supp.s_suppkey) & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
    )
