"""Window-frame analytics: running/moving aggregates, first/last values,
calendar bucketing, and deterministic string aggregation — the analytic
window surface beyond row_number/lag (SURVEY.md sections 2.7-2.8)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from event_streaming_service_spark.functions.money import cents, cents_sql
from event_streaming_service_spark.queries import register
from event_streaming_service_spark.sources import tables


@register(
    "moving_window_frames",
    oracle="""
    SELECT event_id, user_id,
           CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT))
                OVER (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS running_cents,
           CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT))
                OVER (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS BIGINT)
               AS window5_cents,
           FIRST_VALUE(event_type) OVER (PARTITION BY user_id
                                         ORDER BY ts, event_id)
               AS first_type,
           LEAD(event_id) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS next_event_id
    FROM events
    """,
    tags=("2.7", "window-frames"),
)
def q_moving_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running totals, 5-row moving sums, first-value and lead pointers
    per user — exact integer cents so frames hash identically."""
    ev = tables.load_table(spark, sf_dir, "events")
    order = Window.partitionBy("user_id").orderBy("ts", "event_id")
    running = order.rowsBetween(Window.unboundedPreceding, 0)
    last5 = order.rowsBetween(-4, 0)
    c = cents("value")
    return ev.select(
        "event_id", "user_id",
        F.sum(c).over(running).cast("bigint").alias("running_cents"),
        F.sum(c).over(last5).cast("bigint").alias("window5_cents"),
        F.first("event_type").over(order).alias("first_type"),
        F.lead("event_id").over(order).alias("next_event_id"))


@register(
    "window_functions_profile",
    oracle="""
    SELECT event_id, user_id,
           CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id)
                AS BIGINT) AS seq,
           LAG(event_id) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS prev_event_id,
           CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT))
                OVER (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS running_cents,
           CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT))
                OVER (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS BIGINT)
               AS window5_cents,
           FIRST_VALUE(event_type) OVER (PARTITION BY user_id
                                         ORDER BY ts, event_id)
               AS first_type,
           LEAD(event_id) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS next_event_id
    FROM events
    """,
    tags=("W2", "2.7", "window-frames"),
)
def q_window_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W2 per-key ordering (seq + prev pointer) and the 2.7 moving-frame
    family (running/5-row cents, first_value, lead) over ONE shared
    window spec — Catalyst evaluates all six expressions in a single
    sort+Window pass, which is exactly the shape you want at 100 TB
    (one shuffle on the key, one sort, no repeated passes). Coverage
    twin of per_key_ordering + moving_window_frames for the driver
    budget; those stay registered standalone."""
    ev = tables.load_table(spark, sf_dir, "events")
    order = Window.partitionBy("user_id").orderBy("ts", "event_id")
    running = order.rowsBetween(Window.unboundedPreceding, 0)
    last5 = order.rowsBetween(-4, 0)
    c = cents("value")
    return ev.select(
        "event_id", "user_id",
        F.row_number().over(order).cast("bigint").alias("seq"),
        F.lag("event_id").over(order).alias("prev_event_id"),
        F.sum(c).over(running).cast("bigint").alias("running_cents"),
        F.sum(c).over(last5).cast("bigint").alias("window5_cents"),
        F.first("event_type").over(order).alias("first_type"),
        F.lead("event_id").over(order).alias("next_event_id"))


@register(
    "orders_by_month",
    oracle=f"""
    SELECT date_trunc('month', o_orderdate) AS order_month,
           o_orderstatus,
           COUNT(*) AS n_orders,
           CAST(SUM({cents_sql('o_totalprice')}) AS BIGINT) AS total_cents
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY 1, 2
    """,
    tags=("2.9", "calendar"),
)
def q_orders_by_month(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar-month bucketing (date_trunc on rendered wall clock —
    session-timezone invariant via the loader's conversion)."""
    o = tables.load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp")))
    return (o.groupBy(F.date_trunc("month", "o_orderdate").alias("order_month"),
                      "o_orderstatus")
            .agg(F.count("*").alias("n_orders"),
                 F.sum(cents("o_totalprice")).cast("bigint")
                  .alias("total_cents")))


@register(
    "event_types_per_tenant_listagg",
    oracle="""
    SELECT tenant_id, string_agg(event_type, ',' ORDER BY event_type)
               AS types_seen
    FROM (SELECT DISTINCT 'tenant-' || CAST(user_id % 10 AS VARCHAR)
                     AS tenant_id, event_type
          FROM events)
    GROUP BY tenant_id
    """,
    tags=("A5", "listagg"),
)
def q_listagg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5's eventsByType map rendered portably: sorted distinct types
    per tenant as one string (collect_list is unordered, so sort before
    joining — determinism by construction)."""
    ev = tables.load_table(spark, sf_dir, "events")
    distinct = (ev.select(
        F.concat(F.lit("tenant-"), (F.col("user_id") % 10).cast("string"))
         .alias("tenant_id"), "event_type").distinct())
    return (distinct.groupBy("tenant_id")
            .agg(F.concat_ws(",", F.array_sort(F.collect_list("event_type")))
                 .alias("types_seen")))


@register(
    "supplier_balance_rank_profile",
    oracle="""
    WITH s AS (
        SELECT s_suppkey, s_nationkey,
               CAST(ROUND(s_acctbal * 100, 0) AS BIGINT) AS bal_cents
        FROM supplier)
    SELECT s_suppkey, s_nationkey, bal_cents,
           ROUND(PERCENT_RANK() OVER (
               PARTITION BY s_nationkey
               ORDER BY bal_cents, s_suppkey), 9) AS pct_rank,
           ROUND(CUME_DIST() OVER (
               PARTITION BY s_nationkey
               ORDER BY bal_cents, s_suppkey), 9) AS cume_dist
    FROM s
    """,
    tags=("2.7", "window-frames", "A7", "rank-functions"),
)
def q_supplier_balance_ranks(spark: SparkSession,
                             sf_dir: str) -> DataFrame:
    """percent_rank + cume_dist per nation over exact integer cents
    with a total-order tiebreak (no peer groups -> both engines
    evaluate the identical (rank-1)/(n-1) and rn/n divisions; 9 dp
    pin guards the single float op)."""
    s = tables.load_table(spark, sf_dir, "supplier")
    w = (Window.partitionBy("s_nationkey")
         .orderBy(F.col("bal_cents"), F.col("s_suppkey")))
    return (s.select("s_suppkey", "s_nationkey",
                     cents("s_acctbal").alias("bal_cents"))
            .withColumn("pct_rank",
                        F.round(F.percent_rank().over(w), 9))
            .withColumn("cume_dist",
                        F.round(F.cume_dist().over(w), 9)))
