"""Behavioral / operational analytics extensions (round 7): streaks,
throttling audits, arrival cadence, growth curves, ABC classification,
rolling revenue, decile profiles, fulfillment latency, seasonality.

Exactness conventions as everywhere: integer cents/units for money
(functions/money.py), integer milliseconds for time, truncating DIV
for ratios (Spark DIV and DuckDB // agree — both truncate), ROUND at
6 dp only on single float ops over exact integer operands.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window

from event_streaming_service_spark.functions.money import (
    cents,
    cents_sql,
    pct,
    pct_sql,
)
from event_streaming_service_spark.operators import analytics, windows
from event_streaming_service_spark.queries import register
from event_streaming_service_spark.sources import tables

RATE_LIMIT_PER_HOUR = 5


def _ev(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tables.load_table(spark, sf_dir, "events")


@register(
    "activity_streaks_per_user",
    oracle="""
    WITH d AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS dd
               FROM events),
    r AS (SELECT user_id, dd,
                 (dd - DATE '1970-01-01')
                 - ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY dd)
                     AS g
          FROM d),
    isl AS (SELECT user_id, g, COUNT(*) AS len
            FROM r GROUP BY user_id, g)
    SELECT user_id, CAST(SUM(len) AS BIGINT) AS active_days,
           CAST(COUNT(*) AS BIGINT) AS n_streaks,
           CAST(MAX(len) AS BIGINT) AS longest_streak_days
    FROM isl GROUP BY user_id
    """,
    tags=("analytics", "streaks", "gaps-islands", "A5"),
)
def q_activity_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest consecutive-day streak per user via gaps-and-islands
    (day-number minus row_number is constant inside a run)."""
    return analytics.activity_streaks(_ev(spark, sf_dir), "user_id", "ts")


@register(
    "rate_limited_event_counts",
    oracle=f"""
    WITH r AS (
        SELECT user_id,
               ROW_NUMBER() OVER (
                   PARTITION BY user_id, date_trunc('hour', ts)
                   ORDER BY ts, event_id) AS rn
        FROM events)
    SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(COUNT(*) FILTER (rn <= {RATE_LIMIT_PER_HOUR})
                AS BIGINT) AS n_kept,
           CAST(COUNT(*) FILTER (rn > {RATE_LIMIT_PER_HOUR})
                AS BIGINT) AS n_dropped
    FROM r GROUP BY user_id
    """,
    tags=("analytics", "rate-limit", "W5", "A5"),
)
def q_rate_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Throttling audit: cap each user at 5 events per calendar hour
    (earliest kept, (ts, event_id) total order) and count drops."""
    return analytics.rate_limit_counts(
        _ev(spark, sf_dir), "user_id", "ts",
        per_hour=RATE_LIMIT_PER_HOUR, order_tiebreak="event_id")


@register(
    "inter_event_gap_stats",
    oracle="""
    WITH g AS (
        SELECT event_type,
               epoch_ms(ts) - LAG(epoch_ms(ts)) OVER (
                   PARTITION BY user_id, event_type
                   ORDER BY ts, event_id) AS gap_ms
        FROM events)
    SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_gaps,
           CAST(MIN(gap_ms) AS BIGINT) AS min_gap_ms,
           CAST(MAX(gap_ms) AS BIGINT) AS max_gap_ms,
           ROUND(CAST(SUM(gap_ms) AS DOUBLE)
                 / CAST(COUNT(*) AS DOUBLE), 6) AS avg_gap_ms
    FROM g WHERE gap_ms IS NOT NULL GROUP BY event_type
    """,
    tags=("analytics", "cadence", "A5", "A7"),
)
def q_inter_event_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-arrival profile per event type over (user, type)
    timelines; exact integer milliseconds, one float op (the mean)."""
    return analytics.inter_event_gaps(
        _ev(spark, sf_dir), "user_id", "ts", "event_type",
        order_tiebreak="event_id")


@register(
    "mode_event_type_per_user",
    oracle="""
    WITH c AS (SELECT user_id, event_type, COUNT(*) AS n
               FROM events GROUP BY 1, 2),
    r AS (SELECT user_id, event_type, n,
                 ROW_NUMBER() OVER (PARTITION BY user_id
                                    ORDER BY n DESC, event_type) AS rn
          FROM c)
    SELECT user_id, event_type AS mode_value,
           CAST(n AS BIGINT) AS mode_count
    FROM r WHERE rn = 1
    """,
    tags=("analytics", "mode", "A6"),
)
def q_mode_event_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-user modal event type (count + rank with a
    value tiebreak — built-in mode() picks arbitrary winners)."""
    return analytics.mode_per_key(_ev(spark, sf_dir), "user_id",
                                  "event_type")


@register(
    "daily_new_users_cumulative",
    oracle="""
    WITH f AS (SELECT user_id, MIN(CAST(ts AS DATE)) AS first_day
               FROM events GROUP BY user_id),
    d AS (SELECT first_day, COUNT(*) AS new_keys
          FROM f GROUP BY first_day)
    SELECT CAST(first_day AS TIMESTAMP) AS first_day,
           CAST(new_keys AS BIGINT) AS new_keys,
           CAST(SUM(new_keys) OVER (ORDER BY first_day
                                    ROWS UNBOUNDED PRECEDING)
                AS BIGINT) AS cumulative_keys
    FROM d
    """,
    tags=("analytics", "growth", "calendar", "A5"),
)
def q_new_user_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily acquisition curve: new users by first-seen day plus the
    running cumulative (global window over calendar-bounded rows)."""
    return analytics.new_key_growth(_ev(spark, sf_dir), "user_id", "ts")


@register(
    "weekday_hourly_profile",
    oracle="""
    WITH c AS (SELECT CAST(isodow(ts) AS INTEGER) AS isodow,
                      CAST(hour(ts) AS INTEGER) AS hour,
                      COUNT(*) AS n
               FROM events GROUP BY 1, 2)
    SELECT isodow, hour, CAST(n AS BIGINT) AS n_events,
           CAST(n * 1000000 // SUM(n) OVER (PARTITION BY isodow)
                AS BIGINT) AS ppm_of_day
    FROM c
    """,
    tags=("analytics", "seasonality", "calendar", "A6"),
)
def q_weekday_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week x hour-of-day arrival profile with each cell's
    exact ppm share of its weekday (truncating integer division)."""
    ev = _ev(spark, sf_dir)
    c = (ev.select(
            (F.weekday(F.col("ts")) + 1).cast("int").alias("isodow"),
            F.hour(F.col("ts")).cast("int").alias("hour"))
         .groupBy("isodow", "hour")
         .agg(F.count(F.lit(1)).alias("n_events")))
    day_total = F.sum("n_events").over(Window.partitionBy("isodow"))
    return (c.withColumn("__day_total", day_total)
            .withColumn("ppm_of_day",
                        F.expr("n_events * 1000000 DIV __day_total"))
            .select("isodow", "hour", "n_events", "ppm_of_day"))


@register(
    "rolling_7d_revenue",
    oracle=f"""
    SELECT o_custkey, o_orderkey,
           {cents_sql('o_totalprice')} AS price_cents,
           CAST(SUM({cents_sql('o_totalprice')}) OVER (
               PARTITION BY o_custkey ORDER BY epoch_ms(o_orderdate)
               RANGE BETWEEN 604800000 PRECEDING AND CURRENT ROW)
            AS BIGINT) AS trailing_7d_cents
    FROM orders
    """,
    tags=("analytics", "window-frames", "2.7", "rolling"),
)
def q_rolling_7d_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 7-day order revenue per customer: a bounded-start
    RANGE frame over epoch-millis with exact integer cents; peers at
    the same timestamp see identical totals in both engines."""
    o = tables.load_table(spark, sf_dir, "orders")
    out = windows.rolling_time_sum(
        o.select("o_custkey", "o_orderkey", "o_orderdate",
                 cents("o_totalprice").alias("price_cents")),
        "o_custkey", "o_orderdate", F.col("price_cents"),
        window_ms=7 * 86_400_000, out_col="trailing_7d_cents")
    return out.select("o_custkey", "o_orderkey", "price_cents",
                      "trailing_7d_cents")


@register(
    "order_value_deciles",
    oracle=f"""
    WITH d AS (
        SELECT o_orderpriority,
               {cents_sql('o_totalprice')} AS price_cents,
               NTILE(10) OVER (
                   PARTITION BY o_orderpriority
                   ORDER BY {cents_sql('o_totalprice')}, o_orderkey)
                   AS decile
        FROM orders)
    SELECT o_orderpriority, CAST(decile AS INTEGER) AS decile,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(MIN(price_cents) AS BIGINT) AS min_cents,
           CAST(MAX(price_cents) AS BIGINT) AS max_cents,
           CAST(SUM(price_cents) AS BIGINT) AS decile_cents
    FROM d GROUP BY 1, 2
    """,
    tags=("analytics", "ntile", "histogram", "A7"),
)
def q_order_value_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-priority order-value deciles (NTILE over a
    deterministic (cents, orderkey) order) with per-decile exact
    bounds and totals."""
    o = tables.load_table(spark, sf_dir, "orders")
    w = (Window.partitionBy("o_orderpriority")
         .orderBy(cents("o_totalprice"), F.col("o_orderkey")))
    d = o.select(
        "o_orderpriority", cents("o_totalprice").alias("price_cents"),
        F.ntile(10).over(w).cast("int").alias("decile"))
    return (d.groupBy("o_orderpriority", "decile")
            .agg(F.count(F.lit(1)).alias("n_orders"),
                 F.min("price_cents").alias("min_cents"),
                 F.max("price_cents").alias("max_cents"),
                 F.sum("price_cents").alias("decile_cents")))


@register(
    "abc_classification_parts",
    oracle=f"""
    WITH rev AS (
        SELECT l_partkey,
               CAST(SUM({cents_sql('l_extendedprice')}
                        * (100 - {pct_sql('l_discount')}))
                    AS BIGINT) AS revenue_units
        FROM lineitem GROUP BY l_partkey),
    r AS (
        SELECT l_partkey, revenue_units,
               CAST(COALESCE(SUM(revenue_units) OVER (
                        ORDER BY revenue_units DESC, l_partkey
                        ROWS BETWEEN UNBOUNDED PRECEDING
                                 AND 1 PRECEDING), 0)
                    AS BIGINT) AS before_units,
               CAST(SUM(revenue_units) OVER () AS BIGINT) AS total_units
        FROM rev)
    SELECT abc_class, CAST(COUNT(*) AS BIGINT) AS n_items,
           CAST(SUM(revenue_units) AS BIGINT) AS class_revenue
    FROM (SELECT CASE WHEN before_units * 100 < total_units * 70
                          THEN 'A'
                      WHEN before_units * 100 < total_units * 90
                          THEN 'B'
                      ELSE 'C' END AS abc_class,
                 revenue_units
          FROM r)
    GROUP BY abc_class
    """,
    tags=("analytics", "abc", "tpch", "rollup"),
)
def q_abc_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC/Pareto classification of parts by discounted revenue
    (exact 1e-4-dollar units; the 70/90 boundaries test in pure
    integer arithmetic)."""
    li = tables.load_table(spark, sf_dir, "lineitem")
    rev = (li.groupBy("l_partkey")
           .agg(F.sum(cents("l_extendedprice")
                      * (100 - pct("l_discount")))
                .alias("revenue_units")))
    return analytics.abc_classification(rev, "l_partkey",
                                        "revenue_units")


@register(
    "ship_delay_stats",
    oracle="""
    WITH j AS (
        SELECT o.o_orderpriority,
               CAST(l.l_shipdate AS DATE) - CAST(o.o_orderdate AS DATE)
                   AS delay_days
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
    s AS (
        SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_lines,
               CAST(MIN(delay_days) AS BIGINT) AS min_delay_days,
               CAST(MAX(delay_days) AS BIGINT) AS max_delay_days,
               CAST(SUM(delay_days) AS BIGINT) AS sd,
               CAST(SUM(CAST(delay_days AS BIGINT) * delay_days)
                    AS BIGINT) AS sdd
        FROM j GROUP BY o_orderpriority)
    SELECT o_orderpriority, n_lines, min_delay_days, max_delay_days,
           ROUND(CAST(sd AS DOUBLE) / CAST(n_lines AS DOUBLE), 6)
               AS avg_delay_days,
           ROUND(CAST(n_lines * sdd - sd * sd AS DOUBLE)
                 / CAST(n_lines * n_lines AS DOUBLE), 6)
               AS var_delay_days
    FROM s
    """,
    tags=("analytics", "tpch", "A5", "A7", "J1"),
)
def q_ship_delay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-to-ship latency per priority: exact integer day sums
    carry the mean and population variance ((n·Σx² - (Σx)²)/n² from
    exact bigints, one float division each)."""
    li = tables.load_table(spark, sf_dir, "lineitem")
    o = tables.load_table(spark, sf_dir, "orders")
    delay = F.datediff(F.col("l_shipdate"), F.col("o_orderdate"))
    j = (li.join(o, li.l_orderkey == o.o_orderkey)
         .select("o_orderpriority", delay.alias("delay_days")))
    s = (j.groupBy("o_orderpriority")
         .agg(F.count(F.lit(1)).alias("n_lines"),
              F.min("delay_days").cast("long").alias("min_delay_days"),
              F.max("delay_days").cast("long").alias("max_delay_days"),
              F.sum("delay_days").alias("__sd"),
              F.sum(F.col("delay_days").cast("long")
                    * F.col("delay_days")).alias("__sdd")))
    return s.select(
        "o_orderpriority", "n_lines", "min_delay_days",
        "max_delay_days",
        F.round(F.col("__sd").cast("double")
                / F.col("n_lines").cast("double"), 6)
        .alias("avg_delay_days"),
        F.round((F.col("n_lines") * F.col("__sdd")
                 - F.col("__sd") * F.col("__sd")).cast("double")
                / (F.col("n_lines") * F.col("n_lines")).cast("double"),
                6).alias("var_delay_days"))


@register(
    "association_rules_lift",
    oracle="""
    WITH bi AS (SELECT DISTINCT l_orderkey AS b, l_partkey AS i
                FROM lineitem),
    n AS (SELECT COUNT(DISTINCT b) AS n_baskets FROM bi),
    ic AS (SELECT i, COUNT(*) AS cnt FROM bi GROUP BY i),
    p AS (SELECT l.i AS ia, r.i AS ib,
                 CAST(COUNT(*) AS BIGINT) AS pair_cnt
          FROM bi l JOIN bi r ON l.b = r.b AND l.i < r.i
          GROUP BY 1, 2
          HAVING COUNT(*) >= 3)
    SELECT ia AS item_a, ib AS item_b, pair_cnt,
           a.cnt AS cnt_a, bb.cnt AS cnt_b, n_baskets,
           CAST(CAST(pair_cnt AS HUGEINT) * 1000000 // n_baskets
                AS BIGINT) AS support_ppm,
           CAST(CAST(pair_cnt AS HUGEINT) * 1000000 // a.cnt
                AS BIGINT) AS conf_ab_ppm,
           CAST(CAST(pair_cnt AS HUGEINT) * 1000000 // bb.cnt
                AS BIGINT) AS conf_ba_ppm,
           CAST(CAST(pair_cnt AS HUGEINT) * 1000000 * n_baskets
                // (CAST(a.cnt AS HUGEINT) * bb.cnt)
                AS BIGINT) AS lift_ppm
    FROM p JOIN ic a ON p.ia = a.i JOIN ic bb ON p.ib = bb.i
    CROSS JOIN n
    ORDER BY lift_ppm DESC, item_a, item_b LIMIT 20
    """,
    tags=("analytics", "market-basket", "2.12-graph", "A6"),
)
def q_association_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket association rules on order baskets: top-20 part
    pairs by exact integer-ppm lift with directional confidences
    (operators/analytics.py:association_rules)."""
    li = tables.load_table(spark, sf_dir, "lineitem")
    return analytics.association_rules(
        li, "l_orderkey", "l_partkey", min_pair_count=3, top_n=20)


@register(
    "rfm_customer_segments",
    oracle="""
    WITH pk AS (
        SELECT o_custkey,
               MAX(o_orderdate) AS last_d,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT))
                    AS BIGINT) AS spend_cents
        FROM orders GROUP BY 1),
    mx AS (SELECT MAX(last_d) AS maxd FROM pk),
    b AS (SELECT o_custkey, n_orders, spend_cents,
                 CAST(date_diff('day', CAST(last_d AS DATE),
                                CAST(maxd AS DATE)) AS BIGINT)
                     AS recency_days
          FROM pk CROSS JOIN mx),
    r AS (SELECT *,
                 ROW_NUMBER() OVER (ORDER BY recency_days, o_custkey)
                     AS kr,
                 ROW_NUMBER() OVER (ORDER BY n_orders DESC, o_custkey)
                     AS kf,
                 ROW_NUMBER() OVER (ORDER BY spend_cents DESC,
                                    o_custkey) AS km,
                 COUNT(*) OVER () AS n
          FROM b)
    SELECT o_custkey, n_orders, spend_cents, recency_days,
           CAST(1 + ((kr - 1) * 5) // n AS INTEGER) AS r_q,
           CAST(1 + ((kf - 1) * 5) // n AS INTEGER) AS f_q,
           CAST(1 + ((km - 1) * 5) // n AS INTEGER) AS m_q,
           CAST(1 + ((kr - 1) * 5) // n AS VARCHAR)
           || CAST(1 + ((kf - 1) * 5) // n AS VARCHAR)
           || CAST(1 + ((km - 1) * 5) // n AS VARCHAR) AS segment
    FROM r
    """,
    tags=("analytics", "rfm", "segmentation", "A5", "A9"),
)
def q_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM quintile segmentation of customers by order history:
    closed-form equal-count buckets over distributed global ranks,
    quintile 1 best on every axis
    (operators/analytics.py:rfm_segments)."""
    orders = tables.load_table(spark, sf_dir, "orders")
    return analytics.rfm_segments(orders, "o_custkey", "o_orderdate",
                                  cents("o_totalprice"))
