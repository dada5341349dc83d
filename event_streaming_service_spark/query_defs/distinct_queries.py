"""Distinct-count sketch queries (operators/distinct_sketch.py):
portable HyperLogLog and per-group KMV, each hash-checked against the
identical sketch arithmetic in SQL and reported alongside the exact
COUNT(DISTINCT) so the estimate quality itself is driver-visible.

These are the oracle-backed twins of the engine-hash production path
(`approx_distinct_users` stays registered rows-only with Spark's
native approx_count_distinct / xxhash64)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from event_streaming_service_spark.operators import distinct_sketch
from event_streaming_service_spark.queries import register
from event_streaming_service_spark.sources import tables


@register(
    "hll_distinct_users",
    oracle=f"""
    WITH hll AS ({distinct_sketch.hll_summary_sql("user_id", "events")})
    SELECT hll.*, x.n_exact
    FROM hll CROSS JOIN
         (SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_exact
          FROM events) x
    """,
    tags=("sketch", "hll", "A10", "2.12-sketch"),
)
def q_hll_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Portable HyperLogLog over events.user_id: 256-register table as
    a constant-size map-side-combined aggregate, exact dyadic-rational
    harmonic sum, raw + linear-counting estimates in pinned micro
    units, exact distinct alongside (operators/distinct_sketch.py)."""
    events = tables.load_table(spark, sf_dir, "events")
    summary = distinct_sketch.hll_summary(events, F.col("user_id"))
    exact = events.agg(
        F.countDistinct("user_id").cast("bigint").alias("n_exact"))
    return summary.crossJoin(exact)


@register(
    "kmv_distinct_users_by_type",
    oracle=f"""
    WITH kmv AS ({distinct_sketch.kmv_per_group_sql(
        "user_id", "event_type", "events")})
    SELECT kmv.*, x.n_exact
    FROM kmv JOIN
         (SELECT event_type,
                 CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_exact
          FROM events GROUP BY event_type) x USING (event_type)
    """,
    tags=("sketch", "kmv", "A10", "2.12-sketch"),
)
def q_kmv_users_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type KMV (bottom-k theta sketch): bounded Arrow-kernel
    local k-minima, one tiny merge rank, integer estimator
    (k-1)*2^48 DIV h_k, exact distinct alongside."""
    events = tables.load_table(spark, sf_dir, "events")
    kmv = distinct_sketch.kmv_per_group(
        events, "event_type", F.col("user_id"))
    exact = events.groupBy("event_type").agg(
        F.countDistinct("user_id").cast("bigint").alias("n_exact"))
    return kmv.join(exact, "event_type")


KMV_GROUP_A = "click"
KMV_GROUP_B = "purchase"


@register(
    "kmv_intersection_click_purchase",
    oracle=f"""
    WITH hx AS (
        SELECT DISTINCT event_type AS g,
               {distinct_sketch.portable_hash48_sql("user_id")} AS h
        FROM events
        WHERE event_type IN ('{KMV_GROUP_A}', '{KMV_GROUP_B}')),
    ranked AS (
        SELECT g, h, row_number() OVER (PARTITION BY g ORDER BY h) AS rn
        FROM hx QUALIFY rn <= {distinct_sketch.KMV_K}),
    a AS (SELECT h FROM ranked WHERE g = '{KMV_GROUP_A}'),
    b AS (SELECT h FROM ranked WHERE g = '{KMV_GROUP_B}'),
    bounds AS (
        SELECT LEAST((SELECT MAX(h) FROM a),
                     (SELECT MAX(h) FROM b)) AS theta_hash),
    common AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_common_below_theta
        FROM a JOIN b USING (h), bounds
        WHERE h <= theta_hash),
    x AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_exact FROM (
            SELECT user_id FROM events
            WHERE event_type = '{KMV_GROUP_A}'
            INTERSECT
            SELECT user_id FROM events
            WHERE event_type = '{KMV_GROUP_B}'))
    SELECT c.n_common_below_theta, bo.theta_hash,
           CAST(c.n_common_below_theta * {distinct_sketch.KMV_SPACE}
                // bo.theta_hash AS BIGINT) AS est_intersection,
           x.n_exact
    FROM common c, bounds bo, x
    """,
    tags=("sketch", "kmv", "2.10", "2.12-sketch"),
)
def q_kmv_intersection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta-sketch intersection: estimate the distinct users doing
    BOTH click and purchase from the two bottom-k sketches alone
    (h <= theta sample of the union domain), exact INTERSECT count
    alongside (operators/distinct_sketch.py:kmv_intersection)."""
    events = tables.load_table(spark, sf_dir, "events")
    sub = events.filter(
        F.col("event_type").isin(KMV_GROUP_A, KMV_GROUP_B))
    sk = distinct_sketch.kmv_intersection(
        sub, "event_type", F.col("user_id"), KMV_GROUP_A, KMV_GROUP_B)
    ua = (events.filter(F.col("event_type") == KMV_GROUP_A)
          .select("user_id").distinct())
    ub = (events.filter(F.col("event_type") == KMV_GROUP_B)
          .select("user_id").distinct())
    exact = (ua.intersect(ub)
             .agg(F.count(F.lit(1)).cast("bigint").alias("n_exact")))
    return sk.crossJoin(exact)
