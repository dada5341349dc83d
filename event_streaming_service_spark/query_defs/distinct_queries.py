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
