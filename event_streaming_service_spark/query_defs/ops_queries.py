"""Operational-analytics queries added in the round-7 second wave:
OHLC candlestick bars (operators/analytics.py:ohlc_bars) and shuffle-
key skew diagnostics (operators/skew.py:key_skew_profile)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from event_streaming_service_spark.operators import analytics, skew
from event_streaming_service_spark.queries import register
from event_streaming_service_spark.sources import tables

SKEW_TOP_N = 10


@register(
    "ohlc_bars_daily",
    oracle="""
    WITH e AS (
        SELECT event_type, ts,
               CAST(date_trunc('day', ts) AS TIMESTAMP) AS bar_ts,
               CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS cents
        FROM events),
    r AS (
        SELECT *,
               row_number() OVER (PARTITION BY event_type, bar_ts
                                  ORDER BY ts ASC, cents ASC) AS rn_o,
               row_number() OVER (PARTITION BY event_type, bar_ts
                                  ORDER BY ts DESC, cents DESC) AS rn_c
        FROM e)
    SELECT event_type, bar_ts,
           CAST(MAX(CASE WHEN rn_o = 1 THEN cents END) AS BIGINT)
               AS open_cents,
           CAST(MAX(cents) AS BIGINT) AS high_cents,
           CAST(MIN(cents) AS BIGINT) AS low_cents,
           CAST(MAX(CASE WHEN rn_c = 1 THEN cents END) AS BIGINT)
               AS close_cents,
           CAST(COUNT(*) AS BIGINT) AS volume,
           CAST(SUM(cents) AS BIGINT) AS total_cents
    FROM r GROUP BY event_type, bar_ts
    """,
    tags=("A5", "calendar", "window-frames", "2.12-timeseries", "ohlc"),
)
def q_ohlc_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily OHLC bars per event type: open/close by explicit total
    order (ts, cents), high/low/volume/total in exact integer cents —
    the hypertable candlestick downsample."""
    events = tables.load_table(spark, sf_dir, "events")
    return analytics.ohlc_bars(
        events, "event_type", "ts",
        F.expr("CAST(FLOOR(value * 100 + 0.5) AS BIGINT)"),
        F.date_trunc("day", F.col("ts")).cast("timestamp"))


@register(
    "skew_key_diagnostics",
    oracle=f"""
    WITH counts AS (
        SELECT o_custkey AS key, CAST(COUNT(*) AS BIGINT) AS cnt
        FROM orders GROUP BY o_custkey),
    t AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_keys,
                 CAST(SUM(cnt) AS BIGINT) AS total FROM counts)
    SELECT key, cnt,
           CAST(cnt * 1000000 // total AS BIGINT) AS share_ppm,
           CAST(cnt * n_keys * 1000000 // total AS BIGINT)
               AS hot_x_avg_ppm,
           n_keys
    FROM counts, t
    ORDER BY cnt DESC, key LIMIT {SKEW_TOP_N}
    """,
    tags=("A10", "skew", "2.12-skew"),
)
def q_skew_diag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 heaviest orders.o_custkey shuffle keys with exact share
    and hot-factor ppm — the pre-flight skew profile for salt / AQE
    tuning (operators/skew.py)."""
    orders = tables.load_table(spark, sf_dir, "orders")
    return skew.key_skew_profile(orders, "o_custkey", SKEW_TOP_N)
