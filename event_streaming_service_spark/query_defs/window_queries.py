"""Event-time window queries W8/W2 (SURVEY.md section 2.8), batch form.

All bucketing is wall-clock-millisecond arithmetic (engine-portable and
session-timezone invariant); see operators/windows.py for why native
F.window is reserved for the streaming layer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from event_streaming_service_spark.operators import windows
from event_streaming_service_spark.operators.stats import dsum
from event_streaming_service_spark.queries import register
from event_streaming_service_spark.sources import tables

HOUR_MS = 3_600_000
DAY_MS = 86_400_000
HALF_HOUR_MS = 1_800_000


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tables.load_table(spark, sf_dir, "events")


@register(
    "tumbling_daily_by_type",
    oracle=f"""
    SELECT make_timestamp((epoch_ms(ts) // {DAY_MS}) * {DAY_MS} * 1000)
               AS window_start,
           make_timestamp(((epoch_ms(ts) // {DAY_MS}) * {DAY_MS} + {DAY_MS}) * 1000)
               AS window_end,
           event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(24,4))) AS DOUBLE) AS sum_value
    FROM events GROUP BY 1, 2, 3
    """,
    tags=("W8",),
)
def q_tumbling_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W8 tumbling: daily event counts per type."""
    df = windows.tumbling(_events(spark, sf_dir), "ts", DAY_MS)
    return (df.groupBy("window_start", "window_end", "event_type")
            .agg(F.count("*").alias("n"), dsum("value").alias("sum_value")))


@register(
    "sliding_hourly_counts",
    oracle=f"""
    SELECT make_timestamp((((epoch_ms(ts) - off) // {HOUR_MS}) * {HOUR_MS} + off)
                          * 1000) AS window_start,
           COUNT(*) AS n
    FROM events, (VALUES (0), ({HALF_HOUR_MS})) AS offs(off)
    GROUP BY 1
    """,
    tags=("W8",),
)
def q_sliding_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W8 sliding: 1-hour windows every 30 minutes (each event in 2)."""
    df = windows.sliding(_events(spark, sf_dir), "ts", HOUR_MS, HALF_HOUR_MS)
    return df.groupBy("window_start").agg(F.count("*").alias("n"))


@register(
    "session_windows_30m",
    oracle="""
    WITH ordered AS (
        SELECT user_id, event_id, ts, epoch_ms(ts) AS ms,
               LAG(epoch_ms(ts)) OVER (PARTITION BY user_id
                                       ORDER BY ts, event_id) AS prev_ms
        FROM events
    ), flagged AS (
        SELECT *, CASE WHEN prev_ms IS NULL OR ms - prev_ms > 1800000
                       THEN 1 ELSE 0 END AS new_s
        FROM ordered
    ), sess AS (
        SELECT *, CAST(SUM(new_s) OVER (PARTITION BY user_id
                                        ORDER BY ts, event_id
                                        ROWS UNBOUNDED PRECEDING) AS BIGINT)
                      AS session_seq
        FROM flagged
    )
    SELECT user_id, session_seq,
           make_timestamp(MIN(ms) * 1000) AS session_start,
           make_timestamp(MAX(ms) * 1000) AS session_end,
           COUNT(*) AS n_events
    FROM sess GROUP BY user_id, session_seq
    """,
    tags=("W8",),
)
def q_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W8 session windows: 30-minute-gap sessionization per user
    (gaps-and-islands; streaming twin is session_window + watermark)."""
    return windows.sessionize(_events(spark, sf_dir), "user_id", "ts",
                              HALF_HOUR_MS, "event_id")


@register(
    "per_key_ordering",
    oracle="""
    SELECT event_id, user_id,
           CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id)
                AS BIGINT) AS seq,
           LAG(event_id) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS prev_event_id
    FROM events
    """,
    tags=("W2",),
)
def q_per_key_ordering(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W2: per-key ordering guarantee materialized as (seq, prev pointer)."""
    df = windows.per_key_order(_events(spark, sf_dir), "user_id", "ts", "event_id")
    return df.select("event_id", "user_id", "seq", "prev_event_id")


@register(
    "gapfill_hourly_locf",
    oracle=f"""
    WITH agg AS (
        SELECT event_type,
               make_timestamp((epoch_ms(ts) // {HOUR_MS}) * {HOUR_MS} * 1000)
                   AS bucket,
               COUNT(*) AS n,
               CAST(SUM(CAST(value AS DECIMAL(24,4))) AS DOUBLE) AS sum_value
        FROM events GROUP BY 1, 2),
    bounds AS (
        SELECT event_type, MIN(bucket) AS lo, MAX(bucket) AS hi
        FROM agg GROUP BY event_type),
    spine AS (
        SELECT event_type,
               unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS bucket
        FROM bounds),
    joined AS (
        SELECT s.event_type, s.bucket, a.n, a.sum_value,
               a.n IS NULL AS is_gap
        FROM spine s LEFT JOIN agg a
          ON a.event_type = s.event_type AND a.bucket = s.bucket)
    SELECT event_type, bucket,
           LAST_VALUE(n IGNORE NULLS) OVER w AS n,
           LAST_VALUE(sum_value IGNORE NULLS) OVER w AS sum_value,
           is_gap
    FROM joined
    WINDOW w AS (PARTITION BY event_type ORDER BY bucket
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
    tags=("W8", "gapfill", "rollup"),
)
def q_gapfill_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style time_bucket_gapfill + locf: hourly per-type
    aggregates densified to every hour in each type's observed range,
    gaps carrying the last value forward (is_gap marks synthesized
    rows). Spine = one tiny min/max aggregate exploded JVM-side; the
    back-join hashes on the aggregate's own grain; the carry-forward is
    a single window pass."""
    agg = (windows.tumbling(_events(spark, sf_dir), "ts", HOUR_MS)
           .groupBy(F.col("event_type"),
                    F.col("window_start").alias("bucket"))
           .agg(F.count("*").alias("n"), dsum("value").alias("sum_value")))
    out = windows.gapfill_locf(agg, "event_type", "bucket", HOUR_MS,
                               ["n", "sum_value"])
    return out.select("event_type", "bucket", "n", "sum_value", "is_gap")


EWMA_ALPHA = 0.3


@register(
    "ewma_value_per_user",
    oracle=f"""
    WITH RECURSIVE ordered AS (
        SELECT user_id, ts, event_id, value,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS seq
        FROM events),
    walk(user_id, seq, ts, value, s) AS (
        SELECT user_id, seq, ts, value, value FROM ordered WHERE seq = 1
        UNION ALL
        SELECT o.user_id, o.seq, o.ts, o.value,
               {EWMA_ALPHA} * o.value + {1 - EWMA_ALPHA} * w.s
        FROM walk w JOIN ordered o
          ON o.user_id = w.user_id AND o.seq = w.seq + 1)
    SELECT user_id, ts, value, ROUND(s, 6) AS ewma FROM walk
    """,
    tags=("W8", "ewma", "2.11"),
)
def q_ewma_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user EWMA of event values (alpha=0.3), ties broken on
    event_id — the sequential-state smoothing primitive, one shuffle on
    the key + a linear Arrow pass per group. The oracle recurses the
    identical fold; both engines compute the same two IEEE products and
    one sum per step, so the 6dp rounding is a guard, not a fudge."""
    ev = tables.load_table(spark, sf_dir, "events")
    return windows.ewma(ev, "user_id", "ts", "value", EWMA_ALPHA,
                        order_tiebreak="event_id")


@register(
    "ewma_segmented_per_user",
    oracle=f"""
    WITH RECURSIVE ordered AS (
        SELECT user_id, ts, event_id, value,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS seq
        FROM events),
    walk(user_id, seq, ts, value, s) AS (
        SELECT user_id, seq, ts, value, value FROM ordered WHERE seq = 1
        UNION ALL
        SELECT o.user_id, o.seq, o.ts, o.value,
               {EWMA_ALPHA} * o.value + {1 - EWMA_ALPHA} * w.s
        FROM walk w JOIN ordered o
          ON o.user_id = w.user_id AND o.seq = w.seq + 1)
    SELECT user_id, ts, value, ROUND(s, 6) AS ewma FROM walk
    """,
    tags=("W8", "ewma", "2.11", "segmented-scan"),
)
def q_ewma_segmented_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The hot-key EWMA fallback (windows.ewma_segmented), driver-
    checked against the SAME sequential-recurrence oracle as
    ewma_value_per_user: segment each user's timeline into 8
    contiguous time ranges, fold each segment to its affine (A, B)
    composition, combine the per-key summaries, then re-run the scan
    per segment from the assigned incoming state. Three linear passes,
    max task = rows/segment — the shape that survives a 10^8-rows/key
    skew. Hash-matching the one-pass oracle at 6dp demonstrates the
    affine composition is numerically faithful, not just approximately
    right."""
    ev = tables.load_table(spark, sf_dir, "events")
    out = windows.ewma_segmented(ev, "user_id", "ts", "value",
                                 EWMA_ALPHA, order_tiebreak="event_id",
                                 n_segments=8)
    return out.select("user_id", "ts", "value", "ewma")


@register(
    "interval_coverage_supplier",
    oracle="""
    WITH base AS (
        SELECT l_suppkey, CAST(l_shipdate AS DATE) AS s,
               CAST(l_shipdate AS DATE)
                   + CAST(l_orderkey % 15 AS INTEGER) AS e
        FROM lineitem),
    marked AS (
        SELECT l_suppkey, s, e,
               CASE WHEN MAX(e) OVER (
                        PARTITION BY l_suppkey ORDER BY s, e
                        ROWS BETWEEN UNBOUNDED PRECEDING
                                 AND 1 PRECEDING) IS NULL
                      OR s > MAX(e) OVER (
                        PARTITION BY l_suppkey ORDER BY s, e
                        ROWS BETWEEN UNBOUNDED PRECEDING
                                 AND 1 PRECEDING)
                    THEN 1 ELSE 0 END AS is_new
        FROM base),
    isl AS (
        SELECT l_suppkey, s, e,
               SUM(is_new) OVER (PARTITION BY l_suppkey
                                 ORDER BY s, e
                                 ROWS BETWEEN UNBOUNDED PRECEDING
                                          AND CURRENT ROW) AS isl_id
        FROM marked),
    merged AS (
        SELECT l_suppkey, isl_id, MIN(s) AS ms, MAX(e) AS me,
               COUNT(*) AS n
        FROM isl GROUP BY l_suppkey, isl_id)
    SELECT l_suppkey,
           CAST(SUM(n) AS BIGINT) AS n_intervals,
           CAST(COUNT(*) AS BIGINT) AS n_islands,
           CAST(SUM(me - ms + 1) AS BIGINT) AS covered_days,
           CAST(MAX(me - ms + 1) AS INTEGER) AS max_island_days
    FROM merged GROUP BY l_suppkey
    """,
    tags=("W8", "windows", "islands", "bi"),
)
def q_interval_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merged-interval coverage per supplier
    (operators/windows.interval_coverage): overlap-merging
    gaps-and-islands with a growing-frame running MAX(end), union day
    counts inclusive. The fixture lineitem carries only l_shipdate, so
    the span end derives deterministically as shipdate + orderkey % 15
    days (both engines compute it identically; DuckDB date + int is
    day arithmetic, matching Spark's date_add), giving spans from 1 to
    15 days that genuinely nest and chain."""
    li = (tables.load_table(spark, sf_dir, "lineitem")
          .withColumn("__start", F.to_date("l_shipdate"))
          .withColumn("__end", F.date_add(
              F.col("__start"),
              (F.col("l_orderkey") % 15).cast("int"))))
    return windows.interval_coverage(li, "l_suppkey",
                                     "__start", "__end")
