"""Consume-pipeline queries: validation, DLQ decoration, dedup, retry
routing (SURVEY.md P3/P4, S3, D1, W5/W6).

Event ids with synthesized holes (empty / NULL) exercise the reject
branches; a modulo-folded dup_key synthesizes duplicates for D1. A
fixed "now" (2024-02-03, a few days past the fixture's last event)
makes the 7-day staleness window deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from event_streaming_service_spark.operators import pipeline
from event_streaming_service_spark.queries import register
from event_streaming_service_spark.sources import tables

NOW = "2024-02-03 00:00:00"

_VALIDATION_INPUT_SQL = """
validation_input AS (
    SELECT event_id, ts, user_id, event_type, value,
           'nnipa.events.' || event_type AS topic,
           CASE WHEN event_id % 13 = 0 THEN ''
                WHEN event_id % 17 = 0 THEN NULL
                ELSE 'evt-' || CAST(event_id AS VARCHAR) END AS event_key
    FROM events
)
"""


def validation_input(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = tables.load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id", "ts", "user_id", "event_type", "value",
        F.concat(F.lit("nnipa.events."), F.col("event_type")).alias("topic"),
        F.when(F.col("event_id") % 13 == 0, F.lit(""))
         .when(F.col("event_id") % 17 == 0, F.lit(None).cast("string"))
         .otherwise(F.concat(F.lit("evt-"), F.col("event_id").cast("string")))
         .alias("event_key"),
    )


@register(
    "validation_rejects",
    oracle="WITH " + _VALIDATION_INPUT_SQL + f"""
    SELECT event_id, reject_reason,
           'nnipa.dlq.' || event_type AS dlq_topic,
           reject_reason AS error_message,
           'ValidationException' AS error_class,
           SUBSTRING('ValidationException: ' || reject_reason, 1, 1000)
               AS error_stacktrace
    FROM (
        SELECT *,
               CASE WHEN event_key IS NULL OR event_key = ''
                        THEN 'missing_event_id'
                    WHEN ts < TIMESTAMP '{NOW}' - INTERVAL 7 DAY
                        THEN 'stale_event'
                    ELSE NULL END AS reject_reason
        FROM validation_input
    ) WHERE reject_reason IS NOT NULL
    """,
    tags=("P3", "S3"),
)
def q_validation_rejects(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P3 + S3: the reject branch, decorated for the DLQ
    (BaseEventConsumer.java:136-163 -> EventPublisher.java:163-201)."""
    df = validation_input(spark, sf_dir)
    now = F.lit(NOW).cast("timestamp")
    _, invalid = pipeline.split_valid_invalid(df, "event_key", "ts", now)
    return pipeline.to_dlq(invalid).select(
        "event_id", "reject_reason", "dlq_topic",
        "error_message", "error_class", "error_stacktrace")


@register(
    "validation_summary",
    oracle="WITH " + _VALIDATION_INPUT_SQL + f"""
    SELECT COALESCE(CASE WHEN event_key IS NULL OR event_key = ''
                             THEN 'missing_event_id'
                         WHEN ts < TIMESTAMP '{NOW}' - INTERVAL 7 DAY
                             THEN 'stale_event'
                         ELSE NULL END, 'ok') AS outcome,
           COUNT(*) AS n
    FROM validation_input GROUP BY 1
    """,
    tags=("P3", "A6"),
)
def q_validation_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P3 as an outcome histogram — the reference's accept/reject counters."""
    df = validation_input(spark, sf_dir)
    now = F.lit(NOW).cast("timestamp")
    outcome = F.coalesce(
        pipeline.rejection_reason(F.col("event_key"), F.col("ts"), now),
        F.lit("ok"))
    return df.select(outcome.alias("outcome")).groupBy("outcome").count().withColumnRenamed("count", "n")


@register(
    "pipeline_dispositions",
    oracle="WITH " + _VALIDATION_INPUT_SQL + f""",
    base AS (
        SELECT *, CAST(event_id % 5 AS INTEGER) AS retry_count,
               CASE WHEN event_key IS NULL OR event_key = ''
                        THEN 'missing_event_id'
                    WHEN ts < TIMESTAMP '{NOW}' - INTERVAL 7 DAY
                        THEN 'stale_event'
                    ELSE NULL END AS reject_reason
        FROM validation_input
    )
    SELECT event_id,
           CASE WHEN reject_reason IS NOT NULL THEN 'reject'
                WHEN retry_count >= 3 THEN 'exhausted'
                WHEN retry_count > 0 THEN 'retry'
                ELSE 'ok' END AS disposition,
           CASE WHEN reject_reason IS NOT NULL THEN 'nnipa.dlq.' || event_type
                WHEN retry_count >= 3 THEN 'nnipa.dlq.' || event_type
                WHEN retry_count > 0
                    THEN 'nnipa.events.' || event_type || '.retry.'
                         || CAST(retry_count + 1 AS VARCHAR)
                ELSE topic END AS target_topic,
           CASE WHEN reject_reason IS NULL AND retry_count BETWEEN 1 AND 2
                THEN LEAST(POW(2, retry_count - 1) * 1000, 60000)
                END AS backoff_ms,
           reject_reason
    FROM base
    """,
    tags=("P3", "S3", "W5", "W6"),
)
def q_pipeline_dispositions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P3/S3/W5/W6: the whole consume-pipeline decision per event —
    validation reject -> DLQ topic, retries-exhausted -> DLQ, transient
    failure -> next retry topic with backoff, else deliver — as one
    branch-free projection (BaseEventConsumer.java:136-276). At 100 TB
    the classification rides the scan; the per-disposition fan-out is a
    partitioned write, not four passes."""
    df = (validation_input(spark, sf_dir)
          .withColumn("retry_count", (F.col("event_id") % 5).cast("int")))
    now = F.lit(NOW).cast("timestamp")
    reject = pipeline.rejection_reason(F.col("event_key"), F.col("ts"), now)
    retrying = reject.isNull() & (F.col("retry_count") > 0)
    return df.select(
        "event_id",
        F.when(reject.isNotNull(), F.lit("reject"))
         .when(F.col("retry_count") >= 3, F.lit("exhausted"))
         .when(F.col("retry_count") > 0, F.lit("retry"))
         .otherwise(F.lit("ok")).alias("disposition"),
        F.when(reject.isNotNull() | (F.col("retry_count") >= 3),
               F.concat(F.lit("nnipa.dlq."), F.col("event_type")))
         .when(F.col("retry_count") > 0,
               pipeline.retry_route(F.col("topic"), F.col("retry_count")))
         .otherwise(F.col("topic")).alias("target_topic"),
        F.when(retrying & (F.col("retry_count") < 3),
               pipeline.backoff_ms(F.col("retry_count"))).alias("backoff_ms"),
        reject.alias("reject_reason"),
    )


@register(
    "dedup_earliest",
    oracle="""
    SELECT dup_key, event_id, ts, event_type FROM (
        SELECT CAST(event_id % 800 AS BIGINT) AS dup_key, event_id, ts, event_type,
               ROW_NUMBER() OVER (PARTITION BY event_id % 800
                                  ORDER BY ts, event_id) AS rn
        FROM events
    ) WHERE rn = 1
    """,
    tags=("D1", "D2"),
)
def q_dedup_earliest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D1: idempotent consumption — first occurrence per key wins
    (BaseEventConsumer.java:175-196). dup_key folds event_id so the
    fixture actually contains duplicates."""
    ev = (tables.load_table(spark, sf_dir, "events")
          .withColumn("dup_key", (F.col("event_id") % 800).cast("bigint")))
    return pipeline.dedup_earliest(
        ev, ["dup_key"], ["ts", "event_id"]
    ).select("dup_key", "event_id", "ts", "event_type")


@register(
    "retry_routing",
    oracle="""
    SELECT event_id, retry_count,
           LEAST(POW(2, retry_count - 1) * 1000, 60000) AS backoff_ms,
           CASE WHEN retry_count >= 3 THEN 'nnipa.dlq.' || event_type
                ELSE 'nnipa.events.' || event_type || '.retry.'
                     || CAST(retry_count + 1 AS VARCHAR) END AS next_topic
    FROM (SELECT event_id, event_type,
                 CAST(event_id % 5 AS INTEGER) AS retry_count FROM events)
    """,
    tags=("W5", "W6"),
)
def q_retry_routing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W5/W6: backoff schedule + retry-vs-DLQ routing
    (BaseEventConsumer.java:209-276). Jitter excluded (non-deterministic)."""
    ev = (tables.load_table(spark, sf_dir, "events")
          .withColumn("retry_count", (F.col("event_id") % 5).cast("int"))
          .withColumn("topic", F.concat(F.lit("nnipa.events."), F.col("event_type"))))
    return ev.select(
        "event_id", "retry_count",
        pipeline.backoff_ms(F.col("retry_count")).alias("backoff_ms"),
        pipeline.retry_route(F.col("topic"), F.col("retry_count")).alias("next_topic"),
    )
