"""EventEnvelope queries: nested metadata struct + headers map (P1/P2).

The reference wraps every payload in an EventEnvelope before publishing
(model/EventEnvelope.java:21-31) whose protobuf contract is the 10-field
EventMetadata message (common.proto:38-49). `operators/envelope.py`
materializes that shape as real Spark nested types; the query here
proves the round trip — build the envelope, then read it back through
nested-field projection (`metadata.tenant_id`) and map access
(`headers['event.id']`), the two access paths a consumer uses.

Scale: Catalyst's nested-schema pruning pushes the projection into the
scan, so reading two metadata leaves out of a 100 TB envelope table
reads two leaf columns, not the whole struct.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from event_streaming_service_spark.operators import envelope
from event_streaming_service_spark.queries import register
from event_streaming_service_spark.sources import tables


@register(
    "envelope_projection",
    oracle="""
    SELECT 'nnipa.events.' || event_type AS topic,
           'evt-' || CAST(event_id AS VARCHAR) AS event_id,
           'corr-' || CAST(event_id % 1000 AS VARCHAR) AS correlation_id,
           'nnipa-' || event_type || '-service' AS source_service,
           ts AS event_ts,
           CAST(1 + event_id % 3 AS INTEGER) AS version,
           'tenant-' || CAST(user_id % 10 AS VARCHAR) AS tenant_id,
           'user-' || CAST(user_id AS VARCHAR) AS user_id,
           CASE CAST(event_id % 4 AS INTEGER)
               WHEN 1 THEN 'PRIORITY_MEDIUM'
               WHEN 2 THEN 'PRIORITY_HIGH'
               WHEN 3 THEN 'PRIORITY_CRITICAL'
               ELSE 'PRIORITY_LOW' END AS priority,
           CASE WHEN event_type = 'error'
                THEN CAST(event_id % 3 AS INTEGER)
                ELSE 0 END AS retry_count,
           'evt-' || CAST(event_id AS VARCHAR) AS hdr_event_id,
           event_type AS hdr_event_type,
           value
    FROM events
    """,
    tags=("P1", "P2"),
)
def q_envelope_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P2: build the nested EventEnvelope, then project through it —
    `metadata.*` struct-field access + `headers['event.id']` map lookup
    (model/EventEnvelope.java:21-31, common.proto:38-49). The oracle
    re-derives every leaf from the flat fixture, so a hash match proves
    the nested construction AND the nested access are lossless."""
    ec = tables.with_coordinates(tables.load_table(spark, sf_dir, "events"))
    env = envelope.build_envelope(ec)
    return env.select(
        "topic",
        F.col("metadata.event_id").alias("event_id"),
        F.col("metadata.correlation_id").alias("correlation_id"),
        F.col("metadata.source_service").alias("source_service"),
        F.col("metadata.timestamp").alias("event_ts"),
        F.col("metadata.version").alias("version"),
        F.col("metadata.tenant_id").alias("tenant_id"),
        F.col("metadata.user_id").alias("user_id"),
        F.col("metadata.priority").alias("priority"),
        F.col("metadata.retry_count").alias("retry_count"),
        F.element_at("headers", F.lit("event.id")).alias("hdr_event_id"),
        F.element_at("headers", F.lit("event.type")).alias("hdr_event_type"),
        F.col("payload.value").alias("value"),
    )
