"""EventEnvelope: the reference's nested wire format, materialized.

The reference wraps every payload in an envelope before publishing
(reference: model/EventEnvelope.java:21-31 — eventId, eventType, source,
tenantId, userId, timestamp, payload, headers, version) and its protobuf
contract carries a 10-field ``EventMetadata`` message (reference:
nnipa-protos common.proto:38-49 — event_id, correlation_id,
source_service, timestamp, version, headers map, tenant_id, user_id,
priority enum, retry_count) plus a Priority enum (common.proto:25-31).

``build_envelope`` produces that shape as real Spark nested types — a
10-field ``metadata`` struct, a ``headers`` map<string,string>, and a
``payload`` struct — derived deterministically from the flat events
fixture so a DuckDB oracle can re-derive every leaf.

Scale: a narrow per-row projection (struct/map construction is
codegen'd JVM-side, no Python, no shuffle); nested-field access like
``metadata.tenant_id`` is pruned by Catalyst's nested-schema pruning
(spark.sql.optimizer.nestedSchemaPruning.enabled, default on), so a
query touching two metadata fields reads only those leaves at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Priority enum names, common.proto:25-31. event_id % 4 cycles through
# the four real levels (UNSPECIFIED is the proto zero-value, never set
# by the publisher).
_PRIORITY_NAMES = [
    "PRIORITY_LOW", "PRIORITY_MEDIUM", "PRIORITY_HIGH", "PRIORITY_CRITICAL",
]


def _priority() -> Column:
    c = F.lit(_PRIORITY_NAMES[0])
    for i, name in enumerate(_PRIORITY_NAMES[1:], start=1):
        c = F.when(F.col("event_id") % 4 == i, F.lit(name)).otherwise(c)
    return c


def build_envelope(events_coords: DataFrame) -> DataFrame:
    """Wrap coordinate-derived events in the reference envelope.

    Input: events + derived coordinates (tables.with_coordinates).
    Output columns:
      topic, event_type        — routing surface (EventPublisher.java:168)
      metadata  struct<10>     — EventMetadata, common.proto:38-49
      headers   map<str,str>   — the publisher's standard header set
      payload   struct         — the domain body (value, props)
    """
    event_id_str = F.concat(F.lit("evt-"), F.col("event_id").cast("string"))
    metadata = F.struct(
        event_id_str.alias("event_id"),
        F.concat(F.lit("corr-"), (F.col("event_id") % 1000).cast("string"))
         .alias("correlation_id"),
        F.concat(F.lit("nnipa-"), F.col("event_type"), F.lit("-service"))
         .alias("source_service"),
        F.col("ts").alias("timestamp"),
        (F.lit(1) + F.col("event_id") % 3).cast("int").alias("version"),
        F.col("tenant_id").alias("tenant_id"),
        F.concat(F.lit("user-"), F.col("user_id").cast("string"))
         .alias("user_id"),
        _priority().alias("priority"),
        F.when(F.col("event_type") == "error",
               (F.col("event_id") % 3).cast("int"))
         .otherwise(F.lit(0)).alias("retry_count"),
    )
    headers = F.create_map(
        F.lit("event.id"), event_id_str,
        F.lit("event.type"), F.col("event_type"),
        F.lit("tenant.id"), F.col("tenant_id"),
    )
    payload = F.struct(
        F.col("value").alias("value"),
        F.col("props").alias("props"),
    )
    return events_coords.select(
        "topic", "event_type",
        metadata.alias("metadata"),
        headers.alias("headers"),
        payload.alias("payload"),
    )
