"""S10 protobuf wire-format bridge, driver-checked end to end.

The reference serializes event envelopes as protobuf on the Kafka wire
(config/KafkaConfig.java:73-75, 107-114; EventMetadata message). The
engine's jar-free bridge (sources/proto_wire.py) encodes and decodes
that wire format with pure-Python Arrow kernels; this query proves the
WHOLE bridge against an arithmetic oracle:

  * metadata fields are derived deterministically from `events`;
  * `encode_metadata_column` writes real wire bytes (producer side);
  * `decode_metadata_column` parses them back (consumer side);
  * the result carries BOTH the decoded fields and octet_length(wire).

The oracle recomputes the fields directly (roundtrip identity) AND the
exact wire size from proto3 layout rules — tag varint (1 byte for
field numbers <= 15) + length varint (1 byte below 128) + payload,
with default values ('' / 0) omitted — so a codec that cheated the
wire format (wrong tags, missing default-omission, padded output)
hash-mismatches even though the roundtrip would still be the identity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from event_streaming_service_spark.queries import register
from event_streaming_service_spark.sources import proto_wire, tables


@register(
    "proto_wire_roundtrip",
    oracle="""
    WITH m AS (
        SELECT event_id AS eid,
               CAST(event_id AS VARCHAR) AS event_id,
               CASE WHEN event_id % 11 = 0 THEN ''
                    ELSE 'corr-' || CAST(user_id AS VARCHAR)
               END AS correlation_id,
               event_type AS source_service,
               CAST(event_id % 5 AS INTEGER) AS version,
               't' || CAST(user_id % 10 AS VARCHAR) AS tenant_id,
               CAST(user_id AS VARCHAR) AS user_id,
               CAST(event_id % 4 AS INTEGER) AS priority,
               CAST(event_id % 3 AS INTEGER) AS retry_count
        FROM events)
    SELECT eid, event_id, correlation_id, source_service, version,
           tenant_id, user_id, priority, retry_count,
           CAST((2 + length(event_id))
              + (CASE WHEN correlation_id = '' THEN 0
                      ELSE 2 + length(correlation_id) END)
              + (2 + length(source_service))
              + (CASE WHEN version = 0 THEN 0 ELSE 2 END)
              + (2 + length(tenant_id))
              + (2 + length(user_id))
              + (CASE WHEN priority = 0 THEN 0 ELSE 2 END)
              + (CASE WHEN retry_count = 0 THEN 0 ELSE 2 END)
             AS BIGINT) AS wire_len
    FROM m
    """,
    tags=("S10", "proto", "2.11"),
)
def q_proto_wire_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Encode→decode roundtrip of EventMetadata over real protobuf
    wire bytes, plus the wire size checked against proto3 layout
    arithmetic. Every field value and varint in the fixture stays
    below 128, so each tag and each length is exactly one byte — the
    oracle's 2+len / 2-per-int accounting is exact, and a zero int or
    empty string must contribute ZERO bytes (proto3 default
    omission)."""
    ev = tables.load_table(spark, sf_dir, "events")
    meta = ev.select(
        F.col("event_id").alias("eid"),
        F.col("event_id").cast("string").alias("event_id"),
        F.when(F.col("event_id") % 11 == 0, F.lit(""))
         .otherwise(F.concat(F.lit("corr-"),
                             F.col("user_id").cast("string")))
         .alias("correlation_id"),
        F.col("event_type").alias("source_service"),
        (F.col("event_id") % 5).cast("int").alias("version"),
        F.concat(F.lit("t"), (F.col("user_id") % 10).cast("string"))
         .alias("tenant_id"),
        F.col("user_id").cast("string").alias("user_id"),
        (F.col("event_id") % 4).cast("int").alias("priority"),
        (F.col("event_id") % 3).cast("int").alias("retry_count"),
    )
    encoded = proto_wire.encode_metadata_column(meta, out_col="wire")
    decoded = proto_wire.decode_metadata_column(
        encoded.withColumn("wire_len",
                           F.octet_length("wire").cast("bigint")),
        "wire")
    return decoded.select(
        "eid", "event_id", "correlation_id", "source_service",
        "version", "tenant_id", "user_id", "priority", "retry_count",
        "wire_len")
