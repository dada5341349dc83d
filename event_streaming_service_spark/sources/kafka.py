"""Kafka source/sink wiring (S1-S4, W1) — the production deployment of
the streaming layer.

The reference consumes Protobuf-on-Kafka (config/KafkaConfig.java:
107-120, max-poll 500, read_committed) and publishes keyed records with
headers (service/EventPublisher.java:51-104). On Spark those map to the
built-in `kafka` source/sink; this container has no spark-sql-kafka
jars or brokers, so construction is attempted lazily and callers get a
clear error (and tests skip) when the package is absent — the
transformations in streaming/pipeline.py are source-agnostic either way.

Payload decoding: the driver fixtures carry JSON (`props`), so the
envelope decoder is from_json; a Protobuf deployment swaps in
pyspark.sql.protobuf.functions.from_protobuf with the same schema —
one line, same plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from event_streaming_service_spark.streaming.pipeline import EVENT_SCHEMA

MAX_OFFSETS_PER_TRIGGER = 500  # the reference's max-poll (KafkaConfig.java:117)


class KafkaUnavailable(RuntimeError):
    pass


def read_kafka_events(spark: SparkSession, brokers: str, topic: str,
                      starting_offsets: str = "earliest") -> DataFrame:
    """W1/S4: micro-batch Kafka consumer with the reference's batch cap,
    read_committed isolation, and envelope decode to EVENT_SCHEMA."""
    try:
        raw = (spark.readStream.format("kafka")
               .option("kafka.bootstrap.servers", brokers)
               .option("subscribe", topic)
               .option("startingOffsets", starting_offsets)
               .option("maxOffsetsPerTrigger", MAX_OFFSETS_PER_TRIGGER)
               .option("kafka.isolation.level", "read_committed")
               .load())
    except Exception as e:  # missing spark-sql-kafka package
        raise KafkaUnavailable(
            "kafka source unavailable (spark-sql-kafka jars not on the "
            "classpath); use streaming/pipeline.read_event_stream for the "
            "file-driven twin") from e
    return decode_envelope(raw)


def decode_envelope(raw: DataFrame) -> DataFrame:
    """Kafka record -> typed event columns + log coordinates — the same
    shape sources/tables.with_coordinates derives for fixtures."""
    value = F.from_json(F.col("value").cast("string"),
                        EVENT_SCHEMA)
    return raw.select(
        F.col("key").cast("string").alias("key"),
        value.alias("event"),
        F.col("topic"), F.col("partition").cast("int"),
        F.col("offset").cast("bigint"),
        F.col("timestamp").alias("kafka_ts"),
    ).select("key", "event.*", "topic", "partition", "offset", "kafka_ts")


def write_kafka(df: DataFrame, brokers: str, topic: str, key_col: str,
                checkpoint_dir: str):
    """S1: keyed publish — key preserves per-key partition ordering
    (EventPublisher.java:67-73); value is the JSON envelope."""
    payload = df.select(
        F.col(key_col).cast("string").alias("key"),
        F.to_json(F.struct(*[c for c in df.columns if c != key_col]))
         .alias("value"))
    try:
        return (payload.writeStream.format("kafka")
                .option("kafka.bootstrap.servers", brokers)
                .option("topic", topic)
                .option("checkpointLocation", checkpoint_dir)
                .start())
    except Exception as e:
        raise KafkaUnavailable("kafka sink unavailable") from e
