"""Kafka wiring tests: envelope decode is fully testable without a
broker; source construction degrades with a clear error when the
kafka package is absent."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from event_streaming_service_spark.sources import kafka as ks


def test_decode_envelope_shape(spark):
    raw = spark.createDataFrame(
        [("k1", '{"event_id": 1, "ts": "2024-01-01T10:00:00", "user_id": 2, '
          '"event_type": "view", "value": 1.5, "props": "{}"}',
          "nnipa.events.view", 3, 42, "2024-01-01 10:00:01")],
        "key string, value string, topic string, partition int, "
        "offset long, ts_s string") \
        .withColumn("timestamp", F.col("ts_s").cast("timestamp")).drop("ts_s")
    out = ks.decode_envelope(raw)
    row = out.first()
    assert row.event_id == 1 and row.user_id == 2
    assert row.event_type == "view" and row.value == 1.5
    assert (row.topic, row.partition, row.offset) == ("nnipa.events.view", 3, 42)


def test_kafka_source_unavailable_is_clear(spark):
    if "spark-sql-kafka" in spark.sparkContext.getConf().get(
            "spark.jars.packages", ""):
        pytest.skip("kafka jars present; source would construct")
    with pytest.raises(ks.KafkaUnavailable, match="kafka source unavailable"):
        ks.read_kafka_events(spark, "localhost:9092", "t")