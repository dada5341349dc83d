"""Replay-scan queries S5-S7 + P5 (SURVEY.md sections 2.1, 3.3)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from event_streaming_service_spark.operators import replay
from event_streaming_service_spark.queries import register
from event_streaming_service_spark.sources import tables

REPLAY_TS = "2024-02-01 00:00:00"

_BASE = "WITH " + tables.EVENTS_COORDS_SQL


def _coords(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tables.with_coordinates(tables.load_table(spark, sf_dir, "events"))


@register(
    "replay_time_range",
    oracle=_BASE + f"""
    SELECT event_id, ts, topic, "partition", "offset",
           topic AS replay_original_topic,
           "partition" AS replay_original_partition,
           "offset" AS replay_original_offset,
           TIMESTAMP '{REPLAY_TS}' AS replay_timestamp
    FROM events_coords
    WHERE ts >= TIMESTAMP '2024-01-10 00:00:00'
      AND ts <= TIMESTAMP '2024-01-15 00:00:00'
      AND value > 50.0
    """,
    tags=("S5", "P5"),
)
def q_replay_time_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S5: time-range replay with a P5 ReplayFilter (value > 50); the
    seek collapses to a pushed-down ts-range predicate."""
    out = replay.replay_time_range(
        _coords(spark, sf_dir),
        "2024-01-10 00:00:00", "2024-01-15 00:00:00",
        REPLAY_TS, filter_expr=F.col("value") > 50.0)
    return out.select(
        "event_id", "ts", "topic", "partition", "offset",
        "replay_original_topic", "replay_original_partition",
        "replay_original_offset", "replay_timestamp")


@register(
    "replay_offset_range",
    oracle=_BASE + f"""
    SELECT event_id, ts, topic, "partition", "offset",
           TIMESTAMP '{REPLAY_TS}' AS replay_timestamp
    FROM events_coords
    WHERE topic = 'nnipa.events.view'
      AND "partition" = 2 AND "offset" BETWEEN 100 AND 600
    """,
    tags=("S6",),
)
def q_replay_offset_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S6: offset-range replay on one TopicPartition
    (EventReplayService.java:152-207)."""
    out = replay.replay_offset_range(_coords(spark, sf_dir), 2, 100, 600,
                                     REPLAY_TS, topic="nnipa.events.view")
    return out.select("event_id", "ts", "topic", "partition", "offset",
                      "replay_timestamp")


@register(
    "replay_slice",
    oracle=_BASE + f"""
    SELECT 'time_range' AS mode, event_id, ts, topic, "partition", "offset",
           TIMESTAMP '{REPLAY_TS}' AS replay_timestamp
    FROM events_coords
    WHERE ts >= TIMESTAMP '2024-01-10 00:00:00'
      AND ts <= TIMESTAMP '2024-01-15 00:00:00'
      AND value > 50.0
    UNION ALL
    SELECT 'offset_range', event_id, ts, topic, "partition", "offset",
           TIMESTAMP '{REPLAY_TS}'
    FROM events_coords
    WHERE topic = 'nnipa.events.view'
      AND "partition" = 2 AND "offset" BETWEEN 100 AND 600
    """,
    tags=("S5", "S6", "P5"),
)
def q_replay_slice(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S5+S6+P5: both replay modes over one log scan — a time-range seek
    with a ReplayFilter predicate, and an offset-range seek on one
    TopicPartition, tagged by mode (EventReplayService.java:101-207).
    Each branch's predicate pushes to the scan independently."""
    ec = _coords(spark, sf_dir)
    cols = ["event_id", "ts", "topic", "partition", "offset",
            "replay_timestamp"]
    t = replay.replay_time_range(
        ec, "2024-01-10 00:00:00", "2024-01-15 00:00:00",
        REPLAY_TS, filter_expr=F.col("value") > 50.0
    ).select(F.lit("time_range").alias("mode"), *cols)
    o = replay.replay_offset_range(
        ec, 2, 100, 600, REPLAY_TS, topic="nnipa.events.view"
    ).select(F.lit("offset_range").alias("mode"), *cols)
    return t.unionByName(o)


@register(
    "topic_offset_catalog",
    oracle=_BASE + """
    , probe AS (
        SELECT topic, "partition",
               MIN("offset") AS beginning_offset,
               MAX("offset") AS end_offset,
               MAX("offset") - MIN("offset") + 1 AS total_messages
        FROM events_coords GROUP BY topic, "partition"
    )
    SELECT topic, "partition", beginning_offset, end_offset, total_messages
    FROM probe
    UNION ALL
    SELECT topic, -1, MIN(beginning_offset), MAX(end_offset),
           CAST(SUM(total_messages) AS BIGINT)
    FROM probe GROUP BY topic
    """,
    tags=("S7", "A4"),
)
def q_topic_offset_catalog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S7+A4: the offset catalog at both grains — per-partition
    beginning/end offsets (EventReplayService.java:212-227) and the
    per-topic message count rolled up from them (partition = -1 rows,
    TopicManagementService.java:439-475). Two-level partial aggregation;
    the topic level re-aggregates 6 rows per topic, not the log."""
    probe = replay.offset_probe(_coords(spark, sf_dir))
    topic_level = (probe.groupBy("topic").agg(
        F.min("beginning_offset").alias("beginning_offset"),
        F.max("end_offset").alias("end_offset"),
        F.sum("total_messages").cast("bigint").alias("total_messages"))
        .withColumn("partition", F.lit(-1)))
    return probe.unionByName(topic_level.select(probe.columns))


@register(
    "offset_probe",
    oracle=_BASE + """
    SELECT topic, "partition",
           MIN("offset") AS beginning_offset,
           MAX("offset") AS end_offset,
           MAX("offset") - MIN("offset") + 1 AS total_messages
    FROM events_coords GROUP BY topic, "partition"
    """,
    tags=("S7",),
)
def q_offset_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S7: beginning/end offsets per (topic, partition)."""
    return replay.offset_probe(_coords(spark, sf_dir))
