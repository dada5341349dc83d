"""Replay scans S5-S7 (SURVEY.md section 2.1, 3.3).

The reference replays a topic by seeking: offsetsForTimes per partition,
then a poll loop with a stop predicate (service/EventReplayService.java:
45-147 time-range, :152-207 offset-range, :212-227 offset probe). On a
columnar log the whole seek machinery collapses into predicate pushdown:
a ts-range filter prunes parquet row groups by min/max stats (and
partitions, on a date-partitioned table), so Spark reads only the
replayed span — the same I/O the seek achieves, without custom code.

Replayed records get provenance headers exactly like the reference
(:249-253: original topic/partition/offset + replay timestamp).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_provenance(df: DataFrame, replay_ts: str,
                    target_topic: Column | None = None) -> DataFrame:
    """Replay provenance headers (EventReplayService.java:249-253)."""
    out = (
        df.withColumn("replay_original_topic", F.col("topic"))
        .withColumn("replay_original_partition", F.col("partition"))
        .withColumn("replay_original_offset", F.col("offset"))
        .withColumn("replay_timestamp", F.lit(replay_ts).cast("timestamp"))
    )
    if target_topic is not None:
        out = out.withColumn("topic", target_topic)
    return out


def replay_time_range(events_coords: DataFrame, from_ts: str, to_ts: str,
                      replay_ts: str, filter_expr: Column | None = None) -> DataFrame:
    """S5: time-range replay — `offsetsForTimes` seek + stop predicate
    `record.timestamp() > toTimestamp` (EventReplayService.java:45-147)
    as a pushed-down range filter; P5 optional ReplayFilter (:107-111)."""
    out = events_coords.filter(
        (F.col("ts") >= F.lit(from_ts).cast("timestamp"))
        & (F.col("ts") <= F.lit(to_ts).cast("timestamp")))
    if filter_expr is not None:
        out = out.filter(filter_expr)
    return with_provenance(out, replay_ts)


def replay_offset_range(events_coords: DataFrame, partition: int,
                        from_offset: int, to_offset: int,
                        replay_ts: str) -> DataFrame:
    """S6: offset-range replay — `assign + seek(from)` poll loop until
    `offset > toOffset` (EventReplayService.java:152-207)."""
    out = events_coords.filter(
        (F.col("partition") == partition)
        & F.col("offset").between(from_offset, to_offset))
    return with_provenance(out, replay_ts)


def offset_probe(events_coords: DataFrame) -> DataFrame:
    """S7: beginning/end offsets + total per (topic, partition)
    (EventReplayService.java:212-227, 285-297)."""
    return (
        events_coords.groupBy("topic", "partition")
        .agg(
            F.min("offset").alias("beginning_offset"),
            F.max("offset").alias("end_offset"),
            (F.max("offset") - F.min("offset") + 1).alias("total_messages"),
        )
    )
