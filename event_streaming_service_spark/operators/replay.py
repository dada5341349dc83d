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

from datetime import datetime, timezone

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _wall_to_micros(ts_str: str) -> int:
    """Naive wall-clock literal -> epoch micros (the fixture's stored
    values are naive wall-clock; see sources/tables.py)."""
    dt = datetime.fromisoformat(ts_str).replace(tzinfo=timezone.utc)
    return int(dt.timestamp() * 1_000_000)


def nanos_range(from_ts: str, to_ts: str, nanos_col: str = "__ts_nanos") -> Column:
    """Pushdown-capable twin of `ts BETWEEN from AND to` on the raw
    nanos long: ts = floor(ns/1000) as wall-clock, so
    ts >= F  <=>  ns >= F_us*1000   and   ts <= T  <=>  ns <= T_us*1000+999
    — exact integer equivalence, and a plain column predicate the
    parquet reader prunes row groups with."""
    lo = _wall_to_micros(from_ts) * 1000
    hi = _wall_to_micros(to_ts) * 1000 + 999
    return F.col(nanos_col).between(lo, hi)


def time_range_predicate(df: DataFrame, from_ts: str, to_ts: str,
                         nanos_col: str = "__ts_nanos",
                         ts_col: str = "ts") -> Column:
    """`ts BETWEEN from AND to` in whichever form reaches the parquet
    scan for this frame's storage layout: the raw-nanos twin when the
    fixture stores TIMESTAMP(NANOS) (surfaced as a long + `nanos_col`,
    where a predicate on the converted expression could NOT push down),
    else a plain column predicate on the natively-read `ts_col` (Spark
    casts the literal, not the column, so pushdown survives either
    timezone flavor). Both column names are parameters so frames with
    non-default layouts dispatch on THEIR nanos column instead of
    silently falling through to the non-pushdown branch."""
    if nanos_col in df.columns:
        return nanos_range(from_ts, to_ts, nanos_col)
    return (F.col(ts_col) >= F.lit(from_ts).cast("timestamp")) & (
        F.col(ts_col) <= F.lit(to_ts).cast("timestamp"))


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
    as a pushed-down range filter; P5 optional ReplayFilter (:107-111).

    When the raw nanos column is present the range predicate targets it
    (exact equivalent) so it reaches the parquet scan — predicates on
    the converted timestamp expression cannot push down.
    """
    out = events_coords.filter(
        time_range_predicate(events_coords, from_ts, to_ts))
    if filter_expr is not None:
        out = out.filter(filter_expr)
    return with_provenance(out, replay_ts)


def replay_offset_range(events_coords: DataFrame, partition: int,
                        from_offset: int, to_offset: int,
                        replay_ts: str, topic: str | None = None) -> DataFrame:
    """S6: offset-range replay — `assign + seek(from)` poll loop until
    `offset > toOffset` (EventReplayService.java:152-207). The seek is
    on a TopicPartition, so pass `topic` to scope the range to one log
    (None = every topic's partition, for cross-topic sweeps)."""
    pred = ((F.col("partition") == partition)
            & F.col("offset").between(from_offset, to_offset))
    if topic is not None:
        pred = pred & (F.col("topic") == topic)
    return with_provenance(events_coords.filter(pred), replay_ts)


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
