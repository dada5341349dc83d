"""Scalar-function inventory (SURVEY.md section 2.9).

Every scalar the reference computes per record maps to a built-in
`pyspark.sql.functions` call — JVM-side, codegen'd, no Python in the
hot path. This module collects the non-obvious ones as named helpers;
trivial 1:1 mappings (lower, length, concat, substring...) are used
inline at call sites.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def strip_topic_prefix(topic: Column, prefix: str = "nnipa.events.") -> Column:
    """`topic.replace("nnipa.events.", "")` (EventPublisher.java:168)."""
    return F.replace(topic, F.lit(prefix), F.lit(""))


def idempotency_key(consumer: Column, event_id: Column) -> Column:
    """`"event:processed:%s:%s"` (BaseEventConsumer.java:202-203)."""
    return F.format_string("event:processed:%s:%s", consumer, event_id)


def subject_for_topic(topic: Column, kind: str = "value") -> Column:
    """Schema-registry subject naming `topic + "-value"`
    (SchemaRegistryService.java:281)."""
    return F.concat(topic, F.lit(f"-{kind}"))


def wall_clock_millis(ts: Column) -> Column:
    """Epoch millis of a timestamp's *rendered wall clock* — session-tz
    invariant, so it equals DuckDB's epoch_ms of the same naive value
    (the reference's Timestamps.toMillis, BaseEventConsumer.java:151)."""
    return F.unix_millis(F.from_utc_timestamp(ts, F.expr("current_timezone()")))


def millis_to_ts(ms: Column) -> Column:
    """Timestamps.fromMillis (EventPublisher.java:135), rendered
    session-tz invariantly (the inverse of wall_clock_millis)."""
    return F.to_utc_timestamp(F.timestamp_millis(ms), F.expr("current_timezone()"))


def truncate(col: Column, limit: int = 1000) -> Column:
    """Stacktrace truncation (EventPublisher.java:177-180)."""
    return F.substring(col, 1, limit)
