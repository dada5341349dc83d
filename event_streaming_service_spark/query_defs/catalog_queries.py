"""Catalog-surface query: topics, consumer groups, subscriptions.

One admin-listing query covering the reference's catalog endpoints:

  * sorted topic list, default-bootstrap topics unioned with live ones
    (TopicManagementService.java:101-144, O1/S9/P6)
  * sorted consumer-group list (TopicManagementService.java:258-261, O2)
  * groups-subscribed-to-topic — a group is subscribed where it has a
    positive committed offset for the topic's log
    (TopicManagementService.java:689-718)

Each row carries an explicit `rank` (row_number over the sort key
within its kind) so the *sortedness* the reference guarantees is part
of the verified data, not lost to the driver's order-insensitive hash.

Scale: topics/groups are catalog metadata (tiny); the subscription leg
is one aggregation over the offsets table — the same shuffle shape as
consumer lag, no joins against the event log itself.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from event_streaming_service_spark.queries import register
from event_streaming_service_spark.sources import tables, topics

_DEFAULTS_VALUES = ", ".join(f"('{cfg.name}')" for cfg in topics.DEFAULT_TOPICS)

_ORACLE = (
    "WITH " + tables.EVENTS_COORDS_SQL + ", " + tables.CONSUMER_OFFSETS_SQL
    + f""",
    topic_rows AS (
        SELECT DISTINCT 'nnipa.events.' || event_type AS name,
               'live' AS detail
        FROM events
        UNION ALL
        SELECT t.name, 'default'
        FROM (VALUES {_DEFAULTS_VALUES}) AS t(name)
    ),
    group_rows AS (SELECT DISTINCT group_id FROM consumer_offsets),
    sub_rows AS (
        SELECT DISTINCT group_id, topic
        FROM consumer_offsets WHERE committed_offset > 0
    )
    SELECT 'topic' AS kind, name, detail,
           CAST(ROW_NUMBER() OVER (ORDER BY name, detail) AS INTEGER) AS rank
    FROM topic_rows
    WHERE NOT starts_with(name, '_')
    UNION ALL
    SELECT 'group', group_id, '',
           CAST(ROW_NUMBER() OVER (ORDER BY group_id) AS INTEGER)
    FROM group_rows
    UNION ALL
    SELECT 'subscription', group_id, topic,
           CAST(ROW_NUMBER() OVER (ORDER BY group_id, topic) AS INTEGER)
    FROM sub_rows
    """
)


def _ordinal(*order_cols) -> F.Column:
    """Global row_number over a CATALOG-sized frame (distinct topics /
    groups — bounded by admin metadata cardinality, never event grain).
    Partitioning on a constant makes the deliberate single-partition
    explicit and keeps WindowExec from warning about an empty partition
    spec; a few thousand catalog rows in one task is the correct plan
    at any data scale."""
    return F.row_number().over(
        Window.partitionBy(F.lit("catalog")).orderBy(*order_cols))


@register(
    "catalog_surface",
    oracle=_ORACLE,
    tags=("O1", "O2", "S9", "P6", "2.10"),
)
def q_catalog_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O1/O2/S9/P6: the admin catalog — sorted topics (defaults ∪ live,
    internal names filtered), sorted consumer groups, and per-topic
    subscriptions derived from committed offsets."""
    ec = tables.with_coordinates(tables.load_table(spark, sf_dir, "events"))
    # tiny (groups x topics x partitions) frame feeding two legs —
    # cached so the events scan + aggregation runs once, not per leg
    co = tables.consumer_offsets(ec).cache()

    live = (ec.select(F.col("topic").alias("name")).distinct()
            .withColumn("detail", F.lit("live")))
    defaults = spark.createDataFrame(
        [(cfg.name,) for cfg in topics.DEFAULT_TOPICS], "name string"
    ).withColumn("detail", F.lit("default"))
    topic_rows = (live.unionByName(defaults)
                  .filter(~F.col("name").startswith("_")))
    topic_rows = topic_rows.select(
        F.lit("topic").alias("kind"), "name", "detail",
        _ordinal("name", "detail").alias("rank"))

    group_rows = (co.select("group_id").distinct().select(
        F.lit("group").alias("kind"),
        F.col("group_id").alias("name"),
        F.lit("").alias("detail"),
        _ordinal("group_id").alias("rank")))

    sub_rows = (co.filter(F.col("committed_offset") > 0)
                .select("group_id", "topic").distinct()
                .select(
                    F.lit("subscription").alias("kind"),
                    F.col("group_id").alias("name"),
                    F.col("topic").alias("detail"),
                    _ordinal("group_id", "topic").alias("rank")))

    return topic_rows.unionByName(group_rows).unionByName(sub_rows)
