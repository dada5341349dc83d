"""Routing-strategy queries (SURVEY.md section 2.3, R1-R10).

The fixtures carry no Kafka metadata, so a deterministic "routing
input" is synthesized from `events`: tenant/user/correlation keys with
empty-string holes (to exercise every fallback branch the reference
has, PartitionKeyExtractor.java:31-87) and an event-class name that
hits each CUSTOM dispatch arm. The derivation is defined twice — once
as Spark columns, once as SQL — and the oracle checks they agree.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from event_streaming_service_spark.operators import routing, rules
from event_streaming_service_spark.queries import register
from event_streaming_service_spark.sources import tables

# Maps fixture event_type -> a reference event-class simple name, chosen
# so every branch of CUSTOM dispatch (Tenant / User|Auth / Notification /
# else) is exercised (PartitionKeyExtractor.java:98-116).
_CLASS_FOR_TYPE = {
    "signup": "TenantCreatedEvent",
    "click": "UserLoginEvent",
    "purchase": "AuthTokenGeneratedEvent",
    "view": "NotificationSentEvent",
    "error": "SystemErrorEvent",
}


def routing_input(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = tables.load_table(spark, sf_dir, "events")
    cls = F.lit(None).cast("string")
    for etype, cname in _CLASS_FOR_TYPE.items():
        cls = F.when(F.col("event_type") == etype, F.lit(cname)).otherwise(cls)
    return ev.select(
        "event_id",
        F.when(F.col("event_id") % 11 == 0, F.lit(""))
         .otherwise(F.concat(F.lit("tenant-"), (F.col("user_id") % 10).cast("string")))
         .alias("tenant_id"),
        F.when(F.col("event_id") % 7 == 0, F.lit(""))
         .otherwise(F.concat(F.lit("user-"), F.col("user_id").cast("string")))
         .alias("user_key"),
        F.when(F.col("event_id") % 5 == 0, F.lit(""))
         .otherwise(F.concat(F.lit("corr-"), (F.col("event_id") % 1000).cast("string")))
         .alias("correlation_id"),
        F.when(F.col("event_id") % 4 == 0, F.lit("PRIORITY_HIGH"))
         .when(F.col("event_id") % 4 == 1, F.lit("PRIORITY_LOW"))
         .otherwise(F.lit(None).cast("string"))
         .alias("priority"),
        F.concat(F.lit("evt-"), F.col("event_id").cast("string")).alias("event_key"),
        cls.alias("event_class"),
    )


_ROUTING_INPUT_SQL = """
routing_input AS (
    SELECT
        event_id,
        CASE WHEN event_id % 11 = 0 THEN ''
             ELSE 'tenant-' || CAST(user_id % 10 AS VARCHAR) END AS tenant_id,
        CASE WHEN event_id % 7 = 0 THEN ''
             ELSE 'user-' || CAST(user_id AS VARCHAR) END AS user_key,
        CASE WHEN event_id % 5 = 0 THEN ''
             ELSE 'corr-' || CAST(event_id % 1000 AS VARCHAR) END AS correlation_id,
        CASE WHEN event_id % 4 = 0 THEN 'PRIORITY_HIGH'
             WHEN event_id % 4 = 1 THEN 'PRIORITY_LOW'
             ELSE NULL END AS priority,
        'evt-' || CAST(event_id AS VARCHAR) AS event_key,
        CASE event_type
            WHEN 'signup' THEN 'TenantCreatedEvent'
            WHEN 'click' THEN 'UserLoginEvent'
            WHEN 'purchase' THEN 'AuthTokenGeneratedEvent'
            WHEN 'view' THEN 'NotificationSentEvent'
            WHEN 'error' THEN 'SystemErrorEvent'
        END AS event_class
    FROM events
)
"""


@register(
    "routing_keys",
    oracle="WITH " + _ROUTING_INPUT_SQL + """
    SELECT
        event_id,
        COALESCE(NULLIF(tenant_id, ''), 'default-tenant') AS key_tenant,
        COALESCE(NULLIF(user_key, ''), NULLIF(tenant_id, ''), 'default-tenant')
            AS key_user,
        COALESCE(NULLIF(correlation_id, ''), event_key) AS key_correlation,
        COALESCE(NULLIF(priority, ''), 'PRIORITY_MEDIUM') AS key_priority,
        event_class AS key_event_type,
        CONCAT_WS(':', COALESCE(NULLIF(tenant_id, ''), 'default'),
                       COALESCE(NULLIF(user_key, ''), 'system')) AS key_composite,
        CASE
            WHEN event_class LIKE '%Tenant%'
                THEN COALESCE(NULLIF(tenant_id, ''), 'default-tenant')
            WHEN event_class LIKE '%User%' OR event_class LIKE '%Auth%'
                THEN CONCAT_WS(':', COALESCE(NULLIF(tenant_id, ''), 'default'),
                                    COALESCE(NULLIF(user_key, ''), 'system'))
            WHEN event_class LIKE '%Notification%'
                THEN COALESCE(NULLIF(user_key, ''), 'default-user')
            ELSE COALESCE(NULLIF(correlation_id, ''), event_key)
        END AS key_custom
    FROM routing_input
    """,
    tags=("R1", "R2", "R3", "R4", "R5", "R6", "R8", "R11"),
)
def q_routing_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R1-R8: every deterministic strategy as a column over the same input."""
    df = routing_input(spark, sf_dir)
    return df.select(
        "event_id",
        routing.tenant_based().alias("key_tenant"),
        routing.user_based().alias("key_user"),
        routing.correlation_based().alias("key_correlation"),
        routing.priority_based().alias("key_priority"),
        routing.event_type_based().alias("key_event_type"),
        routing.composite().alias("key_composite"),
        routing.custom().alias("key_custom"),
    )


@register(
    "routing_partitions",
    oracle="WITH " + _ROUTING_INPUT_SQL + """,
    keyed AS (
        SELECT event_id,
               COALESCE(NULLIF(tenant_id, ''), 'default-tenant') AS key
        FROM routing_input
    )
    SELECT event_id, key,
           CAST((LENGTH(key) * 31 + ASCII(SUBSTRING(key, 1, 1))
                 + ASCII(SUBSTRING(key, LENGTH(key), 1)) * 7) % 6 AS INTEGER)
               AS partition_id,
           LENGTH(key) >= 8 AND NOT regexp_matches(key, '^[0-9]+$')
               AS well_balanced
    FROM keyed
    """,
    tags=("R9", "R10"),
)
def q_routing_partitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R9/R10: portable hash-partition assignment + key-balance heuristic.

    The production path uses Spark murmur3 (`routing.partition_for`,
    unit-tested separately); this oracle-checkable twin proves the
    contract: deterministic key -> stable partition in [0, n).
    """
    df = routing_input(spark, sf_dir)
    key = routing.tenant_based()
    return df.select(
        "event_id",
        key.alias("key"),
        routing.portable_partition_for(key).alias("partition_id"),
        routing.is_well_balanced_key(key).alias("well_balanced"),
    )


@register(
    "routing_surface",
    oracle="WITH " + _ROUTING_INPUT_SQL + """
    SELECT
        event_id,
        COALESCE(NULLIF(tenant_id, ''), 'default-tenant') AS key_tenant,
        COALESCE(NULLIF(user_key, ''), NULLIF(tenant_id, ''), 'default-tenant')
            AS key_user,
        COALESCE(NULLIF(correlation_id, ''), event_key) AS key_correlation,
        COALESCE(NULLIF(priority, ''), 'PRIORITY_MEDIUM') AS key_priority,
        event_class AS key_event_type,
        CONCAT_WS(':', COALESCE(NULLIF(tenant_id, ''), 'default'),
                       COALESCE(NULLIF(user_key, ''), 'system')) AS key_composite,
        CASE
            WHEN event_class LIKE '%Tenant%'
                THEN COALESCE(NULLIF(tenant_id, ''), 'default-tenant')
            WHEN event_class LIKE '%User%' OR event_class LIKE '%Auth%'
                THEN CONCAT_WS(':', COALESCE(NULLIF(tenant_id, ''), 'default'),
                                    COALESCE(NULLIF(user_key, ''), 'system'))
            WHEN event_class LIKE '%Notification%'
                THEN COALESCE(NULLIF(user_key, ''), 'default-user')
            ELSE COALESCE(NULLIF(correlation_id, ''), event_key)
        END AS key_custom,
        CAST((LENGTH(COALESCE(NULLIF(tenant_id, ''), 'default-tenant')) * 31
              + ASCII(SUBSTRING(COALESCE(NULLIF(tenant_id, ''), 'default-tenant'), 1, 1))
              + ASCII(SUBSTRING(COALESCE(NULLIF(tenant_id, ''), 'default-tenant'),
                                LENGTH(COALESCE(NULLIF(tenant_id, ''), 'default-tenant')), 1)) * 7)
             % 6 AS INTEGER) AS partition_id,
        LENGTH(COALESCE(NULLIF(tenant_id, ''), 'default-tenant')) >= 8
            AND NOT regexp_matches(COALESCE(NULLIF(tenant_id, ''), 'default-tenant'),
                                   '^[0-9]+$') AS well_balanced
    FROM routing_input
    """,
    tags=("R1", "R2", "R3", "R4", "R5", "R6", "R8", "R9", "R10", "R11"),
)
def q_routing_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R1-R11 end-to-end: every key strategy AND the partition the
    tenant key lands on, plus the balance heuristic — the full
    EventPublisher routing decision as one narrow projection
    (PartitionKeyExtractor.java:31-116), no shuffle, codegen'd."""
    df = routing_input(spark, sf_dir)
    key = routing.tenant_based()
    return df.select(
        "event_id",
        key.alias("key_tenant"),
        routing.user_based().alias("key_user"),
        routing.correlation_based().alias("key_correlation"),
        routing.priority_based().alias("key_priority"),
        routing.event_type_based().alias("key_event_type"),
        routing.composite().alias("key_composite"),
        routing.custom().alias("key_custom"),
        routing.portable_partition_for(key).alias("partition_id"),
        routing.is_well_balanced_key(key).alias("well_balanced"),
    )


@register(
    "routing_rule_fanout",
    oracle="""
    SELECT event_id, event_type, value,
           value * 2 AS boosted,
           'high-value' AS priority_tag,
           'nnipa.events.priority' AS target_topic,
           'tenant-' || CAST(user_id % 10 AS VARCHAR) AS key
    FROM events
    WHERE value > 400.0 AND event_type IN ('purchase', 'signup')
    """,
    tags=("P8",),
)
def q_routing_rule(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P8: a declarative EventRoutingRule (condition string +
    transformations map) compiled into the plan via F.expr — Catalyst
    is the rule evaluator the reference never implemented
    (model/EventRoutingRule.java:16-24)."""
    ev = (tables.load_table(spark, sf_dir, "events")
          .withColumn("tenant_id",
                      F.concat(F.lit("tenant-"),
                               (F.col("user_id") % 10).cast("string"))))
    rule = rules.EventRoutingRule(
        source_topic="nnipa.events.all",
        target_topic="nnipa.events.priority",
        condition="value > 400.0 AND event_type IN ('purchase', 'signup')",
        partition_strategy="TENANT_BASED",
        transformations={"boosted": "value * 2",
                         "priority_tag": "'high-value'"})
    out = rules.apply_rule(ev, rule)
    return out.select("event_id", "event_type", "value", "boosted",
                      "priority_tag", "target_topic", "key")
