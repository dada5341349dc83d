"""Combined-grain governance query (round-4 rotation surface).

The driver verifies the first 50 registry entries; to free slots for
the round-3 operators that had never received a driver row, six small
single-purpose anchors — schema-registry stats (A8), lag health (A11),
latest-version-per-key (A9), tag-dimensioned counters (A6), the A5
listagg rendering, and calendar-month bucketing (2.9) — fold into ONE
union query on the same (kind, k1, k2, n, v, s) shape the existing
catalog_surface / lag_surface / routing_surface queries use. The six
original queries stay registered (and r1-r3 driver-green); this
surface keeps their operator tags inside the driver budget.

Scale: each leg is its own small aggregate; the union is append-only
(no shuffle across legs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from event_streaming_service_spark.functions.scalars import wall_clock_millis
from event_streaming_service_spark.queries import register
from event_streaming_service_spark.query_defs.agg_extra_queries import (
    q_schema_stats,
)
from event_streaming_service_spark.query_defs.join_queries import (
    q_latest_per_user,
)
from event_streaming_service_spark.query_defs.stats_queries import (
    _BASE,
    _LAG_SQL_BODY,
    q_events_by_type_tenant,
    q_health_status,
)
from event_streaming_service_spark.query_defs.window_frame_queries import (
    q_listagg,
    q_orders_by_month,
)

# lazy: F.lit needs an active SparkContext, so these cannot be built at
# module import time (query modules import session-free)
def _NS():
    return F.lit(None).cast("string")


def _NB():
    return F.lit(None).cast("bigint")


def _ND():
    return F.lit(None).cast("double")


@register(
    "governance_surface",
    oracle=_BASE + ", " + _LAG_SQL_BODY + """
    , subjects AS (
        SELECT 'nnipa.events.' || event_type || '-value' AS subject,
               1 + (ascii(SUBSTRING(event_type, 1, 1)) % 3) AS n_versions
        FROM (SELECT DISTINCT event_type FROM events)
        UNION ALL
        SELECT 'nnipa.events.' || event_type || '-key', 1
        FROM (SELECT DISTINCT event_type FROM events)
        WHERE event_type IN ('view', 'click')
    )
    SELECT 'schema' AS kind,
           CASE WHEN ends_with(subject, '-value') THEN 'value'
                WHEN ends_with(subject, '-key') THEN 'key'
                ELSE 'other' END AS k1,
           CAST(NULL AS VARCHAR) AS k2,
           COUNT(*) AS n,
           CAST(SUM(n_versions) AS DOUBLE) AS v,
           CAST(MAX(n_versions) AS VARCHAR) AS s
    FROM subjects GROUP BY 2
    UNION ALL
    SELECT 'health', group_id, NULL, CAST(SUM(lag) AS BIGINT), NULL,
           CASE WHEN SUM(lag) > 5000 THEN 'UNHEALTHY'
                WHEN SUM(lag) > 1000 THEN 'WARNING'
                ELSE 'HEALTHY' END
    FROM lag_table GROUP BY group_id
    UNION ALL
    SELECT 'latest', CAST(user_id AS VARCHAR), event_type, event_id,
           CAST(epoch_ms(ts) AS DOUBLE), NULL
    FROM (SELECT user_id, event_id, ts, event_type,
                 ROW_NUMBER() OVER (PARTITION BY user_id
                                    ORDER BY ts DESC, event_id DESC) AS rn
          FROM events) WHERE rn = 1
    UNION ALL
    SELECT 'counts', event_type, tenant_id, COUNT(*),
           CAST(SUM(CAST(value AS DECIMAL(24,4))) AS DOUBLE), NULL
    FROM events_coords GROUP BY event_type, tenant_id
    UNION ALL
    SELECT 'listagg', tenant_id, NULL, NULL, NULL,
           string_agg(event_type, ',' ORDER BY event_type)
    FROM (SELECT DISTINCT 'tenant-' || CAST(user_id % 10 AS VARCHAR)
                     AS tenant_id, event_type FROM events)
    GROUP BY tenant_id
    UNION ALL
    SELECT 'calendar', strftime(date_trunc('month', o_orderdate), '%Y-%m'),
           o_orderstatus, COUNT(*),
           CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) AS DOUBLE),
           NULL
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY 2, 3
    """,
    tags=("A5", "A6", "A8", "A9", "A11", "2.9",
          "listagg", "calendar"),
)
def q_governance_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8/A11/A9/A6/A5-listagg/2.9-calendar in one union surface; each
    leg delegates to the same operator the standalone query uses, so
    this is coverage consolidation, not reimplementation."""
    sch = q_schema_stats(spark, sf_dir).select(
        F.lit("schema").alias("kind"), F.col("kind").alias("k1"),
        _NS().alias("k2"), F.col("n_subjects").alias("n"),
        F.col("total_versions").cast("double").alias("v"),
        F.col("max_versions").cast("string").alias("s"))
    health = q_health_status(spark, sf_dir).select(
        F.lit("health").alias("kind"), F.col("group_id").alias("k1"),
        _NS().alias("k2"), F.col("total_lag").alias("n"),
        _ND().alias("v"), F.col("status").alias("s"))
    latest = q_latest_per_user(spark, sf_dir).select(
        F.lit("latest").alias("kind"),
        F.col("user_id").cast("string").alias("k1"),
        F.col("event_type").alias("k2"), F.col("event_id").alias("n"),
        wall_clock_millis(F.col("ts")).cast("double").alias("v"),
        _NS().alias("s"))
    counts = q_events_by_type_tenant(spark, sf_dir).select(
        F.lit("counts").alias("kind"), F.col("event_type").alias("k1"),
        F.col("tenant_id").alias("k2"), F.col("n"),
        F.col("sum_value").alias("v"), _NS().alias("s"))
    listagg = q_listagg(spark, sf_dir).select(
        F.lit("listagg").alias("kind"), F.col("tenant_id").alias("k1"),
        _NS().alias("k2"), _NB().alias("n"), _ND().alias("v"),
        F.col("types_seen").alias("s"))
    calendar = q_orders_by_month(spark, sf_dir).select(
        F.lit("calendar").alias("kind"),
        F.date_format("order_month", "yyyy-MM").alias("k1"),
        F.col("o_orderstatus").alias("k2"), F.col("n_orders").alias("n"),
        F.col("total_cents").cast("double").alias("v"), _NS().alias("s"))
    return (sch.unionByName(health).unionByName(latest)
            .unionByName(counts).unionByName(listagg)
            .unionByName(calendar))
