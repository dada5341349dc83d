"""Scalar-function inventory query (SURVEY.md section 2.9): one wide
projection computing every deterministic scalar family the reference
uses, cross-checked against the DuckDB equivalents."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from event_streaming_service_spark.functions import scalars
from event_streaming_service_spark.queries import register
from event_streaming_service_spark.sources import tables


@register(
    "scalar_functions",
    oracle="""
    SELECT
        event_id,
        REPLACE('nnipa.events.' || event_type, 'nnipa.events.', '')
            AS topic_suffix,
        printf('event:processed:%s:%s', 'TenantEventConsumer',
               CAST(event_id AS VARCHAR)) AS idem_key,
        'nnipa.events.' || event_type || '-value' AS schema_subject,
        starts_with(event_type, 'p') AS starts_p,
        ends_with(event_type, 'k') AS ends_k,
        contains(event_type, 'i') AS has_i,
        SUBSTRING(props, 1, 6) AS props_head,
        LOWER(event_type) || '-group' AS group_name,
        CAST(LENGTH(props) AS INTEGER) AS props_len,
        regexp_matches(CAST(user_id AS VARCHAR), '^[0-9]+$') AS all_digits,
        json_extract_string(props, '$.k') AS prop_k,
        CAST(CAST(json_extract_string(props, '$.k') AS INTEGER) * 2 AS INTEGER)
            AS prop_k_doubled,
        epoch_ms(ts) AS ts_millis,
        CAST(ABS(event_id - 5000) AS BIGINT) AS abs_diff,
        GREATEST(value, 100.0) AS at_least_100,
        LEAST(value, 100.0) AS at_most_100,
        COALESCE(NULLIF(event_type, 'error'), 'recovered') AS defaulted,
        CONCAT_WS(':', event_type, CAST(user_id AS VARCHAR)) AS composite
    FROM events
    """,
    tags=("2.9",),
)
def q_scalar_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String / math / json / timestamp scalar inventory, one row per event."""
    ev = tables.load_table(spark, sf_dir, "events")
    topic = F.concat(F.lit("nnipa.events."), F.col("event_type"))
    return ev.select(
        "event_id",
        scalars.strip_topic_prefix(topic).alias("topic_suffix"),
        scalars.idempotency_key(F.lit("TenantEventConsumer"),
                                F.col("event_id").cast("string")).alias("idem_key"),
        scalars.subject_for_topic(topic).alias("schema_subject"),
        F.col("event_type").startswith("p").alias("starts_p"),
        F.col("event_type").endswith("k").alias("ends_k"),
        F.col("event_type").contains("i").alias("has_i"),
        F.substring("props", 1, 6).alias("props_head"),
        F.concat(F.lower("event_type"), F.lit("-group")).alias("group_name"),
        F.length("props").alias("props_len"),
        F.col("user_id").cast("string").rlike("^[0-9]+$").alias("all_digits"),
        F.get_json_object("props", "$.k").alias("prop_k"),
        (F.get_json_object("props", "$.k").cast("int") * 2).alias("prop_k_doubled"),
        scalars.wall_clock_millis(F.col("ts")).alias("ts_millis"),
        F.abs(F.col("event_id") - 5000).alias("abs_diff"),
        F.greatest(F.col("value"), F.lit(100.0)).alias("at_least_100"),
        F.least(F.col("value"), F.lit(100.0)).alias("at_most_100"),
        F.coalesce(F.nullif(F.col("event_type"), F.lit("error")),
                   F.lit("recovered")).alias("defaulted"),
        F.concat_ws(":", F.col("event_type"),
                    F.col("user_id").cast("string")).alias("composite"),
    )
