"""Scale-pattern queries: salted skew aggregation (result-identical to
the direct form — that IS the oracle), SCD2 merge, approximate distinct."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from event_streaming_service_spark.functions.money import cents
from event_streaming_service_spark.functions import money
from event_streaming_service_spark.operators import scd, skew
from event_streaming_service_spark.queries import register
from event_streaming_service_spark.sources import tables


@register(
    "salted_hot_key_agg",
    oracle="""
    SELECT event_type, COUNT(*) AS n,
           CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT)
               AS value_cents
    FROM events GROUP BY event_type
    """,
    tags=("skew",),
)
def q_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-safe aggregation over genuinely hot keys (5 event types for
    the whole table): salt -> partial -> fold. The oracle is the DIRECT
    aggregation — salting must be result-invisible."""
    ev = tables.load_table(spark, sf_dir, "events")
    return skew.salted_sum_count(
        ev, ["event_type"], {"value_cents": cents("value")},
        salt_cols=["event_id"])


@register(
    "scd2_customer_updates",
    oracle=f"""
    WITH updates AS (
        SELECT c_custkey, c_name, c_acctbal + 100.0 AS c_acctbal
        FROM customer WHERE c_custkey % 10 = 0
    ),
    current AS (
        SELECT c_custkey, c_name, c_acctbal,
               TIMESTAMP '2024-01-01 00:00:00' AS valid_from,
               TIMESTAMP '{scd.FAR_FUTURE}' AS valid_to
        FROM customer
    )
    SELECT c_custkey, c_name, c_acctbal, valid_from, valid_to FROM (
        SELECT c.c_custkey, c.c_name, c.c_acctbal, c.valid_from,
               CASE WHEN u.c_custkey IS NULL THEN c.valid_to
                    ELSE TIMESTAMP '2024-02-01 00:00:00' END AS valid_to
        FROM current c LEFT JOIN updates u ON c.c_custkey = u.c_custkey
        UNION ALL
        SELECT c_custkey, c_name, c_acctbal,
               TIMESTAMP '2024-02-01 00:00:00' AS valid_from,
               TIMESTAMP '{scd.FAR_FUTURE}' AS valid_to
        FROM updates
    )
    """,
    tags=("scd2", "cdc"),
)
def q_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 merge: every 10th customer gets an account-balance update;
    old versions close at the effective date, new versions open —
    MERGE INTO semantics from anti/semi joins + union."""
    cust = tables.load_table(spark, sf_dir, "customer")
    current = (cust.select("c_custkey", "c_name", "c_acctbal")
               .withColumn("valid_from",
                           F.lit("2024-01-01 00:00:00").cast("timestamp"))
               .withColumn("valid_to",
                           F.lit(scd.FAR_FUTURE).cast("timestamp")))
    updates = (cust.filter(F.col("c_custkey") % 10 == 0)
               .select("c_custkey", "c_name",
                       (F.col("c_acctbal") + 100.0).alias("c_acctbal")))
    return scd.scd2_apply(current, updates, "c_custkey",
                          ["c_name", "c_acctbal"], "2024-02-01 00:00:00")


@register("approx_distinct_users", oracle=None, tags=("A10", "approx"))
def q_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A10 approximate path: HLL++ distinct users per event type —
    sketch values are engine-specific (rows-only check; pytest bounds
    the error against the exact count)."""
    ev = tables.load_table(spark, sf_dir, "events")
    return (ev.groupBy("event_type")
            .agg(F.approx_count_distinct("user_id", rsd=0.02)
                 .alias("approx_users"),
                 F.countDistinct("user_id").alias("exact_users")))


@register(
    "scd2_snapshot_asof",
    oracle=f"""
    WITH updates AS (
        SELECT c_custkey, c_name, c_acctbal + 100.0 AS c_acctbal
        FROM customer WHERE c_custkey % 10 = 0
    ),
    dim AS (
        SELECT c.c_custkey, c.c_name, c.c_acctbal,
               TIMESTAMP '2024-01-01 00:00:00' AS valid_from,
               CASE WHEN u.c_custkey IS NULL
                    THEN TIMESTAMP '{scd.FAR_FUTURE}'
                    ELSE TIMESTAMP '2024-02-01 00:00:00' END AS valid_to
        FROM customer c LEFT JOIN updates u ON c.c_custkey = u.c_custkey
        UNION ALL
        SELECT c_custkey, c_name, c_acctbal,
               TIMESTAMP '2024-02-01 00:00:00',
               TIMESTAMP '{scd.FAR_FUTURE}'
        FROM updates
    )
    SELECT kind, c_custkey,
           CAST(FLOOR(c_acctbal * 100 + 0.5) AS BIGINT) AS acctbal_cents
    FROM (
        SELECT 'before' AS kind, * FROM dim
        WHERE valid_from <= TIMESTAMP '2024-01-15 00:00:00'
          AND valid_to > TIMESTAMP '2024-01-15 00:00:00'
        UNION ALL
        SELECT 'after', * FROM dim
        WHERE valid_from <= TIMESTAMP '2024-02-15 00:00:00'
          AND valid_to > TIMESTAMP '2024-02-15 00:00:00')
    """,
    tags=("scd2", "cdc", "asof", "J4"),
)
def q_scd2_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AS OF reads over the SCD2 dimension built by scd2_apply: the
    same key set reads its pre-update balance at Jan 15 and its
    post-update balance at Feb 15 — half-open interval semantics, a
    pushed-down range filter per snapshot, no join."""
    versioned = q_scd2(spark, sf_dir)
    before = (scd.snapshot_asof(versioned, "2024-01-15 00:00:00")
              .select(F.lit("before").alias("kind"), "c_custkey",
                      money.cents("c_acctbal").alias("acctbal_cents")))
    after = (scd.snapshot_asof(versioned, "2024-02-15 00:00:00")
             .select(F.lit("after").alias("kind"), "c_custkey",
                     money.cents("c_acctbal").alias("acctbal_cents")))
    return before.unionByName(after)
