"""Join-family + set-operation queries (SURVEY.md sections 2.6, 2.10).

J1 (lag join) is covered by stats_queries; here the family generalizes
over the star schema: broadcast enrichment, semi/anti, full outer,
range (interval) join, as-of join, latest-per-key, and set ops.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from event_streaming_service_spark.operators import joins
from event_streaming_service_spark.operators.stats import dsum
from event_streaming_service_spark.queries import register
from event_streaming_service_spark.sources import tables


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return tables.load_table(spark, sf_dir, name)


@register(
    "orders_enriched_by_nation",
    oracle="""
    SELECT n.n_name AS nation, c.c_mktsegment AS segment,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
               AS total_price
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY n.n_name, c.c_mktsegment
    """,
    tags=("J5", "J2"),
)
def q_orders_enriched(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J5 generalized: fact enrichment through two broadcast dimension
    joins (the tenant-cache lookup shape, TenantEventConsumer.java:42-58)."""
    orders = _t(spark, sf_dir, "orders")
    customer = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    enriched = joins.broadcast_enrich(
        orders, customer, orders.o_custkey == customer.c_custkey, "inner")
    enriched = joins.broadcast_enrich(
        enriched, nation, enriched.c_nationkey == nation.n_nationkey, "inner")
    return (
        enriched.groupBy(F.col("n_name").alias("nation"),
                         F.col("c_mktsegment").alias("segment"))
        .agg(F.count("*").alias("n_orders"),
             dsum("o_totalprice").alias("total_price"))
    )


@register(
    "customers_with_orders_semi",
    oracle="""
    SELECT c_mktsegment AS segment, COUNT(*) AS n_customers
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    GROUP BY c_mktsegment
    """,
    tags=("J3",),
)
def q_customers_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3: the 'groups subscribed to topic' anyMatch as a left-semi join
    (TopicManagementService.java:689-718)."""
    customer = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    present = joins.semi(customer, orders,
                         customer.c_custkey == orders.o_custkey)
    return (present.groupBy(F.col("c_mktsegment").alias("segment"))
            .agg(F.count("*").alias("n_customers")))


@register(
    "customers_without_orders_anti",
    oracle="""
    SELECT c_custkey, c_name, c_mktsegment
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
    tags=("J3",),
)
def q_customers_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT EXISTS complement — left-anti join."""
    customer = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    return joins.anti(customer, orders,
                      customer.c_custkey == orders.o_custkey
                      ).select("c_custkey", "c_name", "c_mktsegment")


@register(
    "nation_presence_full_outer",
    oracle="""
    WITH cust AS (SELECT c_nationkey AS nationkey, COUNT(*) AS n_customers
                  FROM customer GROUP BY c_nationkey),
         supp AS (SELECT s_nationkey AS nationkey, COUNT(*) AS n_suppliers
                  FROM supplier GROUP BY s_nationkey)
    SELECT COALESCE(c.nationkey, s.nationkey) AS nationkey,
           COALESCE(c.n_customers, 0) AS n_customers,
           COALESCE(s.n_suppliers, 0) AS n_suppliers
    FROM cust c FULL OUTER JOIN supp s ON c.nationkey = s.nationkey
    """,
    tags=("2.6",),
)
def q_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join: nations seen from the customer vs supplier side."""
    cust = (_t(spark, sf_dir, "customer").groupBy(
        F.col("c_nationkey").alias("nationkey"))
        .agg(F.count("*").alias("n_customers")))
    supp = (_t(spark, sf_dir, "supplier").groupBy(
        F.col("s_nationkey").alias("nationkey"))
        .agg(F.count("*").alias("n_suppliers")))
    joined = cust.alias("c").join(supp.alias("s"),
                                  F.col("c.nationkey") == F.col("s.nationkey"),
                                  "full_outer")
    return joined.select(
        F.coalesce(F.col("c.nationkey"), F.col("s.nationkey")).alias("nationkey"),
        F.coalesce(F.col("n_customers"), F.lit(0)).alias("n_customers"),
        F.coalesce(F.col("n_suppliers"), F.lit(0)).alias("n_suppliers"))


@register(
    "price_band_range_join",
    oracle="""
    SELECT b.band, COUNT(*) AS n_parts,
           CAST(SUM(CAST(p.p_retailprice AS DECIMAL(18,4))) AS DOUBLE)
               AS sum_price
    FROM part p
    JOIN (VALUES (900.0, 924.99, 'budget'), (925.0, 949.99, 'standard'),
                 (950.0, 974.99, 'premium'), (975.0, 999.99, 'luxury'))
         AS b(lo, hi, band)
      ON p.p_retailprice >= b.lo AND p.p_retailprice <= b.hi
    GROUP BY b.band
    """,
    tags=("2.6-range",),
)
def q_price_band_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range/interval join: facts against a broadcast band table."""
    part = _t(spark, sf_dir, "part")
    bands = spark.createDataFrame(
        [(900.0, 924.99, "budget"), (925.0, 949.99, "standard"),
         (950.0, 974.99, "premium"), (975.0, 999.99, "luxury")],
        "lo double, hi double, band string")
    joined = joins.range_join(part, bands, F.col("p_retailprice"),
                              F.col("lo"), F.col("hi"))
    return (joined.groupBy("band")
            .agg(F.count("*").alias("n_parts"),
                 dsum("p_retailprice").alias("sum_price")))


@register(
    "asof_last_order_before_event",
    oracle="""
    WITH ev AS (
        SELECT event_id, ts, CAST(user_id % 50 AS BIGINT) AS k FROM events
    ),
    ord AS (  -- unique per (k, time): deterministic as-of winner
        SELECT CAST(o_custkey % 50 AS BIGINT) AS k, o_orderdate,
               MAX(o_orderkey) AS o_orderkey
        FROM orders GROUP BY 1, 2
    )
    SELECT e.event_id, e.ts, e.k, o.o_orderkey AS asof_o_orderkey
    FROM ev e ASOF LEFT JOIN ord o
      ON e.k = o.k AND o.o_orderdate <= e.ts
    """,
    tags=("J4",),
)
def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J4 generalized: latest order state as of each event's timestamp —
    the offsetsForTimes shape (EventReplayService.java:71-88). Spark has
    no native as-of; this is the union+window implementation (one
    shuffle on the key, scale-safe). Oracle uses DuckDB's native ASOF."""
    ev = (_t(spark, sf_dir, "events")
          .select("event_id", "ts",
                  (F.col("user_id") % 50).cast("bigint").alias("k")))
    ord_ = (_t(spark, sf_dir, "orders")
            .groupBy((F.col("o_custkey") % 50).cast("bigint").alias("k"),
                     "o_orderdate")
            .agg(F.max("o_orderkey").alias("o_orderkey")))
    out = joins.asof_join(ev, ord_, key="k", left_time="ts",
                          right_time="o_orderdate",
                          right_payload=["o_orderkey"])
    return out.select("event_id", "ts", "k", "asof_o_orderkey")


@register(
    "latest_event_per_user",
    oracle="""
    SELECT user_id, event_id, ts, event_type FROM (
        SELECT user_id, event_id, ts, event_type,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY ts DESC, event_id DESC) AS rn
        FROM events
    ) WHERE rn = 1
    """,
    tags=("A9",),
)
def q_latest_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A9 generalized: latest row per key (the schema-registry
    latest-version lookup, SchemaRegistryService.java:110-121)."""
    ev = _t(spark, sf_dir, "events")
    return joins.latest_per_key(
        ev, ["user_id"], [F.col("ts").desc(), F.col("event_id").desc()]
    ).select("user_id", "event_id", "ts", "event_type")


@register(
    "set_ops_engaged_users",
    oracle="""
    (SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'
     INTERSECT
     SELECT DISTINCT user_id FROM events WHERE event_type = 'view')
    EXCEPT
    SELECT DISTINCT user_id FROM events WHERE event_type = 'error'
    """,
    tags=("2.10",),
)
def q_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set operations: (purchasers INTERSECT viewers) EXCEPT error-users."""
    ev = _t(spark, sf_dir, "events")
    purchasers = ev.filter(F.col("event_type") == "purchase").select("user_id")
    viewers = ev.filter(F.col("event_type") == "view").select("user_id")
    error_users = ev.filter(F.col("event_type") == "error").select("user_id")
    return purchasers.intersect(viewers).subtract(error_users)


@register(
    "union_by_name_topics",
    oracle="""
    SELECT source, name FROM (
        SELECT DISTINCT 'live' AS source, 'nnipa.events.' || event_type AS name
        FROM events
        UNION
        SELECT 'default' AS source, t.name
        FROM (VALUES ('nnipa.events.tenant'), ('nnipa.events.user'),
                     ('nnipa.events.notification'), ('nnipa.events.signup'),
                     ('_internal.metrics')) AS t(name)
    ) WHERE NOT starts_with(name, '_')
    """,
    tags=("2.10", "P6", "S9"),
)
def q_union_topics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S9/P6: default-topic bootstrap unioned with live topics, internal
    `_`-prefixed names filtered out (TopicManagementService.java:101-144)."""
    ev = _t(spark, sf_dir, "events")
    live = (ev.select(F.concat(F.lit("nnipa.events."),
                               F.col("event_type")).alias("name"))
            .distinct().withColumn("source", F.lit("live")))
    defaults = spark.createDataFrame(
        [("nnipa.events.tenant",), ("nnipa.events.user",),
         ("nnipa.events.notification",), ("nnipa.events.signup",),
         ("_internal.metrics",)], "name string"
    ).withColumn("source", F.lit("default"))
    both = live.unionByName(defaults).distinct()
    return (both.filter(~F.col("name").startswith("_"))
            .select("source", "name"))
