"""Snapshot-diff + attribution queries: classify a rerun's changes
(operators/diff.py:table_diff) and attribute purchases to their last
marketing touch (operators/analytics.py:last_touch_attribution).

The diff's "two versions" derive deterministically from the orders
fixture (drop every 97th key, perturb every 13th price, add a shifted
copy of every 101st row), so both engines build identical inputs; the
attribution oracle is the quadratic join + row_number form the
window implementation avoids.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from event_streaming_service_spark.functions import money
from event_streaming_service_spark.functions.money import cents
from event_streaming_service_spark.operators import analytics, diff
from event_streaming_service_spark.queries import register
from event_streaming_service_spark.sources import tables

WEEK_MS = 7 * 86_400_000

_VERSIONS = """
    old_v AS (
        SELECT o_orderkey,
               o_orderstatus,
               CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)
                   AS total_cents
        FROM orders),
    new_v AS (
        SELECT o_orderkey, o_orderstatus,
               CASE WHEN o_orderkey % 13 = 0 THEN total_cents + 1
                    ELSE total_cents END AS total_cents
        FROM old_v WHERE o_orderkey % 97 <> 0
        UNION ALL
        -- added keys NEGATE the source key: orderkeys are >= 1 at any
        -- scale factor, so negatives are disjoint from every real key
        -- (an additive shift collides once sf grows past the constant)
        SELECT -o_orderkey, o_orderstatus, total_cents
        FROM old_v WHERE o_orderkey % 101 = 0)
"""

_DIGEST_OLD = ("md5(COALESCE(CAST(LENGTH(CAST(o_orderstatus AS VARCHAR)) "
               "AS VARCHAR), '-') || ':' || "
               "COALESCE(CAST(o_orderstatus AS VARCHAR), '') || '|' || "
               "COALESCE(CAST(LENGTH(CAST(total_cents AS VARCHAR)) "
               "AS VARCHAR), '-') || ':' || "
               "COALESCE(CAST(total_cents AS VARCHAR), ''))")


@register(
    "orders_snapshot_diff",
    oracle=f"""
    WITH {_VERSIONS},
    o AS (SELECT o_orderkey, {_DIGEST_OLD} AS old_digest FROM old_v),
    n AS (SELECT o_orderkey, {_DIGEST_OLD} AS new_digest FROM new_v)
    SELECT COALESCE(o.o_orderkey, n.o_orderkey) AS o_orderkey,
           CASE WHEN o.old_digest IS NULL THEN 'added'
                WHEN n.new_digest IS NULL THEN 'removed'
                WHEN o.old_digest = n.new_digest THEN 'unchanged'
                ELSE 'changed' END AS change_kind,
           o.old_digest, n.new_digest
    FROM o FULL OUTER JOIN n ON o.o_orderkey = n.o_orderkey
    """,
    tags=("diff", "cdc", "J3", "scd"),
)
def q_orders_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rerun reconciliation over two derived order snapshots: one
    full-outer join on the key carrying only content digests (wide
    tables diff at key+digest cost); every key classified
    added/removed/changed/unchanged."""
    orders = tables.load_table(spark, sf_dir, "orders")
    old_v = orders.select("o_orderkey", "o_orderstatus",
                          money.cents("o_totalprice")
                          .alias("total_cents"))
    survived = (old_v.where(F.col("o_orderkey") % 97 != 0)
                .withColumn("total_cents",
                            F.when(F.col("o_orderkey") % 13 == 0,
                                   F.col("total_cents") + 1)
                            .otherwise(F.col("total_cents"))))
    added = (old_v.where(F.col("o_orderkey") % 101 == 0)
             .withColumn("o_orderkey", -F.col("o_orderkey")))
    new_v = survived.unionByName(added)
    return diff.table_diff(old_v, new_v, ["o_orderkey"],
                           ["o_orderstatus", "total_cents"])


@register(
    "purchase_attribution_last_touch",
    oracle=f"""
    WITH e AS (
        SELECT event_id, user_id, event_type, epoch_ms(ts) AS ms
        FROM events),
    p AS (SELECT * FROM e WHERE event_type = 'purchase'),
    t AS (SELECT * FROM e WHERE event_type IN ('view', 'click')),
    j AS (
        SELECT p.event_id AS conversion_id, p.user_id,
               p.ms AS conversion_ms,
               t.event_id AS touch_id, t.event_type AS touch_type,
               t.ms AS touch_ms,
               ROW_NUMBER() OVER (
                   PARTITION BY p.event_id
                   ORDER BY t.ms DESC, t.event_id DESC) AS rk
        FROM p LEFT JOIN t
          ON t.user_id = p.user_id
         AND t.ms >= p.ms - {WEEK_MS} AND t.ms <= p.ms - 1)
    SELECT conversion_id, user_id, conversion_ms,
           touch_id, touch_type, touch_ms,
           conversion_ms - touch_ms AS ms_since_touch
    FROM j WHERE rk = 1
    """,
    tags=("analytics", "attribution", "J4", "W2"),
)
def q_purchase_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch attribution of purchases to the most recent
    view/click within 7 days, per user: one range-framed window, no
    conversions x touches join; equal-millisecond ties resolve by
    highest event id in both engines."""
    events = tables.load_table(spark, sf_dir, "events")
    return analytics.last_touch_attribution(
        events, "user_id", "ts", "event_type",
        conversion_type="purchase", touch_types=["view", "click"],
        window_ms=WEEK_MS)


@register(
    "session_journey_paths",
    oracle="""
    WITH ordered AS (
        SELECT user_id, event_id, event_type, ts, epoch_ms(ts) AS ms,
               LAG(epoch_ms(ts)) OVER (PARTITION BY user_id
                                       ORDER BY ts, event_id) AS prev_ms
        FROM events),
    flagged AS (
        SELECT *, CASE WHEN prev_ms IS NULL OR ms - prev_ms > 1800000
                       THEN 1 ELSE 0 END AS new_s
        FROM ordered),
    sess AS (
        SELECT *, SUM(new_s) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id
                                   ROWS UNBOUNDED PRECEDING) AS seq
        FROM flagged),
    paths AS (
        SELECT user_id, seq,
               array_to_string(list_slice(
                   list(event_type ORDER BY ts, event_id), 1, 5), '>')
                   AS path
        FROM sess GROUP BY user_id, seq),
    counted AS (
        SELECT path, CAST(COUNT(*) AS BIGINT) AS n_sessions
        FROM paths GROUP BY path)
    SELECT path, n_sessions FROM counted
    ORDER BY n_sessions DESC, path LIMIT 20
    """,
    tags=("analytics", "journey", "W8", "O4", "listagg"),
)
def q_session_journey_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top 20 five-step session journey paths over 30-minute-gap
    sessions: full ordered sequences completing the funnel /
    transition-matrix family; deterministic top-n by
    (count desc, path asc)."""
    events = tables.load_table(spark, sf_dir, "events")
    return analytics.session_paths(events, "user_id", "ts",
                                   "event_type",
                                   gap_ms=30 * 60_000,
                                   max_steps=5, top_n=20)


@register(
    "cdc_merge_upsert",
    oracle="""
    WITH log AS (
        SELECT CASE WHEN o_orderkey % 7 = 3 THEN o_custkey + 1000000
                    ELSE o_custkey END AS k,
               CASE WHEN o_orderkey % 20 = 0 THEN 'D' ELSE 'U' END
                   AS op,
               CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS v,
               o_orderdate, o_orderkey
        FROM orders),
    last AS (
        SELECT k, op, v FROM (
            SELECT k, op, v,
                   ROW_NUMBER() OVER (PARTITION BY k
                       ORDER BY o_orderdate DESC, o_orderkey DESC)
                       AS rn
            FROM log) WHERE rn = 1),
    b AS (SELECT c_custkey AS bk,
                 CAST(ROUND(c_acctbal * 100, 0) AS BIGINT) AS old
          FROM customer)
    SELECT COALESCE(bk, k) AS c_custkey,
           CASE WHEN k IS NULL THEN 'unchanged'
                WHEN bk IS NULL AND op = 'D' THEN 'noop_delete'
                WHEN bk IS NULL THEN 'inserted'
                WHEN op = 'D' THEN 'deleted'
                ELSE 'updated' END AS action,
           old AS old_val,
           CASE WHEN op = 'D' THEN NULL
                WHEN op IS NULL THEN old
                ELSE v END AS new_val
    FROM b FULL OUTER JOIN last ON bk = k
    """,
    tags=("cdc", "merge-upsert", "2.6", "J3", "D1", "scd"),
)
def q_cdc_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO / CDC apply audit: orders become a keyed I/U/D
    changelog over the customer snapshot (deterministic op derivation:
    orderkey%20==0 deletes, orderkey%7==3 targets a key outside the
    base so the insert path runs), latest op per key by
    (o_orderdate, o_orderkey) wins
    (operators/diff.py:merge_changelog)."""
    cust = tables.load_table(spark, sf_dir, "customer")
    orders = tables.load_table(spark, sf_dir, "orders")
    log = orders.select(
        F.when(F.col("o_orderkey") % 7 == 3,
               F.col("o_custkey") + 1_000_000)
        .otherwise(F.col("o_custkey")).alias("c_custkey"),
        F.when(F.col("o_orderkey") % 20 == 0, F.lit("D"))
        .otherwise(F.lit("U")).alias("op"),
        cents("o_totalprice").alias("v"),
        F.col("o_orderdate"), F.col("o_orderkey"))
    base = cust.select("c_custkey", cents("c_acctbal").alias("bal"))
    return diff.merge_changelog(
        base, log, "c_custkey", ["o_orderdate", "o_orderkey"],
        "op", "v", "bal")


@register(
    "ivm_delta_join_orders",
    oracle="""
    SELECT c_nationkey,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT))
                AS BIGINT) AS total_cents
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_nationkey
    """,
    tags=("ivm", "joins", "J5", "streaming-adjacent"),
)
def q_ivm_delta_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delta-join IVM (operators/diff.py:ivm_delta_join): the orders /
    customer join view maintained from insert deltas — base slices
    are orderkey%10 != 0 and custkey%7 != 0, the deltas the
    complements, so the four-term union must reconstruct EXACTLY the
    full join (the oracle recomputes it whole). Delta terms broadcast
    the delta side; the base join is the only base-grain work."""
    from event_streaming_service_spark.operators import diff

    orders = tables.load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey",
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
        .cast("long").alias("cents"))
    cust = tables.load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_nationkey")
    view = diff.ivm_delta_join(
        orders.filter(F.col("o_orderkey") % 10 != 0),
        orders.filter(F.col("o_orderkey") % 10 == 0),
        cust.filter(F.col("o_custkey") % 7 != 0),
        cust.filter(F.col("o_custkey") % 7 == 0),
        "o_custkey")
    return (view.groupBy("c_nationkey")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_rows"),
                 F.sum("cents").cast("bigint").alias("total_cents")))
