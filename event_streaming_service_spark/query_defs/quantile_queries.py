"""Exact-quantile queries (operators/quantiles.py): order statistics
with no full sort, verified against a row_number() oracle."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from event_streaming_service_spark.functions.money import cents
from event_streaming_service_spark.operators import quantiles
from event_streaming_service_spark.operators.quantiles import exact_quantiles
from event_streaming_service_spark.queries import register
from event_streaming_service_spark.sources import tables

QS = [0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99]


def _quantile_oracle() -> str:
    legs = []
    for q in QS:
        legs.append(f"""
        SELECT CAST({q} AS DOUBLE) AS q, r.rk, tot.n, r.v AS value
        FROM ranked r, tot
        WHERE r.rk = GREATEST(1, CAST(CEIL(CAST({q} AS DOUBLE) * tot.n)
                                      AS BIGINT))""")
    union = " UNION ALL ".join(legs)
    return f"""
    WITH ranked AS (
        SELECT l_extendedprice AS v,
               row_number() OVER (ORDER BY l_extendedprice) AS rk
        FROM lineitem WHERE l_extendedprice IS NOT NULL),
    tot AS (
        SELECT CAST(COUNT(l_extendedprice) AS BIGINT) AS n FROM lineitem)
    {union}
    """


@register(
    "exact_price_quantiles",
    oracle=_quantile_oracle(),
    doc="",
    tags=("quantiles", "A7"),
)
def q_exact_price_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 1st-99th percentiles of l_extendedprice by iterative
    histogram refinement: bounded-size aggregates locate each rank's
    value envelope, a tiny exact rank finishes — no full sort, no full
    shuffle, yet bit-identical to the oracle's row_number() scan (see
    operators/quantiles.py). The oracle pays the total sort this
    operator exists to avoid."""
    li = tables.load_table(spark, sf_dir, "lineitem")
    return exact_quantiles(li, "l_extendedprice", QS)


@register(
    "dyadic_quantile_sketch_prices",
    oracle="""
    WITH vals AS (
        SELECT CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS v,
               o_orderkey AS tb
        FROM orders
        WHERE CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) > 0),
    bc AS (SELECT CAST(length(bin(v)) - 1 AS BIGINT) AS b,
                  CAST(COUNT(*) AS BIGINT) AS cnt
           FROM vals GROUP BY 1),
    cum AS (SELECT b, cnt,
                   SUM(cnt) OVER (ORDER BY b) AS cum,
                   SUM(cnt) OVER () AS n_total
            FROM bc),
    q AS (SELECT unnest([500, 900, 990]) AS q),
    t AS (SELECT q,
                 CAST((q * n_total + 999) // 1000 AS BIGINT) AS k,
                 CAST(n_total AS BIGINT) AS n_total,
                 MIN(b) AS b
          FROM cum CROSS JOIN q
          WHERE cum >= (q * n_total + 999) // 1000
          GROUP BY 1, 2, 3),
    r AS (SELECT v, ROW_NUMBER() OVER (ORDER BY v, tb) AS rank
          FROM vals),
    e AS (SELECT q AS eq, v AS exact_val FROM r JOIN t ON rank = k)
    SELECT CAST(t.q AS BIGINT) AS q_permille, t.k, t.n_total,
           (CAST(1 AS BIGINT) << CAST(b AS INTEGER)) AS est_lo,
           (CAST(2 AS BIGINT) << CAST(b AS INTEGER)) - 1 AS est_hi,
           e.exact_val,
           e.exact_val >= (CAST(1 AS BIGINT) << CAST(b AS INTEGER))
               AS within_lo,
           e.exact_val <= (CAST(2 AS BIGINT) << CAST(b AS INTEGER)) - 1
               AS within_hi
    FROM t JOIN e ON t.q = e.eq
    ORDER BY q_permille
    """,
    tags=("quantiles", "sketch", "A7", "2.12-sketch"),
)
def q_dyadic_quantile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Constant-size mergeable dyadic quantile sketch over order
    prices (p50/p90/p99 envelopes) verified against the exact
    distributed k-th order statistic
    (operators/quantiles.py:dyadic_quantile_sketch)."""
    orders = tables.load_table(spark, sf_dir, "orders")
    df = orders.select(cents("o_totalprice").alias("pc"),
                       F.col("o_orderkey"))
    return quantiles.dyadic_quantile_sketch(
        df, "pc", "o_orderkey", q_permilles=(500, 900, 990))


@register(
    "winsorized_price_stats",
    oracle="""
    WITH vals AS (
        SELECT CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS v,
               o_orderkey AS tb
        FROM orders),
    r AS (SELECT v, ROW_NUMBER() OVER (ORDER BY v, tb) AS rank
          FROM vals),
    n AS (SELECT CAST(MAX(rank) AS BIGINT) AS n_rows FROM r),
    k AS (SELECT n_rows,
                 CAST((10 * n_rows + 999) // 1000 AS BIGINT) AS klo,
                 CAST((990 * n_rows + 999) // 1000 AS BIGINT) AS khi
          FROM n),
    thr AS (SELECT n_rows,
                   MIN(CASE WHEN rank = klo THEN v END) AS lo_cap,
                   MIN(CASE WHEN rank = khi THEN v END) AS hi_cap
            FROM r CROSS JOIN k
            WHERE rank = klo OR rank = khi
            GROUP BY n_rows)
    SELECT n_rows, lo_cap, hi_cap,
           CAST(SUM(v) AS BIGINT) AS sum_raw,
           CAST(SUM(GREATEST(LEAST(v, hi_cap), lo_cap)) AS BIGINT)
               AS sum_winsorized,
           CAST(SUM(CASE WHEN v < lo_cap THEN 1 ELSE 0 END) AS BIGINT)
               AS n_capped_low,
           CAST(SUM(CASE WHEN v > hi_cap THEN 1 ELSE 0 END) AS BIGINT)
               AS n_capped_high
    FROM vals CROSS JOIN thr
    GROUP BY n_rows, lo_cap, hi_cap
    """,
    tags=("quantiles", "robust-stats", "A7", "quality"),
)
def q_winsorized_price_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """p1/p99-winsorized order-price statistics: exact k-th-order-
    statistic caps, integer clamp + sums, cap-hit counts
    (operators/quantiles.py:winsorized_stats)."""
    orders = tables.load_table(spark, sf_dir, "orders")
    df = orders.select(cents("o_totalprice").alias("pc"),
                       F.col("o_orderkey"))
    return quantiles.winsorized_stats(df, "pc", "o_orderkey",
                                      lo_permille=10, hi_permille=990)
