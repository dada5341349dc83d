"""TPC-H-shaped flagship analytics over the star-schema fixtures.

These are the bench headliners: deep scan+agg (Q1), selective
3-way join top-k (Q3), 6-way join (Q5). Predicates are adapted to the
fixture's date ranges (orders 1995-2001). Money math uses exact
integer-cents arithmetic (functions/money.py) so aggregates are
bit-identical across engines and partitionings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from event_streaming_service_spark.functions.money import cents, cents_sql, pct, pct_sql
from event_streaming_service_spark.queries import register
from event_streaming_service_spark.sources import tables

# revenue terms in integer units: cents * percent = 1e-4 dollar units,
# cents * percent * percent = 1e-6 dollar units
_PRICE_C = cents_sql("l_extendedprice")
_DISC_P = pct_sql("l_discount")
_TAX_P = pct_sql("l_tax")


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return tables.load_table(spark, sf_dir, name)


def _disc_units() -> F.Column:
    """l_extendedprice * (1 - l_discount) in exact 1e-4-dollar units."""
    return cents("l_extendedprice") * (100 - pct("l_discount"))


@register(
    "tpch_q1_pricing_summary",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           SUM({cents_sql('l_quantity')}) / 100.0 AS sum_qty,
           SUM({_PRICE_C}) / 100.0 AS sum_base_price,
           SUM({_PRICE_C} * (100 - {_DISC_P})) / 10000.0 AS sum_disc_price,
           SUM({_PRICE_C} * (100 - {_DISC_P}) * (100 + {_TAX_P})) / 1000000.0
               AS sum_charge,
           (SUM({cents_sql('l_quantity')}) / 100.0) / COUNT(*) AS avg_qty,
           (SUM({_PRICE_C}) / 100.0) / COUNT(*) AS avg_price,
           (SUM({_DISC_P}) / 100.0) / COUNT(*) AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2001-09-01 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
    tags=("tpch", "A5"),
)
def q_tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1: scan-heavy grouped aggregation, 8 aggregates."""
    li = _t(spark, sf_dir, "lineitem")
    qty_c = cents("l_quantity")
    price_c = cents("l_extendedprice")
    disc_p = pct("l_discount")
    tax_p = pct("l_tax")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2001-09-01 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            (F.sum(qty_c) / 100.0).alias("sum_qty"),
            (F.sum(price_c) / 100.0).alias("sum_base_price"),
            (F.sum(price_c * (100 - disc_p)) / 10000.0).alias("sum_disc_price"),
            (F.sum(price_c * (100 - disc_p) * (100 + tax_p)) / 1000000.0)
                .alias("sum_charge"),
            ((F.sum(qty_c) / 100.0) / F.count("*")).alias("avg_qty"),
            ((F.sum(price_c) / 100.0) / F.count("*")).alias("avg_price"),
            ((F.sum(disc_p) / 100.0) / F.count("*")).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


@register(
    "tpch_q3_shipping_priority",
    oracle=f"""
    SELECT l.l_orderkey, o.o_orderdate, o.o_orderpriority,
           SUM({cents_sql('l.l_extendedprice')}
               * (100 - {pct_sql('l.l_discount')})) / 10000.0 AS revenue
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      AND l.l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, o_orderdate, l_orderkey
    LIMIT 10
    """,
    tags=("tpch", "O4"),
)
def q_tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3: selective join + top-10 by revenue (deterministic
    tiebreaks on date and orderkey)."""
    c = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15 00:00:00").cast("timestamp"))
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-03-15 00:00:00").cast("timestamp"))
    joined = (li.join(o, li.l_orderkey == o.o_orderkey)
              .join(F.broadcast(c), o.o_custkey == c.c_custkey))
    return (
        joined.groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg((F.sum(_disc_units()) / 10000.0).alias("revenue"))
        .orderBy(F.col("revenue").desc(), "o_orderdate", "l_orderkey")
        .limit(10)
    )


@register(
    "tpch_q5_local_supplier_volume",
    oracle=f"""
    SELECT n.n_name AS nation,
           SUM({cents_sql('l.l_extendedprice')}
               * (100 - {pct_sql('l.l_discount')})) / 10000.0 AS revenue
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
                   AND c.c_nationkey = s.s_nationkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY n.n_name
    """,
    tags=("tpch",),
)
def q_tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5: 6-way join, dimension sides broadcast."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp")))
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    joined = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), (o.o_custkey == c.c_custkey))
        .join(F.broadcast(s), (li.l_suppkey == s.s_suppkey)
              & (c.c_nationkey == s.s_nationkey))
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
    )
    return (joined.groupBy(F.col("n_name").alias("nation"))
            .agg((F.sum(_disc_units()) / 10000.0).alias("revenue")))
