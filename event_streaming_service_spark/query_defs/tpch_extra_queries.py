"""Additional TPC-H-shaped queries: nation-pair volume (Q7-like),
returned-item reporting (Q10-like), promo revenue ratio (Q14-like),
and a disjunctive-predicate join (Q19-like) — adapted to the fixture's
columns and date ranges. Money math: integer cents throughout."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from event_streaming_service_spark.functions.money import cents, cents_sql, pct, pct_sql
from event_streaming_service_spark.queries import register
from event_streaming_service_spark.sources import tables


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return tables.load_table(spark, sf_dir, name)


def _disc_units() -> F.Column:
    return cents("l_extendedprice") * (100 - pct("l_discount"))


_DISC_SQL = f"{cents_sql('l_extendedprice')} * (100 - {pct_sql('l_discount')})"


@register(
    "tpch_q7_nation_volume",
    oracle=f"""
    SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
           CAST(EXTRACT(year FROM l.l_shipdate) AS INTEGER) AS l_year,
           SUM({_DISC_SQL}) / 10000.0 AS revenue
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation sn ON s.s_nationkey = sn.n_nationkey
    JOIN nation cn ON c.c_nationkey = cn.n_nationkey
    WHERE ((sn.n_name = 'FRANCE' AND cn.n_name = 'GERMANY')
        OR (sn.n_name = 'GERMANY' AND cn.n_name = 'FRANCE'))
      AND l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l.l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY sn.n_name, cn.n_name, CAST(EXTRACT(year FROM l.l_shipdate) AS INTEGER)
    """,
    tags=("tpch",),
)
def q_tpch_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q7-like: bilateral shipping volume between two nations by year.
    The disjunctive nation-pair predicate lands AFTER the broadcast
    joins; both nation sides broadcast."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp")))
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    sn = _t(spark, sf_dir, "nation").withColumnRenamed("n_name", "supp_nation")
    cn = _t(spark, sf_dir, "nation").withColumnRenamed("n_name", "cust_nation")
    joined = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(sn), s.s_nationkey == sn.n_nationkey)
        .join(F.broadcast(cn), c.c_nationkey == cn.n_nationkey)
        .filter(((F.col("supp_nation") == "FRANCE") & (F.col("cust_nation") == "GERMANY"))
                | ((F.col("supp_nation") == "GERMANY") & (F.col("cust_nation") == "FRANCE")))
    )
    return (joined
            .groupBy("supp_nation", "cust_nation",
                     F.year("l_shipdate").cast("int").alias("l_year"))
            .agg((F.sum(_disc_units()) / 10000.0).alias("revenue")))


@register(
    "tpch_q10_returned_items",
    oracle=f"""
    SELECT c.c_custkey, c.c_name, n.n_name AS nation,
           SUM({_DISC_SQL}) / 10000.0 AS revenue
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE l.l_returnflag = 'R'
      AND o.o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o.o_orderdate < TIMESTAMP '1997-07-01 00:00:00'
    GROUP BY c.c_custkey, c.c_name, n.n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
    tags=("tpch", "O4"),
)
def q_tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q10-like: top-20 customers by returned-item revenue in a half
    year (deterministic custkey tiebreak)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-07-01 00:00:00").cast("timestamp")))
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = _t(spark, sf_dir, "nation")
    joined = (li.join(o, li.l_orderkey == o.o_orderkey)
              .join(F.broadcast(c), o.o_custkey == c.c_custkey)
              .join(F.broadcast(n), c.c_nationkey == n.n_nationkey))
    return (joined.groupBy("c_custkey", "c_name",
                           F.col("n_name").alias("nation"))
            .agg((F.sum(_disc_units()) / 10000.0).alias("revenue"))
            .orderBy(F.col("revenue").desc(), "c_custkey")
            .limit(20))


@register(
    "tpch_q14_promo_revenue",
    oracle=f"""
    SELECT SUM(CASE WHEN p.p_type = 'PROMO' THEN {_DISC_SQL} ELSE 0 END)
               * 100.0 / SUM({_DISC_SQL}) AS promo_pct
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l.l_shipdate < TIMESTAMP '1997-02-01 00:00:00'
    """,
    tags=("tpch",),
)
def q_tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q14-like: promo revenue share — exact integer sums, single final
    double division (engine-identical)."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-02-01 00:00:00").cast("timestamp")))
    p = _t(spark, sf_dir, "part")
    joined = li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
    promo = F.sum(F.when(F.col("p_type") == "PROMO", _disc_units()).otherwise(0))
    return joined.agg((promo * 100.0 / F.sum(_disc_units())).alias("promo_pct"))


@register(
    "tpch_q19_disjunctive_join",
    oracle=f"""
    SELECT SUM({_DISC_SQL}) / 10000.0 AS revenue, COUNT(*) AS n_items
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity >= 1 AND l.l_quantity <= 20)
       OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 25
           AND l.l_quantity >= 10 AND l.l_quantity <= 30)
       OR (p.p_brand = 'Brand#34' AND p.p_size BETWEEN 1 AND 35
           AND l.l_quantity >= 20 AND l.l_quantity <= 40)
    """,
    tags=("tpch",),
)
def q_tpch_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q19-like: disjunctive multi-attribute predicates across the join
    — Catalyst extracts the common p_partkey equi-condition so the join
    stays hash-based, with the OR evaluated as a post-join filter."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    cond = (
        ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 15)
         & F.col("l_quantity").between(1, 20))
        | ((F.col("p_brand") == "Brand#23") & F.col("p_size").between(1, 25)
           & F.col("l_quantity").between(10, 30))
        | ((F.col("p_brand") == "Brand#34") & F.col("p_size").between(1, 35)
           & F.col("l_quantity").between(20, 40))
    )
    return (li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
            .filter(cond)
            .agg((F.sum(_disc_units()) / 10000.0).alias("revenue"),
                 F.count("*").alias("n_items")))
