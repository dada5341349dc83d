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
    WHERE ((sn.n_name = 'NATION_1' AND cn.n_name = 'NATION_2')
        OR (sn.n_name = 'NATION_2' AND cn.n_name = 'NATION_1'))
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
        .filter(((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
                | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1")))
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


@register(
    "tpch_q4_order_priority",
    oracle="""
    SELECT o.o_orderpriority, COUNT(*) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o.o_orderdate < TIMESTAMP '1997-04-01 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
    GROUP BY o.o_orderpriority
    """,
    tags=("tpch", "J3"),
)
def q_tpch_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q4-like: order-priority checking via EXISTS — a left-semi join
    with a non-equi conjunct (late-shipped line exists; the fixture has
    no commitdate, so lateness is shipdate > orderdate + 60 days).
    Catalyst plans the equi part as the join key and the date gap as a
    join-side filter — no cartesian."""
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-04-01").cast("timestamp")))
    li = _t(spark, sf_dir, "lineitem")
    late = o.join(
        li, (li.l_orderkey == o.o_orderkey)
        & (li.l_shipdate > o.o_orderdate + F.expr("INTERVAL 60 DAYS")),
        "left_semi")
    return late.groupBy("o_orderpriority").agg(
        F.count("*").alias("order_count"))


@register(
    "tpch_q6_forecast_revenue",
    oracle=f"""
    SELECT SUM({cents_sql('l_extendedprice')} * {pct_sql('l_discount')})
               / 10000.0 AS revenue,
           COUNT(*) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
      AND {pct_sql('l_discount')} BETWEEN 2 AND 4
      AND l_quantity < 24
    """,
    tags=("tpch",),
)
def q_tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q6-like: forecasting-revenue-change — the canonical fully-pushed
    scan: every predicate reaches the parquet reader, the aggregate is
    a single partial+final sum, no shuffle beyond the 1-row exchange.
    Discounts compare in exact percent units (integer), never raw
    doubles."""
    li = _t(spark, sf_dir, "lineitem")
    return (li.filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        & pct("l_discount").between(2, 4)
        & (F.col("l_quantity") < 24))
        .agg((F.sum(cents("l_extendedprice") * pct("l_discount"))
              / 10000.0).alias("revenue"),
             F.count("*").alias("n_lines")))


@register(
    "tpch_q13_order_count_distribution",
    oracle="""
    SELECT c_count, COUNT(*) AS custdist FROM (
        SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
        FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
        GROUP BY c.c_custkey)
    GROUP BY c_count
    """,
    tags=("tpch", "2.6"),
)
def q_tpch_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q13-like: customer order-count distribution — outer join
    preserving order-less customers, then a two-level aggregation
    (count per customer, histogram of counts). The second groupBy keys
    on the tiny count domain, so AQE coalesces it to a handful of
    partitions."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    per_cust = (c.join(o, c.c_custkey == o.o_custkey, "left")
                .groupBy(c.c_custkey)
                .agg(F.count("o_orderkey").alias("c_count")))
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


@register(
    "tpch_q17_small_quantity_revenue",
    oracle=f"""
    WITH avg_qty AS (
        SELECT l_partkey,
               {cents_sql('l_quantity')} AS qty_c
        FROM lineitem),
    thresholds AS (
        SELECT l_partkey,
               CAST(FLOOR(0.4 * AVG(qty_c)) AS BIGINT) AS thr_c
        FROM avg_qty GROUP BY l_partkey)
    SELECT SUM({cents_sql('l.l_extendedprice')}) / 100.0 / 7.0
               AS avg_yearly
    FROM lineitem l JOIN thresholds t ON l.l_partkey = t.l_partkey
    WHERE {cents_sql('l.l_quantity')} < t.thr_c
    """,
    tags=("tpch", "J5"),
)
def q_tpch_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q17-like: small-quantity-order revenue — the correlated scalar
    subquery (per-part average quantity) decorrelated into a grouped
    aggregate joined back on partkey. The threshold floors to integer
    cents on BOTH sides so the comparison is exact in either engine
    (comparing raw double averages would hash-drift). The per-part agg
    and the probe join share the l_partkey shuffle key, so the
    exchange is reused."""
    li = _t(spark, sf_dir, "lineitem")
    qty_c = cents("l_quantity")
    thr = (li.groupBy("l_partkey")
           .agg(F.floor(F.avg(qty_c) * 0.4).cast("bigint").alias("thr_c")))
    return (li.join(thr, "l_partkey")
            .filter(qty_c < F.col("thr_c"))
            .agg((F.sum(cents("l_extendedprice")) / 100.0 / 7.0)
                 .alias("avg_yearly")))


@register(
    "tpch_q18_large_volume_customers",
    oracle=f"""
    WITH big AS (
        SELECT l_orderkey FROM lineitem
        GROUP BY l_orderkey
        HAVING SUM({cents_sql('l_quantity')}) > 22000)
    SELECT c.c_name, o.o_custkey, o.o_orderkey, o.o_orderdate,
           SUM({cents_sql('l.l_quantity')}) / 100.0 AS total_qty
    FROM orders o
    JOIN big ON o.o_orderkey = big.l_orderkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    GROUP BY 1, 2, 3, 4
    ORDER BY total_qty DESC, o_orderkey
    LIMIT 20
    """,
    tags=("tpch", "O4"),
)
def q_tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q18-like: large-volume customers — HAVING over a grouped sum
    feeding a semi-filtering join (the classic 'filter by aggregate'
    shape), then top-20 with deterministic tiebreak. The HAVING side
    reduces lineitem to a handful of keys FIRST, so the enrichment
    joins run on a tiny frame and broadcast."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    qty_c = cents("l_quantity")
    big = (li.groupBy("l_orderkey").agg(F.sum(qty_c).alias("__sum_qty"))
           .filter(F.col("__sum_qty") > 22000)
           # alias the key: `big` derives from `li`, and the later
           # o⋈big⋈li chain would otherwise be an ambiguous self-join
           .select(F.col("l_orderkey").alias("__big_orderkey")))
    return (o.join(F.broadcast(big),
                   o.o_orderkey == F.col("__big_orderkey"))
            .drop("__big_orderkey")
            .join(li, li.l_orderkey == o.o_orderkey)
            .join(F.broadcast(c), c.c_custkey == o.o_custkey)
            .groupBy("c_name", "o_custkey", "o_orderkey", "o_orderdate")
            .agg((F.sum(qty_c) / 100.0).alias("total_qty"))
            .orderBy(F.col("total_qty").desc(), "o_orderkey")
            .limit(20))


@register(
    "tpch_q22_global_sales_opportunity",
    oracle="""
    WITH avg_bal AS (
        SELECT AVG(CAST(ROUND(c_acctbal * 100, 0) AS BIGINT)) AS ab
        FROM customer WHERE c_acctbal > 0),
    rich_idle AS (
        SELECT c.c_custkey, c.c_nationkey,
               CAST(ROUND(c.c_acctbal * 100, 0) AS BIGINT) AS bal_c
        FROM customer c, avg_bal
        WHERE CAST(ROUND(c.c_acctbal * 100, 0) AS BIGINT) > avg_bal.ab
          AND NOT EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_custkey = c.c_custkey
                            AND o.o_orderdate >=
                                TIMESTAMP '2000-01-01 00:00:00'))
    SELECT n.n_name, COUNT(*) AS numcust,
           CAST(SUM(bal_c) AS BIGINT) AS total_bal_cents
    FROM rich_idle r JOIN nation n ON n.n_nationkey = r.c_nationkey
    GROUP BY n.n_name
    """,
    tags=("tpch", "J3"),
)
def q_tpch_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q22-like: above-average-balance customers idle since 2000 — a
    scalar aggregate threshold (cross-joined 1-row frame, broadcast by
    AQE) feeding an anti join whose probe side is pre-filtered (the
    date predicate pushes into the orders scan BEFORE the anti join,
    not evaluated per joined row), grouped by nation. Balances
    aggregate in exact integer cents."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp"))
    n = _t(spark, sf_dir, "nation")
    bal_c = cents("c_acctbal")
    avg_bal = (c.filter(F.col("c_acctbal") > 0)
               .agg(F.avg(bal_c).alias("ab")))
    rich = (c.withColumn("bal_c", bal_c)
            .crossJoin(F.broadcast(avg_bal))
            .filter(F.col("bal_c") > F.col("ab")))
    idle = rich.join(o, rich.c_custkey == o.o_custkey, "left_anti")
    return (idle.join(F.broadcast(n),
                      idle.c_nationkey == n.n_nationkey)
            .groupBy("n_name")
            .agg(F.count("*").alias("numcust"),
                 F.sum("bal_c").cast("bigint").alias("total_bal_cents")))


@register(
    "tpch_q9_product_type_profit",
    oracle=f"""
    SELECT n.n_name AS nation,
           CAST(EXTRACT(YEAR FROM o.o_orderdate) AS INTEGER) AS o_year,
           SUM({_DISC_SQL}) / 10000.0 AS profit
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    WHERE p.p_name LIKE '%widget%'
    GROUP BY 1, 2
    """,
    tags=("tpch", "J5"),
)
def q_tpch_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q9-like: product-type profit by nation and year — the widest
    join tree in the set (lineitem ⋈ part ⋈ supplier ⋈ nation ⋈
    orders) with a LIKE filter reducing the part side before its join.
    All dimensions broadcast; the fixture has no partsupp/supplycost,
    so profit is the discounted revenue."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").filter(F.col("p_name").contains("widget"))
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    o = _t(spark, sf_dir, "orders")
    return (li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
            .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
            .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
            .join(o, li.l_orderkey == o.o_orderkey)
            .groupBy(F.col("n_name").alias("nation"),
                     F.year("o_orderdate").alias("o_year"))
            .agg((F.sum(_disc_units()) / 10000.0).alias("profit")))


@register(
    "tpch_q15_top_supplier",
    oracle=f"""
    WITH revenue AS (
        SELECT l_suppkey AS supplier_no,
               SUM({_DISC_SQL}) AS total_revenue_u
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1999-01-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1999-04-01 00:00:00'
        GROUP BY l_suppkey)
    SELECT s.s_suppkey, s.s_name,
           r.total_revenue_u / 10000.0 AS total_revenue
    FROM supplier s JOIN revenue r ON s.s_suppkey = r.supplier_no
    WHERE r.total_revenue_u = (SELECT MAX(total_revenue_u) FROM revenue)
    """,
    tags=("tpch", "O4"),
)
def q_tpch_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q15-like: top supplier by quarterly revenue — argmax via scalar
    subquery (revenue == global max, ALL ties kept, unlike a LIMIT 1).
    The max rides a 1-row broadcast cross join; revenue sums stay in
    exact integer units until the final division so the equality
    comparison cannot ulp-miss."""
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    revenue = (li.filter(
        (F.col("l_shipdate") >= F.lit("1999-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1999-04-01").cast("timestamp")))
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(F.sum(_disc_units()).alias("total_revenue_u")))
    top = revenue.agg(F.max("total_revenue_u").alias("__max_u"))
    return (revenue.crossJoin(F.broadcast(top))
            .filter(F.col("total_revenue_u") == F.col("__max_u"))
            .join(F.broadcast(s),
                  F.col("supplier_no") == F.col("s_suppkey"))
            .select("s_suppkey", "s_name",
                    (F.col("total_revenue_u") / 10000.0)
                    .alias("total_revenue")))
