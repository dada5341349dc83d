"""The remaining TPC-H shapes (Q2, Q8, Q11, Q12, Q16, Q20, Q21),
completing 22/22 decision-support coverage.

The fixture has no partsupp table, no l_shipmode, and no
commit/receipt dates, so the classic queries are adapted: the
part-supplier relation derives from the distinct (l_partkey,
l_suppkey) pairs actually shipped; "min cost" becomes min supplier
account balance; Q12's ship-mode dimension becomes l_returnflag with
lateness = shipdate > orderdate + 30 days; Q21's "receipt after
commit" becomes shipdate > orderdate + 60 days. The SHAPES — the
point of each query — are preserved:

  Q2  correlated-min subquery decorrelated into agg + equality join
  Q8  market-share via conditional-sum ratio per year
  Q11 group-HAVING against a scalar fraction of the global total
  Q12 join + two conditional aggregates over a priority class
  Q16 distinct-count with a NOT-IN supplier exclusion (anti join)
  Q20 nested IN-subquery with an aggregate threshold from a scalar
      subquery
  Q21 EXISTS + NOT EXISTS self-joins on lineitem, decorrelated into
      one per-order profile aggregate

Money/quantity math: exact integer cents (functions/money.py), one
double division at the result boundary, so aggregates are
bit-identical across engines and partition orders.

Scale notes (100 TB): every dimension side (part, supplier, nation,
region, the per-order/per-part profile frames after their HAVING
filters) broadcasts; the only big-table shuffles key on l_partkey /
l_orderkey / l_suppkey and are reused between the aggregate and the
equality-join probe that follows it (same key ⇒ same exchange). No
correlated per-row subquery survives to the physical plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from event_streaming_service_spark.functions.money import cents, cents_sql, pct, pct_sql
from event_streaming_service_spark.queries import register
from event_streaming_service_spark.sources import tables

_DISC_SQL = f"{cents_sql('l_extendedprice')} * (100 - {pct_sql('l_discount')})"


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return tables.load_table(spark, sf_dir, name)


def _disc_units() -> F.Column:
    return cents("l_extendedprice") * (100 - pct("l_discount"))


def _region_suppliers(spark: SparkSession, sf_dir: str, region: str) -> DataFrame:
    """Suppliers in a region with nation name and exact-cents balance —
    a tiny frame (|supplier| rows max), always broadcast by callers."""
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == region)
    return (s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
            .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
            .select("s_suppkey", "s_name", "n_name",
                    cents("s_acctbal").alias("bal_c")))


_REGION_SUPP_SQL = """
    SELECT s.s_suppkey, s.s_name, n.n_name,
           CAST(ROUND(s.s_acctbal * 100, 0) AS BIGINT) AS bal_c
    FROM supplier s
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = '{region}'
"""


@register(
    "tpch_q2_min_balance_supplier",
    oracle=f"""
    WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
    eu AS ({_REGION_SUPP_SQL.format(region='EUROPE')}),
    cand AS (
        SELECT p.p_partkey, p.p_name, eu.s_suppkey, eu.s_name,
               eu.n_name AS nation, eu.bal_c
        FROM part p
        JOIN ps ON p.p_partkey = ps.l_partkey
        JOIN eu ON ps.l_suppkey = eu.s_suppkey
        WHERE p.p_size BETWEEN 10 AND 20 AND p.p_type = 'STANDARD')
    SELECT c.s_acctbal, c.s_name, c.nation, c.p_partkey, c.p_name
    FROM (SELECT *, bal_c / 100.0 AS s_acctbal FROM cand) c
    JOIN (SELECT p_partkey, MIN(bal_c) AS mb FROM cand GROUP BY p_partkey) b
      ON c.p_partkey = b.p_partkey AND c.bal_c = b.mb
    """,
    tags=("tpch", "J5"),
)
def q_tpch_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2-like: for each STANDARD mid-size part sold in EUROPE, the
    supplier(s) with the minimum account balance among that part's
    shippers. The classic correlated MIN subquery is decorrelated: one
    grouped MIN over the candidate frame, equality-joined back on
    (partkey, balance). Balances compare in integer cents so the
    equality cannot ulp-miss; ties keep ALL minimal suppliers, as in
    the spec query. The part and supplier sides broadcast; the only
    lineitem pass is the distinct-pair projection, and both the MIN
    agg and the join back hash on p_partkey (exchange reuse)."""
    li = _t(spark, sf_dir, "lineitem")
    ps = li.select("l_partkey", "l_suppkey").distinct()
    eu = _region_suppliers(spark, sf_dir, "EUROPE")
    p = _t(spark, sf_dir, "part").filter(
        F.col("p_size").between(10, 20) & (F.col("p_type") == "STANDARD"))
    cand = (ps.join(F.broadcast(p), ps.l_partkey == p.p_partkey)
            .join(F.broadcast(eu), ps.l_suppkey == eu.s_suppkey)
            .select("p_partkey", "p_name", "s_suppkey", "s_name",
                    F.col("n_name").alias("nation"), "bal_c"))
    best = (cand.groupBy("p_partkey")
            .agg(F.min("bal_c").alias("__mb"))
            .select(F.col("p_partkey").alias("__bp"), "__mb"))
    return (cand.join(F.broadcast(best),
                      (cand.p_partkey == F.col("__bp"))
                      & (cand.bal_c == F.col("__mb")))
            .select((F.col("bal_c") / 100.0).alias("s_acctbal"),
                    "s_name", "nation", "p_partkey", "p_name"))


@register(
    "tpch_q8_market_share",
    oracle=f"""
    WITH vol AS (
        SELECT CAST(EXTRACT(YEAR FROM o.o_orderdate) AS INTEGER) AS o_year,
               sn.n_name AS supp_nation,
               {_DISC_SQL} AS volume_u
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation cn ON c.c_nationkey = cn.n_nationkey
        JOIN region r ON cn.n_regionkey = r.r_regionkey
        JOIN part p ON l.l_partkey = p.p_partkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        JOIN nation sn ON s.s_nationkey = sn.n_nationkey
        WHERE r.r_name = 'AMERICA' AND p.p_type = 'ECONOMY'
          AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00')
    SELECT o_year,
           SUM(CASE WHEN supp_nation = 'NATION_3' THEN volume_u ELSE 0 END)
               * 1.0 / SUM(volume_u) AS mkt_share
    FROM vol GROUP BY o_year
    """,
    tags=("tpch",),
)
def q_tpch_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q8-like: NATION_3's share of ECONOMY-part revenue sold into
    AMERICA, by year. Share = conditional integer sum / total integer
    sum with ONE double division per group — partition-order
    independent on both engines. Seven-way join: lineitem ⋈ orders is
    the only big-big pair; customer, both nation copies, region, part,
    supplier all broadcast."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp")))
    c = _t(spark, sf_dir, "customer")
    cn = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    p = _t(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    s = _t(spark, sf_dir, "supplier")
    sn = _t(spark, sf_dir, "nation").withColumnRenamed("n_name", "supp_nation")
    vol = (li.join(o, li.l_orderkey == o.o_orderkey)
           .join(F.broadcast(c), o.o_custkey == c.c_custkey)
           .join(F.broadcast(cn), c.c_nationkey == cn.n_nationkey)
           .join(F.broadcast(r), cn.n_regionkey == r.r_regionkey)
           .join(F.broadcast(p), li.l_partkey == p.p_partkey)
           .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
           .join(F.broadcast(sn), s.s_nationkey == sn.n_nationkey)
           .select(F.year("o_orderdate").cast("int").alias("o_year"),
                   "supp_nation", _disc_units().alias("volume_u")))
    share_num = F.sum(F.when(F.col("supp_nation") == "NATION_3",
                             F.col("volume_u")).otherwise(F.lit(0)))
    return (vol.groupBy("o_year")
            .agg((share_num * 1.0 / F.sum("volume_u")).alias("mkt_share")))


@register(
    "tpch_q11_important_parts",
    oracle=f"""
    WITH v AS (
        SELECT l.l_partkey,
               SUM({cents_sql('l.l_extendedprice')}) AS val_c
        FROM lineitem l
        JOIN ({_REGION_SUPP_SQL.format(region='EUROPE')}) eu
          ON l.l_suppkey = eu.s_suppkey
        GROUP BY l.l_partkey)
    SELECT l_partkey, val_c / 100.0 AS part_value
    FROM v WHERE val_c * 1000 > (SELECT SUM(val_c) FROM v)
    """,
    tags=("tpch",),
)
def q_tpch_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q11-like: parts whose EUROPE-supplied shipped value exceeds
    0.1% of the total such value. The scalar-subquery threshold rides
    a broadcast 1-row cross join (the q15/q22 pattern), and the
    comparison is INTEGER (val_c * 1000 > total_c) so no engine can
    disagree on the boundary. One shuffle, on l_partkey; the per-part
    frame is reused for both the threshold sum and the filter."""
    li = _t(spark, sf_dir, "lineitem")
    eu = _region_suppliers(spark, sf_dir, "EUROPE")
    v = (li.join(F.broadcast(eu), li.l_suppkey == eu.s_suppkey)
         .groupBy("l_partkey")
         .agg(F.sum(cents("l_extendedprice")).alias("val_c")))
    total = v.agg(F.sum("val_c").alias("__total_c"))
    return (v.crossJoin(F.broadcast(total))
            .filter(F.col("val_c") * 1000 > F.col("__total_c"))
            .select("l_partkey", (F.col("val_c") / 100.0).alias("part_value")))


@register(
    "tpch_q12_late_lines_by_flag",
    oracle="""
    SELECT l.l_returnflag,
           CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY
    GROUP BY l.l_returnflag
    """,
    tags=("tpch",),
)
def q_tpch_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q12-like: late-shipment line counts split by order priority
    class per return flag (the fixture has no l_shipmode, so the
    grouping dimension is l_returnflag; lateness is shipdate more than
    30 days after the order date — a non-equi conjunct evaluated as a
    post-join filter on the l_orderkey equi-join). Two conditional
    aggregates over a 3-row group domain; AQE collapses the final
    exchange to one partition."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (li.join(o, li.l_orderkey == o.o_orderkey)
            .filter(F.col("l_shipdate")
                    > F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS"))
            .groupBy("l_returnflag")
            .agg(F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
                 F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count")))


@register(
    "tpch_q16_supplier_part_spec_counts",
    oracle="""
    WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
    SELECT p.p_brand, p.p_type, p.p_size,
           COUNT(DISTINCT ps.l_suppkey) AS supplier_cnt
    FROM part p JOIN ps ON p.p_partkey = ps.l_partkey
    WHERE p.p_brand <> 'Brand#13' AND p.p_type <> 'PROMO'
      AND p.p_size IN (1, 4, 9, 14, 19, 23, 36, 45)
      AND ps.l_suppkey NOT IN
          (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p.p_brand, p.p_type, p.p_size
    """,
    tags=("tpch", "J3"),
)
def q_tpch_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q16-like: how many distinct suppliers can deliver each part
    spec, excluding one brand, the PROMO type, and suppliers in the
    red (the fixture's stand-in for the spec's complaints filter).
    The NOT IN becomes a broadcast LEFT ANTI join against the tiny
    negative-balance supplier list — the exclusion list contains no
    NULLs by construction, so anti-join and NOT IN agree. The
    distinct-pair projection is the only lineitem pass."""
    li = _t(spark, sf_dir, "lineitem")
    ps = li.select("l_partkey", "l_suppkey").distinct()
    p = _t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#13") & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 4, 9, 14, 19, 23, 36, 45))
    bad = (_t(spark, sf_dir, "supplier")
           .filter(F.col("s_acctbal") < 0).select("s_suppkey"))
    return (ps.join(F.broadcast(p), ps.l_partkey == p.p_partkey)
            .join(F.broadcast(bad), ps.l_suppkey == bad.s_suppkey,
                  "left_anti")
            .groupBy("p_brand", "p_type", "p_size")
            .agg(F.countDistinct("l_suppkey").alias("supplier_cnt")))


@register(
    "tpch_q20_promotable_suppliers",
    oracle=f"""
    WITH red AS (
        SELECT l.l_suppkey,
               SUM({cents_sql('l.l_quantity')}) AS q_c
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        WHERE p.p_name LIKE 'red%'
        GROUP BY l.l_suppkey),
    thr AS (SELECT CAST(FLOOR(0.5 * AVG(q_c)) AS BIGINT) AS t FROM red)
    SELECT s.s_suppkey, s.s_name, red.q_c / 100.0 AS red_qty
    FROM supplier s
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    JOIN red ON s.s_suppkey = red.l_suppkey, thr
    WHERE r.r_name = 'ASIA' AND red.q_c > thr.t
    """,
    tags=("tpch", "J5"),
)
def q_tpch_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q20-like: ASIA suppliers who shipped more than half the average
    per-supplier volume of red parts — the spec's nested IN-subquery
    with a correlated aggregate threshold, decorrelated into (red
    volume per supplier) ⨝ (1-row scalar threshold, broadcast) ⨝
    (region-filtered supplier dim, broadcast). The threshold floors to
    an integer so the strict comparison is exact; the red frame is
    grouped on l_suppkey — the same key the supplier join probes, and
    at |supplier| cardinality it broadcasts."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").filter(F.col("p_name").startswith("red"))
    red = (li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
           .groupBy("l_suppkey")
           .agg(F.sum(cents("l_quantity")).alias("q_c")))
    thr = red.agg(F.floor(F.avg("q_c") * 0.5).cast("bigint").alias("__t"))
    qualifying = (red.crossJoin(F.broadcast(thr))
                  .filter(F.col("q_c") > F.col("__t")))
    asia = _region_suppliers(spark, sf_dir, "ASIA")
    return (asia.join(F.broadcast(qualifying),
                      asia.s_suppkey == qualifying.l_suppkey)
            .select("s_suppkey", "s_name",
                    (F.col("q_c") / 100.0).alias("red_qty")))


@register(
    "tpch_q21_waiting_supplier",
    oracle="""
    SELECT s.s_name, COUNT(*) AS numwait
    FROM supplier s
    JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
    JOIN orders o ON o.o_orderkey = l1.l_orderkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'EUROPE' AND o.o_orderstatus = 'F'
      AND l1.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
    GROUP BY s.s_name
    """,
    tags=("tpch", "J3"),
)
def q_tpch_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q21-like: EUROPE suppliers who were the SOLE late shipper on a
    finished multi-supplier order. The oracle states it with the
    spec's correlated EXISTS + NOT EXISTS self-joins; the Spark plan
    decorrelates both into ONE per-order profile aggregate —
    countDistinct(supplier) and countDistinct(late supplier) — then:

        l1 late  ∧  n_supps ≥ 2  ∧  n_late = 1
      ⇔ l1 late  ∧  ∃ other supplier  ∧  ¬∃ other LATE supplier

    (l1 late puts l1's supplier in the late set, so n_late = 1 pins
    that set to exactly {l1.supplier}). lineitem ⋈ orders shuffles on
    l_orderkey; the profile agg and the join back both reuse that key
    — two exchanges total on the big table, no correlated per-row
    probe, no self-join of lineitem against itself at full width."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    lo = (li.join(o, li.l_orderkey == o.o_orderkey)
          .select("l_orderkey", "l_suppkey",
                  (F.col("l_shipdate")
                   > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
                  .alias("late")))
    profile = (lo.groupBy("l_orderkey")
               .agg(F.countDistinct("l_suppkey").alias("__n_supps"),
                    F.countDistinct(
                        F.when(F.col("late"), F.col("l_suppkey")))
                    .alias("__n_late"))
               .filter((F.col("__n_supps") >= 2) & (F.col("__n_late") == 1))
               .select(F.col("l_orderkey").alias("__ok")))
    eu = _region_suppliers(spark, sf_dir, "EUROPE")
    return (lo.filter(F.col("late"))
            .join(profile, lo.l_orderkey == F.col("__ok"))
            .join(F.broadcast(eu), lo.l_suppkey == eu.s_suppkey)
            .groupBy("s_name")
            .agg(F.count("*").alias("numwait")))
