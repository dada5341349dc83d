"""PageRank query over the customer-supplier trade graph
(operators/graph.py): who are the structurally central parties in the
order flow — the influence-ranking shape, run in exact integer
arithmetic so the 5-iteration fixpoint hash-matches an unrolled SQL
oracle (a float PageRank's per-node in-edge sums fold in partition
order and could never be hash-checked).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from event_streaming_service_spark.operators import graph
from event_streaming_service_spark.queries import register
from event_streaming_service_spark.sources import tables

ITERS = 5

_EDGES = """
    base AS (
        SELECT DISTINCT 'c' || CAST(o.o_custkey AS VARCHAR) AS src,
               's' || CAST(l.l_suppkey AS VARCHAR) AS dst
        FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey),
    edges AS (
        SELECT src, dst FROM base
        UNION
        SELECT dst AS src, src AS dst FROM base),
    outdeg AS (SELECT src, COUNT(*) AS deg FROM edges GROUP BY src),
    nodes AS (SELECT DISTINCT src AS node FROM edges)
"""


def _iter_cte(i: int) -> str:
    prev = "r0" if i == 1 else f"r{i - 1}"
    return f"""
    r{i} AS (
        SELECT n.node,
               150000000 + COALESCE(SUM(CAST(FLOOR(
                   p.rank_nano * 85 / (100 * d.deg)) AS BIGINT)), 0)
                   AS rank_nano
        FROM nodes n
        LEFT JOIN edges e ON e.dst = n.node
        LEFT JOIN {prev} p ON p.node = e.src
        LEFT JOIN outdeg d ON d.src = e.src
        GROUP BY n.node)
    """


@register(
    "pagerank_trade_graph",
    oracle=(
        "WITH " + _EDGES + ",\n"
        "    r0 AS (SELECT node, CAST(1000000000 AS BIGINT) "
        "AS rank_nano FROM nodes),\n"
        + ",\n".join(_iter_cte(i) for i in range(1, ITERS + 1))
        + f"\n    SELECT node, CAST(rank_nano AS BIGINT) AS rank_nano "
          f"FROM r{ITERS}"
    ),
    tags=("graph", "pagerank", "iterative", "J2"),
)
def q_pagerank_trade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5-iteration integer PageRank over the undirected customer <->
    supplier graph derived from order lines: one join+aggregate per
    round over a cached edge list; the oracle unrolls the identical
    five updates as chained CTEs."""
    orders = tables.load_table(spark, sf_dir, "orders")
    lineitem = tables.load_table(spark, sf_dir, "lineitem")
    base = (orders
            .join(lineitem,
                  lineitem.l_orderkey == orders.o_orderkey)
            .select(F.concat(F.lit("c"), F.col("o_custkey").cast("string"))
                    .alias("src"),
                    F.concat(F.lit("s"), F.col("l_suppkey").cast("string"))
                    .alias("dst"))
            .distinct())
    # no .distinct() here: the c->s and s->c branches are disjoint by
    # prefix, each already distinct, and pagerank dedups its input
    edges = base.unionByName(
        base.select(F.col("dst").alias("src"),
                    F.col("src").alias("dst")))
    # broadcast_ranks was A/B-tested here (the node set is
    # dimension-sized): 2.8-3.7 s both ways, difference inside
    # host noise — keep the default shuffled join the round-4
    # plan audit already signed off on
    return graph.pagerank(edges, iterations=ITERS)
