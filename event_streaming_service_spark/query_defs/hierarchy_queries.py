"""Recursive hierarchy rollup query (operators/hierarchy.py).

The part table carries a synthetic but deterministic bill-of-materials
tree: part k's parent is k DIV 10 when that is >= 1 (1..9 are roots;
key 0 is an isolated singleton, which is why the closure's node
universe comes from the part table itself, not the edge list). Fixture
part keys are contiguous from 0, so every parent exists and the tree
depth is ceil(log10(max key)) — 4 at sf0.01, 7 at sf100. The rollup
aggregates exact retail-price cents over every subtree; the oracle is
the literal WITH RECURSIVE twin, bit-exact because everything is
integer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from event_streaming_service_spark.functions.money import cents, cents_sql
from event_streaming_service_spark.operators import hierarchy
from event_streaming_service_spark.queries import register
from event_streaming_service_spark.sources import tables


@register(
    "part_hierarchy_rollup",
    oracle=f"""
    WITH RECURSIVE cl(anc, des, depth) AS (
        SELECT p_partkey, p_partkey, 0 FROM part
        UNION ALL
        SELECT anc // 10, des, depth + 1 FROM cl WHERE anc // 10 >= 1
    )
    SELECT anc AS p_partkey,
           CAST(COUNT(*) AS BIGINT) AS n_desc,
           CAST(SUM(v.price_cents) AS BIGINT) AS subtree_retail_cents,
           CAST(MAX(depth) AS INTEGER) AS subtree_height
    FROM cl JOIN (SELECT p_partkey,
                         {cents_sql('p_retailprice')} AS price_cents
                  FROM part) v
      ON v.p_partkey = cl.des
    GROUP BY anc
    """,
    tags=("hierarchy", "recursive", "rollup", "tpch"),
)
def q_part_hierarchy_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arbitrary-depth subtree rollup over the synthetic part BOM tree
    (parent = key DIV 10): per node, descendant count, exact subtree
    retail cents, and subtree height — Spark's recursive-CTE
    equivalent via iterated equi-joins with a localCheckpoint per
    level (depth is log-bounded, so 4-7 shallow joins replace the
    recursion)."""
    part = tables.load_table(spark, sf_dir, "part")
    edges = (part.select(F.col("p_partkey").alias("child"),
                         F.expr("p_partkey DIV 10").alias("parent"))
             .where(F.col("parent") >= 1))
    vals = part.select("p_partkey",
                       cents("p_retailprice").alias("price_cents"))
    # the DIV-10 key tree has depth ceil(log10(max key)) — 8 levels
    # covers part counts to 10^8 keys (sf~500); probe_empty=False makes
    # the whole closure ONE lazy plan with zero build-time actions, so
    # benchmarks time the real work
    out = hierarchy.hierarchy_rollup(edges, vals, "p_partkey",
                                     "price_cents", max_depth=8,
                                     probe_empty=False)
    return out.select("p_partkey", "n_desc",
                      F.col("subtree_value").alias("subtree_retail_cents"),
                      "subtree_height")


@register(
    "part_hierarchy_paths",
    oracle="""
    WITH RECURSIVE up(des, anc, path, depth) AS (
        SELECT p_partkey, p_partkey, CAST(p_partkey AS VARCHAR), 0
        FROM part
        UNION ALL
        SELECT des, anc // 10,
               CAST(anc // 10 AS VARCHAR) || '>' || path, depth + 1
        FROM up WHERE anc // 10 >= 1
    )
    SELECT des AS p_partkey,
           CAST(anc AS BIGINT) AS root_key,
           CAST(depth AS INTEGER) AS depth,
           path
    FROM up
    WHERE anc // 10 < 1
    """,
    tags=("hierarchy", "recursive", "listagg", "tpch"),
)
def q_part_hierarchy_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flattened-hierarchy dimension over the part BOM tree: every
    part's root ancestor, depth, and materialized root>...>node path
    string — the recursive family's read-side twin (the rollup is the
    aggregate side). The oracle accumulates the same path inside the
    recursion and keeps each node's full chain (the row whose ancestor
    is a root)."""
    part = tables.load_table(spark, sf_dir, "part")
    edges = (part.select(F.col("p_partkey").alias("child"),
                         F.expr("p_partkey DIV 10").alias("parent"))
             .where(F.col("parent") >= 1))
    return hierarchy.hierarchy_paths(
        edges, part, "p_partkey", max_depth=8, probe_empty=False)
