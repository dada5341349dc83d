"""Recursive hierarchy rollup: aggregate a measure up an
arbitrary-depth parent/child tree — the WITH RECURSIVE shape (bill of
materials, org charts, category trees) that plain GROUP BY ROLLUP
cannot express because the depth is data-dependent.

No reference counterpart (the closest is the lag rollup's fixed
two-level grand total, operators/stats.py); this is the one
TPC-H-adjacent query family the engine lacked (VERDICT r4 item #8).

Spark has no recursive CTE, so the ancestor closure is built by
ITERATED equi-joins: frontier_0 = (node, node), frontier_{k+1} =
frontier_k joined one step up the parent edge. Each iteration is one
hash join; the loop stops when the frontier empties (checked with a
cheap isEmpty action) or at `max_depth` — a hierarchy's depth is
log-bounded in practice (10^1..10^2 for real trees), so lineage stays
shallow and no checkpoint is needed. The closure size is
sum-over-nodes(depth(node)) ~ N * avg_depth — the same blow-up a
recursive CTE materializes, distributed over the cluster instead of
one engine thread.

Exactness: the rollup itself is COUNT + integer SUM over the closure
— no floats anywhere, so the DuckDB WITH RECURSIVE twin matches
bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def ancestor_closure(edges: DataFrame, child_col: str = "child",
                     parent_col: str = "parent",
                     max_depth: int = 30,
                     nodes: DataFrame | None = None,
                     probe_empty: bool = True) -> DataFrame:
    """Transitive (ancestor, descendant, depth) closure of a
    parent/child edge list, INCLUDING the reflexive depth-0 pairs.
    `nodes` (single column `node`) is the node universe; when omitted
    it falls back to the edge endpoints — but callers with isolated
    nodes (no parent, no children) must pass the universe explicitly
    or those nodes drop out of the reflexive base. Cycles are cut
    by the max_depth bound (a cycle would otherwise iterate forever —
    trees and DAG-shaped hierarchies are the contract; detecting a
    cycle is `closure.where(depth > 0 AND anc = des)`).

    probe_empty=True (the unknown-depth default) materializes each
    frontier (localCheckpoint) and stops at the first empty one —
    driver actions happen at BUILD time. Callers who know a depth
    bound (ceil(log_b N) for a b-ary key tree) pass probe_empty=False:
    the closure is then ONE fully-lazy plan of exactly max_depth
    chained joins — no build-time actions, no checkpoints (keep
    max_depth small; every level is a join in the single plan, and
    levels past the true depth are empty and near-free under AQE;
    the cached edge frame then lives until the caller clears the
    cache — the probing path unpersists it itself)."""
    e = (edges.select(F.col(child_col).alias("__c"),
                      F.col(parent_col).alias("__p"))
         .where(F.col(parent_col).isNotNull())
         .distinct()
         .cache())
    if nodes is None:
        nodes = (e.select(F.col("__c").alias("node"))
                 .unionByName(e.select(F.col("__p").alias("node")))
                 .distinct())
    base = nodes.select(F.col("node").alias("anc"),
                        F.col("node").alias("des"),
                        F.lit(0).alias("depth"))
    out = base
    frontier = base
    for _ in range(max_depth):
        frontier = (frontier
                    .join(e, frontier.anc == e.__c)
                    .select(F.col("__p").alias("anc"),
                            F.col("des"),
                            (F.col("depth") + 1).alias("depth")))
        if probe_empty:
            # materialize the (shrinking) frontier: the emptiness
            # check and the union both read it, and without a
            # checkpoint each level would recompute the chain below it
            frontier = frontier.localCheckpoint(eager=True)
            if frontier.isEmpty():
                break
        out = out.unionByName(frontier)
    if probe_empty:
        e.unpersist()
    return out


def hierarchy_rollup(edges: DataFrame, values: DataFrame,
                     key_col: str, value_col: str,
                     child_col: str = "child",
                     parent_col: str = "parent",
                     max_depth: int = 30,
                     probe_empty: bool = True) -> DataFrame:
    """Subtree aggregate per node: for every node, the count and exact
    integer sum of `value_col` over ALL its descendants (itself
    included) plus its subtree height. One closure build + one hash
    aggregate keyed on the ancestor."""
    cl = ancestor_closure(
        edges, child_col, parent_col, max_depth,
        nodes=values.select(F.col(key_col).alias("node")).distinct(),
        probe_empty=probe_empty)
    v = values.select(F.col(key_col).alias("des"),
                      F.col(value_col).alias("__v"))
    return (cl.join(v, "des")
            .groupBy("anc")
            .agg(F.count(F.lit(1)).alias("n_desc"),
                 F.sum("__v").cast("bigint").alias("subtree_value"),
                 F.max("depth").cast("int").alias("subtree_height"))
            .withColumnRenamed("anc", key_col))


def hierarchy_paths(edges: DataFrame, nodes: DataFrame,
                    key_col: str,
                    child_col: str = "child",
                    parent_col: str = "parent",
                    max_depth: int = 30,
                    probe_empty: bool = True) -> DataFrame:
    """Materialized root-to-node paths: for every node, its root
    ancestor, its depth (chain length), and the full `root>...>node`
    path string — the flattened-hierarchy dimension every BI layer
    builds from a parent/child table (the read-side complement of
    hierarchy_rollup's aggregate).

    One closure build + one per-node aggregate: the node's ancestor
    chain is exactly its closure rows, each carrying its distance, so
    sorting by descending depth lays out root-first order; the root is
    the chain's deepest ancestor. Path length is bounded by the tree
    depth, so the collected per-node state is max_depth entries."""
    cl = ancestor_closure(
        edges, child_col, parent_col, max_depth,
        nodes=nodes.select(F.col(key_col).alias("node")).distinct(),
        probe_empty=probe_empty)
    # struct(-depth, anc): ascending sort = descending depth = root
    # first (tree chains have unique depths per descendant)
    chain = F.array_sort(F.collect_list(
        F.struct((-F.col("depth")).alias("nd"), F.col("anc").alias("a"))))
    return (cl.groupBy("des")
            .agg(F.max("depth").cast("int").alias("depth"),
                 chain.alias("__chain"))
            .select(F.col("des").alias(key_col),
                    F.element_at(F.col("__chain"), 1)["a"].alias("root_key"),
                    "depth",
                    F.array_join(
                        F.transform(F.col("__chain"),
                                    lambda x: x["a"].cast("string")),
                        ">").alias("path")))
