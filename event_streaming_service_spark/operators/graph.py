"""Iterative graph analytics: PageRank in exact integer arithmetic —
the third iterative operator in the engine (after dedup.py's
connected-components label propagation and similarity.py's Lloyd
k-means), covering the score-propagation family (influence ranking,
importance-weighted sampling of linked corpora).

Exactness device: ranks live as integer NANO-units. One update is

    r'(v) = floor(0.15 * 1e9) + sum over in-edges (u, v) of
            floor(d_num * r(u) / (d_den * outdeg(u)))

— every term an integer, every division floored, so the k-th iterate
is a pure integer function of the graph: the SQL oracle (the same k
updates unrolled as chained CTEs) matches bit-for-bit, which a
float PageRank never would (per-node in-edge sums fold in partition
order). At the default width the quotient r*d_num stays below 2^53,
so the floored double division both engines evaluate is exact; for
corpus-scale graphs pass decimal=True and every term widens to
decimal(38,0) with the floored quotient computed as
(a - pmod(a, b)) / b — exact at any realistic rank magnitude (the
division result is integer-valued, so the engine's scale-6 decimal
quotient is representable exactly).

Scale: one hash-join + aggregate per iteration (edges x ranks on the
src key, re-aggregated on dst); the edge table is the only large
operand and is never mutated, so a real deployment caches it and the
per-iteration shuffle is rank-table-sized. Iterations are a fixed
small k (PageRank converges geometrically; k=5-20 is the production
norm), so lineage stays shallow — no checkpoint needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from event_streaming_service_spark.operators.hints import (
    gated_broadcast_rows)

# Packed-pair radix: (u, v) pairs ride hash aggregates / anti-joins /
# top-k as ONE bigint u * _PACK + v. Ids must stay below 2^31 so the
# packed value fits BIGINT (u * 2^32 + v < 2^63).
_PACK = 1 << 32
_PACK_MAX_ID = 1 << 31

TELEPORT_NANO = 150_000_000      # floor(0.15 * 1e9)
INIT_NANO = 1_000_000_000        # unnormalized start mass per node


def pagerank(edges: DataFrame, iterations: int = 5,
             damping_num: int = 85, damping_den: int = 100,
             src_col: str = "src", dst_col: str = "dst",
             decimal: bool = False,
             materialize: bool = False,
             broadcast_ranks: bool = False,
             seeds: list | None = None) -> DataFrame:
    """Integer-exact PageRank over a directed edge list (callers union
    reversed edges for the undirected form). Returns (node, rank_nano)
    after `iterations` updates from a uniform INIT_NANO start. Nodes
    are the edge endpoints (an edge list has no isolated nodes).

    decimal=True widens rank_nano and the per-edge floored quotient to
    decimal(38,0) for graphs whose rank mass can cross 2^53 (VERDICT
    r4 item #4); results equal the default path wherever both are in
    range, and the column type is the only schema difference.

    Caching lifecycle: the edge+degree operand and the node list are
    cached for the duration of the iterations and — because the result
    is lazy — stay cached until the caller drops them
    (spark.catalog.clearCache(), session end). Long-lived drivers that
    invoke pagerank repeatedly should pass materialize=True: the final
    ranks are eagerly localCheckpoint-ed (small: one row per node) and
    the two cached operands are unpersisted before returning.

    broadcast_ranks=True pins the per-iteration rank table (and the
    contribution aggregate) to the broadcast side of its joins — the
    right plan whenever the NODE set fits an executor (the edge table
    never re-shuffles; post-aggregate size estimates are too opaque
    for AQE to pick this up on its own). Leave False for graphs whose
    node set itself is cluster-scale.

    seeds=[...] switches to PERSONALIZED PageRank: start mass and the
    per-update teleport land only on the seed node literals instead of
    uniformly — ranks then measure proximity to the seed set (the
    related-items / trust-propagation shape). Same integer-nano
    exactness; non-seed leaves simply decay toward 0."""
    # the graph is static across iterations — cache it WITH the
    # out-degree pre-joined, or iteration k re-derives the edge list k
    # times through the growing rank lineage and pays two joins per
    # round instead of one (measured 8.5 s -> 4.4 s -> 3.6 s at sf0.1
    # for the trade-graph query)
    e = (edges.select(F.col(src_col).alias("src"),
                      F.col(dst_col).alias("dst"))
         .distinct())
    deg_w = Window.partitionBy("src")
    e = e.withColumn("__deg", F.count(F.lit(1)).over(deg_w)).cache()
    nodes = (e.select(F.col("src").alias("node"))
             .unionByName(e.select(F.col("dst").alias("node")))
             .distinct().cache())
    rank_t = "decimal(38,0)" if decimal else "bigint"
    if seeds is None:
        teleport = F.lit(TELEPORT_NANO)
        init = F.lit(INIT_NANO)
    else:
        is_seed = F.col("node").isin(list(seeds))
        teleport = F.when(is_seed, F.lit(TELEPORT_NANO)).otherwise(F.lit(0))
        init = F.when(is_seed, F.lit(INIT_NANO)).otherwise(F.lit(0))
    ranks = nodes.withColumn("rank_nano", init.cast(rank_t))
    for _ in range(iterations):
        if decimal:
            # exact floored quotient in decimal: a, b >= 0 integers =>
            # floor(a/b) = (a - pmod(a,b)) / b, and that division is
            # integer-valued so the engine's fixed-scale decimal
            # quotient represents it exactly (never floor a raw
            # decimal division — its scale-6 rounding can cross an
            # integer boundary)
            a = (F.col("rank_nano") * F.lit(damping_num)) \
                .cast("decimal(38,0)")
            b = (F.lit(damping_den) * F.col("__deg")) \
                .cast("decimal(38,0)")
            quot = ((a - F.pmod(a, b)) / b).cast(rank_t)
        else:
            quot = F.floor(F.col("rank_nano") * F.lit(damping_num)
                           / (F.lit(damping_den) * F.col("__deg")))
        r = F.broadcast(ranks) if broadcast_ranks else ranks
        contrib = (e
                   .join(r, e.src == r.node)
                   .select(F.col("dst").alias("node"),
                           quot.alias("__c")))
        agg = contrib.groupBy("node").agg(F.sum("__c").alias("__in"))
        if broadcast_ranks:
            agg = F.broadcast(agg)
        ranks = (nodes
                 .join(agg, "node", "left")
                 .select("node",
                         (teleport
                          + F.coalesce(F.col("__in"),
                                       F.lit(0).cast(rank_t)))
                         .cast(rank_t).alias("rank_nano")))
    if materialize:
        out = ranks.localCheckpoint(eager=True)
        e.unpersist()
        nodes.unpersist()
        return out
    return ranks


def triangle_stats(edges: DataFrame, a_col: str = "a",
                   b_col: str = "b") -> DataFrame:
    """Exact triangle count + global clustering coefficient of an
    undirected simple graph — the motif statistic behind community
    detection and spam/bot-graph screening.

    Scale design: the classic DEGREE ORIENTATION (node-iterator++,
    Chiba-Nishizeki): orient every undirected edge from its
    (degree, id)-smaller endpoint to the larger, so each node's
    out-degree is bounded by O(sqrt(m)) on any graph (arboricity
    bound) — then triangles are wedges (u->v, u->w), v<w in the same
    order, closed by an oriented edge (v->w). The wedge join fans out
    by the ORIENTED degree, never the raw degree: a celebrity node
    with 10^6 neighbors contributes nothing to the join fan-out
    because its edges all point INTO it. Two equi-joins, one exact
    aggregate; no windows, no iteration.

    Returns one row: n_nodes, n_edges (undirected), n_wedges (open +
    closed, from raw degrees: sum deg*(deg-1)/2), n_triangles, and
    clustering_ppm = 3 * triangles * 1e6 DIV wedges (0 when no
    wedges). All exact bigints / truncating division."""
    und = (edges
           .select(F.least(F.col(a_col), F.col(b_col)).alias("x"),
                   F.greatest(F.col(a_col), F.col(b_col)).alias("y"))
           .where(F.col("x") != F.col("y"))
           .distinct())
    deg = (und.select(F.col("x").alias("n"))
           .unionAll(und.select(F.col("y").alias("n")))
           .groupBy("n").agg(F.count(F.lit(1)).alias("deg")))
    # deg is node-grain (two BIGINTs per node — orders of magnitude
    # smaller than the edge set on any real graph): broadcast both
    # degree lookups explicitly. AQE keeps these SMJ at runtime (the
    # union+agg subtree defeats its size estimate), and the two
    # edge-set sort+shuffle legs they force are ~20% of the query
    # (measured interleaved best-of-4: 7.72 -> 6.22 s at sf0.1).
    dx = F.broadcast(
        deg.select(F.col("n").alias("x"), F.col("deg").alias("dx")))
    dy = F.broadcast(
        deg.select(F.col("n").alias("y"), F.col("deg").alias("dy")))
    # orient: src = endpoint with (smaller degree, then smaller id)
    withd = und.join(dx, "x").join(dy, "y")
    fwd = (F.col("dx") < F.col("dy")) | (
        (F.col("dx") == F.col("dy")) & (F.col("x") < F.col("y")))
    oriented = withd.select(
        F.when(fwd, F.col("x")).otherwise(F.col("y")).alias("src"),
        F.when(fwd, F.col("y")).otherwise(F.col("x")).alias("dst"))
    # wedge (u->v, u->w) pairs dedup by dst ID; the closing edge is
    # oriented by the (degree, id) order, which need NOT match the id
    # order — so close against the UNDIRECTED id-ordered edge set
    # (checking the oriented form here silently dropped every triangle
    # whose closing edge points id-backwards; caught by the planted
    # 1M-triangle scale probe, which knows the true count)
    e1, e2 = oriented.alias("e1"), oriented.alias("e2")
    closing = und.select(F.col("x").alias("__cx"),
                         F.col("y").alias("__cy"))
    tri = (e1.join(e2, (F.col("e1.src") == F.col("e2.src"))
                   & (F.col("e1.dst") < F.col("e2.dst")))
           .join(closing, (F.col("__cx") == F.col("e1.dst"))
                 & (F.col("__cy") == F.col("e2.dst")))
           .agg(F.count(F.lit(1)).alias("n_triangles")))
    wedges = deg.agg(
        F.sum(F.expr("deg * (deg - 1) DIV 2")).cast("bigint")
        .alias("n_wedges"))
    counts = und.agg(F.count(F.lit(1)).alias("n_edges"))
    nodes = deg.agg(F.count(F.lit(1)).alias("n_nodes"))
    return (nodes.crossJoin(counts).crossJoin(wedges).crossJoin(tri)
            .withColumn(
                "clustering_ppm",
                F.when(F.col("n_wedges") > 0,
                       F.expr("3 * n_triangles * 1000000"
                              " DIV n_wedges"))
                .otherwise(F.lit(0)).cast("bigint"))
            .select("n_nodes", "n_edges", "n_wedges", "n_triangles",
                    "clustering_ppm"))


def adamic_adar_links(edges: DataFrame, top_n: int = 20,
                      a_col: str = "a", b_col: str = "b",
                      max_center_degree: int | None = None) -> DataFrame:
    """Adamic-Adar link prediction over an undirected edge set
    (a < b distinct pairs): for every NON-adjacent 2-hop pair (u, v),
    AA(u, v) = sum over common neighbors w of 1 / ln(deg(w)),
    plus the raw common-neighbor count. Returns the top_n by score.

    Per-neighbor terms are pinned to integer micro-units
    (floor(1e6 / ln(deg) + 0.5)) BEFORE the cross-row sum — the
    repo-wide rule that keeps a float-log pipeline hash-exact across
    engines (common neighbors have deg >= 2, so ln > 0 always).

    Scale shape: wedges are enumerated through the center node w —
    one self-join of the adjacency list on w, cost sum_w deg(w)^2.
    A hub node dominates that sum (one 10^6-degree celebrity alone is
    5*10^11 wedges), so `max_center_degree=C` bounds the expansion per
    center: each center's adjacency is truncated to its C smallest
    neighbor ids (a rank window on the SAME w-partitioning the wedge
    self-join shuffles on, so the exchange is reused) BEFORE the
    self-join, capping the fan-out at sum_w min(deg(w), C)^2 — the
    posting-cap device from text.inverted_index. Truncation is
    deterministic (neighbor-id order) and only ever DROPS wedges, so
    capped scores/counts are lower bounds; AA terms still use the TRUE
    degree. With C >= max degree the capped path is bit-identical to
    the exact default (asserted in tests + tools/scale_probe.py
    adamic_hub); the exact path stays the oracle-gated default.
    The final anti-join against the edge set removes already-linked
    pairs, and TakeOrderedAndProject folds to top_n without a global
    sort.

    The (u, v) pair rides the post-wedge pipeline PACKED into one
    BIGINT (u * 2^32 + v): the sum-deg^2-sized hash aggregate, the
    anti-join, and the top-k all key on a single 8-byte column
    instead of two, measured 1.6x faster end-to-end at sf0.1 (148M
    wedges). Node ids must fit in [0, 2^31); a node-count-grain check
    raises before any wedge is enumerated if one does not."""
    # The edge set feeds SIX consumers (adjacency twice per side, the
    # degree count, the final anti-join): without a persist Catalyst
    # re-derives the upstream edge pipeline (often a fact-table
    # self-join) once per consumer. Cache lifecycle: query lifetime
    # (lazy result; session end or clearCache reclaims — the pq.py
    # convention).
    und = (edges.select(F.col(a_col).alias("x"),
                        F.col(b_col).alias("y")).distinct().persist())
    adj = (und.select(F.col("x").alias("w"), F.col("y").alias("n"))
           .union(und.select(F.col("y").alias("w"),
                             F.col("x").alias("n")))).persist()
    deg = adj.groupBy("w").agg(F.count(F.lit(1)).alias("deg"))
    # deg-1 leaves never center a wedge, but ANSI mode evaluates the
    # projection for every row — guard so ln(1) = 0 never divides
    # INT term, not BIGINT: 1e6/ln(2) = 1,442,695 is the maximum, well
    # inside int32 — the term rides the 148M-row wedge shuffle, so the
    # narrower type cuts that exchange by 4 bytes/row (guide §2.3
    # "narrower types"); the aggregate SUM widens back to bigint, so
    # the output schema is unchanged
    term = F.when(
        F.col("deg") >= 2,
        F.floor(F.lit(1_000_000.0)
                / F.log(F.col("deg").cast("double"))
                + F.lit(0.5)).cast("bigint"))
    # Pack-id guard at node grain (cheap: one row per node, evaluated
    # on the same pass that computes the degree terms): assert_true is
    # NULL when the id fits, raises before any wedge is enumerated if
    # not, and `term + coalesce(NULL, 0)` keeps leaf terms NULL.
    guard = F.assert_true(
        (F.col("w") >= 0) & (F.col("w") < F.lit(_PACK_MAX_ID)),
        F.lit("adamic_adar_links: node id outside [0, 2^31) — "
              "packed-pair fast path would overflow BIGINT"))
    centers = deg.withColumn(
        "term_micro", term + F.coalesce(guard.cast("bigint"), F.lit(0)))
    # Wedge stream joins centers AFTER enumeration on purpose: centers
    # is node-count-sized, so AQE broadcasts it and the |wedges| =
    # sum deg(w)^2 stream pays one hash probe per row. (Folding the
    # term into an adjacency leg BEFORE the self-join was measured
    # 1.6-2.4x SLOWER at sf0.1: the extra column rides through the
    # sort-merge wedge join's sort buffers, which costs more than the
    # broadcast probe it saves.)
    if max_center_degree is not None:
        # per-center top-C expansion: deterministic smallest-id
        # truncation, applied to HUB CENTERS ONLY (deg > C). Windowing
        # the whole adjacency was measured 1.4x slower end-to-end at
        # sf0.1 where the copurchase graph has NO hubs (max degree 222
        # vs C=1024 — the sort bought nothing); splitting on the
        # already-computed degree makes the capped path cost one
        # broadcast anti-join when the cap never binds (the hub list
        # is empty) while still bounding the hub term of sum deg(w)^2
        # at min(deg, C)^2 on power-law graphs. The hub adjacency
        # (only rows whose center exceeds C) persists: it feeds both
        # wedge legs and its window must not run twice.
        from pyspark.sql import Window

        hubs = (deg.filter(F.col("deg") > max_center_degree)
                .select("w"))
        wcap = Window.partitionBy("w").orderBy("n")
        capped_hub = (adj.join(F.broadcast(hubs), "w")
                      .withColumn("__r", F.row_number().over(wcap))
                      .filter(F.col("__r") <= max_center_degree)
                      .drop("__r")).persist()
        wedge_adj = (adj.join(F.broadcast(hubs), "w", "left_anti")
                     .unionByName(capped_hub))
    else:
        wedge_adj = adj
    l = wedge_adj.select(F.col("w"), F.col("n").alias("u"))
    r = wedge_adj.select(F.col("w"), F.col("n").alias("v"))
    wedges = (l.join(r, "w").filter(F.col("u") < F.col("v"))
              .select((F.col("u") * F.lit(_PACK) + F.col("v")).alias("pk"),
                      F.col("w")))
    # The pair aggregate's keys are nearly distinct (101M distinct of
    # 148M wedges at sf0.1), so map-side partial aggregation dedups
    # almost nothing while building giant spilling hash maps sized by
    # the whole wedge stream. Repartitioning on pk FIRST makes the
    # partial agg run post-shuffle (effectively single-phase) and 4x
    # the shuffle-partition count bounds each final hash map; measured
    # 19.0 -> 12.2 s for the aggregate stage at sf0.1 (repartition
    # 32/128/256: 14.9/12.2/12.6; a numpy mapInArrow sort kernel on
    # the same stream lost to the JVM agg, 16.5 vs 13.9). The count is
    # derived from session parallelism, not a local constant, and an
    # explicit repartition is exempt from AQE coalescing.
    sess = edges.sparkSession
    nagg = 4 * max(int(sess.conf.get("spark.sql.shuffle.partitions")),
                   sess.sparkContext.defaultParallelism)
    scored = (wedges.join(centers.select("w", "term_micro"), "w")
              .repartition(nagg, "pk")
              .groupBy("pk")
              .agg(F.count(F.lit(1)).alias("common_neighbors"),
                   F.sum("term_micro").alias("aa_micro")))
    # The anti-join keys on the UNPACKED (u, v) pair on purpose: a
    # single-bigint join key routes the broadcast build through
    # LongHashedRelation, whose map degrades pathologically on sparse
    # u*2^32+v keys (observed: a 5M-edge build burned 16 min on one
    # thread; the generic two-column UnsafeHashedRelation builds the
    # same side in seconds). The aggregate above keeps the packed key
    # — hash aggs don't take that code path.
    unpacked = scored.select(
        # integer unpack — float division would round above 2^53
        F.shiftright(F.col("pk"), 32).alias("u"),
        (F.col("pk") % F.lit(_PACK)).alias("v"),
        F.col("common_neighbors"), F.col("aa_micro"))
    # r13 measured-and-REJECTED variants (tools/ab_adamic2.py, 4-way
    # interleaved best-of-3 at sf0.1: base 23.8 s, int-term 26.8,
    # broadcast-anti 26.5, both 26.8): (a) an explicit gated broadcast
    # of `und` here makes Catalyst push the LeftAnti below the pair
    # aggregate, trading the post-agg Exchange+Sort (which AQE already
    # rewrites to a runtime BHJ) for a per-WEDGE hash probe — 148M
    # probes cost more than the 101M-row exchange they avoid; (b) an
    # int32 term_micro narrows the wedge exchange 4 bytes/row but the
    # per-row widening in the sum eats the saving. The r12 plan-pruned
    # exchange (pk + term only, w dropped) is already the narrow shape.
    non_adj = unpacked.join(
        und, (unpacked["u"] == und["x"]) & (unpacked["v"] == und["y"]),
        "left_anti")
    return (non_adj
            .orderBy(F.col("aa_micro").desc(), F.col("u"), F.col("v"))
            .limit(top_n))


def kcore_peel(edges: DataFrame, k: int = 3, rounds: int = 6,
               a_col: str = "a", b_col: str = "b",
               broadcast_keep: bool = False) -> DataFrame:
    """k-core membership by EXACTLY `rounds` peeling rounds: each
    round drops nodes of degree < k and the edges touching them.
    Peeling is monotone, so once a round changes nothing every later
    round is a no-op — running a fixed count is semantically the
    true k-core whenever the graph stabilizes within `rounds`, and
    (crucially for the oracle) a deterministic, engine-portable
    function of the input either way: the SQL twin unrolls the same
    `rounds` CTE stages, so both engines compute the identical set
    even on adversarial inputs that need more rounds.

    Returns (node, deg_in_core) for surviving nodes.

    Plan shape for 100 TB: per round one degree aggregate plus two
    semi-joins on the shrinking adjacency, each round
    localCheckpoint-ed (the near_dup_clusters convention) — adj
    feeds THREE consumers per round (the degree agg and both semi-
    join probes), so a lazy plan re-derives the previous round 3x
    per level: 3^rounds expansion, observed as an OOM at rounds=6
    on the vanilla driver heap. Checkpointing bounds every round to
    one shuffle set over the shrinking adjacency. Production picks
    `rounds` ~ O(log n) for real degree distributions; a
    pathological chain needs O(n) rounds.

    broadcast_keep=True pins the node-grain survivor set to the
    broadcast side of both per-round semi-joins (the hits
    broadcast_scores device) so the checkpointed adjacency never
    re-shuffles inside a round; leave False for cluster-scale node
    sets. Each round's checkpoint is LAZY and the early-exit count is
    the action that materializes it — one barrier job per round
    instead of the former eager-checkpoint + count pair (r13, guide
    §1.2: at sf0.1 the round count, not the data, is the cost)."""
    und = (edges.select(F.col(a_col).alias("x"),
                        F.col(b_col).alias("y")).distinct())
    adj = (und.select(F.col("x").alias("w"), F.col("y").alias("n"))
           .union(und.select(F.col("y").alias("w"),
                             F.col("x").alias("n")))
           ).localCheckpoint(eager=False)
    # early exit at the fixpoint: a round that drops no edge proves
    # every node kept its degree, so all remaining rounds are no-ops
    # and skipping them cannot change the result. The count doubles as
    # the checkpoint's materializing action (one job), then reads
    # cached partitions.
    n_edges = adj.count()
    for _ in range(rounds):
        keep = (adj.groupBy("w")
                .agg(F.count(F.lit(1)).alias("deg"))
                .filter(F.col("deg") >= k)
                .select("w"))
        keep = _bc(keep, broadcast_keep)
        adj = (adj
               .join(keep, "w", "left_semi")
               .join(keep.select(F.col("w").alias("n")), "n",
                     "left_semi")).localCheckpoint(eager=False)
        n_next = adj.count()
        if n_next == n_edges:
            break
        n_edges = n_next
    return (adj.groupBy(F.col("w").alias("node"))
            .agg(F.count(F.lit(1)).alias("deg_in_core")))


def wl_roles(edges: DataFrame, rounds: int = 2,
             a_col: str = "a", b_col: str = "b",
             broadcast_hashes: bool = False) -> DataFrame:
    """Weisfeiler-Leman node role hashing (the 1-WL color refinement
    behind graph-isomorphism tests and WL graph kernels,
    Weisfeiler & Leman 1968; Shervashidze et al., JMLR 2011): start
    every node at a canonical label of its degree, then for `rounds`
    iterations relabel each node with
        h'(v) = md5( h(v) || ':' || join(sorted [h(u) for u ~ v]) )
    Nodes sharing a role hash after k rounds have isomorphic
    k-neighborhood label trees — structural roles (leaf, hub spoke,
    bridge, clique member) fall out without any training.

    Engine-portable by construction: md5 and binary-lexicographic
    string sorts exist identically in Spark and DuckDB (degree labels
    are zero-padded so the string sort is also the numeric sort).

    Returns (node, deg, wl_role) with node named after a_col.

    Scale shape: one shuffle per round — join the neighbor's current
    hash onto the adjacency (node-keyed build side) and re-aggregate
    the sorted list per node; both hash on the node key, so the
    exchange is reused. The collect_list per node is degree-bounded —
    a 1e6-degree hub makes a 32 MB label list, the same hub hazard
    adamic_adar_links caps; production would cap or sample neighbor
    multisets per center the same way.

    broadcast_hashes=True pins the node-grain hash frame to the
    broadcast side of the per-round adjacency join (the hits
    broadcast_scores device) so the cached adjacency never re-shuffles
    per round; leave False for cluster-scale node sets. Each round's
    hash frame persists (r13): it feeds BOTH the next round's
    neighbor-list build and the relabel join, and without the pin the
    whole previous round re-evaluates once per consumer — 2x plan
    growth per round (guide §2.4)."""
    fwd = edges.select(F.col(a_col).alias("n"), F.col(b_col).alias("m"))
    adj = (fwd.unionByName(fwd.select(F.col("m").alias("n"),
                                      F.col("n").alias("m")))
           .persist())
    deg = adj.groupBy("n").agg(F.count(F.lit(1)).alias("deg"))
    h = deg.select("n", F.lpad(F.col("deg").cast("string"), 8, "0")
                   .alias("h")).persist()
    for _ in range(rounds):
        hb = _bc(h, broadcast_hashes)
        nb = (adj.join(hb.select(F.col("n").alias("m"),
                                 F.col("h").alias("hm")), "m")
              .groupBy("n")
              .agg(F.concat_ws(
                  ",", F.sort_array(F.collect_list("hm"))).alias("nbs")))
        h = (hb.join(nb, "n")
             .select("n", F.md5(F.concat_ws(":", "h", "nbs")).alias("h"))
             .persist())
    return (deg.join(h, "n")
            .select(F.col("n").alias(a_col),
                    F.col("deg").cast("bigint").alias("deg"),
                    F.col("h").alias("wl_role")))


HITS_SCALE = 1_000_000_000


def _bc(df: DataFrame, flag: bool) -> DataFrame:
    """Broadcast hint applied only when the caller asked for it."""
    return F.broadcast(df) if flag else df


def hits(edges: DataFrame, iterations: int = 3,
         src_col: str = "src", dst_col: str = "dst",
         broadcast_scores: bool = False) -> DataFrame:
    """Integer-exact HITS (Kleinberg hubs & authorities) over a
    directed edge list: hub score = how much good authority a node
    points AT, authority score = how much good hub mass points at IT
    — the directed complement of PageRank's single centrality (a
    customer buying from every top supplier is a hub; a supplier every
    big buyer touches is an authority).

    Each half-round is the textbook update followed by L1
    normalization to HITS_SCALE total (the usual L2 norm needs a
    sqrt; L1 keeps the fixpoint's direction and stays in integers):
        auth_raw(i) = sum_{j->i} hub(j);  auth = auth_raw * S DIV tot
    and symmetrically for hubs from the fresh authorities. The DIV is
    truncating in both engines, every intermediate is decimal(38,0),
    so the unrolled oracle hash-matches exactly.

    Scale shape: per round, one equi-join of the cached edge list
    against the node-grain score frame + one hash agg, then a 1-row
    total broadcast-cross-joined back (the quantiles.py device — no
    global window). Node-only rows keep 0 via left joins.

    broadcast_scores=True pins the node-grain score frame (and the
    per-round contribution aggregate) to the broadcast side of its
    joins — the lpa broadcast_labels device: the cached edge list
    then never re-shuffles per half-round (post-aggregate size
    estimates are too opaque for AQE to pick this up on its own).
    Right whenever the NODE set fits an executor; leave False for
    cluster-scale node sets."""
    dec = "decimal(38,0)"
    e = (edges.select(F.col(src_col).alias("src"),
                      F.col(dst_col).alias("dst"))
         .distinct().cache())
    nodes = (e.select(F.col("src").alias("node"))
             .unionByName(e.select(F.col("dst").alias("node")))
             .distinct().cache())
    hubs = nodes.withColumn("s", F.lit(HITS_SCALE).cast(dec))
    auths = None
    for i in range(iterations):
        # each raw frame is consumed TWICE (total + normalize) and
        # feeds the remaining rounds -> without a pin per round the
        # plan tree doubles per half-round (OOMed the driver). A lazy
        # persist covers the double consumption; ONE eager
        # localCheckpoint per round (on the round's hub frame, plus
        # the final auth frame) keeps the iterated lineage flat at a
        # third of the eager-everywhere materialization cost.
        hb = _bc(hubs, broadcast_scores)
        araw = (nodes.join(
                    _bc(e.join(hb, e.src == hb.node)
                        .groupBy(F.col("dst").alias("node"))
                        .agg(F.sum("s").cast(dec).alias("raw")),
                        broadcast_scores),
                    "node", "left")
                .select("node", F.coalesce(F.col("raw"),
                                           F.lit(0).cast(dec))
                        .alias("raw"))
                .persist())
        atot = araw.agg(F.sum("raw").cast(dec).alias("__tot"))
        auths = (araw.crossJoin(F.broadcast(atot))
                 .select("node", F.expr(
                     f"CAST((raw * {HITS_SCALE} - pmod(raw *"
                     f" {HITS_SCALE}, __tot)) / __tot"
                     " AS DECIMAL(38,0))").alias("s")))
        if i == iterations - 1:
            auths = auths.localCheckpoint(eager=True)
        ab = _bc(auths, broadcast_scores)
        hraw = (nodes.join(
                    _bc(e.join(ab, e.dst == ab.node)
                        .groupBy(F.col("src").alias("node"))
                        .agg(F.sum("s").cast(dec).alias("raw")),
                        broadcast_scores),
                    "node", "left")
                .select("node", F.coalesce(F.col("raw"),
                                           F.lit(0).cast(dec))
                        .alias("raw"))
                .persist())
        htot = hraw.agg(F.sum("raw").cast(dec).alias("__tot"))
        hubs = (hraw.crossJoin(F.broadcast(htot))
                .select("node", F.expr(
                    f"CAST((raw * {HITS_SCALE} - pmod(raw *"
                    f" {HITS_SCALE}, __tot)) / __tot"
                    " AS DECIMAL(38,0))").alias("s"))
                .localCheckpoint(eager=True))
        araw.unpersist()
        hraw.unpersist()
    return (hubs.withColumnRenamed("s", "__h")
            .join(_bc(auths.withColumnRenamed("s", "__a"),
                      broadcast_scores), "node")
            .select("node",
                    F.col("__h").cast("bigint").alias("hub_nano"),
                    F.col("__a").cast("bigint").alias("auth_nano")))


def label_propagation(edges: DataFrame, rounds: int = 3,
                      a_col: str = "a", b_col: str = "b",
                      broadcast_labels: bool = False) -> DataFrame:
    """Synchronous label-propagation community detection over an
    undirected edge list (RAGHAVAN et al.'s near-linear LPA, made
    fully deterministic): every node starts as its own label; each
    round every node adopts the label that is MOST FREQUENT among its
    neighbors, ties broken by the SMALLEST label — the (count desc,
    label asc) ranking, so the classic random tie-flip disappears and
    the fixed round count has an exact unrolled SQL twin. Communities
    after k rounds are k-hop label basins: denser regions collapse
    onto their minimum id, bridges keep their sides apart (contrast
    with the near-dup min-label propagation, which computes CONNECTED
    COMPONENTS — LPA splits a connected graph into cohesive parts).

    Scale shape per round: one equi-join of the cached undirected
    edge list against the node-grain label frame, a hash agg to the
    (node, neighbor-label) grain, and one per-node argmax window
    whose partition is bounded by degree. Labels pin via eager
    localCheckpoint per round (node-grain rows; keeps the iterated
    lineage flat — the pagerank/BPE convention)."""
    und = (edges.select(F.col(a_col).alias("n"), F.col(b_col).alias("m"))
           .unionByName(
               edges.select(F.col(b_col).alias("n"),
                            F.col(a_col).alias("m")))
           .distinct().cache())
    labels = (und.select(F.col("n").alias("node")).distinct()
              .withColumn("lab", F.col("node"))
              .localCheckpoint(eager=True))
    w = Window.partitionBy("n").orderBy(F.col("c").desc(), F.col("lab"))
    for _ in range(rounds):
        # broadcast_labels=True pins the node-grain label frame to the
        # broadcast side so the cached edge list never re-shuffles per
        # round — right whenever the NODE set fits an executor (the
        # pagerank broadcast_ranks caveat applies: leave False for
        # cluster-scale node sets)
        r = F.broadcast(labels) if broadcast_labels else labels
        counts = (und.join(r, und.m == r.node)
                  .groupBy("n", "lab")
                  .agg(F.count(F.lit(1)).alias("c")))
        labels = (counts
                  .withColumn("__rn", F.row_number().over(w))
                  .filter(F.col("__rn") == 1)
                  .select(F.col("n").alias("node"), "lab")
                  .localCheckpoint(eager=True))
    wlab = Window.partitionBy("lab")
    return labels.select(
        "node", F.col("lab").alias("community"),
        F.count(F.lit(1)).over(wlab).cast("bigint")
        .alias("community_size"))
