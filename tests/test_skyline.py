"""Pareto-frontier operator semantics: dominance edges (coincident
points, equal-price columns) and the global bucketed prefix-max path
checked against a brute-force reference (operators/skyline.py)."""

from __future__ import annotations

import random

from event_streaming_service_spark.operators import skyline


def _brute_frontier(points):
    """Quadratic reference: the definition, applied literally."""
    out = []
    for a in points:
        dominated = any(
            b[0] <= a[0] and b[1] >= a[1] and (b[0] < a[0] or b[1] > a[1])
            for b in points)
        if not dominated:
            out.append(a)
    return sorted(set(out))


def test_frontier_edges_coincident_and_equal_price(spark):
    pts = [(10, 5), (10, 5),      # coincident pair: both survive, n_items 2
           (10, 3),               # same price, smaller -> dominated
           (5, 5),                # cheaper at same size -> dominates (10,5)? yes
           (20, 9), (20, 8),      # same price: only the 9 survives
           (1, 1)]                # cheapest: survives
    df = spark.createDataFrame(pts, "p bigint, q bigint")
    got = {(r["p"], r["q"]): r["n_items"]
           for r in skyline.pareto_frontier(df, "p", "q").collect()}
    # (10,5) is dominated by (5,5); (10,3) by (10,5); (20,8) by (20,9)
    assert got == {(1, 1): 1, (5, 5): 1, (20, 9): 1}


def test_global_path_matches_brute_force(spark):
    rng = random.Random(7)
    pts = [(rng.randrange(0, 1000), rng.randrange(0, 100))
           for _ in range(500)]
    df = spark.createDataFrame(pts, "p bigint, q bigint")
    got = sorted((r["p"], r["q"]) for r in
                 skyline.pareto_frontier(df, "p", "q",
                                         n_buckets=8).collect())
    assert got == _brute_frontier(pts)


def test_grouped_path_matches_brute_force_per_group(spark):
    rng = random.Random(11)
    pts = [(f"g{rng.randrange(3)}", rng.randrange(0, 50),
            rng.randrange(0, 50)) for _ in range(300)]
    df = spark.createDataFrame(pts, "g string, p bigint, q bigint")
    got = sorted((r["g"], r["p"], r["q"]) for r in
                 skyline.pareto_frontier(df, "p", "q",
                                         group_cols=["g"]).collect())
    want = []
    for g in {p[0] for p in pts}:
        sub = [(p, q) for gg, p, q in pts if gg == g]
        want += [(g, p, q) for p, q in _brute_frontier(sub)]
    assert got == sorted(want)


def test_single_bucket_degenerate_price_range(spark):
    # all points share one price: only the max q (with multiplicity)
    df = spark.createDataFrame([(7, i % 3) for i in range(9)],
                               "p bigint, q bigint")
    rows = skyline.pareto_frontier(df, "p", "q", n_buckets=4).collect()
    assert [(r["p"], r["q"], r["n_items"]) for r in rows] == [(7, 2, 3)]
