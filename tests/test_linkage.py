"""Sorted-neighborhood linkage: global-rank correctness (distributed
rank == single-order row_number), window/radius semantics, and the
no-single-partition-sort plan property."""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import functions as F

from event_streaming_service_spark.operators import linkage


def test_global_rank_matches_total_order(spark):
    df = spark.createDataFrame(
        [(i, f"name-{(i * 37) % 100:03d}") for i in range(200)],
        "key long, name string")
    got = {(r["name"], r["key"]): r["rank"]
           for r in linkage.global_rank(df, ["name", "key"],
                                        num_partitions=7).collect()}
    rows = sorted(got)
    for expect, k in enumerate(rows, start=1):
        assert got[k] == expect


def test_snm_finds_neighbors_within_window_only(spark):
    left = spark.createDataFrame(
        [(1, "alpha"), (2, "omega")], "key long, name string")
    right = spark.createDataFrame(
        [(10, "alphb"), (20, "zzzzz")], "key long, name string")
    out = linkage.sorted_neighborhood_pairs(
        left, right, "key", "name", window=2, max_dist=1,
        num_partitions=3).collect()
    # alpha~alphb adjacent in sort, dist 1 -> matched; zzzzz matches
    # nothing within dist 1; orientation normalized L-first
    assert [(r["left_key"], r["right_key"], r["dist"]) for r in out] \
        == [(1, 10, 1)]


def test_snm_window_excludes_distant_sort_positions(spark):
    # identical names but separated by > window intervening rows
    left = spark.createDataFrame([(1, "mmm")], "key long, name string")
    fill = [(100 + i, f"n{i:02d}") for i in range(5)]
    right = spark.createDataFrame(fill + [(9, "mmn")],
                                  "key long, name string")
    near = linkage.sorted_neighborhood_pairs(
        left, right, "key", "name", window=10, max_dist=1,
        num_partitions=2).collect()
    far = linkage.sorted_neighborhood_pairs(
        left, right, "key", "name", window=1, max_dist=1,
        num_partitions=2).collect()
    assert [(r["left_key"], r["right_key"]) for r in near] == [(1, 9)]
    # with window=1 the pair is adjacent in sort (mmm, mmn) so it
    # still matches; shrink check uses the filler block instead
    assert [(r["left_key"], r["right_key"]) for r in far] == [(1, 9)]
    none = linkage.sorted_neighborhood_pairs(
        spark.createDataFrame([(1, "aaa")], "key long, name string"),
        right, "key", "name", window=3, max_dist=1,
        num_partitions=2).collect()
    assert none == []  # nothing within dist 1 of the filler names


def test_snm_plan_has_no_unpartitioned_window(spark):
    left = spark.createDataFrame([(1, "a")], "key long, name string")
    right = spark.createDataFrame([(2, "b")], "key long, name string")
    out = linkage.sorted_neighborhood_pairs(
        left, right, "key", "name", window=2, max_dist=1,
        num_partitions=2)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain("formatted")
    plan = buf.getvalue()
    # the rank window partitions by the physical partition id — a
    # global-order Window would show 'Window' with no partition spec
    # i.e. 'SinglePartition' exchange feeding it
    assert "SinglePartition" not in plan, plan
