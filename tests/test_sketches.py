"""Sketch-layer operators (operators/sketches.py): Misra-Gries
candidate completeness, exact-verify equality with the naive plan, and
Z-order envelope quality."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from event_streaming_service_spark.operators import sketches


def _items(spark, values):
    pdf = pd.DataFrame({"tok": values})
    # many small partitions force cross-batch/cross-partition merging
    return spark.createDataFrame(pdf).repartition(8)


def test_heavy_hitters_equal_naive_groupby(spark):
    # skewed synthetic stream: token "hot-i" appears (i+1)*50 times,
    # plus a long tail of singletons drowning the counters
    values = []
    for i in range(5):
        values += [f"hot-{i}"] * ((i + 1) * 50)
    values += [f"tail-{j}" for j in range(3000)]
    df = _items(spark, values)
    k = 20
    got = {r["tok"]: r["cnt"]
           for r in sketches.heavy_hitters_exact(df, "tok", k).collect()}
    n = len(values)
    want = {f"hot-{i}": (i + 1) * 50 for i in range(5)
            if (i + 1) * 50 * k > n}
    assert got == want
    # shares are exact counts over the exact total
    out = sketches.heavy_hitters_exact(df, "tok", k).collect()
    for r in out:
        assert abs(r["share"] - r["cnt"] / n) < 1e-15


def test_mg_candidates_are_bounded_and_complete(spark):
    values = ["dominant"] * 5000 + [f"noise-{j}" for j in range(10000)]
    df = _items(spark, values)
    cand = sketches.misra_gries_candidates(df, "tok", 10).collect()
    toks = {r["tok"] for r in cand}
    assert "dominant" in toks            # pigeonhole guarantee
    assert len(cand) <= 2 * 10 * 8       # <= 2k per partition


def test_heavy_hitters_empty_and_uniform(spark):
    # uniform stream: nothing exceeds n/k, result must be empty
    df = _items(spark, [f"u-{j}" for j in range(500)])
    assert sketches.heavy_hitters_exact(df, "tok", 50).count() == 0


def test_zorder_key_matches_reference_interleave(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"x": [0, 1, 255, 170, 85], "y": [0, 1, 255, 85, 170]}))
    out = df.withColumn(
        "z", sketches.zorder_key([F.col("x"), F.col("y")], 8)).collect()

    def morton(x, y):
        z = 0
        for b in range(8):
            z |= ((x >> b) & 1) << (2 * b)
            z |= ((y >> b) & 1) << (2 * b + 1)
        return z

    for r in out:
        assert r["z"] == morton(r["x"], r["y"])


def test_zorder_buckets_bound_both_dimensions(spark):
    """The point of Z-order: every layout bucket's min/max envelope is
    narrow in BOTH dimensions (a single-column sort leaves the second
    dimension spanning the full range)."""
    import itertools

    pdf = pd.DataFrame(
        [(x, y) for x, y in itertools.product(range(64), range(64))],
        columns=["x", "y"])
    df = spark.createDataFrame(pdf)
    z = df.withColumn("z", sketches.zorder_key([F.col("x"), F.col("y")], 6))
    stats = (z.groupBy(F.shiftright("z", 8).alias("bucket"))
             .agg(F.min("x").alias("x0"), F.max("x").alias("x1"),
                  F.min("y").alias("y0"), F.max("y").alias("y1"))
             .collect())
    assert len(stats) == 16
    for r in stats:
        assert r["x1"] - r["x0"] <= 31
        assert r["y1"] - r["y0"] <= 15


def test_incremental_dedup_flags_cross_corpus_only(spark):
    """incremental_dedup must flag new docs duplicating the INDEX, and
    must NOT flag duplicates that exist only inside the new batch."""
    import pandas as pd

    from event_streaming_service_spark.operators import dedup

    corpus_text = "the quick brown fox jumps over the lazy dog again and again"
    other_text = "completely different words nothing shared here at all today"
    index = spark.createDataFrame(pd.DataFrame({
        "doc_id": [0, 1],
        "text": [corpus_text, "unrelated index content row two entirely"]}))
    new = spark.createDataFrame(pd.DataFrame({
        "doc_id": [10, 11, 12, 13],
        "text": [corpus_text,          # exact + near dup of index doc 0
                 other_text,           # unique
                 other_text,           # dup of 11 only — batch-internal
                 corpus_text + " x"],  # near dup of index doc 0
    }))
    out = {r["doc_id"]: r for r in
           dedup.incremental_dedup(new, index, 0.5).collect()}
    assert len(out) == 4
    assert out[10]["exact_dup"] and out[10]["exact_match_id"] == 0
    assert out[10]["near_dup"] and out[10]["near_match_id"] == 0
    assert not out[11]["exact_dup"] and not out[11]["near_dup"]
    # batch-internal duplicate is NOT an index duplicate
    assert not out[12]["exact_dup"] and not out[12]["near_dup"]
    assert not out[13]["exact_dup"]
    assert out[13]["near_dup"] and out[13]["near_match_id"] == 0
    assert out[13]["near_jaccard"] > 0.5


def test_substring_dup_stats_zero_fills_short_docs(spark):
    import pandas as pd

    from event_streaming_service_spark.operators import dedup

    shared = " ".join(f"w{i}" for i in range(12))
    docs = spark.createDataFrame(pd.DataFrame({
        "doc_id": [0, 1, 2],
        "text": [shared + " tail-a extra words here",
                 shared + " tail-b other words there",
                 "too short"]}))
    out = {r["doc_id"]: r for r in
           dedup.substring_dup_stats(docs, n=8).collect()}
    assert out[2]["n_grams"] == 0 and out[2]["dup_ratio"] == 0.0
    # the 12 shared tokens give 5 shared 8-gram windows in each doc
    assert out[0]["n_dup_grams"] == 5 and out[1]["n_dup_grams"] == 5
    assert 0 < out[0]["dup_ratio"] < 1


def test_heavy_hitters_preserves_bigint_key_type(spark):
    """mg_summaries must carry the key column's own type — forcing
    string would route the exact-count semi-join through lossy casts
    and miss hitters on int64 domains."""
    from pyspark.sql import functions as F

    big = 2**60 + 12345  # survives only if the type stays bigint
    df = (spark.range(0, 3000)
          .select(F.when(F.col("id") % 2 == 0, F.lit(big))
                  .otherwise(F.col("id")).alias("k"))
          .repartition(4))
    out = {r["k"]: r["cnt"]
           for r in sketches.heavy_hitters_exact(df, "k", 10).collect()}
    assert out == {big: 1500}
    cand = sketches.misra_gries_candidates(df, "k", 10)
    assert cand.schema["k"].dataType.simpleString() == "bigint"


def test_zorder_rejects_oversized_interleave(spark):
    import pytest as _pytest

    with _pytest.raises(ValueError, match="63"):
        sketches.zorder_key([F.col("a"), F.col("b"), F.col("c"),
                             F.col("d")], 16)


def test_cms_never_undercounts_and_is_exact_when_wide(spark):
    """Count-min invariants: est >= exact for every key (collisions
    only ADD mass), and with width >> distinct keys the estimates are
    the exact counts."""
    values = []
    for i in range(20):
        values += [f"k-{i}"] * (i + 1) * 7
    df = _items(spark, values)
    exact = {r["tok"]: r["cnt"] for r in
             df.groupBy("tok").agg(F.count("*").alias("cnt")).collect()}
    keys = df.select("tok").distinct()

    sketch = sketches.cms_table(df, "tok", depth=4, width=8192)
    est = {r["tok"]: r["est"] for r in
           sketches.cms_estimates(keys, "tok", sketch,
                                  depth=4, width=8192).collect()}
    assert est == exact  # 20 keys in 8192 buckets: no collision survives min

    narrow = sketches.cms_table(df, "tok", depth=4, width=8)
    est_n = {r["tok"]: r["est"] for r in
             sketches.cms_estimates(keys, "tok", narrow,
                                    depth=4, width=8).collect()}
    assert all(est_n[k] >= exact[k] for k in exact)
    assert sum(est_n.values()) > sum(exact.values())  # collisions visible


def test_cms_absent_key_estimates_from_collided_mass_only(spark):
    """A key never inserted gets est >= 0 purely from collisions; with
    a wide sketch that is exactly 0."""
    df = _items(spark, [f"present-{i}" for i in range(50)])
    sketch = sketches.cms_table(df, "tok", depth=4, width=8192)
    probe = spark.createDataFrame(
        pd.DataFrame({"tok": ["never-seen-a", "never-seen-b"]}))
    est = {r["tok"]: r["est"] for r in
           sketches.cms_estimates(probe, "tok", sketch,
                                  depth=4, width=8192).collect()}
    assert est == {"never-seen-a": 0, "never-seen-b": 0}
