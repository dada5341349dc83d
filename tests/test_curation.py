"""Unit tests for the corpus-curation operators (operators/curation.py)
and the recursive hierarchy rollup (operators/hierarchy.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from event_streaming_service_spark.operators import curation, hierarchy


def test_split_assign_deterministic_and_complete(spark):
    df = spark.range(1, 2001).withColumn(
        "split", curation.split_assign(F.col("id")))
    counts = {r["split"]: r["n"] for r in
              df.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert set(counts) == {"train", "val", "test"}
    # 90/5/5 within hash-uniformity tolerance on 2000 keys
    assert counts["train"] > 1600
    assert counts["val"] + counts["test"] < 400
    # pure function of the key: re-evaluation identical
    again = {r["id"]: r["split"] for r in df.collect()}
    redo = {r["id"]: r["split"] for r in
            spark.range(1, 2001).withColumn(
                "split", curation.split_assign(F.col("id"))).collect()}
    assert again == redo


def test_curriculum_buckets_equal_counts_and_order(spark):
    df = spark.createDataFrame(
        [(i, float(i % 37)) for i in range(100)], "doc_id long, s double")
    out = curation.curriculum_buckets(df, "s", "doc_id", n_buckets=4)
    rows = out.collect()
    sizes = {}
    for r in rows:
        sizes[r["bucket"]] = sizes.get(r["bucket"], 0) + 1
    assert sizes == {1: 25, 2: 25, 3: 25, 4: 25}
    # bucket boundaries respect the (s, doc_id) order
    by_bucket = {}
    for r in rows:
        by_bucket.setdefault(r["bucket"], []).append((r["s"], r["doc_id"]))
    assert max(by_bucket[1]) <= min(by_bucket[2])
    assert max(by_bucket[3]) <= min(by_bucket[4])


def test_char_gini_known_values(spark):
    df = spark.createDataFrame(
        [(1, "aaaa"), (2, "abab"), (3, "abcd"), (4, "")],
        "doc_id long, text string")
    got = {r["doc_id"]: (r["n_chars_counted"], r["distinct_chars"],
                         r["gini_ppm"])
           for r in curation.char_gini(df).collect()}
    assert got[1] == (4, 1, 0)                # single char: impurity 0
    assert got[2] == (4, 2, 500000)           # two equal chars: 1/2
    assert got[3] == (4, 4, 750000)           # uniform 4: 3/4
    assert 4 not in got                       # empty text yields no row


def test_bpe_merge_pairs_vocab_weighting(spark):
    # "ab ab ab cd" -> pair 'ab' count 3 (one vocab row, weight 3)
    df = spark.createDataFrame([(1, "ab ab ab cd")],
                               "doc_id long, text string")
    got = {r["pair"]: r["pair_count"]
           for r in curation.bpe_merge_pairs(df).collect()}
    assert got == {"ab": 3, "cd": 1}


def test_vocab_coverage_exact_ppm(spark):
    # vocab_size=1 keeps only the most frequent token ("x", count 3)
    df = spark.createDataFrame(
        [(1, "x x y"), (2, "x z z")], "doc_id long, text string")
    got = {r["doc_id"]: (r["n_tokens"], r["oov_tokens"],
                         r["coverage_ppm"])
           for r in curation.vocab_coverage(df, vocab_size=1).collect()}
    assert got[1] == (3, 1, 666666)
    assert got[2] == (3, 2, 333333)


def test_hierarchy_rollup_chain_and_isolated(spark):
    # chain 1 <- 2 <- 3 plus isolated node 9
    edges = spark.createDataFrame([(2, 1), (3, 2)], "child long, parent long")
    vals = spark.createDataFrame([(1, 10), (2, 20), (3, 40), (9, 5)],
                                 "k long, v long")
    got = {r["k"]: (r["n_desc"], r["subtree_value"], r["subtree_height"])
           for r in hierarchy.hierarchy_rollup(
               edges, vals, "k", "v").collect()}
    assert got[1] == (3, 70, 2)
    assert got[2] == (2, 60, 1)
    assert got[3] == (1, 40, 0)
    assert got[9] == (1, 5, 0)    # isolated: reflexive row only


def test_ancestor_closure_dag_multiple_parents(spark):
    # DAG: 3 has parents 1 and 2 — closure carries BOTH ancestor paths
    edges = spark.createDataFrame([(3, 1), (3, 2)], "child long, parent long")
    cl = hierarchy.ancestor_closure(edges)
    pairs = {(r["anc"], r["des"], r["depth"]) for r in cl.collect()}
    assert (1, 3, 1) in pairs and (2, 3, 1) in pairs
    assert (1, 1, 0) in pairs and (3, 3, 0) in pairs


def test_hierarchy_paths_chain_and_roots(spark):
    edges = spark.createDataFrame([(2, 1), (3, 2)], "child long, parent long")
    nodes = spark.createDataFrame([(1,), (2,), (3,), (9,)], "k long")
    from event_streaming_service_spark.operators.hierarchy import (
        hierarchy_paths,
    )
    got = {r["k"]: (r["root_key"], r["depth"], r["path"])
           for r in hierarchy_paths(edges, nodes, "k").collect()}
    assert got[3] == (1, 2, "1>2>3")
    assert got[2] == (1, 1, "1>2")
    assert got[1] == (1, 0, "1")
    assert got[9] == (9, 0, "9")   # isolated node is its own root
