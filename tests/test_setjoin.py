"""Prefix-filtered set-similarity join: exactness vs a brute-force
Jaccard reference and the rational-threshold boundary
(operators/setjoin.py)."""

from __future__ import annotations

import random

from event_streaming_service_spark.operators import setjoin


def _jaccard(a: set, b: set) -> float:
    return len(a & b) / len(a | b)


def test_matches_brute_force_on_random_corpus(spark):
    rng = random.Random(13)
    vocab = [f"w{i}" for i in range(40)]
    docs = []
    for i in range(60):
        base = rng.sample(vocab, rng.randrange(4, 12))
        docs.append((i, " ".join(base)))
        if rng.random() < 0.4:   # planted near-duplicate
            mutated = base[:-1] + [rng.choice(vocab)]
            docs.append((1000 + i, " ".join(mutated)))
    df = spark.createDataFrame(docs, "doc_id bigint, text string")
    got = sorted((r["doc_a"], r["doc_b"]) for r in
                 setjoin.set_similarity_join(df, threshold_num=7,
                                             threshold_den=10).collect())
    sets = {i: set(t.split()) for i, t in docs}
    want = sorted(
        (a, b) for a in sets for b in sets
        if a < b and 10 * len(sets[a] & sets[b])
        >= 7 * len(sets[a] | sets[b]))
    assert got == want and len(want) > 0


def test_exact_rational_boundary_pair_included(spark):
    # |a & b| = 7, |a u b| = 10 -> jaccard exactly 0.7: must be kept
    shared = [f"s{i}" for i in range(7)]
    a = shared + ["a1", "a2"]          # size 9
    b = shared + ["b1"]                # size 8, union 10, overlap 7
    df = spark.createDataFrame(
        [(1, " ".join(a)), (2, " ".join(b))], "doc_id bigint, text string")
    rows = setjoin.set_similarity_join(df, threshold_num=7,
                                       threshold_den=10).collect()
    assert [(r["doc_a"], r["doc_b"], r["overlap"], r["union_size"])
            for r in rows] == [(1, 2, 7, 10)]
    assert rows[0]["jaccard"] == 0.7


def test_disjoint_docs_emit_nothing(spark):
    df = spark.createDataFrame(
        [(1, "x y z"), (2, "p q r")], "doc_id bigint, text string")
    assert setjoin.set_similarity_join(df).count() == 0


def test_sub_shingle_documents_do_not_crash(spark):
    """A corpus containing empty/short documents must not crash the
    shingle path (sequence(1,0) counts DOWN in Spark; the operator
    guards with an empty shingle array)."""
    df = spark.createDataFrame(
        [(1, "alpha beta gamma delta"), (2, "alpha beta gamma delta"),
         (3, "hi there"), (4, ""), (5, "one")],
        "doc_id bigint, text string")
    rows = setjoin.set_similarity_join(df, threshold_num=7,
                                       threshold_den=10,
                                       shingle_n=3).collect()
    assert [(r["doc_a"], r["doc_b"]) for r in rows] == [(1, 2)]
