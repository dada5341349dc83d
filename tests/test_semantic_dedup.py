"""Semantic dedup clusters (similarity.semantic_dedup_clusters):
partition/canonical invariants and agreement with a brute-force
reference on a constructed embedding set."""

from __future__ import annotations

import math

import pandas as pd
from pyspark.sql import functions as F

from event_streaming_service_spark.operators import similarity

DIM = 8


def _vec(seed: float) -> list[float]:
    v = [math.cos(seed * (i + 1) + 0.1) for i in range(DIM)]
    n = math.sqrt(sum(x * x for x in v))
    return [x / n for x in v]


def _perturb(v: list[float], eps: float) -> list[float]:
    w = [x + eps * ((i % 3) - 1) for i, x in enumerate(v)]
    n = math.sqrt(sum(x * x for x in w))
    return [x / n for x in w]


def test_clusters_partition_and_canonical_invariants(spark):
    base_a, base_b = _vec(1.0), _vec(2.5)
    rows = [(0, base_a), (1, _perturb(base_a, 0.01)),
            (2, _perturb(base_a, 0.02)),
            (10, base_b), (11, _perturb(base_b, 0.01)),
            (20, _vec(5.0))]  # singleton
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    out = similarity.semantic_dedup_clusters(df, 0.95, DIM).collect()

    by_id = {r["vec_id"]: r for r in out}
    assert set(by_id) == {0, 1, 2, 10, 11, 20}          # exactly one row each
    for r in out:
        assert r["cluster_id"] <= r["vec_id"]            # min-label root
        assert r["is_canonical"] == (r["vec_id"] == r["cluster_id"])
    # near-identical vectors cluster together, far ones apart
    assert by_id[1]["cluster_id"] == 0 and by_id[2]["cluster_id"] == 0
    assert by_id[11]["cluster_id"] == 10
    assert by_id[20]["cluster_id"] == 20 and by_id[20]["cluster_size"] == 1
    # cluster_size is the member count of the assigned cluster
    assert by_id[0]["cluster_size"] == 3
    assert by_id[10]["cluster_size"] == 2
    # sizes partition the corpus
    assert sum(r["cluster_size"] for r in out if r["is_canonical"]) == 6


def test_threshold_one_keeps_only_exact_directions(spark):
    rows = [(0, _vec(1.0)), (1, _vec(1.0)), (2, _vec(3.0))]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    out = {r["vec_id"]: r["cluster_id"]
           for r in similarity.semantic_dedup_clusters(df, 1.0, DIM).collect()}
    assert out[1] == 0          # identical vector: cosine rounds to 1.0
    assert out[2] == 2
