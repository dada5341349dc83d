"""Exact-quantile operator (operators/quantiles.py): equality with the
sorted ground truth, recursion and heavy-duplicate paths, edge qs."""

from __future__ import annotations

import math

import pandas as pd
from pyspark.sql import functions as F

from event_streaming_service_spark.operators.quantiles import exact_quantiles


def _ground_truth(values, qs):
    s = sorted(values)
    n = len(s)
    return {q: s[max(1, math.ceil(q * n)) - 1] for q in qs}


def _check(spark, values, qs, **kw):
    df = spark.createDataFrame(
        pd.DataFrame({"v": pd.Series(values, dtype="float64")})
    ).repartition(8)
    out = {r["q"]: r for r in exact_quantiles(df, "v", qs, **kw).collect()}
    want = _ground_truth([v for v in values if v == v], qs)
    assert set(out) == set(qs)
    for q in qs:
        assert out[q]["value"] == want[q], (q, out[q]["value"], want[q])
        assert out[q]["n"] == len([v for v in values if v == v])
    return out


def test_matches_sorted_ground_truth(spark):
    values = [((i * 2654435761) % 9973) / 7.0 for i in range(5000)]
    _check(spark, values, [0.01, 0.25, 0.5, 0.75, 0.99, 1.0])


def test_recursion_path_with_tiny_caps(spark):
    """bins=4, inbin_cap=16 forces multi-level histogram descent."""
    values = [float((i * 48271) % 30011) for i in range(3000)]
    _check(spark, values, [0.1, 0.5, 0.9], bins=4, inbin_cap=16)


def test_heavy_duplicates_resolve_without_descent(spark):
    """A dominant repeated value collapses its bucket envelope to one
    value — must resolve immediately even though the bucket count far
    exceeds inbin_cap."""
    values = [42.0] * 2000 + [float(i) for i in range(100)]
    out = _check(spark, values, [0.5, 0.9], bins=8, inbin_cap=64)
    assert out[0.5]["value"] == 42.0


def test_nulls_ignored_and_empty_frame(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"v": [None, 1.0, None, 2.0, 3.0]}))
    out = {r["q"]: r["value"]
           for r in exact_quantiles(df, "v", [0.5]).collect()}
    assert out == {0.5: 2.0}
    empty = df.filter(F.col("v") > 100)
    assert exact_quantiles(empty, "v", [0.5]).count() == 0


def test_extreme_quantiles_hit_min_and_max(spark):
    values = [float(i) for i in range(1, 1001)]
    out = _check(spark, values, [0.001, 1.0])
    assert out[0.001]["value"] == 1.0   # rank max(1, ceil(1.0)) = 1
    assert out[1.0]["value"] == 1000.0
