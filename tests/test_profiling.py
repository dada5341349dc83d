"""Column-profiling operator semantics: null accounting, two-level
distinct counting, canonical forms, and the no-hot-reducer plan shape
(operators/profiling.py)."""

from __future__ import annotations

from datetime import datetime

import pytest

from event_streaming_service_spark.operators import profiling


def test_profile_counts_nulls_distincts_and_ranges(spark):
    df = spark.createDataFrame(
        [(1, "a", 1.5, datetime(2024, 3, 10, 2, 30, 0)),
         (2, "b", 2.25, datetime(2024, 3, 10, 3, 30, 0)),
         (3, None, 1.5, None),
         (4, "a", None, datetime(2024, 1, 1, 0, 0, 0))],
        "id bigint, s string, d double, t timestamp_ntz")
    out = {r["col_name"]: r for r in profiling.profile(df).collect()}

    assert out["id"]["n_rows"] == 4 and out["id"]["n_null"] == 0
    assert out["id"]["n_distinct"] == 4
    assert out["id"]["min_num"] == 1.0 and out["id"]["max_num"] == 4.0

    assert out["s"]["n_null"] == 1 and out["s"]["n_distinct"] == 2
    assert out["s"]["min_str"] == "a" and out["s"]["max_str"] == "b"
    assert out["s"]["min_num"] is None
    assert out["s"]["avg_len"] == pytest.approx(1.0)

    # doubles canonicalize to micro-units: 1.5 -> "1500000"
    assert out["d"]["n_distinct"] == 2
    assert out["d"]["min_str"] == "1500000"
    assert out["d"]["max_num"] == 2_250_000.0

    # 2024-03-10 02:30 local is inside the US spring-forward gap: the
    # field-arithmetic key must NOT shift it even under a DST session tz
    assert out["t"]["n_null"] == 1
    assert out["t"]["min_str"] == "2024-01-01 00:00:00"
    gap_ms = (datetime(2024, 3, 10, 2, 30) -
              datetime(1970, 1, 1)).total_seconds() * 1000
    ms_vals = {out["t"]["min_num"], out["t"]["max_num"]}
    assert gap_ms in ms_vals or out["t"]["max_num"] >= gap_ms


def test_profile_two_level_distinct_no_expand(spark):
    """The profile plan must not contain an Expand-based
    count(distinct) (per-column hot reducers at scale): distinct runs
    as a (col, value)-grain pre-aggregate."""
    df = spark.range(100).selectExpr("id", "CAST(id % 7 AS STRING) AS s")
    plan = (profiling.profile(df)
            ._jdf.queryExecution().executedPlan().toString())
    assert "Expand" not in plan
