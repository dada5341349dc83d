"""Funnel and cohort-retention operator semantics (micro-fixtures) and
their plan shapes (single user-key shuffle, no Python in the fold)."""

from __future__ import annotations

import contextlib
import io
from datetime import datetime

import pytest

from event_streaming_service_spark.operators import analytics


def _events(spark, rows):
    return spark.createDataFrame(
        [(u, datetime(2024, 1, d, h, m), t) for u, d, h, m, t in rows],
        "user_id bigint, ts timestamp, event_type string")


STEPS = ["view", "click", "purchase"]


def test_funnel_greedy_chain_and_partial(spark):
    df = _events(spark, [
        # u1 completes all three in order
        (1, 1, 10, 0, "view"), (1, 1, 11, 0, "click"), (1, 2, 9, 0, "purchase"),
        # u2 clicks BEFORE viewing: click must not count; no purchase
        (2, 1, 8, 0, "click"), (2, 1, 9, 0, "view"),
        # u3 never views -> absent from output despite click+purchase
        (3, 1, 7, 0, "click"), (3, 1, 8, 0, "purchase"),
        # irrelevant types are ignored entirely
        (1, 1, 9, 30, "error"),
    ])
    out = {r["user_id"]: r for r in
           analytics.funnel(df, "user_id", "ts", "event_type", STEPS).collect()}
    assert set(out) == {1, 2}
    assert out[1]["steps_completed"] == 3
    assert out[1]["step3_ts"] == datetime(2024, 1, 2, 9, 0)
    assert out[2]["steps_completed"] == 1
    assert out[2]["step2_ts"] is None and out[2]["step3_ts"] is None


def test_funnel_equal_timestamps_do_not_chain(spark):
    df = _events(spark, [
        (1, 1, 10, 0, "view"), (1, 1, 10, 0, "click"),   # same instant
        (1, 1, 11, 0, "click"),                            # later click OK
    ])
    row = analytics.funnel(df, "user_id", "ts", "event_type", STEPS).first()
    assert row["step2_ts"] == datetime(2024, 1, 1, 11, 0)


def test_funnel_greedy_earliest_is_taken(spark):
    # two valid clicks after the view: the EARLIEST one is step 2, and
    # a purchase between them still chains off the earliest
    df = _events(spark, [
        (1, 1, 10, 0, "view"), (1, 1, 11, 0, "click"),
        (1, 1, 11, 30, "purchase"), (1, 1, 12, 0, "click"),
    ])
    row = analytics.funnel(df, "user_id", "ts", "event_type", STEPS).first()
    assert row["step2_ts"] == datetime(2024, 1, 1, 11, 0)
    assert row["step3_ts"] == datetime(2024, 1, 1, 11, 30)
    assert row["steps_completed"] == 3


def test_funnel_rejects_bad_steps(spark):
    df = _events(spark, [(1, 1, 1, 0, "view")])
    with pytest.raises(ValueError):
        analytics.funnel(df, "user_id", "ts", "event_type", ["view"])
    with pytest.raises(ValueError):
        analytics.funnel(df, "user_id", "ts", "event_type",
                         ["view", "view"])


def test_funnel_plan_single_shuffle_no_python(spark):
    df = _events(spark, [(1, 1, 10, 0, "view"), (1, 1, 11, 0, "click")])
    out = analytics.funnel(df, "user_id", "ts", "event_type", STEPS)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain("formatted")
    plan = buf.getvalue()
    # formatted output names each node twice (tree + detail section)
    assert plan.count("hashpartitioning") == 1, plan
    assert "EvalPython" not in plan, plan


def test_cohort_retention_triangle(spark):
    df = _events(spark, [
        # cohort Jan 1: u1 (active d1, d3), u2 (active d1 only)
        (1, 1, 9, 0, "view"), (1, 1, 10, 0, "click"), (1, 3, 9, 0, "view"),
        (2, 1, 9, 0, "view"),
        # cohort Jan 2: u3 active d2 and d3
        (3, 2, 9, 0, "view"), (3, 3, 9, 0, "view"),
    ])
    out = analytics.cohort_retention(df, "user_id", "ts")
    got = {(str(r["cohort_day"]), r["day_offset"]):
           (r["active_users"], r["cohort_size"]) for r in out.collect()}
    assert got == {
        ("2024-01-01", 0): (2, 2),
        ("2024-01-01", 2): (1, 2),
        ("2024-01-02", 0): (1, 1),
        ("2024-01-02", 1): (1, 1),
    }
