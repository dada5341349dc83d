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


# ---------------------------------------------------------------- TWA


def _valued(spark, rows):
    return spark.createDataFrame(
        [(i, u, datetime(2024, 1, d, h, m), v)
         for i, (u, d, h, m, v) in enumerate(rows)],
        "event_id bigint, user_id bigint, ts timestamp, value double")


def test_twa_weights_by_holding_interval(spark):
    from event_streaming_service_spark.operators.windows import (
        time_weighted_avg,
    )
    # value 10 holds 60 min, value 20 holds 30 min, value 99 terminal
    df = _valued(spark, [
        (1, 1, 10, 0, 10.0), (1, 1, 11, 0, 20.0), (1, 1, 11, 30, 99.0),
    ])
    row = time_weighted_avg(df, "user_id", "ts", "value",
                            order_tiebreak="event_id").first()
    assert row["n_events"] == 3
    assert row["span_ms"] == 90 * 60_000
    assert row["twa_value"] == pytest.approx((10 * 60 + 20 * 30) / 90)


def test_twa_single_event_and_duplicate_instant(spark):
    from event_streaming_service_spark.operators.windows import (
        time_weighted_avg,
    )
    df = _valued(spark, [
        (1, 1, 10, 0, 42.0),                      # lone event: NULL twa
        (2, 1, 10, 0, 5.0), (2, 1, 10, 0, 7.0),   # same instant pair
        (2, 1, 11, 0, 1.0),
    ])
    out = {r["user_id"]: r
           for r in time_weighted_avg(df, "user_id", "ts", "value",
                                      order_tiebreak="event_id").collect()}
    assert out[1]["twa_value"] is None and out[1]["span_ms"] == 0
    # the first of the duplicate pair holds 0 ms; the second holds the
    # full hour -> twa == 7 exactly, regardless of tiebreak direction
    assert out[2]["twa_value"] == pytest.approx(7.0)


# --------------------------------------------------- transition matrix


def test_transition_matrix_counts_and_conditional_prob(spark):
    df = spark.createDataFrame(
        [(1, 1, datetime(2024, 1, 1, 10), "a"),
         (2, 1, datetime(2024, 1, 1, 11), "b"),
         (3, 1, datetime(2024, 1, 1, 12), "a"),
         (4, 2, datetime(2024, 1, 1, 10), "a"),
         (5, 2, datetime(2024, 1, 1, 11), "b"),
         # user 3 contributes no transition (single event)
         (6, 3, datetime(2024, 1, 1, 10), "z")],
        "event_id bigint, user_id bigint, ts timestamp, event_type string")
    out = {(r["prev_type"], r["next_type"]): r for r in
           analytics.transition_matrix(df, "user_id", "ts", "event_type",
                                       order_tiebreak="event_id").collect()}
    assert out[("a", "b")]["n_transitions"] == 2
    assert out[("b", "a")]["n_transitions"] == 1
    assert out[("a", "b")]["prob"] == 1.0       # a only ever -> b
    assert out[("b", "a")]["prob"] == 1.0
    assert ("z", "a") not in out and ("a", "z") not in out


# ------------------------------------------------------------ trend OLS


def test_trend_ols_exact_line_and_degenerate_keys(spark):
    df = spark.createDataFrame(
        # user 1: value rises exactly 24 units/day
        [(1, datetime(2024, 1, 1, 0), 0.0),
         (1, datetime(2024, 1, 1, 6), 6.0),
         (1, datetime(2024, 1, 1, 12), 12.0),
         # user 2: flat -> slope 0
         (2, datetime(2024, 1, 1, 0), 5.0),
         (2, datetime(2024, 1, 2, 0), 5.0),
         # user 3: single point -> NULL slope
         (3, datetime(2024, 1, 1, 0), 9.0)],
        "user_id bigint, ts timestamp, value double")
    out = {r["user_id"]: r for r in
           analytics.trend_ols(df, "user_id", "ts", "value").collect()}
    assert out[1]["slope_per_day"] == pytest.approx(24.0)
    assert out[2]["slope_per_day"] == 0.0
    assert out[3]["slope_per_day"] is None
    assert out[3]["n_points"] == 1


def test_twa_day_scale_values_do_not_overflow(spark):
    """value 2e5 (micro 2e11) held for a day (8.64e7 ms): the per-row
    product exceeds int64 and must widen to decimal, not throw/wrap."""
    from event_streaming_service_spark.operators.windows import (
        time_weighted_avg,
    )
    df = _valued(spark, [
        (1, 1, 0, 0, 200_000.0), (1, 2, 0, 0, 200_000.0),
        (1, 3, 0, 0, 100_000.0),
    ])
    row = time_weighted_avg(df, "user_id", "ts", "value",
                            order_tiebreak="event_id").first()
    assert row["twa_value"] == pytest.approx(200_000.0)


# ------------------------------------------------------------ PageRank


def test_pagerank_integer_fixpoint_and_symmetry(spark):
    from event_streaming_service_spark.operators.graph import pagerank

    # symmetric 2-cycle is stationary at the start mass
    cyc = spark.createDataFrame(
        [("a", "b"), ("b", "a")], "src string, dst string")
    got = {r["node"]: r["rank_nano"]
           for r in pagerank(cyc, iterations=7).collect()}
    assert got == {"a": 1_000_000_000, "b": 1_000_000_000}

    # path a-b-c (undirected): ends stay symmetric, center dominates
    path = spark.createDataFrame(
        [("a", "b"), ("b", "a"), ("b", "c"), ("c", "b")],
        "src string, dst string")
    one = {r["node"]: r["rank_nano"]
           for r in pagerank(path, iterations=1).collect()}
    assert one["a"] == one["c"] == 150_000_000 + 425_000_000
    assert one["b"] == 150_000_000 + 2 * 850_000_000


# -------------------------------------------------------- journey paths


def test_session_paths_boundaries_slice_and_microsecond_order(spark):
    from datetime import timedelta

    base = datetime(2024, 1, 1, 12, 0, 0)
    gap = 30 * 60_000
    rows = [
        # user 1 session A: exactly-gap events MERGE (boundary rule);
        # two same-millisecond events order by MICROsecond ts, not id
        (9, 1, base, "a"),
        (3, 1, base + timedelta(microseconds=200), "b"),
        (5, 1, base + timedelta(minutes=30), "c"),        # == gap: merges
        # user 1 session B: gap+1ms later -> new session
        (6, 1, base + timedelta(minutes=60, milliseconds=1), "d"),
        # user 2: six events -> path truncated to max_steps=5
        *[(10 + i, 2, base + timedelta(seconds=i), t)
          for i, t in enumerate("uvwxyz")],
    ]
    df = spark.createDataFrame(
        rows, "event_id bigint, user_id bigint, ts timestamp, event_type string")
    got = {r["path"]: r["n_sessions"] for r in
           analytics.session_paths(df, "user_id", "ts", "event_type",
                                   gap_ms=gap, max_steps=5,
                                   top_n=10).collect()}
    # same-ms pair: event 9 at .000000 precedes event 3 at .000200
    assert got == {"a>b>c": 1, "d": 1, "u>v>w>x>y": 1}


def test_session_paths_topn_tiebreak_is_total(spark):
    base = datetime(2024, 1, 1, 12, 0, 0)
    rows = [(i, i, base, t) for i, t in
            enumerate(["a", "b", "c", "a"])]   # a:2 sessions, b:1, c:1
    df = spark.createDataFrame(
        rows, "event_id bigint, user_id bigint, ts timestamp, event_type string")
    out = [(r["path"], r["n_sessions"]) for r in
           analytics.session_paths(df, "user_id", "ts", "event_type",
                                   gap_ms=1000, max_steps=5,
                                   top_n=2).collect()]
    assert sorted(out) == [("a", 2), ("b", 1)]   # b beats c on path asc


def test_transition_matrix_segmented_is_bit_identical(spark):
    """n_segments decomposes per-key adjacency into within-segment
    pairs + boundary pairs — integer counts, so the result must equal
    the single-window form EXACTLY, including across segment
    boundaries and same-timestamp tiebreaks."""
    import random
    from datetime import datetime, timedelta

    from event_streaming_service_spark.operators.analytics import (
        transition_matrix,
    )
    rng = random.Random(11)
    base = datetime(2024, 6, 1)
    rows = [(i, i % 5, base + timedelta(seconds=rng.randrange(10_000)),
             f"t{rng.randrange(4)}")
            for i in range(2000)]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string")
    plain = {(r["prev_type"], r["next_type"]):
             (r["n_transitions"], r["prob"])
             for r in transition_matrix(df, "user_id", "ts", "event_type",
                                        order_tiebreak="event_id").collect()}
    seg = {(r["prev_type"], r["next_type"]):
           (r["n_transitions"], r["prob"])
           for r in transition_matrix(df, "user_id", "ts", "event_type",
                                      order_tiebreak="event_id",
                                      n_segments=7).collect()}
    assert plain == seg
