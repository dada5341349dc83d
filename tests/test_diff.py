"""Snapshot-diff classification and last-touch attribution semantics
(operators/diff.py, operators/analytics.py:last_touch_attribution)."""

from __future__ import annotations

from datetime import datetime, timedelta

from event_streaming_service_spark.operators import analytics, diff


def test_table_diff_classifies_all_four_kinds(spark):
    old = spark.createDataFrame(
        [(1, "A", 10), (2, "B", 20), (3, "C", 30), (4, None, 40)],
        "k bigint, s string, v bigint")
    new = spark.createDataFrame(
        [(1, "A", 10),            # unchanged
         (2, "B", 99),            # changed value
         (4, "", 40),             # NULL -> empty string IS a change
         (5, "E", 50)],           # added; 3 removed
        "k bigint, s string, v bigint")
    out = {r["k"]: r["change_kind"]
           for r in diff.table_diff(old, new, ["k"], ["s", "v"])
           .collect()}
    assert out == {1: "unchanged", 2: "changed", 3: "removed",
                   4: "changed", 5: "added"}


def test_attribution_picks_latest_touch_with_id_tiebreak(spark):
    base = datetime(2024, 1, 10, 12, 0, 0)
    rows = [
        # user 1: two touches at the SAME latest instant -> higher id
        (1, 1, base - timedelta(hours=2), "view"),
        (7, 1, base - timedelta(hours=1), "click"),
        (8, 1, base - timedelta(hours=1), "view"),
        (9, 1, base, "purchase"),
        # user 2: touch outside the 7-day window -> NULL attribution
        (20, 2, base - timedelta(days=8), "view"),
        (21, 2, base, "purchase"),
        # user 3: touch AT the purchase instant must not self-attribute
        (30, 3, base, "click"),
        (31, 3, base, "purchase"),
    ]
    df = spark.createDataFrame(
        rows, "event_id bigint, user_id bigint, ts timestamp, event_type string")
    out = {r["conversion_id"]: r for r in
           analytics.last_touch_attribution(
               df, "user_id", "ts", "event_type", "purchase",
               ["view", "click"]).collect()}
    assert out[9]["touch_id"] == 8 and out[9]["touch_type"] == "view"
    assert out[9]["ms_since_touch"] == 3_600_000
    assert out[21]["touch_id"] is None
    assert out[31]["touch_id"] is None
