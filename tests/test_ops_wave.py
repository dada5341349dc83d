"""OHLC bars and skew-profile operators: determinism and exactness on
constructed frames."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from event_streaming_service_spark.operators import analytics, skew


def test_ohlc_open_close_tiebreak(spark):
    """Duplicate timestamps within a bar: the (ts, cents) total order
    must pick the smaller cents as open and the larger as close."""
    t0 = datetime.datetime(2024, 1, 1, 10, 0, 0)
    rows = [("a", t0, 5.00), ("a", t0, 3.00),               # same open ts
            ("a", t0 + datetime.timedelta(hours=1), 9.00),
            ("a", t0 + datetime.timedelta(hours=2), 7.00),
            ("a", t0 + datetime.timedelta(hours=2), 8.00)]  # same close ts
    df = spark.createDataFrame(rows, "k string, ts timestamp, value double")
    out = analytics.ohlc_bars(
        df, "k", "ts",
        F.expr("CAST(FLOOR(value * 100 + 0.5) AS BIGINT)"),
        F.date_trunc("day", F.col("ts")).cast("timestamp")).collect()
    assert len(out) == 1
    bar = out[0]
    assert bar["open_cents"] == 300    # smaller cents at the open tie
    assert bar["close_cents"] == 800   # larger cents at the close tie
    assert bar["high_cents"] == 900
    assert bar["low_cents"] == 300
    assert bar["volume"] == 5
    assert bar["total_cents"] == 3200


def test_key_skew_profile_exact(spark):
    rows = ([("hot",)] * 60) + ([("warm",)] * 30) + ([("cold",)] * 10)
    df = spark.createDataFrame(rows, "k string")
    out = skew.key_skew_profile(df, "k", top_n=2).collect()
    assert [r["key"] for r in out] == ["hot", "warm"]
    hot = out[0]
    assert hot["cnt"] == 60
    assert hot["share_ppm"] == 600_000          # 60/100
    assert hot["hot_x_avg_ppm"] == 1_800_000    # 60 vs avg 33.3 -> 1.8x
    assert hot["n_keys"] == 3
