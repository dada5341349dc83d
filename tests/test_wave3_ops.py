"""Edge-case unit tests for the round-7 third-wave operators (the
driver oracle covers the fixture-scale happy path; these pin boundary
semantics)."""

from __future__ import annotations

from event_streaming_service_spark.operators import analytics


def _baskets(spark, rows):
    return spark.createDataFrame(rows, "b long, i long")


def test_association_rules_exact_ppm(spark):
    rows = [(1, 1), (1, 2), (1, 3),
            (2, 1), (2, 2),
            (3, 1), (3, 2), (3, 4),
            (4, 3), (4, 4),
            (5, 3), (5, 4)]
    out = analytics.association_rules(
        _baskets(spark, rows), "b", "i",
        min_pair_count=2, top_n=10).collect()
    assert [(r["item_a"], r["item_b"]) for r in out] == [(1, 2), (3, 4)]
    r12, r34 = out
    # N=5; cnt(1)=cnt(2)=3; pair(1,2)=3 -> lift = 3*5e6 // 9 = 1666666
    assert r12["support_ppm"] == 600_000
    assert r12["conf_ab_ppm"] == 1_000_000
    assert r12["lift_ppm"] == 1_666_666
    # cnt(3)=cnt(4)=3; pair(3,4)=2 -> lift = 2*5e6 // 9 = 1111111
    assert r34["support_ppm"] == 400_000
    assert r34["conf_ab_ppm"] == 666_666
    assert r34["conf_ba_ppm"] == 666_666
    assert r34["lift_ppm"] == 1_111_111
    # duplicate (basket, item) rows must not inflate counts
    out2 = analytics.association_rules(
        _baskets(spark, rows + rows), "b", "i",
        min_pair_count=2, top_n=10).collect()
    assert [(r["item_a"], r["item_b"], r["lift_ppm"]) for r in out2] == \
        [(r["item_a"], r["item_b"], r["lift_ppm"]) for r in out]


def test_seasonal_anomaly_exact_threshold(spark):
    import datetime
    from event_streaming_service_spark.operators import anomaly

    # five Mondays, hour 10: counts [10,10,10,10,30] -> only the 30
    # crosses 1.5 population sigmas (4*80^2 > 9*1600); a two-day cell
    # can NEVER flag (max deviation is exactly 1 sigma).
    rows = []
    eid = 0
    for day, n in [("2024-01-01", 10), ("2024-01-08", 10),
                   ("2024-01-15", 10), ("2024-01-22", 10),
                   ("2024-01-29", 30)]:
        for i in range(n):
            rows.append((eid, datetime.datetime.fromisoformat(
                f"{day} 10:{i:02d}:00"),))
            eid += 1
    # a 2-observation cell (Tuesdays hour 3) with wild swing: no flag
    for day, n in [("2024-01-02", 1), ("2024-01-09", 59)]:
        for i in range(n):
            rows.append((eid, datetime.datetime.fromisoformat(
                f"{day} 03:{i:02d}:00"),))
            eid += 1
    ev = spark.createDataFrame(rows, "event_id long, ts timestamp")
    out = anomaly.seasonal_count_anomalies(ev, "ts").collect()
    assert len(out) == 1
    r = out[0]
    assert (str(r["event_date"])[:10], r["hr"], r["cnt"]) == \
        ("2024-01-29", 10, 30)
