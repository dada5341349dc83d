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


def test_adamic_adar_path_graph(spark):
    import math
    from event_streaming_service_spark.operators import graph
    edges = spark.createDataFrame([(1, 2), (2, 3), (2, 4), (3, 4)],
                                  "a bigint, b bigint")
    out = {(r["u"], r["v"]): r for r in
           graph.adamic_adar_links(edges, top_n=10).collect()}
    # non-adjacent 2-hop pairs: (1,3) via 2; (1,4) via 2
    assert set(out) == {(1, 3), (1, 4)}
    term_deg3 = math.floor(1e6 / math.log(3) + 0.5)  # node 2 has deg 3
    assert out[(1, 3)]["common_neighbors"] == 1
    assert out[(1, 3)]["aa_micro"] == term_deg3
    assert out[(1, 4)]["aa_micro"] == term_deg3


def test_adamic_adar_hub_cap(spark):
    import math
    from event_streaming_service_spark.operators import graph
    # hub 0 with spokes 1..40, plus a path 100-101-102 whose center
    # (deg 2) yields the single highest-scoring pair
    edges = spark.createDataFrame(
        [(0, i) for i in range(1, 41)] + [(100, 101), (101, 102)],
        "a bigint, b bigint")
    exact = graph.adamic_adar_links(edges, top_n=1000).collect()
    # cap >= max degree -> bit-identical to the exact default
    loose = graph.adamic_adar_links(edges, top_n=1000,
                                    max_center_degree=40).collect()
    assert sorted(map(tuple, exact)) == sorted(map(tuple, loose))
    # tight cap: hub expansion truncated to the 5 smallest-id spokes
    # -> C(5,2)=10 hub pairs instead of C(40,2)=780; the path pair
    # (100,102) survives untouched and still wins on score
    capped = graph.adamic_adar_links(edges, top_n=1000,
                                     max_center_degree=5).collect()
    assert len(capped) == 10 + 1 and len(exact) == 780 + 1
    top = capped[0]
    assert (top["u"], top["v"]) == (100, 102)
    assert top["aa_micro"] == math.floor(1e6 / math.log(2) + 0.5)
    # capped hub pairs keep the TRUE-degree term (deg 40, not 5)
    hub_term = math.floor(1e6 / math.log(40) + 0.5)
    hub_pairs = [r for r in capped if (r["u"], r["v"]) != (100, 102)]
    assert all(r["aa_micro"] == hub_term and r["common_neighbors"] == 1
               for r in hub_pairs)
    assert {(r["u"], r["v"]) for r in hub_pairs} \
        == {(u, v) for u in range(1, 6) for v in range(u + 1, 6)}
