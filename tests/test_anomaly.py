"""Equi-width histogram and median/MAD outlier semantics
(operators/quantiles.py:equi_width_histogram, operators/anomaly.py)."""

from __future__ import annotations

from event_streaming_service_spark.operators import anomaly, quantiles


def test_histogram_bins_partition_the_closed_range(spark):
    # values 0..9, 4 bins over width 10: cells [0,2],[3,4],[5,7],[8,9]
    df = spark.createDataFrame([(i,) for i in range(10)], "v bigint")
    rows = sorted((r["bin"], r["bin_lo"], r["bin_hi"], r["n_values"])
                  for r in quantiles.equi_width_histogram(df, "v", 4)
                  .collect())
    assert rows == [(0, 0, 2, 3), (1, 3, 4, 2), (2, 5, 7, 3),
                    (3, 8, 9, 2)]
    # bounds tile the range with no gaps/overlap
    for (b1, lo1, hi1, _), (b2, lo2, hi2, _) in zip(rows, rows[1:]):
        assert lo2 == hi1 + 1


def test_histogram_grouped_and_degenerate(spark):
    df = spark.createDataFrame(
        [("a", 5), ("a", 5), ("a", 5), ("b", 1), ("b", 100)],
        "g string, v bigint")
    out = {(r["g"], r["bin"]): (r["bin_lo"], r["bin_hi"], r["n_values"])
           for r in quantiles.equi_width_histogram(
               df, "v", 4, group_cols=["g"]).collect()}
    assert out[("a", 0)] == (5, 5, 3)         # zero-width group: 1 bin
    assert out[("b", 0)][2] == 1 and out[("b", 3)][2] == 1


def test_mad_outliers_flags_only_the_spike(spark):
    rows = [(i, 1, 10.0 + (i % 3) * 0.5) for i in range(20)]
    rows.append((99, 1, 500.0))               # the spike
    rows += [(200 + i, 2, 7.0) for i in range(5)]   # constant key: MAD 0
    df = spark.createDataFrame(
        rows, "event_id bigint, user_id bigint, value double")
    got = anomaly.mad_outliers(df, "user_id", "value",
                               id_cols=["event_id"]).collect()
    assert [r["event_id"] for r in got] == [99]
    assert got[0]["robust_z"] > 100
    # key 2 (MAD zero) emits nothing even though all values "equal"
    assert all(r["user_id"] != 2 for r in got)


def test_benford_digit_extraction_and_chi2(spark):
    import math

    # 9 rows with leading cents digits 1..9 once each; 0 amount excluded
    df = spark.createDataFrame(
        [(float(d) / 100,) for d in range(10)], "amt double")
    rows = anomaly.benford_digit_audit(df, "amt").collect()
    got = {r["digit"]: r for r in rows}
    assert sorted(got) == list(range(1, 10))
    assert all(r["n_obs"] == 1 for r in rows)
    # expected_n for digit 1 with N=9: 9 * log10(2)
    assert got[1]["expected_n"] == round(9 * math.log10(2), 6)
    # chi2 identical on every row of the (single) group
    assert len({r["chi2_group"] for r in rows}) == 1
