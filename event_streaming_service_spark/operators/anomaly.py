"""Robust anomaly detection: per-key median/MAD outlier flagging —
the monitoring-side query (latency spikes, metric excursions) the
reference's fixed HAVING thresholds (service/EventStatisticsService
health checks) approximate with constants. Median/MAD is the robust
version: immune to the outliers it hunts, unlike mean/stddev.

Exactness: values quantize to micro-units (floor(v*1e6+0.5), the
money.py convention) BEFORE the medians, so both engines interpolate
even-count medians over identical integers — the interpolated results
are exact multiples of 0.5 (and the second-level MAD of 0.25), all
representable in doubles, so no ulp drift enters before the single
pinned z-score rounding.

Scale: two median aggregates on the key (Spark's exact `median`
buffers a group's values on one executor — same hot-key caveat as
sessionize; pre-aggregate or sample upstream if one key holds 10^8+
rows) plus one broadcast-sized join of per-key stats back to the
rows. Keys whose MAD is zero (majority-constant signals) emit
nothing, by convention — no robust scale means no robust outliers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

MAD_CONSISTENCY = 0.6745  # Phi^-1(0.75): MAD -> sigma-equivalent


def mad_outliers(df: DataFrame, key_col: str, value_col: str,
                 threshold: float = 3.5,
                 id_cols: list[str] | None = None) -> DataFrame:
    """Rows whose robust z-score |0.6745 * (v - median) / MAD| exceeds
    `threshold` within their key group. Output: id cols + key + the
    original value + med/mad (micro-units) + the 6 dp z-score."""
    ids = list(id_cols or [])
    v = F.floor(F.col(value_col) * F.lit(1e6) + F.lit(0.5))
    base = df.select(*ids, F.col(key_col), F.col(value_col),
                     v.alias("__v"))
    med = (base.groupBy(key_col)
           .agg(F.median("__v").alias("med_micro")))
    with_med = base.join(med, key_col)
    mad = (with_med
           .groupBy(key_col)
           .agg(F.median(F.abs(F.col("__v") - F.col("med_micro")))
                .alias("mad_micro")))
    z = (F.lit(MAD_CONSISTENCY) * (F.col("__v") - F.col("med_micro"))
         / F.col("mad_micro"))
    return (with_med.join(mad, key_col)
            .where((F.col("mad_micro") > 0)
                   & (F.abs(z) > F.lit(threshold)))
            .select(*ids, key_col, value_col, "med_micro", "mad_micro",
                    F.round(z, 6).alias("robust_z")))


def benford_digit_audit(df: DataFrame, amount_col: str,
                        group_cols: list[str] | None = None) -> DataFrame:
    """First-digit Benford's-law audit of a positive amount column —
    the fraud/data-quality screen (fabricated or unit-mangled amounts
    flunk the log-uniform leading-digit distribution that organic
    multiplicative data follows).

    Output grain: (group..., leading digit 1-9) with the exact
    observed count, the Benford-expected count, the digit's chi-square
    contribution, and the group's total chi-square statistic
    (repeated per row; 8 degrees of freedom). Counts are exact
    bigints; expected/chi-square are the only float ops, pinned at
    6 dp, with log10(1 + 1/d) spelled identically in the oracle.

    Plan shape for 100 TB: leading digit is one string op on the cents
    value; then ONE hash aggregate at (group, digit) grain — at most
    9 x groups rows survive the map-side combine — and the chi-square
    rollup is a window over those tiny grouped rows, not the data.
    """
    groups = list(group_cols or [])
    cents = F.floor(F.col(amount_col) * 100 + F.lit(0.5)).cast("bigint")
    digit = F.substring(cents.cast("string"), 1, 1).cast("bigint")
    counts = (df.where(cents > 0)
              .select(*groups, digit.alias("digit"))
              .groupBy(*groups, "digit")
              .agg(F.count(F.lit(1)).alias("n_obs")))
    w = Window.partitionBy(*groups) if groups else Window.partitionBy()
    n_total = F.sum("n_obs").over(w)
    p_ben = F.log10(F.lit(1.0) + F.lit(1.0) / F.col("digit")
                    .cast("double"))
    expected = n_total.cast("double") * p_ben
    contrib = ((F.col("n_obs").cast("double") - expected)
               * (F.col("n_obs").cast("double") - expected) / expected)
    return (counts
            .withColumn("expected_n", F.round(expected, 6))
            .withColumn("chi2_contrib", F.round(contrib, 6))
            .withColumn("chi2_group",
                        F.round(F.sum(contrib).over(w), 6)))


def seasonal_count_anomalies(events: DataFrame, ts_col: str,
                             k_num: int = 3, k_den: int = 2) -> DataFrame:
    """Seasonal-baseline anomaly detection on hourly event counts: the
    (weekday, hour) cell is the seasonality profile; an (date, hour)
    observation is anomalous when it deviates from its cell mean by
    more than k = k_num/k_den population standard deviations (rational
    so the threshold clears to integers; default 1.5).

    The k-sigma test is evaluated WITHOUT floats or square roots:
        |x - s/n| > k * sqrt((n*ss - s^2) / n^2)
    is squared and cleared of denominators to
        k_den^2 * (n*x - s)^2 > k_num^2 * (n*ss - s^2),
    all in DECIMAL(38,0), so both engines decide every boundary case
    identically (the observation itself stays in the baseline —
    population, not leave-one-out). Emits only the anomalous hours
    with their evidence.

    Plan shape for 100 TB: one hash aggregate to (date, hour) grain
    (pushed partials), one to the 168-row (dow, hour) profile, one
    broadcast join back. The raw event stream is touched once."""
    hourly = (events
              .select(F.to_date(F.col(ts_col)).alias("event_date"),
                      F.hour(F.col(ts_col)).alias("hr"))
              .groupBy("event_date", "hr")
              .agg(F.count(F.lit(1)).alias("cnt")))
    # Spark dayofweek: 1=Sunday..7=Saturday — DuckDB twin is
    # EXTRACT(dow FROM d) + 1 (NOT isodow, which is Monday-based)
    hourly = hourly.withColumn(
        "dow", F.dayofweek(F.col("event_date")))
    dec = "decimal(38,0)"
    prof = (hourly.groupBy("dow", "hr")
            .agg(F.count(F.lit(1)).alias("n_days"),
                 F.sum("cnt").alias("sum_cnt"),
                 F.sum(F.col("cnt").cast(dec) * F.col("cnt"))
                 .cast(dec).alias("sumsq_cnt")))
    j = hourly.join(F.broadcast(prof), ["dow", "hr"])
    lhs = ((F.col("n_days").cast(dec) * F.col("cnt") - F.col("sum_cnt"))
           .cast(dec))
    rhs = (F.lit(k_num * k_num)
           * (F.col("n_days").cast(dec) * F.col("sumsq_cnt")
              - F.col("sum_cnt").cast(dec) * F.col("sum_cnt"))).cast(dec)
    # sumsq stays internal (DECIMAL -> HUGEINT would round-trip as
    # float64/object in pandas and break the dtype-kind compare);
    # (cnt, n_days, sum_cnt) is full evidence for the mean side.
    return (j.filter((F.lit(k_den * k_den) * lhs * lhs).cast(dec) > rhs)
            .select(F.col("event_date").cast("timestamp")
                    .alias("event_date"),
                    "hr", "dow", "cnt", "n_days",
                    F.col("sum_cnt").cast("bigint").alias("sum_cnt"))
            .orderBy("event_date", "hr"))
