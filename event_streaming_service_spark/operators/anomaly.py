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


def psi_drift(df: DataFrame, group_col: str, value_col: str,
              period_flag: Column, n_bins: int = 10,
              bin_width: float = 50.0) -> DataFrame:
    """Population Stability Index per group — the feature-drift gate
    ML-ops pipelines run between a training window and a serving
    window before (re)training: bin the value, compare the two
    periods' bin distributions,
        PSI = sum_bins (p_i - q_i) * ln(p_i / q_i),
    with Laplace +1 smoothing so empty bins stay finite. Conventional
    reading: < 0.1 stable, 0.1-0.25 moderate shift, > 0.25 retrain.

    Engine-exactness: bins are fixed-width integer arithmetic
    (floor(value / bin_width) clamped into [0, n_bins - 1] on BOTH
    ends — an unclamped negative value would produce a negative bin
    the dense spine's left join silently drops, excluding those rows
    from the counts AND the totals); the smoothed
    shares p, q and the per-bin term are the SAME short float-op
    sequence in both engines and the term is pinned to integer
    nano-units (floor(term * 1e9 + 0.5)) BEFORE the cross-bin sum —
    the PMI/entropy device — so psi_nano is an exact bigint.

    Returns one row per (group, bin) with the counts and the pinned
    term, plus the group PSI broadcast back on every row (the drilldown
    shape: the flagged group AND which bins moved, one result set).

    Scale shape: one hash agg to (group, bin, period) grain, a pivot
    to two count columns, and one window sum over <= n_bins rows per
    group — no joins, no skew surface (bins bound the grain)."""
    bin_col = F.greatest(
        F.least(F.floor(F.col(value_col) / bin_width),
                F.lit(n_bins - 1)),
        F.lit(0)).cast("int")
    base = (df.select(F.col(group_col).alias("grp"),
                      bin_col.alias("bin"),
                      period_flag.cast("int").alias("__p"))
            .groupBy("grp", "bin")
            .agg(F.sum(F.when(F.col("__p") == 0, 1).otherwise(0))
                 .alias("cnt_a"),
                 F.sum(F.when(F.col("__p") == 1, 1).otherwise(0))
                 .alias("cnt_b")))
    wg = Window.partitionBy("grp")
    n_a = F.sum("cnt_a").over(wg)
    n_b = F.sum("cnt_b").over(wg)
    # Laplace +1 over the FULL bin domain: absent (grp, bin) rows
    # contribute (1/(nA+n_bins) - 1/(nB+n_bins)) * ln(ratio) — a
    # nonzero constant per missing bin, so the domain must be dense.
    # Densify with a bins spine cross join (n_bins rows, broadcast).
    spine = (df.sparkSession.range(n_bins)
             .select(F.col("id").cast("int").alias("bin")))
    grps = base.select("grp").distinct()
    dense = (grps.crossJoin(F.broadcast(spine))
             .join(base, ["grp", "bin"], "left")
             .fillna(0, ["cnt_a", "cnt_b"]))
    p = (F.col("cnt_a") + 1) / (n_a + F.lit(n_bins))
    q = (F.col("cnt_b") + 1) / (n_b + F.lit(n_bins))
    term_nano = F.floor((p - q) * F.log(p / q) * 1e9 + F.lit(0.5)) \
        .cast("long")
    per_bin = dense.withColumn("term_nano", term_nano)
    return (per_bin
            .withColumn("psi_nano",
                        F.sum("term_nano").over(wg).cast("long"))
            .select(F.col("grp").alias(group_col), "bin",
                    F.col("cnt_a").cast("bigint").alias("cnt_a"),
                    F.col("cnt_b").cast("bigint").alias("cnt_b"),
                    "term_nano", "psi_nano"))


def cusum_alerts(events: DataFrame, key_col: str, ts_col: str,
                 value_col: str, k_cents: int, h_cents: int,
                 tiebreak_col: str) -> DataFrame:
    """One-sided CUSUM change-point detection per key (Page 1954):
    fold S_i = max(0, S_{i-1} + cents_i - k) over the key's timeline
    and alert when S crosses h — the sequential drift detector that
    flags a sustained upward shift in a metric (fraud spend, error
    rate, latency) far earlier than fixed-threshold rules. All state
    is integer cents, so the fold is engine-exact.

    Returns one summary row per key:
      (key, n_events, n_alerts, max_cusum_cents, first_alert_id)
    with n_alerts counting CROSSINGS (S goes from <= h to > h; a
    sustained excursion is one alert until S returns below h).

    Scale shape: ONE partition-level kernel pass — repartition on the
    key, sortWithinPartitions((key, ts, tiebreak)), mapInPandas with
    the fold state carried across group boundaries and Arrow batches
    (the many-small-groups device from ewma_segmented: applyInPandas
    pays ~1 ms per GROUP). A key bigger than a task would use a
    segmented scan exactly like ewma_segmented — the recurrence is
    max-plus affine (a segment composes to S_out = max(S_in + a, m),
    and (a, m) pairs compose associatively) — not needed at the
    fixture's per-key rates, documented for the 100 TB shape."""
    import pandas as pd

    cents = F.floor(F.col(value_col) * 100 + F.lit(0.5)).cast("long")
    n = events.sparkSession.sparkContext.defaultParallelism
    base = (events.select(F.col(key_col).alias("__k"),
                          F.col(ts_col).alias("__ts"),
                          F.col(tiebreak_col).alias("__tb"),
                          cents.alias("__c"))
            .repartition(n, "__k")
            .sortWithinPartitions("__k", "__ts", "__tb"))

    out_schema = (f"{key_col} bigint, n_events bigint, "
                  "n_alerts bigint, max_cusum_cents bigint, "
                  "first_alert_id bigint")

    def part(batches):
        cur = None
        s = n_ev = n_al = mx = 0
        above = False
        first = None
        done = []

        def flush():
            if cur is not None:
                done.append((cur, n_ev, n_al, mx,
                             first if first is not None else 0))

        for pdf in batches:
            ks = pdf["__k"].to_numpy()
            cs = pdf["__c"].to_numpy()
            tbs = pdf["__tb"].to_numpy()
            for i in range(len(pdf)):
                if ks[i] != cur:
                    flush()
                    cur = int(ks[i])
                    s = n_ev = n_al = mx = 0
                    above, first = False, None
                n_ev += 1
                s = max(0, s + int(cs[i]) - k_cents)
                if s > mx:
                    mx = s
                if s > h_cents:
                    if not above:
                        n_al += 1
                        if first is None:
                            first = int(tbs[i])
                    above = True
                else:
                    above = False
        flush()
        yield pd.DataFrame(done, columns=[
            key_col, "n_events", "n_alerts", "max_cusum_cents",
            "first_alert_id"])

    return base.mapInPandas(part, out_schema)


def holt_linear(events: DataFrame, key_col: str, ts_col: str,
                value_col: str, alpha: float, gamma: float,
                tiebreak_col: str) -> DataFrame:
    """Holt's linear (double exponential) smoothing per key — the
    level+trend forecaster one step up from EWMA (Holt 1957):
        l_i = alpha * x_i + (1 - alpha) * (l_{i-1} + b_{i-1})
        b_i = gamma * (l_i - l_{i-1}) + (1 - gamma) * b_{i-1}
    seeded l_1 = x_1, b_1 = 0 (the deterministic convention; trend
    ramps in). Emits every row with the smoothed level and trend
    rounded to 6 dp (floor(x*1e6 + 0.5)/1e6, the EWMA convention)
    while the carried state stays full precision.

    Engine-exact like ewma_stream: the per-step float sequence is the
    identical two-multiply-one-add chain the recursive-CTE oracle
    runs, with alpha/gamma chosen exactly representable by callers.

    Scale shape: one partition-level kernel pass (repartition on key,
    sortWithinPartitions, mapInPandas with cross-group carry — the
    many-small-groups device); state is two doubles per key."""
    import pandas as pd

    n = events.sparkSession.sparkContext.defaultParallelism
    base = (events.select(F.col(key_col).alias("__k"),
                          F.col(ts_col).alias("__ts"),
                          F.col(tiebreak_col).alias("__tb"),
                          F.col(value_col).cast("double").alias("__v"))
            .repartition(n, "__k")
            .sortWithinPartitions("__k", "__ts", "__tb"))

    def part(batches):
        import math

        cur = None
        lvl = trend = 0.0
        out = []
        for pdf in batches:
            for k, ts, tb, v in zip(pdf["__k"], pdf["__ts"],
                                    pdf["__tb"], pdf["__v"]):
                if k != cur:
                    cur, lvl, trend = int(k), float(v), 0.0
                else:
                    prev = lvl
                    lvl = alpha * float(v) + (1 - alpha) * (lvl + trend)
                    trend = gamma * (lvl - prev) + (1 - gamma) * trend
                out.append((int(k), ts, int(tb), float(v),
                            math.floor(lvl * 1e6 + 0.5) / 1e6,
                            math.floor(trend * 1e6 + 0.5) / 1e6))
        yield pd.DataFrame(out, columns=[
            key_col, ts_col, tiebreak_col, value_col,
            "level6", "trend6"])

    return base.mapInPandas(
        part, (f"{key_col} bigint, {ts_col} timestamp, "
               f"{tiebreak_col} bigint, {value_col} double, "
               "level6 double, trend6 double"))


def chi2_independence(df: DataFrame, row_col: Column, col_col: Column
                      ) -> DataFrame:
    """Pearson chi-square test of independence over a two-way
    contingency table (the categorical-association screen run before
    features enter a model, and the drift test's categorical
    sibling): expected cell count E = row_total * col_total / N,
    per-cell term (O - E)^2 / E pinned to integer micro-units
    (floor(term * 1e6 + 0.5)) BEFORE the cross-cell sum — the PSI
    device — so chi2_micro is an exact bigint both engines agree on.
    Returns the DENSE contingency grain (one row per distinct-row x
    distinct-col cell, observed or not: a zero cell still contributes
    (0-E)^2/E = E to the statistic, so a sparse table computed only
    over observed cells would understate chi2 — the psi_drift spine
    rationale) with observed, expected_micro, term_micro, and the
    table-level chi2_micro + dof broadcast onto every row (the
    drilldown shape).

    Scale shape: one hash agg to cell grain (bounded by the category
    product), a broadcast cross join of the two tiny dimension sets
    to densify, two tiny window sums for the margins."""
    cells = (df.select(row_col.alias("r"), col_col.alias("c"))
             .groupBy("r", "c")
             .agg(F.count(F.lit(1)).cast("long").alias("observed")))
    # Densify: every (distinct r) x (distinct c) cell must be present
    # before the margins — both dimension sets are category-bounded,
    # so the cross join is a broadcast of two tiny frames.
    dense = (cells.select("r").distinct()
             .crossJoin(F.broadcast(cells.select("c").distinct()))
             .join(cells, ["r", "c"], "left")
             .fillna(0, ["observed"]))
    wr = Window.partitionBy("r")
    wc = Window.partitionBy("c")
    wall = Window.partitionBy()
    base = (dense
            .withColumn("__rt", F.sum("observed").over(wr))
            .withColumn("__ct", F.sum("observed").over(wc))
            .withColumn("__n", F.sum("observed").over(wall)))
    e = (F.col("__rt") * F.col("__ct")) / F.col("__n")
    term = (F.col("observed") - e) * (F.col("observed") - e) / e
    out = (base
           .withColumn("expected_micro",
                       F.floor(e * 1_000_000 + F.lit(0.5)).cast("long"))
           .withColumn("term_micro",
                       F.floor(term * 1_000_000 + F.lit(0.5))
                       .cast("long")))
    # DISTINCT aggregates are not window-able in Spark; collect_set is
    # (the cell grain is category-product-bounded, so the set is tiny)
    dof = ((F.size(F.collect_set(F.col("r")).over(wall)) - 1)
           * (F.size(F.collect_set(F.col("c")).over(wall)) - 1))
    return (out
            .withColumn("chi2_micro",
                        F.sum("term_micro").over(wall).cast("long"))
            .withColumn("dof", dof.cast("int"))
            .select(F.col("r").alias("row_value"),
                    F.col("c").alias("col_value"),
                    "observed", "expected_micro", "term_micro",
                    "chi2_micro", "dof"))


def ks_two_sample(df: DataFrame, group_col: str, value_col: str,
                  period_flag: Column, value_scale: int = 100
                  ) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov statistic per group — the
    distribution-level drift test PSI's fixed-width bins only
    approximate: D = max_x |F_a(x) - F_b(x)| over the pooled empirical
    support, sensitive to ANY shape change (location, scale, tails)
    without a binning choice.

    Engine-exactness: the statistic is computed entirely in integers.
    Values quantize to cents (floor(v*scale+0.5)); at each distinct
    value the scaled ECDF gap is
        gap = |cum_a * n_b - cum_b * n_a|
    (an integer: both ECDFs put over the common denominator n_a*n_b),
    and the reported statistic is
        ks_d_ppm = max(gap) * 1e6 DIV (n_a * n_b)
    — a truncating integer DIV, so the result is an exact bigint. The
    split location `at_v_cents` is the SMALLEST value achieving the
    max gap (deterministic tiebreak).

    Scale shape: one hash agg to the (group, distinct value) grain,
    one cumulative window per group ordered by value (the grain is
    distinct-values-bounded, not row-bounded), and a two-level
    argmax — no joins against the raw rows, no skew surface beyond
    a group's distinct-value count. Groups missing either period
    emit NULL ks_d_ppm (no comparison exists)."""
    dec = "decimal(38,0)"
    q = F.floor(F.col(value_col) * F.lit(float(value_scale))
                + F.lit(0.5)).cast("long")
    c = (df.select(F.col(group_col).alias("grp"), q.alias("v"),
                   period_flag.cast("int").alias("__p"))
         .groupBy("grp", "v")
         .agg(F.sum(F.when(F.col("__p") == 0, 1).otherwise(0))
              .cast(dec).alias("ca"),
              F.sum(F.when(F.col("__p") == 1, 1).otherwise(0))
              .cast(dec).alias("cb"))
         # the gap frame feeds BOTH the per-group max and the argmax
         # join — pin the (group, distinct value) grain so the raw
         # scan + first aggregate run once, not twice (this grain is
         # the small one: distinct values, not rows)
         .persist())
    wcum = (Window.partitionBy("grp").orderBy("v")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    wg = Window.partitionBy("grp")
    g = (c.withColumn("__cum_a", F.sum("ca").over(wcum).cast(dec))
         .withColumn("__cum_b", F.sum("cb").over(wcum).cast(dec))
         .withColumn("__na", F.sum("ca").over(wg).cast(dec))
         .withColumn("__nb", F.sum("cb").over(wg).cast(dec))
         .withColumn("gap", F.abs(F.col("__cum_a") * F.col("__nb")
                                  - F.col("__cum_b") * F.col("__na"))
                     .cast(dec)))
    m = (g.groupBy("grp")
         .agg(F.max("gap").alias("__mg"),
              F.max("__na").alias("__na"),
              F.max("__nb").alias("__nb")))
    arg = (g.select("grp", "v", "gap")
           .join(m, "grp")
           .filter(F.col("gap") == F.col("__mg"))
           .groupBy("grp")
           .agg(F.min("v").alias("at_v_cents"),
                F.max("__mg").alias("__mg"),
                F.max("__na").alias("__na"),
                F.max("__nb").alias("__nb")))
    return arg.select(
        F.col("grp").alias(group_col),
        F.col("__na").cast("bigint").alias("n_a"),
        F.col("__nb").cast("bigint").alias("n_b"),
        F.when((F.col("__na") > 0) & (F.col("__nb") > 0),
               F.expr("CAST(__mg * 1000000 DIV (__na * __nb)"
                      " AS BIGINT)")).alias("ks_d_ppm"),
        F.col("at_v_cents").cast("bigint").alias("at_v_cents"))


# the asymptotic two-sample KS p-value and the BH threshold share one
# exact spelling across engines; Column and SQL twins live together so
# a change cannot drift one side
_KS_LAM2_SQL = ("(CAST(ks_d_ppm AS DOUBLE) / 1000000.0)"
                " * (CAST(ks_d_ppm AS DOUBLE) / 1000000.0)"
                " * (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)"
                " / (CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE)))")
KS_P_PPM_SQL = (
    "LEAST(CAST(1000000 AS BIGINT),"
    " CAST(FLOOR(2.0 * (EXP(-2.0 * ({lam2}))"
    " - EXP(-8.0 * ({lam2})) + EXP(-18.0 * ({lam2})))"
    " * 1000000.0 + 0.5) AS BIGINT))").format(lam2=_KS_LAM2_SQL)


def ks_bh_fdr(df: DataFrame, group_col: str, value_col: str,
              period_flag, alpha_ppm: int = 50_000,
              value_scale: int = 100) -> DataFrame:
    """Benjamini-Hochberg FDR control over the per-group two-sample
    KS drift tests — the multiple-testing step every fleet-wide drift
    monitor needs: testing 50 event types at alpha=0.05 each expects
    2-3 false alarms per sweep; BH (Benjamini & Hochberg 1995) orders
    the p-values and rejects the largest prefix whose p_(r) <=
    alpha * r / m, bounding the expected false-discovery RATE at
    alpha instead of the per-test error.

    p-values use the asymptotic Kolmogorov distribution truncated at
    three terms, p = 2 * (e^{-2L} - e^{-8L} + e^{-18L}) with
    L = D^2 * n_a n_b / (n_a + n_b) — one literal float sequence from
    exact integers (the KS statistic is already an exact ppm), pinned
    to integer ppm, clamped to [., 1e6]; three terms bound the
    truncation error below 1 ppm for L >= 0.62 and the BH COMPARISON
    is exact integer arithmetic either way:

        reject rank r  iff  p_ppm * m <= alpha_ppm * r

    (both sides bigint — no float threshold boundary anywhere).
    Groups missing either period have no test and are absent.

    Scale shape: rides ks_two_sample's (group, distinct value) grain;
    the BH step is two global windows over m <= #groups rows — a
    post-aggregate detail, the acf/wow convention. Output: one row
    per tested group with (n_a, n_b, ks_d_ppm, p_ppm, p_rank,
    m_tests, rejected), rejected as int (1/0)."""
    base = (ks_two_sample(df, group_col, value_col, period_flag,
                          value_scale=value_scale)
            .where(F.col("ks_d_ppm").isNotNull())
            .select(group_col, "n_a", "n_b", "ks_d_ppm"))
    scored = base.withColumn("p_ppm", F.expr(KS_P_PPM_SQL))
    wr = Window.orderBy("p_ppm", group_col)
    wall = Window.partitionBy()
    ranked = (scored
              .withColumn("p_rank",
                          F.row_number().over(wr).cast("long"))
              .withColumn("m_tests",
                          F.count(F.lit(1)).over(wall).cast("long")))
    cutoff = F.max(
        F.when(F.col("p_ppm") * F.col("m_tests")
               <= F.lit(int(alpha_ppm)) * F.col("p_rank"),
               F.col("p_rank")).otherwise(F.lit(0))).over(wall)
    return (ranked
            .withColumn("rejected",
                        (F.col("p_rank") <= cutoff).cast("int"))
            .select(group_col, "n_a", "n_b", "ks_d_ppm", "p_ppm",
                    "p_rank", "m_tests", "rejected"))


# Welch statistic shared spellings: variance/na terms, t, and the
# Welch-Satterthwaite df are each ONE float sequence over the exact
# integer moments (na, nb, sxa, sxb, sxxa, sxxb all cast inline)
_W_U = ("(CAST(na AS DOUBLE) * CAST(sxxa AS DOUBLE)"
        " - CAST(sxa AS DOUBLE) * CAST(sxa AS DOUBLE))"
        " / (CAST(na AS DOUBLE) * CAST(na AS DOUBLE)"
        " * (CAST(na AS DOUBLE) - 1.0))")
_W_V = ("(CAST(nb AS DOUBLE) * CAST(sxxb AS DOUBLE)"
        " - CAST(sxb AS DOUBLE) * CAST(sxb AS DOUBLE))"
        " / (CAST(nb AS DOUBLE) * CAST(nb AS DOUBLE)"
        " * (CAST(nb AS DOUBLE) - 1.0))")
WELCH_T_MILLI_SQL = (
    "CAST(FLOOR((CAST(sxa AS DOUBLE) / CAST(na AS DOUBLE)"
    " - CAST(sxb AS DOUBLE) / CAST(nb AS DOUBLE))"
    f" / SQRT(({_W_U}) + ({_W_V})) * 1000.0 + 0.5) AS BIGINT)")
WELCH_DF_MILLI_SQL = (
    f"CAST(FLOOR((({_W_U}) + ({_W_V})) * (({_W_U}) + ({_W_V}))"
    f" / (({_W_U}) * ({_W_U}) / (CAST(na AS DOUBLE) - 1.0)"
    f" + ({_W_V}) * ({_W_V}) / (CAST(nb AS DOUBLE) - 1.0))"
    " * 1000.0 + 0.5) AS BIGINT)")


def welch_ttest(df: DataFrame, group_col: str, value_col: str,
                period_flag, value_scale: int = 100) -> DataFrame:
    """Welch's unequal-variance two-sample t-test per group — the
    parametric mean-shift companion of the KS (shape) and PSI (bin)
    drift tests: t = (mean_a - mean_b) / sqrt(s2a/na + s2b/nb) with
    the Welch-Satterthwaite effective degrees of freedom, the
    default 'did the average move' check for metric monitoring (it
    does NOT assume equal variances, which drifted populations never
    have).

    Exactness: values quantize to cents; per-half counts and
    first/second moments accumulate as exact decimal(38,0) sums in
    ONE map-side-combined aggregate; t and df are each ONE shared
    float spelling over those integers, pinned to milli units.
    Groups needing variance (n >= 2 in BOTH halves) report; others
    emit NULL t/df but keep their counts (the ks_two_sample NULL
    convention). Output: group, n_a, n_b, mean_a_cents_milli,
    mean_b_cents_milli, t_milli, df_milli.

    Scale shape: one hash aggregate, nothing else — the cheapest
    member of the drift suite by construction."""
    dec = "decimal(38,0)"
    q = F.floor(F.col(value_col) * F.lit(float(value_scale))
                + F.lit(0.5)).cast("long")
    p = period_flag.cast("int")
    agg = (df.select(F.col(group_col).alias("grp"), q.alias("v"),
                     p.alias("__p"))
           .groupBy("grp")
           .agg(F.sum(F.when(F.col("__p") == 0, 1).otherwise(0))
                .cast(dec).alias("na"),
                F.sum(F.when(F.col("__p") == 1, 1).otherwise(0))
                .cast(dec).alias("nb"),
                F.sum(F.when(F.col("__p") == 0, F.col("v"))
                      .otherwise(0)).cast(dec).alias("sxa"),
                F.sum(F.when(F.col("__p") == 1, F.col("v"))
                      .otherwise(0)).cast(dec).alias("sxb"),
                F.sum(F.when(F.col("__p") == 0,
                             F.col("v") * F.col("v"))
                      .otherwise(0)).cast(dec).alias("sxxa"),
                F.sum(F.when(F.col("__p") == 1,
                             F.col("v") * F.col("v"))
                      .otherwise(0)).cast(dec).alias("sxxb")))
    ok = (F.col("na") >= 2) & (F.col("nb") >= 2)
    return agg.select(
        F.col("grp").alias(group_col),
        F.col("na").cast("bigint").alias("n_a"),
        F.col("nb").cast("bigint").alias("n_b"),
        F.expr("CAST(FLOOR(CAST(sxa AS DOUBLE) / CAST(na AS DOUBLE)"
               " * 1000.0 + 0.5) AS BIGINT)")
        .alias("mean_a_cents_milli"),
        F.expr("CAST(FLOOR(CAST(sxb AS DOUBLE) / CAST(nb AS DOUBLE)"
               " * 1000.0 + 0.5) AS BIGINT)")
        .alias("mean_b_cents_milli"),
        F.when(ok, F.expr(WELCH_T_MILLI_SQL)).alias("t_milli"),
        F.when(ok, F.expr(WELCH_DF_MILLI_SQL)).alias("df_milli"))
