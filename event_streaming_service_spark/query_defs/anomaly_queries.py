"""Histogram + robust-outlier queries: per-priority equi-width price
histograms (operators/quantiles.py:equi_width_histogram) and per-user
median/MAD anomaly flags (operators/anomaly.py).

Both keep every boundary exact: integer-cents bins with integer
ceil/floor bounds, micro-unit medians whose interpolated halves are
exactly representable, and one pinned z-score rounding.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from event_streaming_service_spark.operators import anomaly, quantiles
from event_streaming_service_spark.queries import register
from event_streaming_service_spark.sources import tables

N_BINS = 20


@register(
    "price_histogram_by_priority",
    oracle=f"""
    WITH base AS (
        SELECT o_orderpriority AS grp,
               CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS v
        FROM orders WHERE o_totalprice IS NOT NULL),
    bounds AS (
        SELECT grp, MIN(v) AS lo, MAX(v) AS hi FROM base GROUP BY grp),
    binned AS (
        SELECT b.grp, lo, hi,
               CAST(FLOOR(CAST(v - lo AS DOUBLE) * {N_BINS}
                          / (hi - lo + 1))
                    AS BIGINT) AS bin
        FROM base b JOIN bounds USING (grp))
    SELECT grp AS o_orderpriority, bin,
           CAST(lo + CEIL(bin * (hi - lo + 1) / {N_BINS})
                AS BIGINT) AS bin_lo,
           CAST(lo + CEIL((bin + 1) * (hi - lo + 1) / {N_BINS}) - 1
                AS BIGINT) AS bin_hi,
           CAST(COUNT(*) AS BIGINT) AS n_values
    FROM binned GROUP BY grp, bin, lo, hi
    """,
    tags=("histogram", "A7", "profiling"),
)
def q_price_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """20-bin equi-width histogram of order totals (integer cents) per
    order priority: tiny bounds agg broadcast back, then one
    (group, bin) hash aggregate — the exchange carries at most
    groups x bins rows."""
    orders = tables.load_table(spark, sf_dir, "orders")
    pts = orders.where(F.col("o_totalprice").isNotNull()).select(
        "o_orderpriority",
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
        .cast("bigint").alias("price_cents"))
    return quantiles.equi_width_histogram(
        pts, "price_cents", N_BINS, group_cols=["o_orderpriority"])


@register(
    "value_outliers_mad",
    oracle="""
    WITH base AS (
        SELECT event_id, user_id, value,
               CAST(FLOOR(value * 1e6 + 0.5) AS BIGINT) AS v
        FROM events),
    med AS (
        SELECT user_id, CAST(median(v) AS DOUBLE) AS med_micro
        FROM base GROUP BY user_id),
    mad AS (
        SELECT b.user_id,
               CAST(median(abs(b.v - m.med_micro)) AS DOUBLE)
                   AS mad_micro
        FROM base b JOIN med m USING (user_id) GROUP BY b.user_id)
    SELECT b.event_id, b.user_id, b.value, m.med_micro, d.mad_micro,
           ROUND(0.6745 * (b.v - m.med_micro) / d.mad_micro, 6)
               AS robust_z
    FROM base b JOIN med m USING (user_id) JOIN mad d USING (user_id)
    WHERE d.mad_micro > 0
      AND ABS(0.6745 * (b.v - m.med_micro) / d.mad_micro) > 3.5
    """,
    tags=("anomaly", "A7", "A11"),
)
def q_value_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user robust z-score outliers of event values: micro-unit
    median/MAD, |z| > 3.5 — the robust version of the reference's
    fixed health thresholds."""
    events = tables.load_table(spark, sf_dir, "events")
    return anomaly.mad_outliers(events, "user_id", "value",
                                threshold=3.5, id_cols=["event_id"])


@register(
    "benford_price_audit",
    oracle="""
    WITH counts AS (
        SELECT o_orderpriority,
               CAST(substring(CAST(CAST(FLOOR(o_totalprice * 100 + 0.5)
                                        AS BIGINT) AS VARCHAR), 1, 1)
                    AS BIGINT) AS digit,
               COUNT(*) AS n_obs
        FROM orders
        WHERE CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) > 0
        GROUP BY 1, 2),
    scored AS (
        SELECT o_orderpriority, digit, CAST(n_obs AS BIGINT) AS n_obs,
               CAST(SUM(n_obs) OVER (PARTITION BY o_orderpriority)
                    AS DOUBLE)
                   * log10(1.0 + 1.0 / CAST(digit AS DOUBLE)) AS exp_n
        FROM counts)
    SELECT o_orderpriority, digit, n_obs,
           ROUND(exp_n, 6) AS expected_n,
           ROUND((CAST(n_obs AS DOUBLE) - exp_n)
                 * (CAST(n_obs AS DOUBLE) - exp_n) / exp_n, 6)
               AS chi2_contrib,
           ROUND(SUM((CAST(n_obs AS DOUBLE) - exp_n)
                     * (CAST(n_obs AS DOUBLE) - exp_n) / exp_n)
                 OVER (PARTITION BY o_orderpriority), 6) AS chi2_group
    FROM scored
    """,
    tags=("anomaly", "benford", "A5"),
)
def q_benford_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford first-digit audit of order totals per priority class:
    exact digit counts at (priority, digit) grain, expected counts and
    chi-square from the pinned log10 expression — the data-quality
    screen for fabricated or unit-mangled amounts."""
    orders = tables.load_table(spark, sf_dir, "orders")
    return anomaly.benford_digit_audit(
        orders, "o_totalprice", group_cols=["o_orderpriority"])


@register(
    "seasonal_hourly_anomalies",
    oracle="""
    WITH hourly AS (
        SELECT CAST(ts AS DATE) AS event_date,
               CAST(EXTRACT(hour FROM ts) AS BIGINT) AS hr,
               CAST(COUNT(*) AS BIGINT) AS cnt
        FROM events GROUP BY 1, 2),
    h2 AS (
        SELECT *, CAST(EXTRACT(dow FROM event_date) + 1 AS BIGINT)
                      AS dow
        FROM hourly),
    prof AS (
        SELECT dow, hr, CAST(COUNT(*) AS BIGINT) AS n_days,
               CAST(SUM(cnt) AS BIGINT) AS sum_cnt,
               SUM(CAST(cnt AS HUGEINT) * cnt) AS sumsq_cnt
        FROM h2 GROUP BY dow, hr)
    SELECT CAST(h2.event_date AS TIMESTAMP) AS event_date,
           h2.hr, h2.dow, h2.cnt, p.n_days, p.sum_cnt
    FROM h2 JOIN prof p ON h2.dow = p.dow AND h2.hr = p.hr
    WHERE 4 * (CAST(p.n_days AS HUGEINT) * h2.cnt - p.sum_cnt)
            * (CAST(p.n_days AS HUGEINT) * h2.cnt - p.sum_cnt)
          > 9 * (CAST(p.n_days AS HUGEINT) * p.sumsq_cnt
                 - CAST(p.sum_cnt AS HUGEINT) * p.sum_cnt)
    ORDER BY event_date, h2.hr
    """,
    tags=("anomaly", "seasonality", "2.12-timeseries", "A5", "calendar"),
)
def q_seasonal_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly event counts more than 1.5 population sigmas from their
    (weekday, hour) seasonal cell mean, decided in exact integer
    arithmetic — k is the rational 3/2, so the squared threshold
    clears to 4*lhs^2 > 9*rhs with no float boundary
    (operators/anomaly.py:seasonal_count_anomalies)."""
    ev = tables.load_table(spark, sf_dir, "events")
    return anomaly.seasonal_count_anomalies(ev, "ts", k_num=3, k_den=2)


@register(
    "psi_value_drift",
    oracle="""
    WITH base AS (
        SELECT event_type AS grp,
               CAST(GREATEST(LEAST(FLOOR(value / 50.0), 9), 0)
                    AS INTEGER) AS bin,
               event_id % 2 AS p
        FROM events),
    cnt AS (SELECT grp, bin,
                   SUM(CASE WHEN p = 0 THEN 1 ELSE 0 END) AS cnt_a,
                   SUM(CASE WHEN p = 1 THEN 1 ELSE 0 END) AS cnt_b
            FROM base GROUP BY grp, bin),
    dense AS (
        SELECT g.grp, b.bin,
               COALESCE(c.cnt_a, 0) AS cnt_a,
               COALESCE(c.cnt_b, 0) AS cnt_b
        FROM (SELECT DISTINCT grp FROM cnt) g
        CROSS JOIN (SELECT unnest(range(0, 10)) AS bin) b
        LEFT JOIN cnt c ON c.grp = g.grp AND c.bin = b.bin),
    tot AS (SELECT *,
                   SUM(cnt_a) OVER (PARTITION BY grp) AS na,
                   SUM(cnt_b) OVER (PARTITION BY grp) AS nb
            FROM dense),
    terms AS (SELECT grp, bin, cnt_a, cnt_b,
                     CAST(FLOOR(
                         ((cnt_a + 1) / (na + 10.0)
                          - (cnt_b + 1) / (nb + 10.0))
                         * ln(((cnt_a + 1) / (na + 10.0))
                              / ((cnt_b + 1) / (nb + 10.0)))
                         * 1e9 + 0.5) AS BIGINT) AS term_nano
              FROM tot)
    SELECT grp AS event_type, bin,
           CAST(cnt_a AS BIGINT) AS cnt_a,
           CAST(cnt_b AS BIGINT) AS cnt_b, term_nano,
           CAST(SUM(term_nano) OVER (PARTITION BY grp) AS BIGINT)
               AS psi_nano
    FROM terms
    """,
    tags=("anomaly", "drift", "governance", "ml-ops"),
)
def q_psi_value_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index of the event value distribution per
    event_type between two half-populations (event_id parity stands in
    for the training/serving window split — deterministic and
    sf-independent): fixed-width bins, Laplace-smoothed shares,
    per-bin (p-q)ln(p/q) terms pinned to integer nano-units before the
    cross-bin sum (operators/anomaly.py:psi_drift). The drilldown
    shape: every (type, bin) row plus the group PSI."""
    ev = tables.load_table(spark, sf_dir, "events")
    return anomaly.psi_drift(ev, "event_type", "value",
                             (F.col("event_id") % 2 == 1))


CUSUM_K_CENTS = 7_500   # drift allowance: 1.5x the ~\$50 mean value
CUSUM_H_CENTS = 30_000  # alert threshold


@register(
    "cusum_value_alerts",
    oracle=f"""
    WITH RECURSIVE ordered AS (
        SELECT user_id, event_id,
               CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS cents,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS seq
        FROM events),
    walk(user_id, seq, s, above, n_al, first_alert) AS (
        SELECT user_id, seq,
               GREATEST(0, cents - {CUSUM_K_CENTS}) AS s,
               GREATEST(0, cents - {CUSUM_K_CENTS}) > {CUSUM_H_CENTS}
                   AS above,
               CASE WHEN GREATEST(0, cents - {CUSUM_K_CENTS})
                         > {CUSUM_H_CENTS} THEN 1 ELSE 0 END AS n_al,
               CASE WHEN GREATEST(0, cents - {CUSUM_K_CENTS})
                         > {CUSUM_H_CENTS} THEN event_id END
                   AS first_alert
        FROM ordered WHERE seq = 1
        UNION ALL
        SELECT o.user_id, o.seq,
               GREATEST(0, w.s + o.cents - {CUSUM_K_CENTS}),
               GREATEST(0, w.s + o.cents - {CUSUM_K_CENTS})
                   > {CUSUM_H_CENTS},
               w.n_al + CASE WHEN GREATEST(0, w.s + o.cents
                                  - {CUSUM_K_CENTS}) > {CUSUM_H_CENTS}
                              AND NOT w.above THEN 1 ELSE 0 END,
               COALESCE(w.first_alert,
                        CASE WHEN GREATEST(0, w.s + o.cents
                                  - {CUSUM_K_CENTS}) > {CUSUM_H_CENTS}
                                  AND NOT w.above
                             THEN o.event_id END)
        FROM walk w JOIN ordered o
          ON o.user_id = w.user_id AND o.seq = w.seq + 1)
    SELECT user_id,
           CAST(MAX(seq) AS BIGINT) AS n_events,
           CAST(MAX(n_al) AS BIGINT) AS n_alerts,
           CAST(MAX(s) AS BIGINT) AS max_cusum_cents,
           CAST(COALESCE(MAX(first_alert), 0) AS BIGINT)
               AS first_alert_id
    FROM walk GROUP BY user_id
    """,
    tags=("anomaly", "cusum", "stateful", "udf-kernel"),
)
def q_cusum_value_alerts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user one-sided CUSUM over event value cents
    (operators/anomaly.py:cusum_alerts): integer max-plus fold in one
    partition-level kernel pass, alerts on upward drift crossings.
    The oracle unrolls the fold as a recursive CTE — inherently
    row-at-a-time in SQL (the EWMA-family handicapped-oracle shape),
    which is exactly why the engine side is a kernel."""
    ev = tables.load_table(spark, sf_dir, "events")
    return anomaly.cusum_alerts(ev, "user_id", "ts", "value",
                                CUSUM_K_CENTS, CUSUM_H_CENTS,
                                "event_id")


HOLT_ALPHA = 0.5    # exactly representable: alpha + (1-alpha) == 1
HOLT_GAMMA = 0.25   # likewise


@register(
    "holt_trend_per_user",
    oracle=f"""
    WITH RECURSIVE ordered AS (
        SELECT user_id, ts, event_id, value,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS seq
        FROM events),
    walk(user_id, seq, ts, event_id, value, l, b) AS (
        SELECT user_id, seq, ts, event_id, value,
               CAST(value AS DOUBLE), CAST(0 AS DOUBLE)
        FROM ordered WHERE seq = 1
        UNION ALL
        SELECT o.user_id, o.seq, o.ts, o.event_id, o.value,
               {HOLT_ALPHA} * o.value
                   + {1 - HOLT_ALPHA} * (w.l + w.b),
               {HOLT_GAMMA} * (({HOLT_ALPHA} * o.value
                   + {1 - HOLT_ALPHA} * (w.l + w.b)) - w.l)
                   + {1 - HOLT_GAMMA} * w.b
        FROM walk w JOIN ordered o
          ON o.user_id = w.user_id AND o.seq = w.seq + 1)
    SELECT user_id, ts, event_id, value,
           FLOOR(l * 1000000 + 0.5) / 1000000 AS level6,
           FLOOR(b * 1000000 + 0.5) / 1000000 AS trend6
    FROM walk
    """,
    tags=("anomaly", "forecast", "stateful", "udf-kernel"),
)
def q_holt_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt's linear level+trend smoothing per user
    (operators/anomaly.py:holt_linear): two doubles of carried state
    in one partition-kernel pass, the EWMA family's trend-aware
    sibling; the oracle unrolls both coupled recurrences as one
    recursive CTE running the identical float op sequence
    (alpha/gamma exactly representable)."""
    ev = tables.load_table(spark, sf_dir, "events")
    return anomaly.holt_linear(ev, "user_id", "ts", "value",
                               HOLT_ALPHA, HOLT_GAMMA, "event_id")


@register(
    "chi2_type_weekday",
    oracle="""
    WITH obs AS (
        SELECT event_type AS r,
               CAST(EXTRACT(dow FROM ts) + 1 AS BIGINT) AS c,
               CAST(COUNT(*) AS BIGINT) AS observed
        FROM events GROUP BY 1, 2),
    cells AS (
        SELECT rr.r, cc.c, COALESCE(o.observed, 0) AS observed
        FROM (SELECT DISTINCT r FROM obs) rr
        CROSS JOIN (SELECT DISTINCT c FROM obs) cc
        LEFT JOIN obs o ON o.r = rr.r AND o.c = cc.c),
    marg AS (
        SELECT r, c, observed,
               SUM(observed) OVER (PARTITION BY r) AS rt,
               SUM(observed) OVER (PARTITION BY c) AS ct,
               SUM(observed) OVER () AS n
        FROM cells),
    terms AS (
        SELECT r, c, observed,
               CAST(FLOOR((rt * ct / n) * 1000000 + 0.5) AS BIGINT)
                   AS expected_micro,
               CAST(FLOOR(((observed - rt * ct / n)
                           * (observed - rt * ct / n)
                           / (rt * ct / n)) * 1000000 + 0.5)
                    AS BIGINT) AS term_micro
        FROM marg)
    SELECT r AS row_value, c AS col_value, observed,
           expected_micro, term_micro,
           CAST(SUM(term_micro) OVER () AS BIGINT) AS chi2_micro,
           CAST((COUNT(DISTINCT r) OVER () - 1)
                * (COUNT(DISTINCT c) OVER () - 1) AS INTEGER) AS dof
    FROM terms
    """,
    tags=("anomaly", "stats-test", "governance"),
)
def q_chi2_type_weekday(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson chi-square independence test of event_type x weekday
    (operators/anomaly.py:chi2_independence): expected counts from the
    margins over the DENSIFIED cell grain (a zero cell contributes
    (0-E)^2/E = E, so sparse tables would understate chi2 otherwise),
    per-cell (O-E)^2/E pinned to micro-units before the cross-cell
    sum, full contingency drilldown with the table statistic and dof
    on every row. Weekday uses Spark dayofweek == DuckDB
    EXTRACT(dow) + 1 (the seasonal-anomalies convention)."""
    ev = tables.load_table(spark, sf_dir, "events")
    return anomaly.chi2_independence(
        ev, F.col("event_type"), F.dayofweek(F.col("ts")).cast("long"))


@register(
    "ks_value_drift",
    oracle="""
    WITH q AS (
        SELECT event_type AS grp,
               CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS v,
               event_id % 2 AS p
        FROM events),
    c AS (SELECT grp, v,
                 SUM(CASE WHEN p = 0 THEN 1 ELSE 0 END) AS ca,
                 SUM(CASE WHEN p = 1 THEN 1 ELSE 0 END) AS cb
          FROM q GROUP BY 1, 2),
    cum AS (
        SELECT grp, v,
               CAST(SUM(ca) OVER w AS HUGEINT) AS cum_a,
               CAST(SUM(cb) OVER w AS HUGEINT) AS cum_b,
               CAST(SUM(ca) OVER (PARTITION BY grp) AS HUGEINT) AS na,
               CAST(SUM(cb) OVER (PARTITION BY grp) AS HUGEINT) AS nb
        FROM c
        WINDOW w AS (PARTITION BY grp ORDER BY v
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
    g AS (SELECT grp, v,
                 ABS(cum_a * nb - cum_b * na) AS gap, na, nb
          FROM cum),
    m AS (SELECT grp, MAX(gap) AS mg, MAX(na) AS na, MAX(nb) AS nb
          FROM g GROUP BY grp)
    SELECT m.grp AS event_type,
           CAST(m.na AS BIGINT) AS n_a,
           CAST(m.nb AS BIGINT) AS n_b,
           CASE WHEN m.na > 0 AND m.nb > 0 THEN
               CAST(m.mg * 1000000 // (m.na * m.nb) AS BIGINT)
           END AS ks_d_ppm,
           CAST(MIN(g.v) AS BIGINT) AS at_v_cents
    FROM m JOIN g ON g.grp = m.grp AND g.gap = m.mg
    GROUP BY m.grp, m.na, m.nb, m.mg
    """,
    tags=("anomaly", "drift", "stats-test", "ml-ops"),
)
def q_ks_value_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov drift test of the value
    distribution per event_type between the two half-populations
    (event_id parity, the psi_value_drift split)
    (operators/anomaly.py:ks_two_sample): the bin-free sibling of PSI
    — max scaled ECDF gap |cum_a*n_b - cum_b*n_a| in exact integers,
    reported as a truncating ks_d_ppm plus the smallest value at
    which the two curves diverge most."""
    ev = tables.load_table(spark, sf_dir, "events")
    return anomaly.ks_two_sample(ev, "event_type", "value",
                                 (F.col("event_id") % 2 == 1))


@register(
    "bh_fdr_value_drift",
    oracle=f"""
    WITH q AS (
        SELECT event_type AS grp,
               CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS v,
               event_id % 2 AS p
        FROM events),
    c AS (SELECT grp, v,
                 SUM(CASE WHEN p = 0 THEN 1 ELSE 0 END) AS ca,
                 SUM(CASE WHEN p = 1 THEN 1 ELSE 0 END) AS cb
          FROM q GROUP BY 1, 2),
    cum AS (
        SELECT grp, v,
               CAST(SUM(ca) OVER w AS HUGEINT) AS cum_a,
               CAST(SUM(cb) OVER w AS HUGEINT) AS cum_b,
               CAST(SUM(ca) OVER (PARTITION BY grp) AS HUGEINT) AS na,
               CAST(SUM(cb) OVER (PARTITION BY grp) AS HUGEINT) AS nb
        FROM c
        WINDOW w AS (PARTITION BY grp ORDER BY v
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
    g AS (SELECT grp, ABS(cum_a * nb - cum_b * na) AS gap, na, nb
          FROM cum),
    m AS (SELECT grp, MAX(gap) AS mg, MAX(na) AS na, MAX(nb) AS nb
          FROM g GROUP BY grp),
    ks AS (
        SELECT grp AS event_type,
               CAST(na AS BIGINT) AS n_a,
               CAST(nb AS BIGINT) AS n_b,
               CAST(mg * 1000000 // (na * nb) AS BIGINT) AS ks_d_ppm
        FROM m WHERE na > 0 AND nb > 0),
    pv AS (
        SELECT event_type, n_a, n_b, ks_d_ppm,
               {anomaly.KS_P_PPM_SQL} AS p_ppm
        FROM ks),
    r AS (
        SELECT *,
               CAST(ROW_NUMBER() OVER (ORDER BY p_ppm, event_type)
                    AS BIGINT) AS p_rank,
               CAST(COUNT(*) OVER () AS BIGINT) AS m_tests
        FROM pv),
    cut AS (
        SELECT *,
               MAX(CASE WHEN p_ppm * m_tests <= 50000 * p_rank
                        THEN p_rank ELSE 0 END) OVER () AS co
        FROM r)
    SELECT event_type, n_a, n_b, ks_d_ppm, p_ppm, p_rank, m_tests,
           CAST(p_rank <= co AS INTEGER) AS rejected
    FROM cut
    """,
    tags=("anomaly", "drift", "stats-test", "ml-ops",
          "experimentation"),
)
def q_bh_fdr_value_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benjamini-Hochberg FDR control over the per-event-type KS
    drift tests (operators/anomaly.py:ks_bh_fdr) — the
    multiple-testing layer a fleet-wide drift monitor needs: without
    it, testing every type at alpha=0.05 fires 2-3 false alarms per
    sweep by construction. Asymptotic 3-term KS p-values pinned to
    ppm; the BH rejection boundary is the exact integer comparison
    p_ppm * m <= 50000 * rank."""
    ev = tables.load_table(spark, sf_dir, "events")
    return anomaly.ks_bh_fdr(ev, "event_type", "value",
                             (F.col("event_id") % 2 == 1),
                             alpha_ppm=50_000)


@register(
    "welch_ttest_value_drift",
    oracle=f"""
    WITH q AS (
        SELECT event_type AS grp,
               CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS v,
               event_id % 2 AS p
        FROM events),
    m AS (
        SELECT grp,
               CAST(SUM(CASE WHEN p = 0 THEN 1 ELSE 0 END)
                    AS HUGEINT) AS na,
               CAST(SUM(CASE WHEN p = 1 THEN 1 ELSE 0 END)
                    AS HUGEINT) AS nb,
               CAST(SUM(CASE WHEN p = 0 THEN v ELSE 0 END)
                    AS HUGEINT) AS sxa,
               CAST(SUM(CASE WHEN p = 1 THEN v ELSE 0 END)
                    AS HUGEINT) AS sxb,
               SUM(CASE WHEN p = 0 THEN CAST(v AS HUGEINT) * v
                        ELSE 0 END) AS sxxa,
               SUM(CASE WHEN p = 1 THEN CAST(v AS HUGEINT) * v
                        ELSE 0 END) AS sxxb
        FROM q GROUP BY grp)
    SELECT grp AS event_type,
           CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
           CAST(FLOOR(CAST(sxa AS DOUBLE) / CAST(na AS DOUBLE)
                * 1000.0 + 0.5) AS BIGINT) AS mean_a_cents_milli,
           CAST(FLOOR(CAST(sxb AS DOUBLE) / CAST(nb AS DOUBLE)
                * 1000.0 + 0.5) AS BIGINT) AS mean_b_cents_milli,
           CASE WHEN na >= 2 AND nb >= 2 THEN
               {anomaly.WELCH_T_MILLI_SQL} END AS t_milli,
           CASE WHEN na >= 2 AND nb >= 2 THEN
               {anomaly.WELCH_DF_MILLI_SQL} END AS df_milli
    FROM m
    """,
    tags=("anomaly", "drift", "stats-test", "experimentation"),
)
def q_welch_ttest_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's unequal-variance t-test of the value mean per
    event_type between the two half-populations (the psi/ks split)
    (operators/anomaly.py:welch_ttest) — the parametric mean-shift
    member of the drift suite (PSI bins, KS shape, BH-FDR multiple
    testing, and now the t statistic with Welch-Satterthwaite df).
    One hash aggregate; t and df pinned to milli units from exact
    decimal moments."""
    ev = tables.load_table(spark, sf_dir, "events")
    return anomaly.welch_ttest(ev, "event_type", "value",
                               (F.col("event_id") % 2 == 1))
