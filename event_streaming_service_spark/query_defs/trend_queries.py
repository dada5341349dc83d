"""Time-series / behavioral trend queries over `events`: interval-
weighted averages, Markov transition matrices, and per-key OLS trend
slopes (operators/windows.py:time_weighted_avg,
operators/analytics.py:transition_matrix/trend_ols).

All three are order- or duration-sensitive aggregations the
reference's counter statistics (service/EventStatisticsService.java)
cannot express, and all three keep their float paths pinned: exact
integer/decimal accumulation, a single final division, ROUND spelled
identically in the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from event_streaming_service_spark.functions.money import cents
from event_streaming_service_spark.operators import analytics, windows
from event_streaming_service_spark.queries import register
from event_streaming_service_spark.sources import tables


@register(
    "twa_value_per_user",
    oracle="""
    WITH seq AS (
        SELECT user_id, epoch_ms(ts) AS ms,
               CAST(FLOOR(value * 1e6 + 0.5) AS HUGEINT) AS vmic,
               LEAD(epoch_ms(ts)) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id) AS next_ms
        FROM events)
    SELECT user_id,
           COUNT(*) AS n_events,
           MAX(ms) - MIN(ms) AS span_ms,
           CASE WHEN MAX(ms) - MIN(ms) > 0 THEN
               ROUND(CAST(SUM(CASE WHEN next_ms IS NULL THEN 0
                                   ELSE (next_ms - ms) * vmic END)
                          AS DOUBLE)
                     / (CAST(MAX(ms) - MIN(ms) AS DOUBLE) * 1e6), 9)
           END AS twa_value
    FROM seq GROUP BY user_id
    """,
    tags=("analytics", "twa", "A5", "window-frames"),
)
def q_twa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user time-weighted average of `value`: each observation
    holds until the user's next event, so bursts stop over-counting
    the mean — kdb/TimescaleDB `twa` semantics on Spark. One shuffle;
    exact integer weighting (see operator docstring)."""
    events = tables.load_table(spark, sf_dir, "events")
    return windows.time_weighted_avg(events, "user_id", "ts", "value",
                                     order_tiebreak="event_id")


@register(
    "event_transition_matrix",
    oracle="""
    WITH seq AS (
        SELECT user_id, event_type,
               LAG(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id)
                   AS prev_type
        FROM events),
    c AS (
        SELECT prev_type, event_type AS next_type,
               COUNT(*) AS n_transitions
        FROM seq WHERE prev_type IS NOT NULL GROUP BY 1, 2)
    SELECT prev_type, next_type, n_transitions,
           ROUND(CAST(n_transitions AS DOUBLE)
                 / CAST(SUM(n_transitions) OVER (PARTITION BY prev_type)
                        AS DOUBLE), 6) AS prob
    FROM c
    """,
    tags=("analytics", "markov", "A6"),
)
def q_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov matrix over per-user event timelines:
    P(next_type | prev_type) with exact transition counts. k^2 output
    rows regardless of input size (map-side combine)."""
    events = tables.load_table(spark, sf_dir, "events")
    return analytics.transition_matrix(events, "user_id", "ts",
                                       "event_type",
                                       order_tiebreak="event_id")


@register(
    "transition_matrix_segmented",
    oracle="""
    WITH seq AS (
        SELECT user_id, event_type,
               LAG(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id)
                   AS prev_type
        FROM events),
    c AS (
        SELECT prev_type, event_type AS next_type,
               COUNT(*) AS n_transitions
        FROM seq WHERE prev_type IS NOT NULL GROUP BY 1, 2)
    SELECT prev_type, next_type, n_transitions,
           ROUND(CAST(n_transitions AS DOUBLE)
                 / CAST(SUM(n_transitions) OVER (PARTITION BY prev_type)
                        AS DOUBLE), 6) AS prob
    FROM c
    """,
    tags=("analytics", "markov", "A6", "segmented-scan"),
)
def q_transition_matrix_segmented(spark: SparkSession,
                                  sf_dir: str) -> DataFrame:
    """The hot-key fallback of the Markov matrix
    (analytics._segmented_adjacent_pairs): each user's timeline splits
    into 8 contiguous time segments — the adjacency window partitions
    by (key, segment) so the max sort task is rows/segment — plus one
    exact boundary pair per consecutive non-empty segment. Integer
    adjacency, no float state, so the oracle is the SAME single-window
    recurrence the unsegmented query proves: a hash match demonstrates
    the decomposition is bit-identical, not just approximately
    right."""
    events = tables.load_table(spark, sf_dir, "events")
    return analytics.transition_matrix(events, "user_id", "ts",
                                       "event_type",
                                       order_tiebreak="event_id",
                                       n_segments=8)


@register(
    "value_trend_per_user",
    oracle="""
    WITH base AS (
        SELECT user_id, epoch_ms(ts) AS ms,
               CAST(FLOOR(value * 1e6 + 0.5) AS HUGEINT) AS y
        FROM events),
    reb AS (
        SELECT user_id,
               CAST(ms - MIN(ms) OVER (PARTITION BY user_id)
                    AS HUGEINT) AS x,
               y
        FROM base),
    s AS (
        SELECT user_id, CAST(COUNT(*) AS HUGEINT) AS n,
               SUM(x) AS sx, SUM(y) AS sy,
               SUM(x * y) AS sxy, SUM(x * x) AS sxx
        FROM reb GROUP BY user_id)
    SELECT user_id, CAST(n AS BIGINT) AS n_points,
           CASE WHEN n * sxx - sx * sx > 0 THEN
               ROUND(CAST(n * sxy - sx * sy AS DOUBLE)
                     / CAST(n * sxx - sx * sx AS DOUBLE) * 86.4, 9)
           END AS slope_per_day
    FROM s
    """,
    tags=("analytics", "ols-trend", "A5"),
)
def q_value_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user OLS slope of value over time (units/day, 9 dp):
    regression-as-aggregation via exact decimal sums — one pass, no
    per-key series materialized."""
    events = tables.load_table(spark, sf_dir, "events")
    return analytics.trend_ols(events, "user_id", "ts", "value")


@register(
    "price_quantity_correlation",
    oracle="""
    WITH q AS (
        SELECT l_returnflag,
               CAST(FLOOR(l_quantity * 100 + 0.5) AS HUGEINT) AS x,
               CAST(FLOOR(l_extendedprice * 100 + 0.5) AS HUGEINT) AS y
        FROM lineitem),
    s AS (
        SELECT l_returnflag, CAST(COUNT(*) AS HUGEINT) AS n,
               SUM(x) AS sx, SUM(y) AS sy, SUM(x * y) AS sxy,
               SUM(x * x) AS sxx, SUM(y * y) AS syy
        FROM q GROUP BY l_returnflag)
    SELECT l_returnflag, CAST(n AS BIGINT) AS n_points,
           CASE WHEN n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0
                THEN ROUND(CAST(n * sxy - sx * sy AS DOUBLE)
                           / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
                                  * CAST(n * syy - sy * sy AS DOUBLE)),
                           9)
           END AS pearson_r
    FROM s
    """,
    tags=("analytics", "correlation", "A5"),
)
def q_price_qty_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson r between quantity and extended price per return flag:
    exact decimal moment sums, one pinned sqrt/divide — deterministic
    where the builtin running-covariance corr is not."""
    lineitem = tables.load_table(spark, sf_dir, "lineitem")
    return analytics.pearson_corr(lineitem, "l_quantity",
                                  "l_extendedprice",
                                  group_cols=["l_returnflag"])


@register(
    "weekly_revenue_wow",
    oracle="""
    WITH w AS (
        SELECT CAST(date_trunc('week', o_orderdate) AS TIMESTAMP)
                   AS week_start,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT))
                    AS BIGINT) AS revenue_cents
        FROM orders GROUP BY 1),
    l AS (SELECT *,
                 LAG(revenue_cents) OVER (ORDER BY week_start)
                     AS prev_cents
          FROM w)
    SELECT week_start, n_orders, revenue_cents,
           prev_cents,
           revenue_cents - prev_cents AS delta_cents,
           CASE WHEN prev_cents > 0
                THEN CAST((revenue_cents - prev_cents) * 1000000
                          // prev_cents AS BIGINT) END AS wow_ppm
    FROM l
    """,
    tags=("trend", "wow", "calendar", "A5", "window-frames"),
)
def q_weekly_revenue_wow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Week-over-week revenue deltas: weekly cents totals (Monday
    weeks, identical date_trunc in both engines) with lag-1 delta and
    truncating-DIV ppm change. The window is over the WEEKLY grain —
    dozens of rows regardless of corpus size, so the partition-less
    ordering is a post-aggregate detail, not a scale hazard."""
    orders = tables.load_table(spark, sf_dir, "orders")
    w = (orders.groupBy(F.date_trunc("week", F.col("o_orderdate"))
                        .alias("week_start"))
         .agg(F.count(F.lit(1)).alias("n_orders"),
              F.sum(cents("o_totalprice")).alias("revenue_cents")))
    lagw = Window.orderBy("week_start")
    out = (w.withColumn("prev_cents",
                        F.lag("revenue_cents").over(lagw))
           .withColumn("delta_cents",
                       F.col("revenue_cents") - F.col("prev_cents"))
           .withColumn("wow_ppm",
                       F.when(F.col("prev_cents") > 0, F.expr(
                           "CAST((revenue_cents - prev_cents) * "
                           "1000000 DIV prev_cents AS BIGINT)"))))
    return out


@register(
    "ltv_by_cohort_month",
    oracle="""
    WITH fo AS (
        SELECT o_custkey,
               MIN(CAST(EXTRACT(year FROM o_orderdate) * 12
                        + EXTRACT(month FROM o_orderdate) - 1
                        AS BIGINT)) AS cohort_m
        FROM orders GROUP BY 1),
    j AS (
        SELECT fo.cohort_m,
               CAST(EXTRACT(year FROM o.o_orderdate) * 12
                    + EXTRACT(month FROM o.o_orderdate) - 1
                    AS BIGINT) - fo.cohort_m AS age_months,
               o.o_custkey,
               CAST(ROUND(o.o_totalprice * 100, 0) AS BIGINT) AS c
        FROM orders o JOIN fo ON o.o_custkey = fo.o_custkey),
    g AS (
        SELECT cohort_m, age_months,
               CAST(COUNT(DISTINCT o_custkey) AS BIGINT)
                   AS active_customers,
               CAST(SUM(c) AS BIGINT) AS revenue_cents
        FROM j GROUP BY 1, 2)
    SELECT cohort_m, age_months, active_customers, revenue_cents,
           CAST(SUM(revenue_cents) OVER (
               PARTITION BY cohort_m ORDER BY age_months)
               AS BIGINT) AS cum_revenue_cents
    FROM g
    """,
    tags=("trend", "cohort", "ltv", "A5", "calendar"),
)
def q_ltv_by_cohort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer-lifetime-value triangle: customers cohorted by first
    order month (linear month index year*12+month-1 — no
    months_between float), revenue accumulated by cohort age with a
    running total over the tiny (cohort, age) grain."""
    orders = tables.load_table(spark, sf_dir, "orders")
    mindex = (F.year("o_orderdate") * 12
              + F.month("o_orderdate") - 1).cast("bigint")
    fo = (orders.groupBy("o_custkey")
          .agg(F.min(mindex).alias("cohort_m")))
    j = (orders.join(fo, "o_custkey")
         .select("cohort_m",
                 (mindex - F.col("cohort_m")).alias("age_months"),
                 "o_custkey",
                 cents("o_totalprice").alias("c")))
    g = (j.groupBy("cohort_m", "age_months")
         .agg(F.countDistinct("o_custkey").alias("active_customers"),
              F.sum("c").alias("revenue_cents")))
    cum = Window.partitionBy("cohort_m").orderBy("age_months") \
        .rowsBetween(Window.unboundedPreceding, 0)
    return g.withColumn("cum_revenue_cents",
                        F.sum("revenue_cents").over(cum)
                        .cast("bigint"))


MARKOV_ITERS = 5


def _markov_oracle(iters: int) -> str:
    """Unrolled integer power iteration (the pagerank CTE scheme) over
    the lag-window transition counts."""
    ctes = ["""seq AS (
        SELECT user_id, event_type,
               LAG(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id)
                   AS prev_type
        FROM events)""",
            """c AS MATERIALIZED (
        SELECT prev_type, event_type AS next_type,
               CAST(COUNT(*) AS BIGINT) AS cnt
        FROM seq WHERE prev_type IS NOT NULL GROUP BY 1, 2)""",
            """tot AS (
        SELECT prev_type, CAST(SUM(cnt) AS BIGINT) AS tot
        FROM c GROUP BY prev_type)""",
            """e AS MATERIALIZED (
        SELECT c.prev_type, c.next_type, c.cnt, t.tot
        FROM c JOIN tot t USING (prev_type))""",
            """states AS MATERIALIZED (
        SELECT DISTINCT prev_type AS state FROM e
        UNION SELECT DISTINCT next_type FROM e)""",
            """r0 AS (
        SELECT state, CAST(1000000000 AS BIGINT) AS pi FROM states)"""]
    for i in range(1, iters + 1):
        ctes.append(f"""r{i} AS MATERIALIZED (
        SELECT s.state,
               CAST(COALESCE(SUM((p.pi * e.cnt) // e.tot), 0)
                    AS BIGINT) AS pi
        FROM states s
        LEFT JOIN e ON e.next_type = s.state
        LEFT JOIN r{i - 1} p ON p.state = e.prev_type
        GROUP BY s.state)""")
    return ("WITH " + ",\n".join(ctes)
            + f"\nSELECT state, pi AS pi_nano FROM r{iters}")


@register(
    "markov_stationary_types",
    oracle=_markov_oracle(MARKOV_ITERS),
    tags=("analytics", "markov", "iterative", "A6"),
)
def q_markov_stationary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Long-run occupancy of the event-type Markov chain
    (operators/analytics.py:markov_stationary): five integer-nano
    power-iteration rounds over the per-user lag-window transition
    counts, unrolled identically in the oracle — the stationary
    readout of event_transition_matrix's one-step probabilities."""
    events = tables.load_table(spark, sf_dir, "events")
    trans = analytics.transition_matrix(
        events, "user_id", "ts", "event_type",
        order_tiebreak="event_id").select(
        "prev_type", "next_type", "n_transitions")
    return analytics.markov_stationary(
        trans, "prev_type", "next_type", "n_transitions",
        iterations=MARKOV_ITERS)


ACF_LAGS = (1, 2, 3)


def _acf_lag_union_sql() -> str:
    return "\n        UNION ALL ".join(
        f"""SELECT event_type, {k} AS lag, cnt AS x,
               LAG(cnt, {k}) OVER (PARTITION BY event_type
                                   ORDER BY h) AS y
        FROM dense""" for k in ACF_LAGS)


@register(
    "acf_hourly_by_type",
    oracle=f"""
    WITH hc AS (
        SELECT event_type, epoch_ms(ts) // 3600000 AS h,
               CAST(COUNT(*) AS BIGINT) AS cnt
        FROM events GROUP BY 1, 2),
    b AS (SELECT MIN(h) AS h0, MAX(h) AS h1 FROM hc),
    spine AS (
        SELECT t.event_type, s.h
        FROM (SELECT DISTINCT event_type FROM hc) t, b,
             LATERAL (SELECT unnest(range(b.h0, b.h1 + 1)) AS h) s),
    dense AS (
        SELECT s.event_type, s.h, COALESCE(hc.cnt, 0) AS cnt
        FROM spine s
        LEFT JOIN hc ON hc.event_type = s.event_type AND hc.h = s.h),
    lagged AS (
        {_acf_lag_union_sql()}),
    m AS (
        SELECT event_type, lag,
               CAST(COUNT(*) AS HUGEINT) AS n,
               CAST(SUM(x) AS HUGEINT) AS sx,
               CAST(SUM(y) AS HUGEINT) AS sy,
               SUM(CAST(x AS HUGEINT) * y) AS sxy,
               SUM(CAST(x AS HUGEINT) * x) AS sxx,
               SUM(CAST(y AS HUGEINT) * y) AS syy
        FROM lagged WHERE y IS NOT NULL GROUP BY 1, 2)
    SELECT event_type, lag, CAST(n AS BIGINT) AS n_points,
           CASE WHEN n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0
                THEN ROUND(CAST(n * sxy - sx * sy AS DOUBLE)
                           / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
                                  * CAST(n * syy - sy * sy AS DOUBLE)),
                           9)
           END AS pearson_r
    FROM m
    """,
    tags=("analytics", "timeseries", "acf", "2.12-timeseries"),
)
def q_acf_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autocorrelation of the hourly event-count series per event_type
    at lags 1-3 (the periodicity diagnostic run before any seasonal
    model): counts densify onto the global hour spine (a gap IS a
    zero, not a missing sample), each lag pairs (x_t, x_{t-k}) via one
    lag window, and the correlation is the exact-moment Pearson device
    (operators/analytics.py:pearson_corr — decimal moments, one pinned
    final float op)."""
    from event_streaming_service_spark.functions.scalars import (
        wall_clock_millis)

    ev = tables.load_table(spark, sf_dir, "events")
    hc = (ev.select("event_type",
                    wall_clock_millis(F.col("ts")).alias("__ms"))
          .select("event_type",
                  F.expr("__ms DIV 3600000").alias("h"))
          .groupBy("event_type", "h")
          .agg(F.count(F.lit(1)).cast("long").alias("cnt")))
    bounds = hc.agg(F.min("h").alias("h0"), F.max("h").alias("h1"))
    spine = (hc.select("event_type").distinct()
             .crossJoin(F.broadcast(bounds))
             .select("event_type",
                     F.explode(F.sequence("h0", "h1")).alias("h")))
    dense = (spine.join(hc, ["event_type", "h"], "left")
             .fillna(0, ["cnt"])
             .persist())
    w = Window.partitionBy("event_type").orderBy("h")
    lagged = None
    for k in ACF_LAGS:
        part = (dense
                .withColumn("y", F.lag("cnt", k).over(w))
                .filter(F.col("y").isNotNull())
                .select("event_type", F.lit(k).cast("int").alias("lag"),
                        F.col("cnt").alias("x"), "y"))
        lagged = part if lagged is None else lagged.unionByName(part)
    return analytics.pearson_corr(lagged, "x", "y",
                                  group_cols=["event_type", "lag"],
                                  x_scale=1, y_scale=1)


TS_CAP = 128


@register(
    "theil_sen_value_trend",
    oracle=f"""
    WITH base AS (
        SELECT user_id, epoch_ms(ts) AS ms,
               CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS c,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY epoch_ms(ts), event_id)
                   AS rn
        FROM events),
    capped AS (SELECT * FROM base WHERE rn <= {TS_CAP}),
    pairs AS (
        SELECT a.user_id,
               ((b.c - a.c) * 3600000000) // (b.ms - a.ms) AS slope
        FROM capped a JOIN capped b
          ON a.user_id = b.user_id AND a.rn < b.rn
        WHERE b.ms <> a.ms)
    SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_pairs,
           CAST(median(slope) AS DOUBLE) AS theil_sen_milli_cph
    FROM pairs GROUP BY user_id
    """,
    tags=("analytics", "robust-stats", "timeseries", "trend"),
)
def q_theil_sen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-Sen robust value trend per user
    (operators/analytics.py:theil_sen_trend): median of pairwise
    slopes pinned to integer milli-cents-per-hour before the median,
    pairwise fan-out bounded by the deterministic per-key event cap —
    the outlier-immune sibling of value_trend_per_user's OLS slope."""
    ev = tables.load_table(spark, sf_dir, "events")
    return analytics.theil_sen_trend(ev, "user_id", "ts", "value",
                                     "event_id",
                                     max_events_per_key=TS_CAP)


def _dense_hourly_counts(ev: DataFrame) -> DataFrame:
    """(event_type, h, cnt) densified onto the GLOBAL hour spine — a
    silent hour IS a zero observation, not a missing row (the acf
    device, shared by the burstiness and cross-correlation queries).
    Spine size = types x hours: dimension-bounded, the explode never
    exceeds ~1e5 rows per type-year."""
    from event_streaming_service_spark.functions.scalars import (
        wall_clock_millis)

    hc = (ev.select("event_type",
                    wall_clock_millis(F.col("ts")).alias("__ms"))
          .select("event_type", F.expr("__ms DIV 3600000").alias("h"))
          .groupBy("event_type", "h")
          .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
          # consumed THREE times (bounds, type set, the join): pin the
          # hourly grain so the raw event scan runs once
          .persist())
    bounds = hc.agg(F.min("h").alias("h0"), F.max("h").alias("h1"))
    spine = (hc.select("event_type").distinct()
             .crossJoin(F.broadcast(bounds))
             .select("event_type",
                     F.explode(F.sequence("h0", "h1")).alias("h")))
    return (spine.join(hc, ["event_type", "h"], "left")
            .fillna(0, ["cnt"]))


def _dense_hourly_sql(where: str = "") -> str:
    """The SQL twin of _dense_hourly_counts; `where` must match any
    pre-filter applied to the Spark input (the spine's hour BOUNDS
    come from the filtered stream, so the filter must sit inside hc,
    not on a later projection)."""
    return _DENSE_HOURLY_TEMPLATE.format(where=where)


_DENSE_HOURLY_TEMPLATE = """
    hc AS (
        SELECT event_type, epoch_ms(ts) // 3600000 AS h,
               CAST(COUNT(*) AS BIGINT) AS cnt
        FROM events {where} GROUP BY 1, 2),
    b AS (SELECT MIN(h) AS h0, MAX(h) AS h1 FROM hc),
    spine AS (
        SELECT t.event_type, s.h
        FROM (SELECT DISTINCT event_type FROM hc) t, b,
             LATERAL (SELECT unnest(range(b.h0, b.h1 + 1)) AS h) s),
    dense AS (
        SELECT s.event_type, s.h, COALESCE(hc.cnt, 0) AS cnt
        FROM spine s
        LEFT JOIN hc ON hc.event_type = s.event_type AND hc.h = s.h)
"""


@register(
    "fano_burstiness_by_type",
    oracle=f"""
    WITH {_dense_hourly_sql()},
    m AS (SELECT event_type,
                 CAST(COUNT(*) AS HUGEINT) AS n,
                 CAST(SUM(cnt) AS HUGEINT) AS sc,
                 SUM(CAST(cnt AS HUGEINT) * cnt) AS scc
          FROM dense GROUP BY 1)
    SELECT event_type,
           CAST(n AS BIGINT) AS n_hours,
           CAST(sc AS BIGINT) AS n_events,
           CAST(sc * 1000000 // n AS BIGINT) AS mean_ppm,
           CASE WHEN sc > 0 THEN
               CAST((n * scc - sc * sc) * 1000000 // (n * sc)
                    AS BIGINT)
           END AS fano_ppm
    FROM m
    """,
    tags=("analytics", "timeseries", "burstiness", "2.12-timeseries"),
)
def q_fano_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fano factor (index of dispersion, variance/mean) of the hourly
    arrival-count series per event_type: the burstiness diagnostic —
    a Poisson process sits at 1.0, clumped traffic (retry storms,
    batch replays) far above, rate-limited flow below. Population
    moments over the DENSE hourly spine (a silent hour is a zero)
    in exact decimal arithmetic; the single division is a truncating
    ppm DIV, so the statistic is an exact bigint in both engines.
    One hash agg over the spine — k output rows, no skew surface."""
    ev = tables.load_table(spark, sf_dir, "events")
    dec = "decimal(38,0)"
    m = (_dense_hourly_counts(ev)
         .groupBy("event_type")
         .agg(F.count(F.lit(1)).cast(dec).alias("__n"),
              F.sum("cnt").cast(dec).alias("__sc"),
              F.sum(F.col("cnt").cast(dec) * F.col("cnt"))
              .cast(dec).alias("__scc")))
    return m.select(
        "event_type",
        F.col("__n").cast("bigint").alias("n_hours"),
        F.col("__sc").cast("bigint").alias("n_events"),
        F.expr("CAST(__sc * 1000000 DIV __n AS BIGINT)")
        .alias("mean_ppm"),
        F.when(F.col("__sc") > 0, F.expr(
            "CAST((__n * __scc - __sc * __sc) * 1000000"
            " DIV (__n * __sc) AS BIGINT)")).alias("fano_ppm"))


XCORR_X_TYPE = "click"
XCORR_Y_TYPE = "purchase"
XCORR_LAGS = (0, 1, 2, 3)


def _xcorr_lag_union_sql() -> str:
    # lag the X (click) series: row t pairs x(t-k) with y(t), so a
    # high r at lag k>0 means click volume k hours AGO predicts
    # purchase volume NOW — click leads purchase (ADVICE r9 #1: the
    # previous LAG(y, k) computed the inverse, purchase leading click,
    # while the docstring claimed this direction)
    return "\n        UNION ALL ".join(
        f"""SELECT {k} AS lag,
               LAG(x, {k}) OVER (ORDER BY h) AS x, y
        FROM paired""" for k in XCORR_LAGS)


@register(
    "xcorr_hourly_types",
    oracle=f"""
    WITH {_dense_hourly_sql(
        f"WHERE event_type IN ('{XCORR_X_TYPE}', '{XCORR_Y_TYPE}')")},
    paired AS (
        SELECT h,
               MAX(CASE WHEN event_type = '{XCORR_X_TYPE}'
                        THEN cnt END) AS x,
               MAX(CASE WHEN event_type = '{XCORR_Y_TYPE}'
                        THEN cnt END) AS y
        FROM dense
        GROUP BY h),
    lagged AS (
        {_xcorr_lag_union_sql()}),
    m AS (
        SELECT lag,
               CAST(COUNT(*) AS HUGEINT) AS n,
               CAST(SUM(x) AS HUGEINT) AS sx,
               CAST(SUM(y) AS HUGEINT) AS sy,
               SUM(CAST(x AS HUGEINT) * y) AS sxy,
               SUM(CAST(x AS HUGEINT) * x) AS sxx,
               SUM(CAST(y AS HUGEINT) * y) AS syy
        FROM lagged WHERE x IS NOT NULL GROUP BY 1)
    SELECT lag, CAST(n AS BIGINT) AS n_points,
           CASE WHEN n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0
                THEN ROUND(CAST(n * sxy - sx * sy AS DOUBLE)
                           / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
                                  * CAST(n * syy - sy * sy AS DOUBLE)),
                           9)
           END AS pearson_r
    FROM m
    """,
    tags=("analytics", "timeseries", "xcorr", "2.12-timeseries"),
)
def q_xcorr_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lagged cross-correlation between the click and purchase hourly
    count series at lags 0-3: does click volume LEAD purchase volume,
    and by how many hours — the "does X drive Y" diagnostic behind
    attribution windows and campaign lift reads. Row t at lag k pairs
    click(t-k) with purchase(t), so high r at k>0 means clicks k
    hours ago predict purchases now (click leads). Both series
    densify onto the shared hour spine (zeros included: correlation
    against a sparse series is meaningless), click shifts back by k
    via one lag window over the GLOBAL hourly grain (thousands of
    rows — the partition-less window is a post-aggregate detail, the
    acf/wow convention), and each lag's r is the exact-moment Pearson
    device with one pinned final sqrt/divide."""
    ev = tables.load_table(spark, sf_dir, "events")
    dense = _dense_hourly_counts(
        ev.filter(F.col("event_type").isin(XCORR_X_TYPE, XCORR_Y_TYPE)))
    paired = (dense.groupBy("h")
              .agg(F.max(F.when(F.col("event_type") == XCORR_X_TYPE,
                                F.col("cnt"))).alias("x"),
                   F.max(F.when(F.col("event_type") == XCORR_Y_TYPE,
                                F.col("cnt"))).alias("y"))
              .persist())
    w = Window.orderBy("h")
    lagged = None
    for k in XCORR_LAGS:
        part = (paired
                .withColumn("__x", F.lag("x", k).over(w))
                .filter(F.col("__x").isNotNull())
                .select(F.lit(k).cast("int").alias("lag"),
                        F.col("__x").alias("x"), "y"))
        lagged = part if lagged is None else lagged.unionByName(part)
    return analytics.pearson_corr(lagged, "x", "y", group_cols=["lag"],
                                  x_scale=1, y_scale=1)


@register(
    "spearman_price_quantity",
    oracle="""
    WITH q AS (
        SELECT l_returnflag AS grp,
               CAST(FLOOR(l_quantity * 100 + 0.5) AS BIGINT) AS qx,
               CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT) AS qy
        FROM lineitem),
    ranked AS (
        SELECT grp,
               CAST(2 * RANK() OVER (PARTITION BY grp ORDER BY qx)
                    + COUNT(*) OVER (PARTITION BY grp, qx) - 1
                    AS HUGEINT) AS x,
               CAST(2 * RANK() OVER (PARTITION BY grp ORDER BY qy)
                    + COUNT(*) OVER (PARTITION BY grp, qy) - 1
                    AS HUGEINT) AS y
        FROM q),
    s AS (
        SELECT grp, CAST(COUNT(*) AS HUGEINT) AS n,
               SUM(x) AS sx, SUM(y) AS sy, SUM(x * y) AS sxy,
               SUM(x * x) AS sxx, SUM(y * y) AS syy
        FROM ranked GROUP BY grp)
    SELECT grp AS l_returnflag, CAST(n AS BIGINT) AS n_points,
           CASE WHEN n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0
                THEN ROUND(CAST(n * sxy - sx * sy AS DOUBLE)
                           / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
                                  * CAST(n * syy - sy * sy AS DOUBLE)),
                           9)
           END AS spearman_rho
    FROM s
    """,
    tags=("analytics", "correlation", "robust-stats", "A5"),
)
def q_spearman_price_qty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rank correlation between quantity and extended price
    per return flag (operators/analytics.py:spearman_corr): Pearson on
    average ranks carried as exact integer DOUBLE ranks
    (2*RANK + ties - 1), so tied halves never touch a float — the
    monotone-association sibling of price_quantity_correlation, immune
    to the price outliers that bend the linear r."""
    lineitem = tables.load_table(spark, sf_dir, "lineitem")
    return analytics.spearman_corr(lineitem, "l_quantity",
                                   "l_extendedprice",
                                   group_cols=["l_returnflag"])


@register(
    "mann_kendall_value_trend",
    oracle=f"""
    WITH base AS (
        SELECT user_id,
               CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS c,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY epoch_ms(ts), event_id)
                   AS rn
        FROM events),
    capped AS (SELECT * FROM base WHERE rn <= {TS_CAP}),
    pairs AS (
        SELECT a.user_id,
               CASE WHEN b.c > a.c THEN 1
                    WHEN b.c < a.c THEN -1 ELSE 0 END AS s
        FROM capped a JOIN capped b
          ON a.user_id = b.user_id AND a.rn < b.rn),
    agg AS (
        SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_pairs,
               CAST(SUM(s) AS BIGINT) AS s_stat
        FROM pairs GROUP BY user_id)
    SELECT user_id, n_pairs, s_stat,
           CAST(CASE WHEN s_stat >= 0 THEN 1 ELSE -1 END
                * ((ABS(s_stat) * 1000000) // n_pairs)
                AS BIGINT) AS tau_ppm
    FROM agg
    """,
    tags=("analytics", "robust-stats", "trend", "stats-test"),
)
def q_mann_kendall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Kendall monotone-trend test per user
    (operators/analytics.py:mann_kendall_trend): the concordant-minus
    -discordant pair statistic S and Kendall tau-a in exact ppm over
    the SAME capped (ts, event_id)-ranked timelines theil_sen_trend
    pairs — magnitude there, direction-consistency here, one shared
    truncation so the two readouts describe the same series."""
    ev = tables.load_table(spark, sf_dir, "events")
    return analytics.mann_kendall_trend(ev, "user_id", "ts", "value",
                                        "event_id",
                                        max_events_per_key=TS_CAP)
