"""Behavioral analytics operators: ordered funnels and cohort
retention over the event log.

The reference exposes per-topic/per-type counters and lag statistics
(reference: service/EventStatisticsService.java, metrics/
ConsumerMetrics.java) but no ORDERED multi-event analysis; funnels and
cohorts are the first queries every consumer of such an event stream
asks next, and both are shapes a streaming-analytics engine must own.
They extend SURVEY.md section 2.5's aggregation family with
order-sensitive semantics.

Design notes (100 TB):

* `funnel` is ONE shuffle on the user key. The per-user event list is
  folded entirely JVM-side (`sort_array` + `aggregate` higher-order
  function — whole-stage-codegen'd, no Python). The alternative
  k-step join chain (agg step1 -> join events -> agg step2 -> ...)
  costs k co-partitioned shuffles; it wins only when single users hold
  more events than an executor can array-buffer (~10^7+), which is a
  data bug upstream. Events not in `steps` are filtered BEFORE the
  shuffle, so the buffered arrays hold only funnel-relevant rows.
* `cohort_retention` is two aggregates that share the user-key
  exchange (first-seen agg, then per-(user, day) distinct) plus one
  tiny broadcast of per-cohort sizes. Nothing scales with days x
  users except the distinct activity set itself — the minimum any
  retention query must touch.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from event_streaming_service_spark.functions.scalars import wall_clock_millis


def funnel(events: DataFrame, user_col: str, ts_col: str,
           type_col: str, steps: list[str]) -> DataFrame:
    """Greedy ordered-funnel completion times per user.

    For each user: step 1's time is the earliest `steps[0]` event;
    step i's time is the earliest `steps[i]` event STRICTLY after the
    step i-1 completion. Greedy-earliest is optimal here: taking an
    earlier step-i completion can only admit more step-i+1 candidates,
    so "greedy reaches step k" == "any event choice reaches step k"
    (the classic funnel/subsequence-matching argument).

    Users with no step-1 event are absent; later steps are NULL where
    never reached. `steps_completed` counts the contiguous prefix.

    Equal timestamps do NOT chain (strict >): a click in the same
    microsecond as the view it "followed" is ambiguous ordering, and
    both engines must agree — strict inequality is the deterministic
    choice.
    """
    k = len(steps)
    if k < 2:
        raise ValueError("funnel needs at least two steps")
    if len(set(steps)) != k:
        raise ValueError("funnel steps must be distinct event types")

    step_idx = F.when(F.col(type_col) == steps[0], 0)
    for i, s in enumerate(steps[1:], start=1):
        step_idx = step_idx.when(F.col(type_col) == s, i)

    relevant = (events
                .where(F.col(type_col).isin(list(steps)))
                .select(F.col(user_col),
                        F.col(ts_col).alias("__ts"),
                        step_idx.alias("__step")))

    ts_type = events.schema[ts_col].dataType.simpleString()
    # sort_array orders by (ts, step); the fold then sees events in
    # time order, ties iterated in step order but never chained (strict
    # inequality above excludes them).
    arr = F.sort_array(F.collect_list(F.struct(
        F.col("__ts").alias("t"), F.col("__step").alias("s"))))

    def fold_step(acc: Column, x: Column) -> Column:
        slots = []
        for i in range(k):
            hit = x["s"] == F.lit(i)
            if i > 0:
                prev = F.element_at(acc, i)
                hit = hit & prev.isNotNull() & (x["t"] > prev)
            slots.append(F.coalesce(F.element_at(acc, i + 1),
                                    F.when(hit, x["t"])))
        return F.array(*slots)

    init = F.array(*[F.lit(None).cast(ts_type) for _ in range(k)])
    folded = (relevant
              .groupBy(user_col)
              .agg(F.aggregate(arr, init, fold_step).alias("__f")))

    out_cols = [F.col(user_col)]
    out_cols += [F.element_at("__f", i + 1).alias(f"step{i + 1}_ts")
                 for i in range(k)]
    completed = F.element_at("__f", 1).isNotNull().cast("int")
    for i in range(1, k):
        completed = completed + F.element_at("__f", i + 1).isNotNull().cast("int")
    out_cols.append(completed.alias("steps_completed"))
    return (folded
            .where(F.element_at("__f", 1).isNotNull())
            .select(*out_cols))


def cohort_retention(events: DataFrame, user_col: str,
                     ts_col: str) -> DataFrame:
    """Daily cohort-retention triangle: users bucketed by first-seen
    day, counted on each later day they were active.

    Output: (cohort_day, day_offset, active_users, cohort_size) — one
    row per cohort x offset with at least one active user; offset 0 is
    the cohort itself (active_users == cohort_size by construction).
    All counts are exact integers — no float rate column, callers
    divide at display time.

    The activity set is deduplicated at (user, day) grain first, so a
    user firing 10^6 events in one day contributes one row past that
    point — the retention rollup's input is bounded by users x active
    days, not raw events.
    """
    day = F.to_date(F.col(ts_col))
    first_seen = (events
                  .groupBy(user_col)
                  .agg(F.min(day).alias("cohort_day")))
    activity = (events
                .select(F.col(user_col), day.alias("active_day"))
                .distinct())
    sizes = (first_seen
             .groupBy("cohort_day")
             .agg(F.count(F.lit(1)).alias("cohort_size")))
    return (activity
            .join(first_seen, user_col)
            .groupBy("cohort_day",
                     F.datediff("active_day", "cohort_day")
                     .alias("day_offset"))
            .agg(F.count(F.lit(1)).alias("active_users"))
            .join(F.broadcast(sizes), "cohort_day"))


def _segmented_adjacent_pairs(events: DataFrame, key_col: str,
                              ts_col: str, type_col: str,
                              order_tiebreak: str | None,
                              n_segments: int) -> DataFrame:
    """EXACT hot-key decomposition of per-key adjacency: split each
    key's timeline into n_segments contiguous time ranges; adjacent
    pairs = within-segment lag pairs (the window now partitions by
    (key, segment) — parallel sorts) UNION one boundary pair per
    consecutive NON-EMPTY segment (previous segment's last row ->
    this segment's first row, extremal rows via min_by/max_by on the
    same total order). Unlike the segmented EWMA there is no float
    state, so this is bit-identical to the single-window form —
    asserted at 10M rows/key by tools/scale_probe.py:transition."""
    from pyspark.sql.types import TimestampType, TimestampNTZType

    is_ts = isinstance(events.schema[ts_col].dataType,
                       (TimestampType, TimestampNTZType))
    ms = (wall_clock_millis(F.col(ts_col)) if is_ts
          else F.col(ts_col).cast("bigint"))
    tb = [order_tiebreak] if order_tiebreak else []
    span = (events.groupBy(key_col)
            .agg(F.min(ms).alias("__mn"), F.max(ms).alias("__mx")))
    base = (events
            # dedup: order_tiebreak == ts_col/type_col must not create
            # duplicate column names (same guard as ewma_segmented)
            .select(*dict.fromkeys([key_col, ts_col, type_col, *tb]))
            .withColumn("__ms", ms)
            .join(span, key_col)
            .withColumn("__seg",
                        F.expr(f"CAST((__ms - __mn) * {n_segments} "
                               f"DIV (__mx - __mn + 1) AS INT)"))
            .drop("__mn", "__mx"))
    # order and extremal selection use the FULL-precision ts the
    # default path sorts by — __ms is only for segment assignment
    # (millisecond truncation could flip sub-ms ties)
    order = [F.col(ts_col)] + [F.col(c) for c in tb]
    w = Window.partitionBy(key_col, "__seg").orderBy(*order)
    within = (base
              .select(F.col(key_col),
                      F.lag(F.col(type_col)).over(w).alias("prev_type"),
                      F.col(type_col).alias("next_type"))
              .where(F.col("prev_type").isNotNull()))
    okey = F.struct(F.col(ts_col), *[F.col(c) for c in tb])
    ends = (base.groupBy(key_col, "__seg")
            .agg(F.min_by(F.col(type_col), okey).alias("__first"),
                 F.max_by(F.col(type_col), okey).alias("__last")))
    w_seg = Window.partitionBy(key_col).orderBy("__seg")
    boundary = (ends
                .select(F.col(key_col),
                        F.lag("__last").over(w_seg).alias("prev_type"),
                        F.col("__first").alias("next_type"))
                .where(F.col("prev_type").isNotNull()))
    return within.unionByName(boundary)


def transition_matrix(events: DataFrame, key_col: str, ts_col: str,
                      type_col: str,
                      order_tiebreak: str | None = None,
                      n_segments: int | None = None) -> DataFrame:
    """First-order Markov transition counts/probabilities between
    consecutive event types within each key's timeline — the "what do
    users do next" matrix behind journey analysis and next-event
    prediction, and the third order-sensitive shape (after funnels and
    retention) the reference's counter-style statistics cannot express.

    Semantics: consecutive = adjacent in the key's (ts, tiebreak)
    order; the first event of each key has no predecessor and emits no
    row. `prob` is the row-conditional P(next | prev), pinned at 6 dp
    (counts are exact; the one division is the only float op).
    With order_tiebreak=None, same-timestamp events within a key have
    nondeterministic lag() adjacency across runs/engines — results are
    only deterministic when a total-order tiebreak column (e.g.
    event_id, which the registered query passes) is supplied.

    Plan shape for 100 TB: one shuffle on the key for the lag()
    window, then a hash aggregate on (prev, next) — k^2 groups, partial
    map-side combine, so the agg output is bounded by the type
    vocabulary squared regardless of input size. The row-total for the
    conditional runs as a second window over those k^2 rows (no extra
    pass over the data). A single hot key still sorts its whole
    timeline in one (spilling) task; pass n_segments to decompose it
    EXACTLY into (key, time-segment) windows plus boundary pairs —
    bit-identical counts (integer adjacency, no float state), max task
    = rows/segment.
    """
    order = [F.col(ts_col)] + (
        [F.col(order_tiebreak)] if order_tiebreak else [])
    if n_segments:
        pairs = _segmented_adjacent_pairs(
            events, key_col, ts_col, type_col, order_tiebreak,
            n_segments)
    else:
        w = Window.partitionBy(key_col).orderBy(*order)
        pairs = (events
                 .select(F.col(key_col),
                         F.lag(F.col(type_col)).over(w)
                         .alias("prev_type"),
                         F.col(type_col).alias("next_type"))
                 .where(F.col("prev_type").isNotNull()))
    counts = (pairs.groupBy("prev_type", "next_type")
              .agg(F.count(F.lit(1)).alias("n_transitions")))
    row_total = Window.partitionBy("prev_type")
    return counts.select(
        "prev_type", "next_type", "n_transitions",
        F.round(F.col("n_transitions").cast("double")
                / F.sum("n_transitions").over(row_total).cast("double"),
                6).alias("prob"))


def trend_ols(df: DataFrame, key_col: str, ts_col: str,
              value_col: str) -> DataFrame:
    """Per-key least-squares trend: the slope of value over time for
    every key in ONE aggregate pass — regression-as-aggregation, the
    scalable form of "fit a line per entity" (fleet drift detection,
    per-tenant growth rates) that never materializes a per-key series.

    Cross-engine determinism: the classic closed form
    slope = (n*Sxy - Sx*Sy) / (n*Sxx - Sx^2) is evaluated over EXACT
    integer sums — x is epoch-millis re-based to the key's earliest
    observation (keeps x^2 inside 64-bit before widening), y quantizes
    to micro-units via floor(v*1e6 + 0.5), and all four sums accumulate
    as decimal(38,0) — so no float fold order can drift. The final
    slope converts to value-units per DAY and rounds at 9 dp; keys with
    n < 2 or zero time variance emit NULL slope.

    Plan shape for 100 TB: one shuffle on the key for the min-ts window
    (re-basing), with the aggregate reusing that exchange — all
    codegen'd column math, no Python, k output rows.
    """
    w = Window.partitionBy(key_col)
    ms = wall_clock_millis(F.col(ts_col))
    x = (ms - F.min(ms).over(w)).cast("decimal(38,0)")
    y = F.floor(F.col(value_col) * F.lit(1e6) + F.lit(0.5)) \
         .cast("decimal(38,0)")
    agg = (df
           .select(F.col(key_col), x.alias("__x"), y.alias("__y"))
           .groupBy(key_col)
           .agg(F.count(F.lit(1)).cast("decimal(38,0)").alias("__n"),
                F.sum("__x").alias("__sx"), F.sum("__y").alias("__sy"),
                F.sum(F.col("__x") * F.col("__y")).alias("__sxy"),
                F.sum(F.col("__x") * F.col("__x")).alias("__sxx")))
    num = (F.col("__n") * F.col("__sxy")
           - F.col("__sx") * F.col("__sy")).cast("double")
    den = (F.col("__n") * F.col("__sxx")
           - F.col("__sx") * F.col("__sx")).cast("double")
    # micro-units/ms -> units/day: * 86_400_000 / 1e6
    return agg.select(
        key_col, F.col("__n").cast("bigint").alias("n_points"),
        F.when(den > 0,
               F.round(num / den * F.lit(86_400_000.0 / 1e6), 9))
        .alias("slope_per_day"))


def pearson_corr(df: DataFrame, x_col: str, y_col: str,
                 group_cols: list[str] | None = None,
                 x_scale: int = 100, y_scale: int = 100) -> DataFrame:
    """Per-group Pearson correlation via exact integer moments — the
    deterministic sibling of Spark's builtin `corr` (whose running
    double covariance folds in partition order, so the last ulps vary
    run-to-run; here the five sums are decimal(38,0) over quantized
    inputs, and the only float ops are the final sqrt and divide,
    pinned at 9 dp).

    x/y quantize via floor(v * scale + 0.5) (cents by default).
    Groups with n < 2 or zero variance in either variable emit NULL.
    One hash aggregate, group-count output rows.
    """
    groups = list(group_cols or [])
    qx = F.floor(F.col(x_col) * F.lit(float(x_scale)) + F.lit(0.5)) \
          .cast("decimal(38,0)")
    qy = F.floor(F.col(y_col) * F.lit(float(y_scale)) + F.lit(0.5)) \
          .cast("decimal(38,0)")
    agg = (df.select(*groups, qx.alias("__x"), qy.alias("__y"))
           .groupBy(*groups)
           .agg(F.count(F.lit(1)).cast("decimal(38,0)").alias("__n"),
                F.sum("__x").alias("__sx"), F.sum("__y").alias("__sy"),
                F.sum(F.col("__x") * F.col("__y")).alias("__sxy"),
                F.sum(F.col("__x") * F.col("__x")).alias("__sxx"),
                F.sum(F.col("__y") * F.col("__y")).alias("__syy")))
    cov = (F.col("__n") * F.col("__sxy")
           - F.col("__sx") * F.col("__sy")).cast("double")
    vx = (F.col("__n") * F.col("__sxx")
          - F.col("__sx") * F.col("__sx")).cast("double")
    vy = (F.col("__n") * F.col("__syy")
          - F.col("__sy") * F.col("__sy")).cast("double")
    return agg.select(
        *groups, F.col("__n").cast("bigint").alias("n_points"),
        F.when((vx > 0) & (vy > 0),
               F.round(cov / F.sqrt(vx * vy), 9)).alias("pearson_r"))


def gini_concentration(df: DataFrame, group_col: str, value_col: str,
                       key_col: str) -> DataFrame:
    """Gini coefficient of a value distribution per group — the
    concentration/inequality readout (revenue concentration across
    customers, token mass across documents) behind every "top 1% of
    X holds Y%" statement, and the scalar the ABC/Pareto queries only
    bucket. Rank form over the ascending sort:
        G = (2 * sum(rank * x) - (n + 1) * sum(x)) / (n * sum(x)),
    with rank = row_number over (value, key) — the deterministic
    total order IS part of the contract (ties contribute identically
    in both engines). All arithmetic exact: integer cents, bigint
    rank products, and the single ppm division runs in decimal(38,0)
    (numerator * 1e6 exceeds bigint at ~10^5 rows x 10^7 cents — the
    auc_binary lesson). Non-positive totals emit NULL.

    Scale shape: one rank window per group + one hash aggregate, both
    on the same group partitioning — one shuffle total."""
    cents = F.floor(F.col(value_col) * 100 + F.lit(0.5)).cast("long")
    w = Window.partitionBy(group_col).orderBy(F.col("__c"),
                                              F.col(key_col))
    base = (df.select(F.col(group_col), F.col(key_col),
                      cents.alias("__c"))
            .withColumn("__r", F.row_number().over(w)))
    agg = (base.groupBy(group_col)
           .agg(F.count(F.lit(1)).cast("long").alias("n_keys"),
                F.sum("__c").cast("long").alias("total_cents"),
                F.sum(F.col("__r").cast("decimal(38,0)")
                      * F.col("__c")).alias("__sr")))
    gini = F.expr(
        "CAST((2 * __sr - CAST(n_keys + 1 AS DECIMAL(38,0))"
        " * total_cents) * 1000000"
        " DIV (CAST(n_keys AS DECIMAL(38,0)) * total_cents)"
        " AS BIGINT)")
    return (agg.select(group_col, "n_keys", "total_cents",
                       F.when(F.col("total_cents") > 0, gini)
                       .alias("gini_ppm")))


def ols2_regression(df: DataFrame, group_col: str, x1_col: str,
                    x2_col: str, y_col: str,
                    y_scale: int = 100) -> DataFrame:
    """Two-feature linear regression per group by NORMAL EQUATIONS —
    regression-as-aggregation generalized beyond trend_ols's single
    regressor: y ~ b0 + b1*x1 + b2*x2 solved in closed form with
    Cramer's rule over the 3x3 moment matrix X'X. ONE hash aggregate
    computes the nine exact decimal(38,0) moments (x inputs must be
    small integers — hour-of-day, weekday, bucket ids — and y
    quantizes by y_scale); the four 3x3 determinants expand as exact
    integer polynomials (magnitudes ~(sum x^2)^2 * sum xy stay under
    decimal(38) for 10^9-row groups of day-grain features), and the
    ONLY float ops are the three final divides, ROUND-pinned at 9dp —
    the pearson_corr contract extended to a linear system. Groups
    with a singular X'X (collinear or constant features) emit NULL
    coefficients.

    Scale shape: one map-side-combined aggregate to group grain;
    nothing else moves. The same pattern extends to k features as
    (k+1)(k+2)/2 moment columns + a driver-side solve; k=2 keeps the
    whole solve in-plan."""
    x1 = F.col(x1_col).cast("decimal(38,0)")
    x2 = F.col(x2_col).cast("decimal(38,0)")
    y = F.floor(F.col(y_col) * F.lit(float(y_scale)) + F.lit(0.5)) \
        .cast("decimal(38,0)")
    agg = (df.select(F.col(group_col), x1.alias("__x1"),
                     x2.alias("__x2"), y.alias("__y"))
           .groupBy(group_col)
           .agg(F.count(F.lit(1)).cast("decimal(38,0)").alias("__n"),
                F.sum("__x1").alias("__s1"),
                F.sum("__x2").alias("__s2"),
                F.sum(F.col("__x1") * F.col("__x1")).alias("__s11"),
                F.sum(F.col("__x1") * F.col("__x2")).alias("__s12"),
                F.sum(F.col("__x2") * F.col("__x2")).alias("__s22"),
                F.sum("__y").alias("__sy"),
                F.sum(F.col("__x1") * F.col("__y")).alias("__s1y"),
                F.sum(F.col("__x2") * F.col("__y")).alias("__s2y")))
    # X'X = [[n, s1, s2], [s1, s11, s12], [s2, s12, s22]];
    # X'y = [sy, s1y, s2y]. Cramer: beta_i = det(A_i) / det(A), all
    # determinants exact integer polynomials of the moments.
    def det3(a, b, c, d, e, f, g, h, i):
        return (a * (e * i - f * h) - b * (d * i - f * g)
                + c * (d * h - e * g))

    n, s1, s2 = F.col("__n"), F.col("__s1"), F.col("__s2")
    s11, s12, s22 = F.col("__s11"), F.col("__s12"), F.col("__s22")
    sy, s1y, s2y = F.col("__sy"), F.col("__s1y"), F.col("__s2y")
    d = det3(n, s1, s2, s1, s11, s12, s2, s12, s22)
    d0 = det3(sy, s1, s2, s1y, s11, s12, s2y, s12, s22)
    d1 = det3(n, sy, s2, s1, s1y, s12, s2, s2y, s22)
    d2 = det3(n, s1, sy, s1, s11, s1y, s2, s12, s2y)
    dd = d.cast("double")
    nonsing = d != F.lit(0).cast("decimal(38,0)")
    return agg.select(
        group_col,
        F.col("__n").cast("bigint").alias("n_points"),
        F.when(nonsing, F.round(d0.cast("double") / dd, 9))
         .alias("beta0"),
        F.when(nonsing, F.round(d1.cast("double") / dd, 9))
         .alias("beta_x1"),
        F.when(nonsing, F.round(d2.cast("double") / dd, 9))
         .alias("beta_x2"))


# Poisson(1) pmf cumulative thresholds in 28-bit hash units — module
# constants so the Spark ladder and the generated SQL ladder are
# identical by construction (weights 0..4 cover 99.63% of the pmf;
# the tail folds into w=4).
import math as _math

_POIS_CUM = [
    int(_math.floor(sum(_math.exp(-1) / _math.factorial(j)
                        for j in range(k + 1)) * (1 << 28)))
    for k in range(4)
]


def bootstrap_mean_ci(df: DataFrame, group_col: str, value_col: str,
                      key_col: str, n_boot: int = 32) -> DataFrame:
    """Poisson-bootstrap confidence interval for the per-group mean
    (the streaming-friendly bootstrap: Chamandy et al. 2012, "Est-
    imating Uncertainty for Massive Data Streams" — each resample
    gives every row an independent Poisson(1) multiplicity, so no
    resample ever materializes): the multiplicity is DERIVED from a
    content hash of (key, replicate) through the exact Poisson(1) CDF
    ladder in 28-bit integer units, so all `n_boot` resamples are a
    pure function of the data — identical across engines, runs, and
    partitionings, which is what makes the CI oracle-checkable at
    all.

    One aggregation pass computes all replicates: 2*n_boot
    conditional sums per group (sum of w_b * cents and sum of w_b)
    with map-side combine — the corpus is scanned ONCE regardless of
    n_boot; no explode, no shuffle growth. Replicate means pin to
    integer micro-units (truncating DIV); the interval is the order
    statistics of the n_boot means (2nd and n_boot-1-th: a ~94%
    interval at n_boot=32 — the index convention is part of the
    contract).

    Output per group: (group, n_rows, mean_micro, ci_lo_micro,
    ci_hi_micro)."""
    cents = F.floor(F.col(value_col) * 100 + F.lit(0.5)).cast("long")
    from event_streaming_service_spark.operators.dedup import (
        portable_token_hash)

    base = df.select(F.col(group_col).alias("grp"),
                     F.col(key_col).cast("string").alias("__k"),
                     cents.alias("__c"))
    aggs = [F.count(F.lit(1)).cast("long").alias("__n"),
            F.sum("__c").cast("long").alias("__s")]
    for b in range(n_boot):
        h = portable_token_hash(
            F.concat(F.col("__k"), F.lit(f":{b}")))
        w = (F.when(h < _POIS_CUM[0], 0)
             .when(h < _POIS_CUM[1], 1)
             .when(h < _POIS_CUM[2], 2)
             .when(h < _POIS_CUM[3], 3)
             .otherwise(4)).cast("long")
        aggs.append(F.sum(w * F.col("__c")).cast("long")
                    .alias(f"__sx{b}"))
        aggs.append(F.sum(w).cast("long").alias(f"__sw{b}"))
    wide = base.groupBy("grp").agg(*aggs)
    stack = ", ".join(f"{b}, __sx{b}, __sw{b}" for b in range(n_boot))
    long = wide.select(
        "grp", "__n", "__s",
        F.expr(f"stack({n_boot}, {stack})").alias("b", "__sx", "__sw"))
    means = long.select(
        "grp", "__n", "__s",
        F.expr("CASE WHEN __sw > 0 THEN (__sx * 1000000) DIV __sw END")
        .alias("__m"))
    wrank = Window.partitionBy("grp").orderBy("__m")
    ranked = means.withColumn("__r", F.row_number().over(wrank))
    lo_idx, hi_idx = 2, n_boot - 1
    return (ranked.groupBy("grp", "__n", "__s")
            .agg(F.min(F.when(F.col("__r") == lo_idx, F.col("__m")))
                 .alias("ci_lo_micro"),
                 F.min(F.when(F.col("__r") == hi_idx, F.col("__m")))
                 .alias("ci_hi_micro"))
            .select(F.col("grp").alias(group_col),
                    F.col("__n").alias("n_rows"),
                    F.expr("(__s * 1000000) DIV __n")
                    .alias("mean_micro"),
                    "ci_lo_micro", "ci_hi_micro"))


def theil_sen_trend(events: DataFrame, key_col: str, ts_col: str,
                    value_col: str, tiebreak_col: str,
                    max_events_per_key: int = 128) -> DataFrame:
    """Theil-Sen robust trend per key (Theil 1950 / Sen 1968): the
    MEDIAN of all pairwise slopes — up to ~29% of the points can be
    arbitrary outliers before the estimate moves, where the OLS slope
    (value_trend_per_user) is dragged by a single spike. The
    robust-regression sibling of mad_outliers.

    Engine-exactness: each pairwise slope is pinned to integer
    milli-cents-per-hour BEFORE the median —
        slope_milli_cph = (dy_cents * 3_600_000_000) DIV dms
    (truncating DIV toward zero, both engines; dy up to ~1e6 cents
    keeps the multiply < 2^62) — and the median of integers is the
    proven cross-engine aggregate (mad_outliers). Same-timestamp
    pairs (dms = 0) are excluded deterministically.

    Scale shape: pairwise slopes are O(n^2) per key — the hot-key
    hazard — so each key's timeline deterministically truncates to
    its first `max_events_per_key` events ((ts, tiebreak) order,
    row_number on the same key partitioning the self-join shuffles
    on) before pairing, bounding fan-out at C(cap, 2) per key; the
    estimator itself is sampling-robust by construction. Keys with
    < 2 usable events are absent (no pairs, inner grain)."""
    cents = F.floor(F.col(value_col) * 100 + F.lit(0.5)).cast("long")
    # the cap rank orders by (ms, tiebreak) — the same two columns the
    # oracle ranks on, so both engines truncate identical timelines
    # (ordering by the raw timestamp here and ms there could disagree
    # on sub-millisecond ties)
    w = Window.partitionBy(key_col).orderBy(F.col("__ms"),
                                            F.col("__tb"))
    base = (events
            .select(F.col(key_col),
                    wall_clock_millis(F.col(ts_col)).alias("__ms"),
                    F.col(tiebreak_col).alias("__tb"),
                    cents.alias("__c"))
            .withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") <= max_events_per_key)
            # both sides of the pair self-join read this capped frame:
            # pin it or the scan + rank window run twice
            .persist())
    a = base.select(F.col(key_col), F.col("__ms").alias("__ma"),
                    F.col("__c").alias("__ca"),
                    F.col("__rn").alias("__ra"))
    b = base.select(F.col(key_col), F.col("__ms").alias("__mb"),
                    F.col("__c").alias("__cb"),
                    F.col("__rn").alias("__rb"))
    pairs = (a.join(b, key_col)
             .filter((F.col("__ra") < F.col("__rb"))
                     & (F.col("__mb") != F.col("__ma")))
             .select(key_col, F.expr(
                 "((__cb - __ca) * 3600000000) DIV (__mb - __ma)")
                 .alias("__slope")))
    return (pairs.groupBy(key_col)
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
                 F.median("__slope").alias("theil_sen_milli_cph")))


def markov_stationary(trans: DataFrame, from_col: str, to_col: str,
                      weight_col: str, iterations: int = 5) -> DataFrame:
    """Stationary distribution of the first-order Markov chain by
    fixed-count power iteration in exact integer nano-units (the
    pagerank device without damping):
        pi_{t+1}[j] = sum_i (pi_t[i] * cnt_ij) DIV out_total_i,
    truncating DIV per edge so every round is a deterministic integer
    function both engines compute bit-identically (a float power
    iteration folds inflows in partition order and could never
    hash-match). Start mass 1e9 per state; states with no outgoing
    transitions simply stop forwarding mass (mirrored in the SQL
    twin). After enough rounds pi_nano/sum(pi_nano) approximates the
    chain's long-run occupancy — the "where do user journeys spend
    their time" readout of the transition matrix.

    Scale shape: the edge list persists (joined every round); each
    round is one broadcast-sized join + one hash aggregate at state
    grain; pi localCheckpoints per round (multi-consumer chained
    lineage — the iterative-operator convention)."""
    tot = trans.groupBy(from_col).agg(
        F.sum(weight_col).cast("long").alias("__tot"))
    e = (trans.join(tot, from_col)
         .select(F.col(from_col).alias("__src"),
                 F.col(to_col).alias("__dst"),
                 F.col(weight_col).cast("long").alias("__w"), "__tot")
         .persist())
    states = (e.select(F.col("__src").alias("state"))
              .union(e.select(F.col("__dst").alias("state")))
              .distinct().persist())
    pi = states.select(
        "state", F.lit(1_000_000_000).cast("long").alias("pi_nano"))
    for _ in range(iterations):
        inflow = (e.join(pi, pi["state"] == e["__src"])
                  .select(F.col("__dst").alias("state"),
                          F.expr("(pi_nano * __w) DIV __tot")
                          .alias("__c")))
        pi = (states
              .join(inflow.groupBy("state")
                    .agg(F.sum("__c").alias("__s")), "state", "left")
              .select("state",
                      F.coalesce(F.col("__s"), F.lit(0)).cast("long")
                      .alias("pi_nano"))
              .localCheckpoint())
    return pi


def kaplan_meier(df: DataFrame, duration_col: str, event_col: str
                 ) -> DataFrame:
    """Kaplan-Meier survival estimate (Kaplan & Meier 1958) over a
    unit-grain frame of (duration, event): duration is the integer
    time-to-event (days), event = 1 for an observed conversion/death
    and 0 for right-censoring. The product-limit estimator
        S(t) = prod over event times s <= t of (n_s - d_s) / n_s
    is carried in LOG space with each factor pinned to integer
    nano-nats BEFORE the cumulative sum —
        term_nano = floor(ln((n-d)/n) * 1e9 + 0.5)  (0 when d = 0)
    — the PMI/entropy/PSI device, so cum_log_surv_nano is an exact
    bigint both engines agree on (a cumulative float PRODUCT could
    never hash-match). The day the risk set is exhausted by events
    (n = d, survival 0, log -inf) reports NULL term/cum; it can only
    be the final row.

    Output one row per distinct duration with any activity:
    (day, n_risk, n_events, n_censored, term_nano,
    cum_log_surv_nano). Scale shape: one hash aggregate to day grain
    (duration-bounded), then two growing window frames (at-risk =
    reverse cumulative of d+c; the log-survival cumsum) — growing
    frames are maintained incrementally, O(1)/row."""
    d = F.col(event_col).cast("long")
    tab = (df.groupBy(F.col(duration_col).cast("long").alias("day"))
           .agg(F.sum(d).cast("long").alias("n_events"),
                F.sum(1 - d).cast("long").alias("n_censored")))
    w_risk = (Window.orderBy(F.col("day").desc())
              .rowsBetween(Window.unboundedPreceding, 0))
    tab = tab.withColumn(
        "n_risk",
        F.sum(F.col("n_events") + F.col("n_censored")).over(w_risk)
        .cast("long"))
    term = F.when(
        F.col("n_risk") > F.col("n_events"),
        F.floor(F.log((F.col("n_risk") - F.col("n_events"))
                      / F.col("n_risk")) * 1e9 + F.lit(0.5))
        .cast("long"))
    w_cum = (Window.orderBy("day")
             .rowsBetween(Window.unboundedPreceding, 0))
    out = tab.withColumn("term_nano", term)
    return (out.withColumn(
        "cum_log_surv_nano",
        F.when(F.col("n_risk") > F.col("n_events"),
               F.sum("term_nano").over(w_cum)).cast("long"))
        .select("day", "n_risk", "n_events", "n_censored",
                "term_nano", "cum_log_surv_nano"))


def cuped_adjusted_means(df: DataFrame, variant_col: str, x_col: str,
                         y_col: str, x_scale: int = 1,
                         y_scale: int = 1) -> DataFrame:
    """CUPED variance reduction for A/B experiments (Deng, Xu, Kohavi
    & Walker 2013, "Improving the Sensitivity of Online Controlled
    Experiments by Utilizing Pre-Experiment Data"): with x a
    pre-experiment covariate and y the experiment metric per unit,
        theta    = cov(x, y) / var(x)          (pooled across variants)
        y_adj    = y - theta * (x - mean(x))
    has the same expectation per variant as y but variance shrunk by
    rho^2 — the standard trick that makes small lifts detectable.
    Per-variant adjusted means come out in closed form
        mean_adj_v = ybar_v - theta * (xbar_v - xbar),
    so the whole computation is one global moment aggregate + one
    per-variant aggregate — no per-unit adjusted column materializes.

    Engine-exactness: the pearson_corr device — all moments are
    decimal(38,0) sums over quantized inputs, each final expression
    casts the exact integers to double and runs the IDENTICAL float op
    sequence in both engines, pinned with ROUND at 6 dp
    (var_reduction_ppm = floor(rho^2 * 1e6 + 0.5) as bigint). Zero
    pooled x-variance yields NULL theta/adjusted/reduction.

    Output one row per variant: n_units, mean_y, mean_y_adj, theta,
    var_reduction_ppm (theta and the reduction repeat per row — the
    drilldown shape). Scale shape: two hash aggregates over the unit
    grain (the input persists — it feeds both) and a 1-row broadcast;
    nothing else moves."""
    qx = F.floor(F.col(x_col) * F.lit(float(x_scale)) + F.lit(0.5)) \
        .cast("decimal(38,0)")
    qy = F.floor(F.col(y_col) * F.lit(float(y_scale)) + F.lit(0.5)) \
        .cast("decimal(38,0)")
    base = (df.select(F.col(variant_col).alias("variant"),
                      qx.alias("__x"), qy.alias("__y"))
            .persist())
    g = base.agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("__n"),
        F.sum("__x").alias("__sx"), F.sum("__y").alias("__sy"),
        F.sum(F.col("__x") * F.col("__y")).alias("__sxy"),
        F.sum(F.col("__x") * F.col("__x")).alias("__sxx"),
        F.sum(F.col("__y") * F.col("__y")).alias("__syy"))
    pv = (base.groupBy("variant")
          .agg(F.count(F.lit(1)).cast("decimal(38,0)").alias("__nv"),
               F.sum("__x").alias("__sxv"),
               F.sum("__y").alias("__syv")))
    j = pv.crossJoin(F.broadcast(g))
    cov = (F.col("__n") * F.col("__sxy")
           - F.col("__sx") * F.col("__sy")).cast("double")
    vx = (F.col("__n") * F.col("__sxx")
          - F.col("__sx") * F.col("__sx")).cast("double")
    vy = (F.col("__n") * F.col("__syy")
          - F.col("__sy") * F.col("__sy")).cast("double")
    theta = cov / vx
    ybar_v = F.col("__syv").cast("double") / F.col("__nv").cast("double")
    xbar_v = F.col("__sxv").cast("double") / F.col("__nv").cast("double")
    xbar = F.col("__sx").cast("double") / F.col("__n").cast("double")
    return j.select(
        "variant",
        F.col("__nv").cast("bigint").alias("n_units"),
        F.round(ybar_v, 6).alias("mean_y"),
        F.when(vx > 0,
               F.round(ybar_v - theta * (xbar_v - xbar), 6))
         .alias("mean_y_adj"),
        F.when(vx > 0, F.round(theta, 6)).alias("theta"),
        F.when((vx > 0) & (vy > 0),
               F.floor(cov * cov / (vx * vy) * 1_000_000 + F.lit(0.5))
               .cast("bigint")).alias("var_reduction_ppm"))


def last_touch_attribution(events: DataFrame, key_col: str, ts_col: str,
                           type_col: str, conversion_type: str,
                           touch_types: list[str],
                           window_ms: int = 7 * 86_400_000,
                           id_col: str = "event_id") -> DataFrame:
    """Last-touch attribution: for every conversion event, the most
    recent touch event (same key, strictly earlier, within the
    lookback window) — the marketing-analytics join every event
    warehouse runs, expressed WITHOUT a self-join: one range-framed
    window over the key's timeline carries the best touch to each
    conversion.

    Deterministic winner: "most recent" ties at the same millisecond
    resolve by the highest id — the window takes max(struct(ms, id,
    type)), whose lexicographic order both engines share; equal-ms
    touches never race on partition order. Conversions with no touch
    in the window emit NULL touch columns (left semantics).

    Plan shape for 100 TB: ONE shuffle on the key, and the frame is
    range(UNBOUNDED PRECEDING, -1) — Spark maintains that frame
    INCREMENTALLY (rows only ever enter it), so the pass is O(n) per
    key even when one hot key holds millions of in-window touches.
    The naive frame [ms - window, ms - 1] is semantically identical
    but quadratic on hot keys: a bounded-start frame evicts rows, and
    Spark's sliding-frame MAX re-scans its buffer per row (the
    10M-conversion scale probe with a 1M-touch hot key hung exactly
    there). The lookback bound moves to a post-filter on the winner:
    the most recent touch within the window IS the most recent touch
    overall whenever that one is inside the window, and no touch
    qualifies otherwise. No conversions x touches pair set ever
    materializes (the SQL oracle's join + row_number form does exactly
    that, quadratically per key).
    """
    ms = wall_clock_millis(F.col(ts_col))
    is_touch = F.col(type_col).isin(list(touch_types))
    touch = F.when(is_touch, F.struct(
        ms.alias("ms"), F.col(id_col).alias("id"),
        F.col(type_col).alias("t")))
    w = (Window.partitionBy(key_col).orderBy(ms.alias("__ms"))
         .rangeBetween(Window.unboundedPreceding, -1))
    best = F.max(touch).over(w)
    in_window = F.col("__best").isNotNull() & (
        (F.col("__ms") - F.col("__best.ms")) <= window_ms)
    return (events
            .select(F.col(id_col), F.col(key_col), F.col(type_col),
                    ms.alias("__ms"), best.alias("__best"))
            .where(F.col(type_col) == conversion_type)
            .select(F.col(id_col).alias("conversion_id"),
                    F.col(key_col),
                    F.col("__ms").alias("conversion_ms"),
                    F.when(in_window, F.col("__best.id"))
                    .alias("touch_id"),
                    F.when(in_window, F.col("__best.t"))
                    .alias("touch_type"),
                    F.when(in_window, F.col("__best.ms"))
                    .alias("touch_ms"),
                    F.when(in_window,
                           F.col("__ms") - F.col("__best.ms"))
                    .alias("ms_since_touch")))


def session_paths(events: DataFrame, key_col: str, ts_col: str,
                  type_col: str, gap_ms: int, max_steps: int = 5,
                  top_n: int = 20,
                  tiebreak_col: str = "event_id") -> DataFrame:
    """Top journey paths: sessionize each key's timeline
    (gaps-and-islands, same boundary rule as windows.sessionize), take
    each session's first `max_steps` event types in (ts, tiebreak)
    order, render them as an `a>b>c` path string, and rank paths by
    session count — the "what do users actually do" report that
    completes the funnel / transition-matrix family with full ordered
    sequences.

    Deterministic: the within-session order is a total order over the
    FULL-precision (ts, tiebreak) — the sort key carries the original
    microsecond timestamp, not the millisecond session clock, so two
    same-millisecond events order identically to the SQL oracle's
    ORDER BY ts, id — and the top-n cut orders by (count desc,
    path asc); no tie can flip membership between engines.

    Plan shape for 100 TB: one shuffle on the key for the session
    window (labeling shared with windows.sessionize — one boundary
    rule, one implementation); the per-session fold is collect_list
    bounded by session length (cap it upstream via max_steps-aware
    filters if sessions can be pathological); path counting is a hash
    aggregate whose grain is the path vocabulary; the final top-n is
    TakeOrdered.
    """
    from event_streaming_service_spark.operators.windows import (
        session_labels,
    )
    with_sess = session_labels(events, key_col, ts_col, gap_ms,
                               tiebreak_col, seq_col="__seq")
    steps = F.slice(
        F.transform(
            F.sort_array(F.collect_list(F.struct(
                F.col(ts_col).alias("m"),
                F.col(tiebreak_col).alias("i"),
                F.col(type_col).alias("t")))),
            lambda x: x["t"]),
        1, max_steps)
    paths = (with_sess
             .groupBy(key_col, "__seq")
             .agg(F.concat_ws(">", steps).alias("path")))
    return (paths
            .groupBy("path")
            .agg(F.count(F.lit(1)).alias("n_sessions"))
            .orderBy(F.col("n_sessions").desc(), "path")
            .limit(top_n))


def activity_streaks(events: DataFrame, key_col: str,
                     ts_col: str) -> DataFrame:
    """Longest consecutive-day activity streak per key — the classic
    gaps-and-islands decomposition: distinct (key, day), then
    day-number minus per-key row_number is constant exactly within a
    run of consecutive days, so one groupBy on that difference yields
    the islands. Output: key, active_days, n_streaks,
    longest_streak_days (all exact bigints).

    Plan shape for 100 TB: the distinct and the row_number window
    share one shuffle on the key (days per key is calendar-bounded,
    so no island buffer can outgrow a task), then two hash aggregates
    whose output is bounded by keys x streaks."""
    d = (events.select(F.col(key_col),
                       F.to_date(F.col(ts_col)).alias("__d"))
         .distinct())
    w = Window.partitionBy(key_col).orderBy("__d")
    islands = (d.withColumn(
                   "__g",
                   F.datediff(F.col("__d"), F.lit("1970-01-01"))
                   - F.row_number().over(w))
               .groupBy(key_col, "__g")
               .agg(F.count(F.lit(1)).alias("__len")))
    return (islands.groupBy(key_col)
            .agg(F.sum("__len").alias("active_days"),
                 F.count(F.lit(1)).alias("n_streaks"),
                 F.max("__len").alias("longest_streak_days")))


def rate_limit_counts(events: DataFrame, key_col: str, ts_col: str,
                      per_hour: int,
                      order_tiebreak: str) -> DataFrame:
    """Per-key throttling audit: cap each key at `per_hour` events per
    calendar hour (keep the earliest by (ts, tiebreak) — the
    deterministic total order) and report how many rows the limiter
    would drop. The shape every ingestion gateway runs before
    admitting a firehose topic.

    One shuffle on (key, hour-bucket) for the row_number, then a
    key-grain aggregate; no state beyond the window sort, and the
    per-(key, hour) sort task is bounded by the hottest key-hour."""
    bucket = F.date_trunc("hour", F.col(ts_col))
    w = (Window.partitionBy(F.col(key_col), bucket)
         .orderBy(F.col(ts_col), F.col(order_tiebreak)))
    flagged = events.withColumn(
        "__kept", (F.row_number().over(w) <= per_hour).cast("int"))
    return (flagged.groupBy(key_col)
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.sum("__kept").cast("bigint").alias("n_kept"),
                 (F.count(F.lit(1)) - F.sum("__kept"))
                 .cast("bigint").alias("n_dropped")))


def inter_event_gaps(events: DataFrame, key_col: str, ts_col: str,
                     type_col: str,
                     order_tiebreak: str) -> DataFrame:
    """Inter-arrival-time profile per event type: gaps between
    consecutive events of the same (key, type) timeline, aggregated to
    type grain — the cadence statistic behind staleness alerting and
    arrival-rate modeling. Exact integer milliseconds; the only float
    op is the final mean (two exact bigints, one division, 6 dp).

    One shuffle on (key, type) for the lag window, then a map-side
    combined aggregate to the type-vocabulary grain."""
    ms = wall_clock_millis(F.col(ts_col))
    w = (Window.partitionBy(key_col, type_col)
         .orderBy(ms, F.col(order_tiebreak)))
    gaps = (events
            .select(F.col(type_col).alias("event_type"),
                    (ms - F.lag(ms).over(w)).alias("gap_ms"))
            .where(F.col("gap_ms").isNotNull()))
    return (gaps.groupBy("event_type")
            .agg(F.count(F.lit(1)).alias("n_gaps"),
                 F.min("gap_ms").alias("min_gap_ms"),
                 F.max("gap_ms").alias("max_gap_ms"),
                 F.round(F.sum("gap_ms").cast("double")
                         / F.count(F.lit(1)).cast("double"), 6)
                 .alias("avg_gap_ms")))


def mode_per_key(df: DataFrame, key_col: str,
                 val_col: str) -> DataFrame:
    """Deterministic per-key mode: the most frequent value, ties
    broken by the smallest value — engines' built-in mode() picks an
    arbitrary bucket winner, so the portable form is count + rank with
    a total-order tiebreak. One shuffle on (key, value), one on the
    key for the rank; output is one row per key."""
    counts = (df.groupBy(key_col, val_col)
              .agg(F.count(F.lit(1)).alias("mode_count")))
    w = (Window.partitionBy(key_col)
         .orderBy(F.col("mode_count").desc(), F.col(val_col)))
    return (counts.withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") == 1)
            .select(F.col(key_col),
                    F.col(val_col).alias("mode_value"),
                    "mode_count"))


def new_key_growth(events: DataFrame, key_col: str,
                   ts_col: str) -> DataFrame:
    """Daily acquisition curve: first-seen day per key, new keys per
    day, and the running cumulative — the growth chart over an event
    log. The cumulative window is GLOBAL but runs over the per-day
    aggregate (calendar-bounded rows), never the raw events; the
    per-key first-seen aggregate is the only pass that scales with
    data."""
    first = (events.groupBy(key_col)
             .agg(F.min(F.to_date(F.col(ts_col))).alias("first_day")))
    daily = (first.groupBy("first_day")
             .agg(F.count(F.lit(1)).alias("new_keys")))
    w = (Window.orderBy("first_day")
         .rowsBetween(Window.unboundedPreceding, 0))
    return (daily.withColumn("cumulative_keys",
                             F.sum("new_keys").over(w))
            # midnight timestamp, not DATE: a date column surfaces as
            # python objects in Arrow/pandas where the SQL twin yields
            # datetime64 — same wall clock, different dtype kind
            .withColumn("first_day",
                        F.col("first_day").cast("timestamp")))


def abc_classification(revenue_by_item: DataFrame, item_col: str,
                       revenue_col: str,
                       a_share: float = 0.7,
                       b_share: float = 0.9) -> DataFrame:
    """ABC / Pareto inventory classification: items sorted by revenue
    descending (ties: smallest item id), class A while the CUMULATIVE
    share before this item is < a_share, B before b_share, else C.
    The boundary test uses exact integer arithmetic — cum_before *
    denominator vs share * total — so no float cumsum can drift the
    class of a boundary item. Output is the 3-row class summary.

    The cumulative window is global but runs at ITEM grain (a
    dimension, not the fact table); the fact-to-item aggregate is the
    only data-scaled pass."""
    # round(), not int(): 0.57*100 floats to 56.999..., and int()
    # truncation would silently shift the A/B boundary (ADVICE r7).
    a_num, a_den = round(a_share * 100), 100
    b_num = round(b_share * 100)
    w = (Window.orderBy(F.col(revenue_col).desc(), F.col(item_col))
         .rowsBetween(Window.unboundedPreceding, -1))
    total = Window.partitionBy()
    ranked = (revenue_by_item
              .withColumn("__before",
                          F.coalesce(F.sum(revenue_col).over(w),
                                     F.lit(0)))
              .withColumn("__total", F.sum(revenue_col).over(total)))
    cls = (F.when(F.col("__before") * a_den
                  < F.col("__total") * a_num, "A")
           .when(F.col("__before") * a_den
                 < F.col("__total") * b_num, "B")
           .otherwise("C"))
    return (ranked.withColumn("abc_class", cls)
            .groupBy("abc_class")
            .agg(F.count(F.lit(1)).alias("n_items"),
                 F.sum(revenue_col).alias("class_revenue"))
            .orderBy("abc_class"))


def ohlc_bars(df: DataFrame, key_col: str, ts_col: str, cents_col: Column,
              bucket: Column) -> DataFrame:
    """Time-series downsampling to OHLC bars: per (key, bucket) the
    opening/closing value by event time plus high/low/volume/total —
    the classic hypertable "candlestick" rollup.

    Open/close are row_number picks over (ts, tiebreak) windows rather
    than min_by/max_by so the deterministic total order is explicit and
    identical in the SQL twin (arg_min/arg_max tiebreak rules differ
    between engines on duplicate timestamps). One shuffle on
    (key, bucket): the window partition key equals the aggregation key,
    so AQE reuses the same exchange for both steps — the plan scales
    as a single repartition + per-partition sort at any volume.

    cents_col must be an exact integer expression (functions/money.py
    convention) so SUM never sees doubles."""
    w_open = Window.partitionBy(key_col, "__bucket").orderBy(
        F.col(ts_col).asc(), F.col("__cents").asc())
    w_close = Window.partitionBy(key_col, "__bucket").orderBy(
        F.col(ts_col).desc(), F.col("__cents").desc())
    prepared = (df.withColumn("__bucket", bucket)
                .withColumn("__cents", cents_col)
                .withColumn("__rn_o", F.row_number().over(w_open))
                .withColumn("__rn_c", F.row_number().over(w_close)))
    return (
        prepared.groupBy(F.col(key_col), F.col("__bucket").alias("bar_ts"))
        .agg(F.max(F.when(F.col("__rn_o") == 1, F.col("__cents")))
             .alias("open_cents"),
             F.max("__cents").alias("high_cents"),
             F.min("__cents").alias("low_cents"),
             F.max(F.when(F.col("__rn_c") == 1, F.col("__cents")))
             .alias("close_cents"),
             F.count(F.lit(1)).alias("volume"),
             F.sum("__cents").alias("total_cents"))
    )


def association_rules(baskets: DataFrame, basket_col: str, item_col: str,
                      min_pair_count: int = 3, top_n: int = 20) -> DataFrame:
    """Market-basket association rules over (basket, item) rows: for
    every unordered item pair {a, b} co-occurring in >= min_pair_count
    baskets, exact integer-ppm support / directional confidence / lift,
    top_n by lift (the a-priori "what sells together" mining pass —
    reference has nothing comparable; this is the 2.12 training-data
    co-occurrence shape).

    lift_ppm = pair_cnt * N * 1e6 DIV (cnt_a * cnt_b) — truncating DIV
    in both engines, numerator widened to DECIMAL(38,0) (pair_cnt * N *
    1e6 overflows BIGINT once baskets pass ~3e3 * 3e9).

    Scale shape: one self-join of the deduped (basket, item) grain on
    basket (cost sum_b items(b)^2, the copurchase-edge bound), one
    hash agg to pair grain, then two joins against the item-count
    table, which is item-domain-sized so AQE broadcasts it.
    A-priori prune (support monotonicity): pair_cnt <= min(cnt_a,
    cnt_b), so items with global count < min_pair_count cannot appear
    in ANY surviving pair — they are semi-joined away BEFORE the
    basket self-join. Lossless, and on heavy-tailed item domains it
    removes the long singleton tail from the quadratic fan-out; the
    residual cost is sum_b frequent_items(b)^2 (mega-basket probe in
    tools/scale_probe.py assoc_rules). The min_pair_count filter
    still lands right after the pair aggregate for the pairs the
    prune cannot reject."""
    bi = (baskets.select(F.col(basket_col).alias("b"),
                         F.col(item_col).alias("i")).distinct().persist())
    # N rides as a broadcast 1-row frame (no eager count() action)
    n_df = bi.agg(F.countDistinct("b").alias("n_baskets"))
    # item counts feed THREE consumers (the prune + both rule-side
    # joins): persist the item-domain-sized frame so the hash agg over
    # bi runs once, not three times
    item_cnt = (bi.groupBy(F.col("i"))
                .agg(F.count(F.lit(1)).alias("cnt"))
                .filter(F.col("cnt") >= min_pair_count).persist())
    # a-priori item prune: item-domain-sized build side, AQE broadcast
    pruned = bi.join(item_cnt.select("i"), "i", "left_semi")
    l = pruned.select("b", F.col("i").alias("ia"))
    r = pruned.select("b", F.col("i").alias("ib"))
    pairs = (l.join(r, "b").filter(F.col("ia") < F.col("ib"))
             .groupBy("ia", "ib")
             .agg(F.count(F.lit(1)).alias("pair_cnt"))
             .filter(F.col("pair_cnt") >= min_pair_count))
    dec = "decimal(38,0)"
    scored = (
        pairs
        .join(item_cnt.select(F.col("i").alias("ia"),
                              F.col("cnt").alias("cnt_a")), "ia")
        .join(item_cnt.select(F.col("i").alias("ib"),
                              F.col("cnt").alias("cnt_b")), "ib")
        .crossJoin(F.broadcast(n_df))
        .select(
            F.col("ia").alias("item_a"), F.col("ib").alias("item_b"),
            "pair_cnt", "cnt_a", "cnt_b",
            (F.col("pair_cnt").cast(dec) * F.lit(1_000_000))
            .cast(dec).alias("__p6"),
            F.col("n_baskets"))
        .select(
            "item_a", "item_b", "pair_cnt", "cnt_a", "cnt_b", "n_baskets",
            F.expr("CAST(__p6 DIV n_baskets AS BIGINT)")
            .alias("support_ppm"),
            F.expr("CAST(__p6 DIV cnt_a AS BIGINT)").alias("conf_ab_ppm"),
            F.expr("CAST(__p6 DIV cnt_b AS BIGINT)").alias("conf_ba_ppm"),
            F.expr("CAST((__p6 * n_baskets)"
                   " DIV (CAST(cnt_a AS DECIMAL(38,0)) * cnt_b)"
                   " AS BIGINT)").alias("lift_ppm")))
    return (scored
            .orderBy(F.col("lift_ppm").desc(), F.col("item_a"),
                     F.col("item_b"))
            .limit(top_n))


def rfm_segments(orders: DataFrame, key_col: str, ts_col: str,
                 amount_cents: Column, n_buckets: int = 5) -> DataFrame:
    """RFM customer segmentation: per key, Recency (days since last
    order, measured from the corpus max date so the result is a pure
    function of the data), Frequency (order count), Monetary (exact
    cents total) — each quintiled 1..n with the closed-form
    equal-count bucket (1 + (rank-1)*n DIV N over a (metric,
    key) total order; curation.curriculum_buckets convention, NTILE
    left nothing to trust). Quintile 1 is always BEST (most recent /
    most orders / highest spend). `segment` concatenates the three
    digits — the classic "111 = champions" code.

    Plan shape for 100 TB: one hash aggregate to key grain, then
    three distributed global ranks over that (already reduced) frame
    — range partition + prefix offsets each, never a single-task
    sort; the max-date scalar rides a broadcast 1-row frame."""
    from event_streaming_service_spark.operators.linkage import (
        global_rank,
    )

    per_key = (orders
               .groupBy(F.col(key_col))
               .agg(F.max(F.col(ts_col)).alias("__last"),
                    F.count(F.lit(1)).alias("n_orders"),
                    F.sum(amount_cents).alias("spend_cents")))
    maxd = per_key.agg(F.max("__last").alias("__maxd"))
    base = (per_key.crossJoin(F.broadcast(maxd))
            .withColumn("recency_days",
                        F.datediff(F.to_date("__maxd"),
                                   F.to_date("__last"))
                        .cast("bigint"))
            .drop("__last", "__maxd"))

    def quintile(df, metric_neg: Column, out: str) -> DataFrame:
        ranked = global_rank(
            df.withColumn("__m", metric_neg), ["__m", key_col])
        total = ranked.agg(F.max("rank").alias("__N"))
        return (ranked.join(F.broadcast(total))
                .withColumn(out, (F.lit(1) + F.expr(
                    f"((rank - 1) * {n_buckets}) DIV __N"))
                    .cast("int"))
                .drop("__m", "rank", "__N"))

    out = quintile(base, F.col("recency_days"), "r_q")
    out = quintile(out, -F.col("n_orders"), "f_q")
    out = quintile(out, -F.col("spend_cents"), "m_q")
    return out.withColumn(
        "segment",
        F.concat(F.col("r_q").cast("string"),
                 F.col("f_q").cast("string"),
                 F.col("m_q").cast("string")))


def _entropy_micro_sql(p: str, q: str) -> str:
    """Binary-entropy micro-units from two BIGINT counts — ONE float
    expression evaluated with the identical op sequence in Spark and
    DuckDB, floored to integers immediately (the bm25/PMI pinning
    rule). Zero on pure nodes."""
    n = f"({p} + {q})"
    pd_ = f"(CAST({p} AS DOUBLE) / CAST({n} AS DOUBLE))"
    qd = f"(CAST({q} AS DOUBLE) / CAST({n} AS DOUBLE))"
    return (f"CASE WHEN {p} = 0 OR {q} = 0 THEN 0 "
            f"ELSE CAST(FLOOR(-({pd_} * LN({pd_}) + {qd} * LN({qd}))"
            f" * 1000000 + 0.5) AS BIGINT) END")


def info_gain_splits(df: DataFrame, value_col: Column, label: Column,
                     thresholds: tuple[int, ...]) -> DataFrame:
    """Decision-stump scoring: information gain of the binary split
    value <= t for each literal threshold, against a boolean label —
    the single-node core of tree induction, run as ONE scan + ONE
    hash aggregate (every threshold is a pair of conditional sums in
    the same aggregate; quality_rules convention), unpivoted to a
    per-threshold report.

    Exactness: entropies are micro-pinned per node before the
    weighted combination; the weighting n_l*H_l + n_r*H_r DIV n is
    pure integer. ig_micro can be off true IG by ~1 micro-unit of
    quantization — identically in both engines, which is the point."""
    v = value_col
    y = label
    aggs = [F.count(F.lit(1)).alias("__n"),
            F.sum(F.when(y, 1).otherwise(0)).cast("bigint")
            .alias("__pos")]
    for i, t in enumerate(thresholds):
        aggs.append(F.sum(F.when(v <= t, 1).otherwise(0))
                    .cast("bigint").alias(f"__nl{i}"))
        aggs.append(F.sum(F.when((v <= t) & y, 1).otherwise(0))
                    .cast("bigint").alias(f"__pl{i}"))
    wide = df.agg(*aggs)
    stack = ", ".join(
        f"CAST({t} AS BIGINT), __nl{i}, __pl{i}"
        for i, t in enumerate(thresholds))
    long = wide.select(
        F.col("__n").alias("n_total"), F.col("__pos").alias("n_pos"),
        F.expr(f"stack({len(thresholds)}, {stack})")
        .alias("threshold", "n_left", "pos_left"))
    hp = _entropy_micro_sql("n_pos", "(n_total - n_pos)")
    hl = _entropy_micro_sql("pos_left", "(n_left - pos_left)")
    hr = _entropy_micro_sql("(n_pos - pos_left)",
                            "((n_total - n_left) - (n_pos - pos_left))")
    return (long
            .withColumn("h_parent_micro", F.expr(hp))
            .withColumn("h_left_micro", F.expr(hl))
            .withColumn("h_right_micro", F.expr(hr))
            .withColumn("ig_micro", F.expr(
                "CAST(h_parent_micro - (n_left * h_left_micro"
                " + (n_total - n_left) * h_right_micro)"
                " DIV n_total AS BIGINT)"))
            .select("threshold", "n_total", "n_pos", "n_left",
                    "pos_left", "h_parent_micro", "h_left_micro",
                    "h_right_micro", "ig_micro")
            .orderBy(F.col("ig_micro").desc(), F.col("threshold")))


def auc_binary(df: DataFrame, key_col: str, score_col: str,
               label: Column) -> DataFrame:
    """Exact ROC-AUC per key via the Mann-Whitney U statistic (the
    rank form every distributed ML-eval pipeline uses — no curve
    integration, no threshold sweep): with ascending competition
    ranks and tie groups averaged,
        AUC = (sum of positive ranks - n_pos(n_pos+1)/2) / (n_pos*n_neg).
    All arithmetic stays integer: twice an averaged rank is
    2*rank_min + tie_count - 1 (an integer), so
        auc_ppm = (2*sum_pos_ranks2 ... ) * 1e6 DIV (2*n_pos*n_neg)
    is engine-exact (truncating DIV both engines). The ppm multiply
    runs in DECIMAL(38,0): sum_pos_ranks2 grows ~n^2 per key, so the
    bigint form (sr2 - n_pos*(n_pos+1)) * 1e6 would silently wrap for
    keys beyond ~2M rows with ANSI mode off — decimal keeps the exact
    value to ~1e16 rows/key (the DuckDB twin rides HUGEINT the same
    way). Keys with a single class (n_pos or n_neg = 0) have no
    defined AUC and are omitted.

    Scale shape: ONE shuffle on the key; the rank and tie-count
    windows and the final aggregate all share the key partitioning,
    so the exchange is reused across all three."""
    w_rank = Window.partitionBy(key_col).orderBy(score_col)
    w_tie = Window.partitionBy(key_col, score_col)
    two_avg_rank = (2 * F.rank().over(w_rank)
                    + F.count(F.lit(1)).over(w_tie) - 1).cast("long")
    is_pos = label.cast("int")
    base = df.select(F.col(key_col), F.col(score_col),
                     is_pos.alias("__pos"),
                     two_avg_rank.alias("__r2"))
    agg = (base.groupBy(key_col)
           .agg(F.sum("__pos").cast("long").alias("n_pos"),
                F.sum(1 - F.col("__pos")).cast("long").alias("n_neg"),
                F.sum(F.col("__pos") * F.col("__r2")).cast("long")
                .alias("__sr2")))
    auc_ppm = F.expr(
        "CAST((CAST(__sr2 AS DECIMAL(38,0))"
        " - CAST(n_pos AS DECIMAL(38,0)) * (n_pos + 1)) * 1000000"
        " DIV (2 * CAST(n_pos AS DECIMAL(38,0)) * n_neg) AS BIGINT)")
    return (agg.filter((F.col("n_pos") > 0) & (F.col("n_neg") > 0))
            .select(key_col, "n_pos", "n_neg",
                    auc_ppm.alias("auc_ppm")))


def quantile_normalize(df: DataFrame, group_col: str, value_col: str,
                       id_col: str) -> DataFrame:
    """Quantile normalization onto the POOLED distribution (the
    rank-based batch-effect correction from microarray statistics,
    Bolstad et al. 2003, generalized to unequal group sizes): each
    row's value is replaced by the pooled value found at the same
    relative rank position,
        pooled_index = 1 + (r - 1) * (N - 1) DIV (n_g - 1),
    with r the row's 1-based rank inside its group and N the pooled
    row count — integer arithmetic, lower-index convention, so both
    engines land the identical pooled row (n_g = 1 maps to pooled
    index 1). Ranks use (value, id) total order; values move as exact
    cents.

    After normalization every group's value distribution is (up to
    the integer index map) the same pooled profile — the ML-
    preprocessing step that removes per-source calibration drift
    before training on pooled corpora.

    Scale shape: group ranks are one key-partitioned window; the
    pooled rank uses linkage.global_rank (range-partitioned prefix
    sums, localCheckpoint-pinned — never a single-task global sort),
    and the final equi-join keys on the pooled index against the
    pooled rank, both dimension-bounded per partition."""
    from event_streaming_service_spark.operators.linkage import (
        global_rank)

    cents = F.floor(F.col(value_col) * 100 + F.lit(0.5)).cast("long")
    base = df.select(F.col(id_col), F.col(group_col),
                     cents.alias("cents"))
    pooled = global_rank(base, ["cents", id_col]).select(
        F.col("rank").alias("__gidx"), F.col("cents").alias("qnorm_cents"))
    n_total = pooled.count()
    # Windows via the Column API (an interpolated identifier would
    # break or mis-bind on names needing backticks); only the DIV
    # arithmetic stays an F.expr over the pre-aliased internal
    # columns so the truncating DIV is literally the same operator
    # the oracle runs.
    wg = Window.partitionBy(group_col).orderBy(F.col("cents"),
                                               F.col(id_col))
    ranked = (base
              .withColumn("__r", F.row_number().over(wg))
              .withColumn("__ng", F.count(F.lit(1)).over(
                  Window.partitionBy(group_col)))
              .withColumn("__gidx", F.expr(
                  f"1 + CAST((__r - 1) * {n_total - 1} AS BIGINT)"
                  f" DIV greatest(__ng - 1, 1)"))
              .drop("__r", "__ng"))
    return (ranked.join(pooled, "__gidx")
            .select(id_col, group_col, F.col("cents").alias("value_cents"),
                    "qnorm_cents"))


def u_shaped_attribution(events: DataFrame, key_col: str, ts_col: str,
                         type_col: str, conversion_type: str,
                         touch_types: list[str],
                         id_col: str = "event_id") -> DataFrame:
    """Position-based (U-shaped / 40-20-40) multi-touch attribution
    over the FULL prior journey: for each conversion, the first touch
    and the most recent touch each earn 40% and the middle touches
    split the remaining 20% — the standard position-based model, the
    multi-touch sibling of last_touch_attribution.

    Credit is exact integer ppm with a deterministic remainder rule:
    n = 1 -> first 1e6; n = 2 -> 500k/500k; n >= 3 -> 400k/400k and
    middle_each = 200k DIV (n-2), the division remainder folded into
    the FIRST touch. One row per conversion with n_touches >= 1:
    (conversion id, n_touches, first/last touch ids, first/last/
    middle-each ppm).

    Deliberately full-history (no lookback bound): first-touch needs
    MIN over a window-bounded range, and bounded-start range frames
    re-scan their buffer per row (the documented quadratic hot-key
    hazard last_touch_attribution's docstring walks through). All
    three aggregates here — first struct, last struct, count — are
    GROWING frames (UNBOUNDED PRECEDING .. -1), maintained
    incrementally, so the pass is O(n) per key; ONE shuffle total."""
    ms = wall_clock_millis(F.col(ts_col))
    is_touch = F.col(type_col).isin(list(touch_types))
    touch = F.when(is_touch, F.struct(
        ms.alias("ms"), F.col(id_col).alias("id")))
    # RANGE, not ROWS: ms ties are real, and a ROWS frame over a
    # non-unique ordering admits same-ms touches by partition order —
    # the same determinism rule last_touch_attribution documents.
    # "Strictly earlier ms" is the deterministic reading both engines
    # share, and growing range frames stay incrementally maintained.
    w = (Window.partitionBy(key_col).orderBy(ms)
         .rangeBetween(Window.unboundedPreceding, -1))
    base = (events
            .withColumn("__first", F.min(touch).over(w))
            .withColumn("__last", F.max(touch).over(w))
            .withColumn("__n", F.count(touch).over(w))
            .filter((F.col(type_col) == conversion_type)
                    & (F.col("__n") >= 1)))
    n = F.col("__n")
    mid_each = F.expr("200000 DIV (__n - 2)")
    first_ppm = (
        F.when(n == 1, F.lit(1_000_000))
        .when(n == 2, F.lit(500_000))
        .otherwise(F.lit(400_000) + F.lit(200_000)
                   - mid_each * (n - 2)))
    last_ppm = (F.when(n == 1, F.lit(0))
                .when(n == 2, F.lit(500_000))
                .otherwise(F.lit(400_000)))
    mid_ppm = F.when(n <= 2, F.lit(0)).otherwise(mid_each)
    return base.select(
        F.col(id_col).alias("conversion_id"), F.col(key_col),
        n.cast("bigint").alias("n_touches"),
        F.col("__first.id").alias("first_touch_id"),
        F.col("__last.id").alias("last_touch_id"),
        first_ppm.cast("bigint").alias("first_ppm"),
        last_ppm.cast("bigint").alias("last_ppm"),
        mid_ppm.cast("bigint").alias("middle_each_ppm"))


def average_precision(df: DataFrame, key_col: str, score_col: str,
                      label: Column, id_col: str) -> DataFrame:
    """Exact average precision (area under the precision-recall curve
    in its rank-sum form) per key:
        AP = (1/n_pos) * sum over positive ranks k of precision@k,
    over the list ranked by score DESCENDING with id ascending as the
    deterministic tiebreak (AP is tie-ambiguous by definition, so the
    tiebreak IS part of the metric contract here — both engines rank
    identically). Each precision@k pins to ppm BEFORE the cross-rank
    sum (truncating DIV), then the mean divides once more — all
    integer, engine-exact. Keys without positives are omitted.

    Scale shape: one key shuffle; rank window + running positive
    count + final aggregate all reuse the exchange (the AUC plan)."""
    w = Window.partitionBy(key_col).orderBy(
        F.col(score_col).desc(), F.col(id_col))
    is_pos = label.cast("long")
    base = (df.select(F.col(key_col), F.col(score_col),
                      F.col(id_col), is_pos.alias("__pos"))
            .withColumn("__k", F.row_number().over(w))
            .withColumn("__cum", F.sum("__pos").over(
                w.rowsBetween(Window.unboundedPreceding, 0))))
    prec_ppm = F.expr("__cum * 1000000 DIV __k")
    agg = (base.groupBy(key_col)
           .agg(F.sum("__pos").cast("long").alias("n_pos"),
                F.count(F.lit(1)).cast("long").alias("n_rows"),
                F.sum(F.when(F.col("__pos") == 1, prec_ppm)
                      .otherwise(0)).cast("long").alias("__sp")))
    return (agg.filter(F.col("n_pos") > 0)
            .select(key_col, "n_pos", "n_rows",
                    F.expr("CAST(__sp DIV n_pos AS BIGINT)")
                    .alias("ap_ppm")))


def calibration_bins(df: DataFrame, score_col: str, label: Column,
                     n_bins: int = 10, score_max: float = 500.0
                     ) -> DataFrame:
    """Reliability diagram + Expected Calibration Error in exact
    integers: scores bucket into fixed-width bins over [0, score_max],
    each bin reports its row count, positive count, mean score
    (micro-units, truncating DIV), and positive rate (ppm); ece_ppm =
    sum over bins of |rate - mean_score_normalized| * n_bin DIV N is
    the weighted calibration gap, broadcast onto every row. The
    ML-eval sibling of auc_binary/average_precision: AUC ranks, AP
    weights the head, ECE checks the SCALE of the scores.

    All arithmetic integer: scores pin to micro-units per row before
    any sum; conf_ppm divides micro-units by score_max in MICRO-units
    (mean_micro * 1e6 DIV round(score_max * 1e6)) so a non-integral
    score_max — 0.5 for probability-like scores, the usual
    calibration domain — is exact rather than int()-truncated. Bins
    clamp into [0, n_bins - 1] on BOTH ends (a negative score would
    otherwise land in a negative bin). One hash agg to <= n_bins rows
    + one tiny window."""
    if not score_max > 0:
        raise ValueError(f"score_max must be positive: {score_max}")
    score_max_micro = int(round(score_max * 1_000_000))
    micro = F.floor(F.col(score_col) * 1_000_000 + F.lit(0.5)) \
        .cast("long")
    bin_col = F.greatest(
        F.least(F.floor(F.col(score_col) * F.lit(n_bins / score_max)),
                F.lit(n_bins - 1)),
        F.lit(0)).cast("int")
    base = (df.select(bin_col.alias("bin"), micro.alias("__mu"),
                      label.cast("long").alias("__pos"))
            .groupBy("bin")
            .agg(F.count(F.lit(1)).cast("long").alias("n_rows"),
                 F.sum("__pos").cast("long").alias("n_pos"),
                 F.sum("__mu").cast("long").alias("__smu")))
    rate_ppm = F.expr("n_pos * 1000000 DIV n_rows")
    mean_micro = F.expr("__smu DIV n_rows")
    per = (base.withColumn("rate_ppm", rate_ppm)
           .withColumn("mean_score_micro", mean_micro)
           # confidence proxy: score normalized onto [0, 1] ppm —
           # micro-units over micro-units so non-integral score_max
           # stays exact (mean/score_max == mean*1e6/(score_max*1e6),
           # same truncation point)
           .withColumn("conf_ppm", F.expr(
               f"mean_score_micro * 1000000 DIV {score_max_micro}"))
           .withColumn("__gap",
                       F.abs(F.col("rate_ppm") - F.col("conf_ppm"))
                       * F.col("n_rows")))
    # global window over <= n_bins rows; truncating DIV mirrors the
    # oracle exactly
    return (per.withColumn(
        "ece_ppm", F.expr(
            "CAST(SUM(__gap) OVER () DIV SUM(n_rows) OVER ()"
            " AS BIGINT)"))
        .select("bin", "n_rows", "n_pos", "rate_ppm",
                "mean_score_micro", "conf_ppm", "ece_ppm"))


def spearman_corr(df: DataFrame, x_col: str, y_col: str,
                  group_cols: list[str] | None = None,
                  x_scale: int = 100, y_scale: int = 100) -> DataFrame:
    """Per-group Spearman rank correlation — the monotone-association
    readout Pearson misses whenever the relationship is nonlinear
    (price vs quantity under tiered discounts, latency vs load near
    saturation): Pearson r computed on the RANKS of x and y.

    Tied values take the average rank, which can be a half-integer —
    so both rank columns carry the DOUBLE rank
        rank2 = 2 * RANK() + tie_count - 1
    (an exact integer: 2 * (min_rank + (ties-1)/2)), and the doubling
    cancels in the correlation. The moment sums are then the
    pearson_corr device verbatim: exact decimal accumulation, one
    pinned final sqrt/divide at 9 dp.

    Scale shape: ONE exchange on the group key + two in-partition
    sorts (x order, y order) — the per-group sort is a rank
    statistic's inherent cost; rows/group bounds the window task.
    The tie count shares the rank window's partitioning AND sort via
    a RANGE BETWEEN CURRENT ROW AND CURRENT ROW frame (peers of the
    order value), so no (group, value)-partitioned exchange exists
    in the plan at all (VERDICT r9 item #5: the former
    per-value-grain count windows each forced their own exchange).
    No joins, no collect."""
    groups = list(group_cols or [])
    qx = F.floor(F.col(x_col) * F.lit(float(x_scale)) + F.lit(0.5)) \
          .cast("long")
    qy = F.floor(F.col(y_col) * F.lit(float(y_scale)) + F.lit(0.5)) \
          .cast("long")
    base = df.select(*groups, qx.alias("__qx"), qy.alias("__qy"))
    wx = Window.partitionBy(*groups).orderBy("__qx")
    wy = Window.partitionBy(*groups).orderBy("__qy")
    tx = wx.rangeBetween(Window.currentRow, Window.currentRow)
    ty = wy.rangeBetween(Window.currentRow, Window.currentRow)
    ranked = (base
              .withColumn("__rx2", (F.lit(2) * F.rank().over(wx)
                                    + F.count(F.lit(1)).over(tx)
                                    - F.lit(1)).cast("long"))
              .withColumn("__ry2", (F.lit(2) * F.rank().over(wy)
                                    + F.count(F.lit(1)).over(ty)
                                    - F.lit(1)).cast("long")))
    out = pearson_corr(ranked, "__rx2", "__ry2", group_cols=groups,
                       x_scale=1, y_scale=1)
    return out.withColumnRenamed("pearson_r", "spearman_rho")


def mann_kendall_trend(events: DataFrame, key_col: str, ts_col: str,
                       value_col: str, tiebreak_col: str,
                       max_events_per_key: int = 128) -> DataFrame:
    """Mann-Kendall trend TEST per key (Mann 1945 / Kendall 1975):
    the significance-side companion of theil_sen_trend's magnitude.
        S = sum over time-ordered pairs of sign(y_j - y_i)
    counts concordant minus discordant pairs — a pure integer, immune
    to any monotone transform of the values — and Kendall's tau-a
        tau_ppm = S * 1e6 DIV n_pairs  (truncating toward zero,
    spelled identically in both engines: DuckDB's // floors, so the
    oracle uses the same CASE-wrapped sign trick Spark's DIV gets).
    |tau| near 1 = consistently monotone series; near 0 = no trend.

    Exactness: values quantize to cents before comparison (ties are
    sign 0, counted in n_pairs — tau-a, not the tie-adjusted tau-b);
    pairs order by (ms, tiebreak) rank exactly like theil_sen_trend,
    and the same deterministic per-key cap bounds the O(n^2) fan-out
    (hot-key hazard). Keys with < 2 capped events are absent."""
    cents = F.floor(F.col(value_col) * 100 + F.lit(0.5)).cast("long")
    w = Window.partitionBy(key_col).orderBy(F.col("__ms"),
                                            F.col("__tb"))
    base = (events
            .select(F.col(key_col),
                    wall_clock_millis(F.col(ts_col)).alias("__ms"),
                    F.col(tiebreak_col).alias("__tb"),
                    cents.alias("__c"))
            .withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") <= max_events_per_key)
            .persist())
    a = base.select(F.col(key_col), F.col("__c").alias("__ca"),
                    F.col("__rn").alias("__ra"))
    b = base.select(F.col(key_col), F.col("__c").alias("__cb"),
                    F.col("__rn").alias("__rb"))
    pairs = (a.join(b, key_col)
             .filter(F.col("__ra") < F.col("__rb"))
             .select(key_col,
                     F.signum(F.col("__cb") - F.col("__ca"))
                     .cast("long").alias("__s")))
    agg = (pairs.groupBy(key_col)
           .agg(F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
                F.sum("__s").cast("bigint").alias("s_stat")))
    # truncating-toward-zero ppm: DuckDB // floors (so -1//2 = -1),
    # Spark DIV truncates — make both truncate via sign * (|S|*1e6 //
    # n_pairs), identical in the oracle
    tau = (F.signum(F.col("s_stat")).cast("long")
           * F.expr("(abs(s_stat) * 1000000) DIV n_pairs"))
    return agg.select(key_col, "n_pairs", "s_stat",
                      tau.cast("bigint").alias("tau_ppm"))


# ---- logistic regression (IRLS / Newton) --------------------------
#
# Shared float spellings: the sigmoid pin and the Cramer solve are the
# ONLY float sequences in the logistic pipeline; Spark and the SQL
# oracle both evaluate these exact strings, so cross-engine hashes
# cannot drift. Everything between them is exact integer arithmetic.

LOGIT_P_NANO_SQL = (
    "CAST(FLOOR(1000000000.0 / (1.0 + EXP(-((CAST(b0 AS DOUBLE)"
    " + CAST(b1 AS DOUBLE) * CAST(x1 AS DOUBLE)"
    " + CAST(b2 AS DOUBLE) * CAST(x2 AS DOUBLE)) / 1000000.0)))"
    " + 0.5) AS BIGINT)")


def _logit_newton_sqls() -> tuple[str, str, str, str]:
    """(det, d1, d2, d3) Cramer strings over the aggregate columns
    g1..g3 / h11..h33, all cast to DOUBLE inline."""
    g1, g2, g3 = ("CAST(g1 AS DOUBLE)", "CAST(g2 AS DOUBLE)",
                  "CAST(g3 AS DOUBLE)")
    h11, h12, h13 = ("CAST(h11 AS DOUBLE)", "CAST(h12 AS DOUBLE)",
                     "CAST(h13 AS DOUBLE)")
    h22, h23, h33 = ("CAST(h22 AS DOUBLE)", "CAST(h23 AS DOUBLE)",
                     "CAST(h33 AS DOUBLE)")
    det = (f"{h11} * ({h22} * {h33} - {h23} * {h23})"
           f" - {h12} * ({h12} * {h33} - {h23} * {h13})"
           f" + {h13} * ({h12} * {h23} - {h22} * {h13})")
    d1 = (f"{g1} * ({h22} * {h33} - {h23} * {h23})"
          f" - {h12} * ({g2} * {h33} - {h23} * {g3})"
          f" + {h13} * ({g2} * {h23} - {h22} * {g3})")
    d2 = (f"{h11} * ({g2} * {h33} - {h23} * {g3})"
          f" - {g1} * ({h12} * {h33} - {h23} * {h13})"
          f" + {h13} * ({h12} * {g3} - {g2} * {h13})")
    d3 = (f"{h11} * ({h22} * {g3} - {g2} * {h23})"
          f" - {h12} * ({h12} * {g3} - {g2} * {h13})"
          f" + {g1} * ({h12} * {h23} - {h22} * {h13})")
    return det, d1, d2, d3


def logit_beta_next_sql(j: int) -> str:
    """b{j} update: Newton step in micro units. The 1e15 factor is the
    unit algebra — gradient sums carry 1e9 (nano-residuals), Hessian
    sums 1e18 (nano^2 weights), so the double solve x = H^-1 g is
    1e-9 x natural and beta_micro moves by x * 1e15."""
    det, d1, d2, d3 = _logit_newton_sqls()
    dj = (d1, d2, d3)[j]
    # CASE guard: a singular Hessian (constant/collinear features)
    # divides by zero — DOUBLE gives inf and CAST(inf AS BIGINT)
    # ERRORS in DuckDB, so both engines return NULL instead (NULL
    # then propagates through later rounds' sigmoid, as documented)
    return (f"CASE WHEN ({det}) <> 0.0 THEN"
            f" CAST(b{j} + CAST(FLOOR(({dj}) / ({det})"
            f" * 1000000000000000.0 + 0.5) AS BIGINT) AS BIGINT) END")


_LOGIT_AGGS = """
    CAST(COUNT(*) AS BIGINT) AS n,
    SUM(CAST(resid AS DECIMAL(38,0))) AS g1,
    SUM(CAST(resid AS DECIMAL(38,0)) * x1) AS g2,
    SUM(CAST(resid AS DECIMAL(38,0)) * x2) AS g3,
    SUM(CAST(w2 AS DECIMAL(38,0))) AS h11,
    SUM(CAST(w2 AS DECIMAL(38,0)) * x1) AS h12,
    SUM(CAST(w2 AS DECIMAL(38,0)) * x2) AS h13,
    SUM(CAST(w2 AS DECIMAL(38,0)) * x1 * x1) AS h22,
    SUM(CAST(w2 AS DECIMAL(38,0)) * x1 * x2) AS h23,
    SUM(CAST(w2 AS DECIMAL(38,0)) * x2 * x2) AS h33
"""


def logistic2_newton(df: DataFrame, y_flag, x1_col: str, x2_col: str,
                     rounds: int = 3) -> DataFrame:
    """Two-feature logistic regression y ~ sigmoid(b0 + b1 x1 + b2 x2)
    fit by `rounds` unrolled Newton/IRLS iterations — regression-as-
    aggregation extended from the linear (ols2_regression) to the
    GLM family, the workhorse behind propensity scores, CTR models,
    and treatment-assignment checks.

    Per round, with the current coefficients as micro-unit integers:
      * every row's sigmoid pins to nano units (ONE shared float
        spelling, LOGIT_P_NANO_SQL) — after which residual
        (y*1e9 - p_nano) and IRLS weight (p_nano*(1e9 - p_nano)) are
        exact integers;
      * gradient and Hessian moments accumulate as exact
        decimal(38,0) sums (HUGEINT in the oracle) — one map-side-
        combined aggregate over the persisted feature frame, nothing
        row-grain shuffles;
      * the 3x3 Newton solve runs by Cramer's rule in DOUBLE on those
        exact sums (the second shared spelling), and the step pins
        back to micro-unit integer coefficients.
    So each round is integer -> one pinned float per row -> integer
    sums -> one pinned solve: a pure integer function of the data,
    bit-equal in the oracle's unrolled CTE chain. Newton on a
    2-feature logistic converges in ~4 iterations from beta=0;
    rounds=3 is the fixed-iteration convention (HITS/LPA/Lloyd) —
    any round count is deterministic and hash-checkable.

    Features must be small exact integers (hour, weekday, bucket ids
    — the ols2_regression contract): Hessian cells then stay under
    decimal(38) for 1e9-row inputs. Output: ONE row — n_rows,
    b0_micro, b1_micro, b2_micro. Singular Hessians (constant
    features) yield NULL coefficients from that round on.

    Scale shape: the feature frame persists once and is scanned once
    per round; coefficients ride 1-row broadcast frames pinned
    eagerly per round (the one-pin-per-round iterative convention)."""
    spark = df.sparkSession
    rows = (df.select(y_flag.cast("int").alias("y"),
                      F.col(x1_col).cast("bigint").alias("x1"),
                      F.col(x2_col).cast("bigint").alias("x2"))
            .persist())
    beta = spark.createDataFrame(
        [(0, 0, 0)], "b0 bigint, b1 bigint, b2 bigint")
    aggs = [a.strip() for a in _LOGIT_AGGS.strip().split(",\n")]
    n_out = None
    for _ in range(rounds):
        j = (rows.crossJoin(F.broadcast(beta))
             .withColumn("p", F.expr(LOGIT_P_NANO_SQL))
             .withColumn("resid", F.expr(
                 "CAST(y AS BIGINT) * 1000000000 - p"))
             .withColumn("w2", F.expr("p * (1000000000 - p)")))
        agg = j.agg(*[F.expr(a) for a in aggs])
        step = agg.crossJoin(F.broadcast(beta)).select(
            F.col("n"),
            F.expr(logit_beta_next_sql(0)).alias("b0"),
            F.expr(logit_beta_next_sql(1)).alias("b1"),
            F.expr(logit_beta_next_sql(2)).alias("b2")).localCheckpoint()
        n_out = step
        beta = step.select("b0", "b1", "b2")
    return n_out.select(
        F.col("n").alias("n_rows"),
        F.col("b0").alias("b0_micro"),
        F.col("b1").alias("b1_micro"),
        F.col("b2").alias("b2_micro"))


# shared float spelling: the conformal residual (pinned to cents) —
# the only float sequence between the pinned OLS betas and the exact
# rank statistic
CONFORMAL_RESID_SQL = (
    "CAST(FLOOR(ABS(CAST(yc AS DOUBLE)"
    " - (beta0 + beta_x1 * CAST(x1 AS DOUBLE)"
    " + beta_x2 * CAST(x2 AS DOUBLE))) + 0.5) AS BIGINT)")


def conformal_ols2_interval(df: DataFrame, group_col: str,
                            x1_col: str, x2_col: str, y_col: str,
                            key_col: str, level_pct: int = 95,
                            y_scale: int = 100) -> DataFrame:
    """Split-conformal prediction interval for the ols2 model
    (Vovk et al.; Lei et al. 2018's split-conformal recipe) — the
    distribution-free uncertainty layer on top of
    ols2_regression: fit y ~ b0 + b1 x1 + b2 x2 on the TRAIN split
    (the engine's content-hash 90/5/5 assignment, so the split is a
    pure function of the key), score the VAL split's absolute
    residuals, and take the ceil(level * n_cal)-th order statistic —
    at test time, pred +- q is a (level)-coverage interval under
    exchangeability, with NO distributional assumption.

    Exactness: betas are the ols2 9dp-pinned Cramer solution;
    each calibration residual is ONE shared float spelling
    (CONFORMAL_RESID_SQL) pinned to integer cents; the quantile is
    the exact k-th order statistic with k = max(1,
    ceil(level_pct * n_cal / 100)) computed in integer arithmetic
    ((n*level + 99) DIV 100) and a deterministic (residual, key)
    rank order.

    Scale shape: one pass builds the split-tagged feature frame
    (persisted: the train aggregate and the calibration scan read
    it); the group-grain beta frame broadcasts back; the order
    statistic is one per-group window sort over the ~5% calibration
    slice. Groups with a singular train fit or an empty calibration
    slice are absent."""
    from event_streaming_service_spark.operators.curation import (
        split_assign)

    base = (df.select(F.col(group_col).alias("grp"),
                      F.col(x1_col).cast("bigint").alias("x1"),
                      F.col(x2_col).cast("bigint").alias("x2"),
                      F.col(y_col).alias("y"),
                      F.col(key_col).alias("__k"))
            .withColumn("__split", split_assign(F.col("__k")))
            .persist())
    betas = ols2_regression(
        base.filter(F.col("__split") == "train"),
        "grp", "x1", "x2", "y", y_scale=y_scale)
    cal = (base.filter(F.col("__split") == "val")
           .withColumn("yc", F.floor(F.col("y") * F.lit(float(y_scale))
                                     + F.lit(0.5)).cast("bigint"))
           .join(F.broadcast(betas.where(F.col("beta0").isNotNull())),
                 "grp")
           .withColumn("r", F.expr(CONFORMAL_RESID_SQL)))
    wr = Window.partitionBy("grp").orderBy("r", "__k")
    wg = Window.partitionBy("grp")
    ranked = (cal.withColumn("rk", F.row_number().over(wr))
              .withColumn("n_cal",
                          F.count(F.lit(1)).over(wg).cast("bigint")))
    k = F.expr(f"GREATEST(CAST(1 AS BIGINT),"
               f" (n_cal * {int(level_pct)} + 99) DIV 100)")
    return (ranked.where(F.col("rk") == k)
            .select(F.col("grp").alias(group_col),
                    F.col("n_points").alias("n_train"),
                    "n_cal", k.alias("q_rank"),
                    F.col("r").alias("q_abs_resid_cents")))


# Segmented-regression shared spellings: per-side SSE from the exact
# centered moment polynomials A = n*syy - sy^2, B = n*sty - st*sy,
# C = n*stt - st^2 (suffix l/r), scaled to 1e-6 cents^2 units; the
# side slope is B/C in micro cents/day. A degenerate side (all rows
# on one day, or < 2 rows) falls back to the mean-only SSE A/n.
def _sse_e6_sql(suf: str) -> str:
    a, b, c, n = (f"CAST(a{suf} AS DOUBLE)", f"CAST(b{suf} AS DOUBLE)",
                  f"CAST(c{suf} AS DOUBLE)", f"CAST(n{suf} AS DOUBLE)")
    fit = f"({a} - {b} * {b} / {c}) / {n}"
    mean_only = f"{a} / {n}"
    return (f"CASE WHEN n{suf} >= 2 AND c{suf} > 0 THEN"
            f" CAST(FLOOR(({fit}) / 1000000.0 + 0.5) AS BIGINT)"
            f" WHEN n{suf} >= 1 THEN"
            f" CAST(FLOOR(({mean_only}) / 1000000.0 + 0.5) AS BIGINT)"
            f" END")


def _slope_micro_sql(suf: str) -> str:
    b, c = f"CAST(b{suf} AS DOUBLE)", f"CAST(c{suf} AS DOUBLE)"
    return (f"CASE WHEN n{suf} >= 2 AND c{suf} > 0 THEN"
            f" CAST(FLOOR({b} / {c} * 1000000.0 + 0.5) AS BIGINT)"
            f" END")


def changepoint_ols(df: DataFrame, t_col: str, y_col: str,
                    breaks: tuple[int, ...],
                    y_scale: int = 100) -> DataFrame:
    """Single-changepoint segmented regression over a literal
    breakpoint grid — the 'did the trend break, and when' readout
    behind launch/incident attribution: for each candidate break b,
    fit y ~ line on t < b and y ~ line on t >= b independently and
    score the split by total SSE; the argmin candidate is the
    estimated changepoint (the classic two-segment special case of
    dynamic-programming changepoint detection, grid-restricted the
    way info_gain_price_splits restricts its thresholds so the whole
    search is ONE aggregate).

    Exactness: t is an exact integer (days), y quantizes by y_scale;
    the 12 per-side moments accumulate as exact decimal(38,0)
    conditional sums in one map-side-combined pass over the row x
    candidate grid; each side's SSE and slope is ONE shared float
    spelling over those integers (SSE in 1e6-cents^2 units — raw
    cents^2 SSE overflows bigint at corpus scale). is_best marks the
    (sse_total_e6, brk) argmin — deterministic tiebreak.

    Output per candidate: brk, n_left, n_right, sse_total_e6,
    slope_left_micro, slope_right_micro, is_best (int)."""
    dec = "decimal(38,0)"
    spark = df.sparkSession
    grid = spark.createDataFrame([(int(b),) for b in breaks],
                                 "brk int")
    yq = F.floor(F.col(y_col) * F.lit(float(y_scale)) + F.lit(0.5)) \
          .cast("long")
    base = (df.select(F.col(t_col).cast("long").alias("t"),
                      yq.alias("y"))
            .crossJoin(F.broadcast(grid)))

    def side(cond, suf):
        return [
            F.sum(F.when(cond, 1).otherwise(0)).cast(dec)
            .alias(f"n{suf}"),
            F.sum(F.when(cond, F.col("t")).otherwise(0)).cast(dec)
            .alias(f"st{suf}"),
            F.sum(F.when(cond, F.col("t") * F.col("t")).otherwise(0))
            .cast(dec).alias(f"stt{suf}"),
            F.sum(F.when(cond, F.col("y")).otherwise(0)).cast(dec)
            .alias(f"sy{suf}"),
            F.sum(F.when(cond, F.col("t") * F.col("y")).otherwise(0))
            .cast(dec).alias(f"sty{suf}"),
            F.sum(F.when(cond, F.col("y").cast(dec) * F.col("y"))
                  .otherwise(0)).cast(dec).alias(f"syy{suf}"),
        ]

    left, right = F.col("t") < F.col("brk"), F.col("t") >= F.col("brk")
    agg = base.groupBy("brk").agg(*(side(left, "l") + side(right, "r")))
    polys = agg
    for suf in ("l", "r"):
        polys = (polys
                 .withColumn(f"a{suf}", F.expr(
                     f"n{suf} * syy{suf} - sy{suf} * sy{suf}"))
                 .withColumn(f"b{suf}", F.expr(
                     f"n{suf} * sty{suf} - st{suf} * sy{suf}"))
                 .withColumn(f"c{suf}", F.expr(
                     f"n{suf} * stt{suf} - st{suf} * st{suf}")))
    scored = (polys
              .withColumn("__sl", F.expr(_sse_e6_sql("l")))
              .withColumn("__sr", F.expr(_sse_e6_sql("r")))
              .withColumn("sse_total_e6",
                          (F.col("__sl") + F.col("__sr"))
                          .cast("bigint")))
    w = Window.orderBy("sse_total_e6", "brk")
    return (scored
            .withColumn("is_best",
                        (F.row_number().over(w) == 1).cast("int"))
            .select(F.col("brk").cast("int"),
                    F.col("nl").cast("bigint").alias("n_left"),
                    F.col("nr").cast("bigint").alias("n_right"),
                    "sse_total_e6",
                    F.expr(_slope_micro_sql("l"))
                    .alias("slope_left_micro"),
                    F.expr(_slope_micro_sql("r"))
                    .alias("slope_right_micro"),
                    "is_best"))


def ols2_kfold_cv(df: DataFrame, x1_col: str, x2_col: str,
                  y_col: str, key_col: str, k: int = 5,
                  y_scale: int = 100) -> DataFrame:
    """K-fold cross-validation of the ols2 model — the model-EVAL loop
    next to the train->apply loop: every row lands in exactly one of
    `k` content-hash folds (a pure function of the key, the
    split_assign device), each fold's model trains on the OTHER k-1
    folds, and the held-out rows score their own fold's betas. Output
    per fold: n_train, n_test, the 9dp-pinned betas, and exact MAE /
    MSE of the pinned integer-cent residuals — the out-of-sample error
    estimate that decides whether the ols2 coefficients generalize.

    The k training moment sets are NOT k corpus scans: ONE aggregate
    computes the nine exact decimal(38,0) moments per fold, the 1-row
    total sums them, and fold f's training moments are the exact
    complement (total - fold_f) — moment additivity is what makes
    k-fold free at this grain. Scale shape: one moments aggregate +
    one scoring scan over the persisted feature frame; betas ride a
    k-row broadcast; residuals pin per row via CONFORMAL_RESID_SQL
    (the shared spelling) so MAE/MSE sums are exact integers."""
    from event_streaming_service_spark.operators.sampling import (
        sample_hash)

    dec = "decimal(38,0)"
    base = (df.select(
        F.pmod(sample_hash(F.col(key_col)), F.lit(k)).cast("int")
        .alias("fold"),
        F.col(x1_col).cast("bigint").alias("x1"),
        F.col(x2_col).cast("bigint").alias("x2"),
        F.floor(F.col(y_col) * F.lit(float(y_scale)) + F.lit(0.5))
        .cast("bigint").alias("yc"))
        .persist())
    x1, x2, yc = (F.col("x1").cast(dec), F.col("x2").cast(dec),
                  F.col("yc").cast(dec))
    # the k-row moment frame feeds BOTH the 1-row total and the
    # complement projection — pin it or the corpus-wide aggregate
    # over the cached base runs twice (seen in the sf0.01 plan)
    foldm = (base.groupBy("fold")
             .agg(F.count(F.lit(1)).cast(dec).alias("fn"),
                  F.sum(x1).alias("f1"), F.sum(x2).alias("f2"),
                  F.sum(x1 * x1).alias("f11"),
                  F.sum(x1 * x2).alias("f12"),
                  F.sum(x2 * x2).alias("f22"),
                  F.sum(yc).alias("fy"),
                  F.sum(x1 * yc).alias("f1y"),
                  F.sum(x2 * yc).alias("f2y"))
             .localCheckpoint())
    tot = foldm.agg(*[F.sum(c).alias("t" + c[1:])
                      for c in ("fn", "f1", "f2", "f11", "f12",
                                "f22", "fy", "f1y", "f2y")])
    tr = (foldm.crossJoin(F.broadcast(tot))
          .select("fold",
                  *[(F.col("t" + c[1:]) - F.col(c)).alias("s" + c[1:])
                    for c in ("fn", "f1", "f2", "f11", "f12",
                              "f22", "fy", "f1y", "f2y")]))
    # complement moment names: sn s1 s2 s11 s12 s22 sy s1y s2y

    def det3(a, b, c, d, e, f, g, h, i):
        return (a * (e * i - f * h) - b * (d * i - f * g)
                + c * (d * h - e * g))

    n, s1, s2 = F.col("sn"), F.col("s1"), F.col("s2")
    s11, s12, s22 = F.col("s11"), F.col("s12"), F.col("s22")
    sy, s1y, s2y = F.col("sy"), F.col("s1y"), F.col("s2y")
    d = det3(n, s1, s2, s1, s11, s12, s2, s12, s22)
    d0 = det3(sy, s1, s2, s1y, s11, s12, s2y, s12, s22)
    d1 = det3(n, sy, s2, s1, s1y, s12, s2, s2y, s22)
    d2 = det3(n, s1, sy, s1, s11, s1y, s2, s12, s2y)
    nonsing = d != F.lit(0).cast(dec)
    betas = tr.select(
        "fold", F.col("sn").cast("bigint").alias("n_train"),
        F.when(nonsing, F.round(d0.cast("double") / d.cast("double"), 9))
         .alias("beta0"),
        F.when(nonsing, F.round(d1.cast("double") / d.cast("double"), 9))
         .alias("beta_x1"),
        F.when(nonsing, F.round(d2.cast("double") / d.cast("double"), 9))
         .alias("beta_x2"))
    scored = (base.join(F.broadcast(betas), "fold")
              .withColumn("__r", F.expr(CONFORMAL_RESID_SQL)))
    return (scored.groupBy("fold", "n_train", "beta0", "beta_x1",
                           "beta_x2")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_test"),
                 F.sum(F.col("__r").cast(dec)).alias("__sr"),
                 F.sum(F.col("__r").cast(dec) * F.col("__r"))
                 .alias("__sr2"))
            .select("fold", "n_train", "n_test",
                    "beta0", "beta_x1", "beta_x2",
                    F.expr("CAST(__sr DIV n_test AS BIGINT)")
                    .alias("mae_cents"),
                    F.expr("CAST(__sr2 DIV n_test AS BIGINT)")
                    .alias("mse_cents2")))
