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

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


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
