"""Join family J1-J5 generalized (SURVEY.md section 2.6).

Every join in the reference is a keyed lookup/merge over small state
(lag join J1, schema-subject lookup J2, group-subscription semi-join J3,
timestamp->offset as-of resolution J4, tenant enrichment J5). The driver
suite generalizes them over the star schema: inner/left/full/semi/anti
equi-joins, range (interval) join, and as-of join.

Scale strategy per shape:
  * dimension joins -> broadcast hash join (F.broadcast on the small
    side; Catalyst already picks BHJ below the threshold, the hint makes
    intent explicit and survives stats drift);
  * fact-fact equi-joins -> sort-merge with AQE skew splitting;
  * as-of -> the union+window trick below: ONE shuffle on (key), no
    per-row lookup, no cross product — survives arbitrarily large sides;
  * range join -> broadcast the (small) interval table and let the
    BETWEEN predicate run as a broadcast nested-loop; if both sides are
    big, bucketize the range key first (not needed for these fixtures).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def broadcast_enrich(facts: DataFrame, dim: DataFrame, on: list[str] | Column,
                     how: str = "left") -> DataFrame:
    """J5: stream/fact enrichment against a small dimension
    (consumer/TenantEventConsumer.java:42-58) — always broadcast."""
    return facts.join(F.broadcast(dim), on, how)


def semi(subscribers: DataFrame, topics: DataFrame, on: list[str] | Column) -> DataFrame:
    """J3: 'groups subscribed to topic' anyMatch
    (TopicManagementService.java:689-718) -> left_semi."""
    return subscribers.join(topics, on, "left_semi")


def anti(all_rows: DataFrame, present: DataFrame, on: list[str] | Column) -> DataFrame:
    """NOT EXISTS — the complement used for DLQ/missed detection."""
    return all_rows.join(present, on, "left_anti")


def asof_join(left: DataFrame, right: DataFrame, key: str,
              left_time: str, right_time: str,
              right_payload: list[str]) -> DataFrame:
    """J4 generalized: for each left row, the latest right row with
    right_time <= left_time within the same key (the reference's
    offsetsForTimes resolution, EventReplayService.java:71-88, inverted
    to 'last state as of').

    Implementation: tag both sides, union, then one window pass per key
    ordered by (time, side) carrying the last-seen right payload forward.
    Right rows sort before left rows at equal time, so `<=` semantics
    hold. Cost: ONE shuffle on key + a sort — no range explosion, no
    driver loop; this is the canonical scale-safe as-of on Spark.

    Right side must be unique per (key, right_time) for determinism —
    pre-aggregate it if not.
    """
    lcols = left.columns
    tagged_left = left.select(
        F.col(key).alias("__k"), F.col(left_time).alias("__t"),
        F.lit(1).alias("__is_left"),
        *[F.col(c) for c in lcols],
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}")
          for c in right_payload],
    )
    tagged_right = right.select(
        F.col(key).alias("__k"), F.col(right_time).alias("__t"),
        F.lit(0).alias("__is_left"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols],
        *[F.col(c).alias(f"__r_{c}") for c in right_payload],
    )
    w = (Window.partitionBy("__k").orderBy("__t", "__is_left")
         .rowsBetween(Window.unboundedPreceding, 0))
    merged = tagged_left.unionByName(tagged_right)
    for c in right_payload:
        merged = merged.withColumn(
            f"__last_{c}", F.last(f"__r_{c}", ignorenulls=True).over(w))
    return (
        merged.filter(F.col("__is_left") == 1)
        .select(*lcols,
                *[F.col(f"__last_{c}").alias(f"asof_{c}") for c in right_payload])
    )


def range_join(facts: DataFrame, intervals: DataFrame, value: Column,
               lo: Column, hi: Column, how: str = "inner") -> DataFrame:
    """Interval join `value BETWEEN lo AND hi`; broadcast the interval
    side (it is small by construction — bands, windows, calendars)."""
    return facts.join(F.broadcast(intervals), (value >= lo) & (value <= hi), how)


def latest_per_key(df: DataFrame, key_cols: list[str],
                   order_cols: list[Column]) -> DataFrame:
    """A9: latest-version-per-subject (SchemaRegistryService.java:110-121)
    generalized: deterministic top-1 per key."""
    w = Window.partitionBy(*key_cols).orderBy(*order_cols)
    return (df.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1).drop("__rn"))
