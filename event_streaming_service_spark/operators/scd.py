"""SCD2 / CDC merge emulation (MERGE INTO without Delta).

The engine's tables are plain parquet, so upserts are expressed as the
classic anti-join + union: unchanged rows pass through, matched rows
are closed (valid_to stamped) and re-inserted with the new values.
Everything is deterministic column logic — oracle-checkable — and the
plan is one broadcast/hash join + union, no row-at-a-time merge loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# sentinel "open row" date; kept inside pandas' datetime64[ns] range
# (9999-12-31 overflows Arrow us->ns conversion at collect time)
FAR_FUTURE = "2200-01-01 00:00:00"


def scd2_apply(current: DataFrame, updates: DataFrame, key: str,
               tracked_cols: list[str], effective_ts: str) -> DataFrame:
    """Apply a batch of updates to an SCD2 dimension.

    `current` rows carry (key, tracked..., valid_from, valid_to); open
    rows have valid_to = FAR_FUTURE. `updates` carries (key, tracked...).
    Matched open rows close at effective_ts and a new open version is
    appended; unmatched rows pass through untouched.
    """
    eff = F.lit(effective_ts).cast("timestamp")
    upd = F.broadcast(updates)

    unmatched = current.join(upd.select(key), key, "left_anti")
    closed = (
        current.join(upd.select(key), key, "left_semi")
        .filter(F.col("valid_to") == F.lit(FAR_FUTURE).cast("timestamp"))
        .withColumn("valid_to", eff))
    still_closed = (
        current.join(upd.select(key), key, "left_semi")
        .filter(F.col("valid_to") != F.lit(FAR_FUTURE).cast("timestamp")))
    opened = (
        updates
        .withColumn("valid_from", eff)
        .withColumn("valid_to", F.lit(FAR_FUTURE).cast("timestamp"))
        .select(key, *tracked_cols, "valid_from", "valid_to"))
    return (unmatched.select(key, *tracked_cols, "valid_from", "valid_to")
            .unionByName(closed.select(key, *tracked_cols,
                                       "valid_from", "valid_to"))
            .unionByName(still_closed.select(key, *tracked_cols,
                                             "valid_from", "valid_to"))
            .unionByName(opened))


def snapshot_asof(dim: DataFrame, at_ts: str,
                  ts_from: str = "valid_from",
                  ts_to: str = "valid_to") -> DataFrame:
    """Point-in-time read of an SCD2 dimension: the version whose
    [valid_from, valid_to) interval covers `at_ts` — the AS OF query
    that makes the versioned history useful (reproduce yesterday's
    report, join facts to the dimension AS IT WAS). Half-open
    semantics: a version closing exactly at `at_ts` is already
    superseded (its replacement opens at the same instant).

    Plan: a pushed-down double range filter on the scan — no join, no
    window; at 100 TB this prunes to ~one version per key by the same
    predicate the storage layout can zone-map on."""
    at = F.lit(at_ts).cast("timestamp")
    return dim.where((F.col(ts_from) <= at) & (F.col(ts_to) > at))
