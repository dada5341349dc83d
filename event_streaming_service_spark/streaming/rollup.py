"""Continuous aggregates: incrementally-maintained rollup tables.

The "hypertable rollup" pattern: a daily (or hourly) aggregate table
maintained incrementally as micro-batches arrive, instead of
recomputing the whole history. Each foreachBatch:

  1. aggregates ONLY the new batch to per-window partials,
  2. determines which windows the batch touched,
  3. re-aggregates just those windows from (existing partials + new
     partials) and overwrites their partitions.

Writes are partitioned by window and replaced per window
(partitionOverwriteMode=dynamic), so a replayed batch converges to the
same state — idempotent like the W9 sinks. At 100 TB the work per
trigger is proportional to the data ARRIVING, not the table size; old
windows are never touched once their data stops arriving (late data
within the watermark updates exactly the windows it lands in).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from event_streaming_service_spark.functions.money import cents

DAY_MS = 86_400_000


def _window_partials(batch: DataFrame) -> DataFrame:
    """Per-(day, event_type) partial aggregates of one micro-batch."""
    from event_streaming_service_spark.functions.scalars import (
        millis_to_ts,
        wall_clock_millis,
    )

    ms = wall_clock_millis(F.col("ts"))
    day = millis_to_ts((ms / DAY_MS).cast("bigint") * DAY_MS)
    return (batch.groupBy(day.alias("window_start"), F.col("event_type"))
            .agg(F.count("*").alias("n"),
                 F.sum(cents("value")).alias("value_cents")))


def start_continuous_rollup(stream: DataFrame, rollup_dir: str,
                            checkpoint_dir: str) -> StreamingQuery:
    """Maintain `rollup_dir` (partitioned by window_start) incrementally."""

    def update(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        new_partials = _window_partials(batch).cache()
        touched = [r.window_start for r in
                   new_partials.select("window_start").distinct().collect()]
        if not touched:
            return
        try:
            existing = spark.read.parquet(rollup_dir).filter(
                F.col("window_start").isin(touched))
        except Exception:
            existing = None
        merged = new_partials if existing is None else (
            existing.unionByName(new_partials)
            .groupBy("window_start", "event_type")
            .agg(F.sum("n").alias("n"),
                 F.sum("value_cents").alias("value_cents")))
        prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try:
            (merged.write.mode("overwrite").partitionBy("window_start")
             .parquet(rollup_dir))
        finally:
            spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)

    return (stream.writeStream.foreachBatch(update)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True).start())


def read_rollup(spark: SparkSession, rollup_dir: str) -> DataFrame:
    return spark.read.parquet(rollup_dir)
