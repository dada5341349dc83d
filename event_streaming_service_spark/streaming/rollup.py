"""Continuous aggregates: incrementally-maintained rollup tables.

The "hypertable rollup" pattern: a daily (or hourly) aggregate table
maintained incrementally as micro-batches arrive, instead of
recomputing the whole history. Each foreachBatch:

  1. aggregates ONLY the new batch to per-window partials,
  2. writes those partials under (window_start, batch_id) partitions
     with dynamic partition overwrite.

Because the partials are scoped by batch_id, a replayed micro-batch
(failure after the parquet write but before the checkpoint commit)
overwrites exactly its OWN previous partitions and nothing else — the
merge is idempotent by construction, never additive, so no batch can be
double-counted. This is stronger than a read-merge-overwrite loop,
whose replay would re-merge partials that the crashed attempt already
merged.

`read_rollup` folds the partials with a final (tiny) aggregate; counts
and sums are associative so partial + final equals the one-shot batch
aggregate. `compact_rollup` periodically collapses the accumulated
partials back to one row per window (same policy as any log-structured
aggregate table). At 100 TB the work per trigger is proportional to the
data ARRIVING, not the table size; old windows are never touched once
their data stops arriving.
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
    """Maintain `rollup_dir` (partitioned by window_start, batch_id)
    incrementally; idempotent under micro-batch replay (see module doc)."""

    def update(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        partials = (_window_partials(batch)
                    .withColumn("batch_id", F.lit(batch_id)))
        prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try:
            # dynamic overwrite replaces only the (window, batch_id)
            # partitions present in THIS batch: replay of batch N swaps
            # in an identical copy of its own output — never a re-merge
            (partials.write.mode("overwrite")
             .partitionBy("window_start", "batch_id")
             .parquet(rollup_dir))
        finally:
            spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)

    return (stream.writeStream.foreachBatch(update)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True).start())


def _fold(partials: DataFrame) -> DataFrame:
    return (partials.groupBy("window_start", "event_type")
            .agg(F.sum("n").alias("n"),
                 F.sum("value_cents").alias("value_cents")))


def read_rollup(spark: SparkSession, rollup_dir: str) -> DataFrame:
    """The rollup view: final fold over per-batch partials. The fold
    groups on the partition column, so partition pruning still serves
    single-window reads before the (tiny) aggregate."""
    return _fold(spark.read.parquet(rollup_dir))


def compact_rollup(spark: SparkSession, rollup_dir: str) -> None:
    """Collapse accumulated partials to one row per (window, type),
    re-tagged as batch_id=-1 partitions. Run between triggers (the
    single-writer maintenance window, like any log-structured table's
    compaction); readers see the same fold before and after."""
    compacted = (_fold(spark.read.parquet(rollup_dir))
                 .withColumn("batch_id", F.lit(-1)))
    tmp = rollup_dir.rstrip("/") + "_compact_tmp"
    (compacted.write.mode("overwrite")
     .partitionBy("window_start", "batch_id").parquet(tmp))
    import shutil

    shutil.rmtree(rollup_dir)
    shutil.move(tmp, rollup_dir)
