"""Streaming-layer queries exposed through the driver contract.

Each runs a real Structured Streaming query synchronously
(trigger(availableNow) + memory sink) over a file-stream copy of the
events fixture and returns the materialized result. Streaming output
depends on watermark-closed state (append mode emits only finalized
windows), which no batch SQL can replicate — so these are rows-only
checks; the batch twins (window_queries.py) carry the value oracles.
"""

from __future__ import annotations

import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession

from event_streaming_service_spark.queries import register
from event_streaming_service_spark.sources import tables
from event_streaming_service_spark.streaming import pipeline as sp


def _run_stream(spark: SparkSession, sf_dir: str, transform, name: str) -> DataFrame:
    tmp = tempfile.mkdtemp(prefix=f"ess-{name}-")
    src = f"{tmp}/src"
    tables.load_table(spark, sf_dir, "events").coalesce(2) \
        .write.mode("overwrite").parquet(src)
    sink = f"{name}_{uuid.uuid4().hex[:8]}"
    q = (transform(sp.read_event_stream(spark, src))
         .writeStream.outputMode("append").format("memory")
         .queryName(sink).trigger(availableNow=True).start())
    q.awaitTermination(300)
    return spark.table(sink)


@register("streaming_tumbling_counts", oracle=None,
          tags=("W1", "W8", "streaming"))
def q_streaming_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W8 native tumbling windows + watermark, driven as micro-batches."""
    return _run_stream(spark, sf_dir,
                       lambda s: sp.tumbling_counts(s, "1 hour", "30 minutes"),
                       "tumbling")


@register("streaming_dedup", oracle=None, tags=("D1", "W4", "streaming"))
def q_streaming_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W4 dropDuplicatesWithinWatermark over the event stream."""
    return _run_stream(spark, sf_dir, sp.dedup_stream, "dedup")


@register("streaming_continuous_rollup", oracle=None,
          tags=("W8", "W9", "rollup", "streaming"))
def q_streaming_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incrementally-maintained daily rollup (hypertable-style
    continuous aggregate): per-batch partial aggregation + per-window
    partition overwrite; equality with the batch recomputation is
    pytest-checked (tests/test_rollup.py)."""
    import tempfile

    from event_streaming_service_spark.streaming import rollup

    tmp = tempfile.mkdtemp(prefix="ess-rollup-q-")
    src = f"{tmp}/src"
    tables.load_table(spark, sf_dir, "events").coalesce(2) \
        .write.mode("overwrite").parquet(src)
    q = rollup.start_continuous_rollup(
        sp.read_event_stream(spark, src, max_files_per_trigger=1),
        f"{tmp}/rollup", f"{tmp}/ckpt")
    q.awaitTermination(300)
    return rollup.read_rollup(spark, f"{tmp}/rollup")
