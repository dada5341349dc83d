"""Continuous-rollup tests: the incrementally-maintained table must
equal the one-shot batch recomputation, and re-running with the same
checkpoint must not change it (idempotent-by-window)."""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from event_streaming_service_spark.functions.money import cents
from event_streaming_service_spark.sources import tables
from event_streaming_service_spark.streaming import pipeline as sp
from event_streaming_service_spark.streaming import rollup


@pytest.fixture()
def tmpdir():
    d = tempfile.mkdtemp(prefix="ess-rollup-")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _batch_truth(ev):
    from event_streaming_service_spark.functions.scalars import (
        millis_to_ts,
        wall_clock_millis,
    )

    ms = wall_clock_millis(F.col("ts"))
    day = millis_to_ts((ms / rollup.DAY_MS).cast("bigint") * rollup.DAY_MS)
    return (ev.groupBy(day.alias("window_start"), "event_type")
            .agg(F.count("*").alias("n"),
                 F.sum(cents("value")).alias("value_cents")))


def test_incremental_rollup_equals_batch(spark, sf_smoke, tmpdir):
    src = f"{tmpdir}/src"
    ev = tables.load_table(spark, sf_smoke, "events")
    # 4 files -> 4 micro-batches: windows get updated incrementally
    ev.repartition(4).write.mode("overwrite").parquet(src)
    q = rollup.start_continuous_rollup(
        sp.read_event_stream(spark, src, max_files_per_trigger=1),
        f"{tmpdir}/rollup", f"{tmpdir}/ckpt")
    q.awaitTermination(180)

    got = {(r.window_start, r.event_type): (r.n, r.value_cents)
           for r in rollup.read_rollup(spark, f"{tmpdir}/rollup").collect()}
    want = {(r.window_start, r.event_type): (r.n, r.value_cents)
            for r in _batch_truth(ev).collect()}
    assert got == want


def test_rollup_replayed_batches_do_not_double_count(spark, sf_smoke, tmpdir):
    """Failure after the parquet write but before the checkpoint commit
    replays the micro-batch. Deleting the checkpoint replays EVERY batch
    over the already-written output — the worst case of that scenario —
    and the totals must not change (the old additive merge doubled them)."""
    src = f"{tmpdir}/src"
    ev = tables.load_table(spark, sf_smoke, "events")
    ev.repartition(3).write.mode("overwrite").parquet(src)
    for _ in range(2):
        q = rollup.start_continuous_rollup(
            sp.read_event_stream(spark, src, max_files_per_trigger=1),
            f"{tmpdir}/rollup", f"{tmpdir}/ckpt")
        q.awaitTermination(180)
        shutil.rmtree(f"{tmpdir}/ckpt")  # lose the commit -> full replay
    total = (rollup.read_rollup(spark, f"{tmpdir}/rollup")
             .agg(F.sum("n").alias("s")).first().s)
    assert total == ev.count()


def test_rollup_compaction_preserves_view(spark, sf_smoke, tmpdir):
    src = f"{tmpdir}/src"
    ev = tables.load_table(spark, sf_smoke, "events")
    ev.repartition(3).write.mode("overwrite").parquet(src)
    q = rollup.start_continuous_rollup(
        sp.read_event_stream(spark, src, max_files_per_trigger=1),
        f"{tmpdir}/rollup", f"{tmpdir}/ckpt")
    q.awaitTermination(180)
    before = sorted((r.window_start, r.event_type, r.n, r.value_cents)
                    for r in rollup.read_rollup(spark, f"{tmpdir}/rollup").collect())
    rollup.compact_rollup(spark, f"{tmpdir}/rollup")
    after = sorted((r.window_start, r.event_type, r.n, r.value_cents)
                   for r in rollup.read_rollup(spark, f"{tmpdir}/rollup").collect())
    assert before == after


def test_rollup_restart_is_idempotent(spark, sf_smoke, tmpdir):
    src = f"{tmpdir}/src"
    ev = tables.load_table(spark, sf_smoke, "events")
    ev.coalesce(2).write.mode("overwrite").parquet(src)
    for _ in range(2):  # second run: checkpoint shows nothing new
        q = rollup.start_continuous_rollup(
            sp.read_event_stream(spark, src),
            f"{tmpdir}/rollup", f"{tmpdir}/ckpt")
        q.awaitTermination(180)
    total = (rollup.read_rollup(spark, f"{tmpdir}/rollup")
             .agg(F.sum("n").alias("s")).first().s)
    assert total == ev.count()
