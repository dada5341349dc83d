"""Streaming/batch equivalence: the same windowed aggregation computed
by Structured Streaming micro-batches (complete mode) must equal the
one-shot batch computation — the strongest correctness statement the
streaming layer can make without a DuckDB oracle."""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from event_streaming_service_spark.sources import tables
from event_streaming_service_spark.streaming import pipeline as sp


@pytest.fixture()
def tmpdir():
    d = tempfile.mkdtemp(prefix="ess-eq-")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_streaming_tumbling_equals_batch(spark, sf_smoke, tmpdir):
    src = f"{tmpdir}/src"
    ev = tables.load_table(spark, sf_smoke, "events")
    # several files -> several micro-batches -> real incremental state
    ev.repartition(4).write.mode("overwrite").parquet(src)

    stream = sp.read_event_stream(spark, src, max_files_per_trigger=1)
    agg = (stream.groupBy(F.window("ts", "1 hour"), F.col("event_type"))
           .agg(F.count("*").alias("n"))
           .select(F.col("window.start").alias("ws"), "event_type", "n"))
    q = (agg.writeStream.outputMode("complete").format("memory")
         .queryName("eq_stream").trigger(availableNow=True).start())
    q.awaitTermination(180)
    got = {(r.ws, r.event_type): r.n
           for r in spark.sql("SELECT * FROM eq_stream").collect()}

    batch = (ev.groupBy(F.window("ts", "1 hour"), F.col("event_type"))
             .agg(F.count("*").alias("n"))
             .select(F.col("window.start").alias("ws"), "event_type", "n"))
    want = {(r.ws, r.event_type): r.n for r in batch.collect()}
    assert got == want


def test_streaming_session_equals_batch_sessionize(spark, sf_smoke, tmpdir):
    """Native streaming session_window vs the batch gaps-and-islands
    operator: same session count and total events per user."""
    src = f"{tmpdir}/src"
    ev = tables.load_table(spark, sf_smoke, "events")
    ev.coalesce(1).write.mode("overwrite").parquet(src)

    stream = sp.read_event_stream(spark, src)
    agg = (stream.groupBy(F.session_window("ts", "30 minutes"),
                          F.col("user_id"))
           .agg(F.count("*").alias("n")))
    q = (agg.writeStream.outputMode("complete").format("memory")
         .queryName("eq_sess").trigger(availableNow=True).start())
    q.awaitTermination(180)
    got = (spark.sql("SELECT user_id, count(*) sessions, sum(n) events "
                     "FROM eq_sess GROUP BY user_id"))
    got_map = {r.user_id: (r.sessions, r.events) for r in got.collect()}

    from event_streaming_service_spark.operators import windows

    batch = windows.sessionize(ev, "user_id", "ts", 1_800_000, "event_id")
    want = (batch.groupBy("user_id")
            .agg(F.count("*").alias("sessions"),
                 F.sum("n_events").alias("events")))
    want_map = {r.user_id: (r.sessions, r.events) for r in want.collect()}
    assert got_map == want_map


def test_streaming_interval_join_equals_batch(spark, sf_smoke, tmpdir):
    """Stream-stream inner interval join (view -> purchase funnel) must
    emit exactly the batch join's matches on a static, time-ordered
    source: inner joins emit on arrival of the later side, and the
    watermark only bounds state. Multi-file source so the two sides
    really cross micro-batch boundaries (a view in batch 1 matched by a
    purchase in batch 2 exercises buffered join state)."""
    import os

    src = f"{tmpdir}/src"
    ev = tables.load_table(spark, sf_smoke, "events")
    ev.orderBy("ts").coalesce(3).write.mode("overwrite").parquet(src)
    parts = [os.path.join(src, f) for f in sorted(os.listdir(src))
             if f.startswith("part-") and not f.endswith(".crc")]
    base = max(os.stat(p).st_mtime for p in parts)
    for i, p in enumerate(parts):  # pin processing order = time order
        os.utime(p, (base + i + 1, base + i + 1))

    def views(df):
        return (df.filter(F.col("event_type") == "view")
                .select(F.col("user_id"), F.col("event_id").alias("view_id"),
                        F.col("ts").alias("view_ts")))

    def purchases(df):
        return (df.filter(F.col("event_type") == "purchase")
                .select(F.col("user_id"), F.col("event_id").alias("buy_id"),
                        F.col("ts").alias("buy_ts")))

    stream = sp.read_event_stream(spark, src, max_files_per_trigger=1)
    joined = sp.interval_join(
        views(stream), purchases(stream), "user_id",
        "view_ts", "buy_ts", within="1 hour")
    out = joined.select("l.view_id", "r.buy_id")
    q = (out.writeStream.outputMode("append").format("memory")
         .queryName("eq_join").trigger(availableNow=True).start())
    q.awaitTermination(180)
    got = {(r.view_id, r.buy_id)
           for r in spark.sql("SELECT * FROM eq_join").collect()}

    v, p = views(ev).alias("l"), purchases(ev).alias("r")
    want = {(r.view_id, r.buy_id) for r in v.join(
        p, (F.col("l.user_id") == F.col("r.user_id"))
        & (F.col("r.buy_ts") >= F.col("l.view_ts"))
        & (F.col("r.buy_ts") <= F.col("l.view_ts") + F.expr("INTERVAL 1 hour")),
        "inner").select("l.view_id", "r.buy_id").collect()}
    assert len(want) > 0
    assert got == want


def test_streaming_interval_join_outer_emission_rule(spark, sf_smoke, tmpdir):
    """Left-outer interval join: matched rows equal the batch join;
    null-padded rows appear EXACTLY for unmatched left rows whose state
    the final watermark evicted (left_ts + within < max event time -
    delay) — rows near the stream tail stay buffered and must NOT
    emit. Multi-batch source so eviction happens across batches."""
    import os

    src = f"{tmpdir}/srco"
    ev = tables.load_table(spark, sf_smoke, "events")
    ev.orderBy("ts").coalesce(3).write.mode("overwrite").parquet(src)
    parts = [os.path.join(src, f) for f in sorted(os.listdir(src))
             if f.startswith("part-") and not f.endswith(".crc")]
    base = max(os.stat(p).st_mtime for p in parts)
    for i, p in enumerate(parts):
        os.utime(p, (base + i + 1, base + i + 1))

    def views(df):
        return (df.filter(F.col("event_type") == "view")
                .select("user_id", F.col("event_id").alias("view_id"),
                        F.col("ts").alias("view_ts")))

    def purchases(df):
        return (df.filter(F.col("event_type") == "purchase")
                .select("user_id", F.col("event_id").alias("buy_id"),
                        F.col("ts").alias("buy_ts")))

    stream = sp.read_event_stream(spark, src, max_files_per_trigger=1)
    joined = sp.interval_join(
        views(stream), purchases(stream), "user_id",
        "view_ts", "buy_ts", within="1 hour", how="leftOuter")
    out = joined.select("l.view_id", "r.buy_id")
    q = (out.writeStream.outputMode("append").format("memory")
         .queryName("eq_join_o").trigger(availableNow=True).start())
    q.awaitTermination(180)
    got = spark.sql("SELECT * FROM eq_join_o")
    got_matched = {(r.view_id, r.buy_id)
                   for r in got.filter("buy_id IS NOT NULL").collect()}
    got_null = {r.view_id for r in got.filter("buy_id IS NULL").collect()}

    v, p = views(ev).alias("l"), purchases(ev).alias("r")
    cond = ((F.col("l.user_id") == F.col("r.user_id"))
            & (F.col("r.buy_ts") >= F.col("l.view_ts"))
            & (F.col("r.buy_ts") <= F.col("l.view_ts")
               + F.expr("INTERVAL 1 HOUR")))
    want_matched = {(r.view_id, r.buy_id)
                    for r in v.join(p, cond).select("view_id", "buy_id")
                    .collect()}
    assert got_matched == want_matched

    wm_ms = (ev.agg(F.max(F.unix_millis(F.col("ts").cast("timestamp"))))
             .collect()[0][0] - 3_600_000)
    unmatched = v.join(p, cond, "left_anti")
    want_null = {r.view_id for r in unmatched.filter(
        F.unix_millis(F.col("view_ts").cast("timestamp"))
        + 3_600_000 < wm_ms).collect()}
    assert got_null == want_null


def test_streaming_ewma_state_crosses_microbatches(spark, tmpdir):
    """The EWMA fold must CONTINUE across micro-batch boundaries, not
    restart: a crafted 3-file time-ordered source where each file holds
    one event per user; the third smoothed value reflects all three."""
    import os
    from datetime import datetime

    from event_streaming_service_spark.streaming import stateful

    src = f"{tmpdir}/src"
    os.makedirs(src, exist_ok=True)
    rows_by_file = [
        [(1, datetime(2024, 1, 1, 10), 8.0), (2, datetime(2024, 1, 1, 10), 4.0)],
        [(1, datetime(2024, 1, 1, 11), 4.0)],
        [(1, datetime(2024, 1, 1, 12), 2.0), (2, datetime(2024, 1, 1, 12), 8.0)],
    ]
    for i, rows in enumerate(rows_by_file):
        df = spark.createDataFrame(
            [(100 + i * 10 + j, ts, u, "view", v, "{}")
             for j, (u, ts, v) in enumerate(rows)],
            "event_id long, ts timestamp, user_id long, event_type string,"
            " value double, props string")
        part = f"{src}/f{i}"
        df.coalesce(1).write.mode("overwrite").parquet(part)
        # move the parquet up so the dir is a flat file-stream source
        for fn in os.listdir(part):
            if fn.startswith("part-"):
                os.replace(f"{part}/{fn}", f"{src}/data-{i}.parquet")
        import shutil
        shutil.rmtree(part)
        os.utime(f"{src}/data-{i}.parquet", (1700000000 + i, 1700000000 + i))

    stream = sp.read_event_stream(spark, src, max_files_per_trigger=1)
    q = (stateful.ewma_stream(stream, 0.5)
         .writeStream.outputMode("append").format("memory")
         .queryName("eq_ewma").trigger(availableNow=True).start())
    q.awaitTermination(180)
    got = {(r.user_id, r.ts): r.ewma
           for r in spark.sql("SELECT * FROM eq_ewma").collect()}
    # u1: 8 -> 0.5*4+0.5*8=6 -> 0.5*2+0.5*6=4 ; u2: 4 -> 0.5*8+0.5*4=6
    assert got == {
        (1, datetime(2024, 1, 1, 10)): 8.0,
        (1, datetime(2024, 1, 1, 11)): 6.0,
        (1, datetime(2024, 1, 1, 12)): 4.0,
        (2, datetime(2024, 1, 1, 10)): 4.0,
        (2, datetime(2024, 1, 1, 12)): 6.0,
    }
