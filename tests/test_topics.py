"""Topic-catalog tests (S8-S10): CRUD, bootstrap, publish/scan round
trip with per-key partition locality, describe, retention."""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from event_streaming_service_spark.sources import topics as tp


@pytest.fixture()
def catalog(spark):
    d = tempfile.mkdtemp(prefix="ess-topics-")
    yield tp.TopicCatalog(spark, d)
    shutil.rmtree(d, ignore_errors=True)


def test_create_list_filters_internal_and_sorts(catalog):
    catalog.bootstrap_defaults()
    catalog.create(tp.TopicConfig("_internal.metrics"))
    names = catalog.list()
    assert names == sorted(names)
    assert all(not n.startswith("_") for n in names)
    assert "_internal.metrics" in catalog.list(include_internal=True)
    # create-if-not-exists swallows duplicates, strict mode raises
    catalog.create(tp.TopicConfig("nnipa.events.tenant"))
    with pytest.raises(FileExistsError):
        catalog.create(tp.TopicConfig("nnipa.events.tenant"), exist_ok=False)


def test_default_retentions_match_reference(catalog):
    catalog.bootstrap_defaults()
    assert catalog.config("nnipa.events.tenant").retention_ms == 7 * 86400_000
    assert catalog.config("nnipa.events.audit").retention_ms == 28 * 86400_000
    assert catalog.config("nnipa.dlq.events").retention_ms == 14 * 86400_000
    assert catalog.config("nnipa.dlq.events").partitions == 3


def test_publish_scan_roundtrip_same_key_same_partition(spark, catalog):
    catalog.create(tp.TopicConfig("t1", partitions=4))
    df = spark.createDataFrame(
        [(f"k{i % 3}", i) for i in range(60)], "key string, v long")
    catalog.publish(df, "t1")
    back = catalog.scan("t1")
    assert back.count() == 60
    # same key never lands on two partitions
    spread = (back.groupBy("key")
              .agg(F.countDistinct("partition").alias("np")).collect())
    assert all(r.np == 1 for r in spread)


def test_describe_and_alter(spark, catalog):
    catalog.create(tp.TopicConfig("t2", partitions=2))
    df = spark.createDataFrame([(f"k{i}", i) for i in range(10)],
                               "key string, v long")
    catalog.publish(df, "t2")
    d = catalog.describe("t2")
    assert d["total_messages"] == 10 and d["partitions"] == 2
    catalog.alter("t2", retention_ms=1234)
    assert catalog.config("t2").retention_ms == 1234
    with pytest.raises(KeyError):
        catalog.alter("t2", nonsense=1)


def test_retention_drops_old_rows(spark, catalog):
    catalog.create(tp.TopicConfig("t3", partitions=2, retention_ms=3600_000))
    df = spark.createDataFrame(
        [("a", "2024-01-01 00:00:00"), ("b", "2024-01-01 12:00:00")],
        "key string, ts_s string") \
        .withColumn("ts", F.col("ts_s").cast("timestamp")).drop("ts_s")
    catalog.publish(df, "t3")
    # now = 12:30 -> 1h retention keeps only the 12:00 row
    import datetime as dt

    now_ms = int(dt.datetime(2024, 1, 1, 12, 30).timestamp() * 1000)
    kept = catalog.apply_retention("t3", now_ms)
    assert kept == 1


def test_delete_removes_topic(spark, catalog):
    catalog.create(tp.TopicConfig("t4"))
    assert "t4" in catalog.list()
    catalog.delete("t4")
    assert "t4" not in catalog.list()


def test_publish_assigns_dense_continuing_offsets(spark, catalog):
    catalog.create(tp.TopicConfig("log1", partitions=2))
    df1 = spark.createDataFrame([(f"k{i}", i) for i in range(10)],
                                "key string, v long")
    catalog.publish(df1, "log1", order_col="v")
    df2 = spark.createDataFrame([(f"k{i}", 100 + i) for i in range(6)],
                                "key string, v long")
    catalog.publish(df2, "log1", order_col="v")
    back = catalog.scan("log1")
    assert back.count() == 16
    # offsets dense 0..n-1 within each partition, no gaps or dups
    per = (back.groupBy("partition")
           .agg(F.count("*").alias("n"), F.min("offset").alias("lo"),
                F.max("offset").alias("hi"),
                F.countDistinct("offset").alias("d")).collect())
    for r in per:
        assert (r.lo, r.hi, r.d) == (0, r.n - 1, r.n)


def test_commit_offsets_and_lag(spark, catalog):
    catalog.create(tp.TopicConfig("log2", partitions=2))
    df = spark.createDataFrame([(f"k{i}", i) for i in range(12)],
                               "key string, v long")
    catalog.publish(df, "log2", order_col="v")
    sizes = {int(r.partition): r.n for r in
             catalog.scan("log2").groupBy("partition")
             .agg(F.count("*").alias("n")).collect()}
    catalog.commit_offsets("g1", "log2", {p: 1 for p in sizes})
    lag = {int(r.partition): r.lag for r in
           catalog.consumer_lag("log2").collect()}
    assert lag == {p: n - 1 for p, n in sizes.items()}
    assert "log2" in catalog.list()          # group keys are not topics
    assert all(not n.startswith("__group") for n in catalog.list(True))
