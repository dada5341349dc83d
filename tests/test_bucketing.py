"""Bucketed co-located joins: the zero-shuffle fact-fact join layout.

At 100 TB the one shuffle the big TPC-H shapes keep (lineitem ⋈ orders
on orderkey) is itself avoidable if both tables are WRITTEN bucketed on
the join key: Spark's bucketed scan exposes the hash distribution, the
join planner sees both sides pre-partitioned, and the SortMergeJoin
runs with NO Exchange on either side. These tests pin that plan shape
on real bucketed tables so the layout recipe in SURVEY.md's scale plan
is demonstrated, not asserted.
"""

from __future__ import annotations

import contextlib
import io

import pytest
from pyspark.sql import functions as F


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


@pytest.fixture(scope="module")
def bucketed_pair(spark):
    # saveAsTable writes to the session's (static) warehouse dir; the
    # managed tables are dropped — and their files deleted — on teardown
    facts = spark.range(0, 50_000).select(
        F.col("id").alias("k"), (F.col("id") % 97).alias("v"))
    dims = spark.range(0, 5_000).select(
        F.col("id").alias("k"), (F.col("id") % 7).alias("grp"))
    for name, df in [("b_facts", facts), ("b_dims", dims)]:
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        (df.write.bucketBy(8, "k").sortBy("k")
         .mode("overwrite").saveAsTable(name))
    yield "b_facts", "b_dims"
    for name in ("b_facts", "b_dims"):
        spark.sql(f"DROP TABLE IF EXISTS {name}")


def test_bucketed_join_has_no_exchange(spark, bucketed_pair):
    f, d = bucketed_pair
    # disable broadcast so the join would otherwise shuffle both sides
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = spark.table(f).join(spark.table(d), "k")
        plan = _plan(joined)
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, (
            "bucketed-on-key join must not shuffle either side")
        assert joined.count() == 5_000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_aggregate_skips_exchange(spark, bucketed_pair):
    f, _ = bucketed_pair
    agg = spark.table(f).groupBy("k").agg(F.sum("v").alias("s"))
    plan = _plan(agg)
    assert "Exchange" not in plan, (
        "groupBy on the bucket key must reuse the write-time hash "
        "distribution")
    assert agg.count() == 50_000
