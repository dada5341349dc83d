"""Interleaved A/B of hits broadcast_scores at sf0.1 (bench shape)."""
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from event_streaming_service_spark.operators import graph
from event_streaming_service_spark.session import get_spark
from event_streaming_service_spark.sources import tables
from event_streaming_service_spark.sources.fixtures import prepare_splittable

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_spark("ab_hits", cpus=32, shuffle_partitions=32)
sf_dir = prepare_splittable(
    SF, str(Path(__file__).resolve().parent.parent / ".bench_cache"))


def build(bc: bool):
    orders = tables.load_table(spark, sf_dir, "orders")
    lineitem = tables.load_table(spark, sf_dir, "lineitem")
    edges = (orders
             .join(lineitem, lineitem.l_orderkey == orders.o_orderkey)
             .select(F.concat(F.lit("c"), F.col("o_custkey").cast("string"))
                     .alias("src"),
                     F.concat(F.lit("s"), F.col("l_suppkey").cast("string"))
                     .alias("dst"))
             .distinct())
    return graph.hits(edges, iterations=3, broadcast_scores=bc)


for variant in (False, True):
    build(variant).write.format("noop").mode("overwrite").save()
    spark.catalog.clearCache()

best = {False: float("inf"), True: float("inf")}
for rnd in range(4):
    for variant in (False, True):
        t0 = time.perf_counter()
        build(variant).write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        best[variant] = min(best[variant], dt)
        print(f"round {rnd} bc={variant}: {dt:.3f}s", flush=True)
        spark.catalog.clearCache()
print(f"BEST base={best[False]:.3f}s bc={best[True]:.3f}s")
spark.stop()
