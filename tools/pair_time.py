"""Paired Spark-vs-DuckDB timing for a subset of registry queries —
the per-query iteration loop for perf work (gen_bench_notes.py measures
the full headline set; this takes names on argv).

Usage: python tools/pair_time.py name [name ...]
Env:   SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from bench import CPUS, SF_DIR
from event_streaming_service_spark.queries import REGISTRY, _load_all
from event_streaming_service_spark.session import get_spark
from event_streaming_service_spark.sources.tables import TABLE_NAMES


def main() -> None:
    _load_all()
    names = sys.argv[1:]
    bench_dir = SF_DIR
    if os.environ.get("SPARK_GRAFT_NO_SPLIT", "0") != "1":
        from event_streaming_service_spark.sources.fixtures import (
            prepare_splittable)
        repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        bench_dir = prepare_splittable(
            SF_DIR, os.path.join(repo_root, ".bench_cache"))

    os.environ.setdefault("SPARK_DRIVER_MEMORY", "32g")
    spark = get_spark("pair-time", cpus=CPUS, shuffle_partitions=max(CPUS, 32))
    con = duckdb.connect()
    for t in TABLE_NAMES:
        path = f"{bench_dir}/{t}.parquet"
        src = f"'{path}/*.parquet'" if os.path.isdir(path) else f"'{path}'"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM {src}")

    for name in names:
        spec = REGISTRY[name]
        best_s = float("inf")
        for i in range(3):
            # builder INSIDE the timer (the bench.py / gen_bench_notes
            # convention): iterative operators do real eager work at
            # build time — timing only the noop write under-reported
            # them and made pair rows incomparable with BENCH_NOTES
            t0 = time.perf_counter()
            df = spec.builder(spark, bench_dir)
            df.write.format("noop").mode("overwrite").save()
            if i > 0:
                best_s = min(best_s, time.perf_counter() - t0)
        spark.catalog.clearCache()
        if spec.oracle:
            best_d = float("inf")
            for i in range(3):
                t0 = time.perf_counter()
                con.execute(spec.oracle).fetchall()
                if i > 0:
                    best_d = min(best_d, time.perf_counter() - t0)
            print(f"{name}: spark={best_s:.2f}s duckdb={best_d:.2f}s "
                  f"ratio={best_s / best_d:.1f}x", flush=True)
        else:
            print(f"{name}: spark={best_s:.2f}s (rows-only)", flush=True)


if __name__ == "__main__":
    main()
