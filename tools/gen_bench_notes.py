"""Regenerate the BENCH_NOTES.md comparison table: every bench.py
headline query timed in Spark (noop sink, best-of-2, shared session)
and in DuckDB against the oracle SQL (fetchall, best-of-2).

Usage: python tools/gen_bench_notes.py [> table.md]
Env:   SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from bench import BENCH_QUERIES, CPUS, SF_DIR
from event_streaming_service_spark.queries import REGISTRY, _load_all
from event_streaming_service_spark.session import get_spark
from event_streaming_service_spark.sources.tables import TABLE_NAMES


def main() -> None:
    _load_all()
    spark = get_spark("bench-notes", cpus=CPUS, shuffle_partitions=max(CPUS, 32))
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")

    # warmup both engines
    REGISTRY["topic_statistics"].builder(spark, SF_DIR) \
        .write.format("noop").mode("overwrite").save()
    con.execute("SELECT COUNT(*) FROM events").fetchall()

    rows = []
    total_s = total_d = 0.0
    for name in BENCH_QUERIES:
        spec = REGISTRY[name]
        best_s = float("inf")
        for _ in range(2):
            df = spec.builder(spark, SF_DIR)
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            best_s = min(best_s, time.perf_counter() - t0)
        if spec.oracle:
            best_d = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                con.execute(spec.oracle).fetchall()
                best_d = min(best_d, time.perf_counter() - t0)
            ratio = f"{best_s / best_d:.1f}x"
            dtxt = f"{best_d:.2f}"
            total_s += best_s
            total_d += best_d
        else:
            dtxt, ratio = "— (rows-only)", "—"
        rows.append((name, f"{best_s:.2f}", dtxt, ratio))
        print(f"| {name} | {rows[-1][1]} | {dtxt} | {ratio} |", flush=True)

    print(f"| **total (oracle-paired)** | **{total_s:.2f}** | "
          f"**{total_d:.2f}** | **{total_s / total_d:.1f}x** |")


if __name__ == "__main__":
    main()
