"""Per-query build/exec profile: time the builder call (eager work —
training collects, checkpoint rounds) separately from the noop-sink
execution, best of N after one warmup. Usage:

    python tools/profile_query.py <name> [...]

Env: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_CPUS (default 32),
PROFILE_RUNS (default 2), PROFILE_WARM=1 keeps caches from the warmup
(bench.py parity: the bench times best-of-N after an untimed warmup
with clearCache only BETWEEN queries, so persisted intermediates are
warm in its timed runs; default 0 clears after every run = cold).
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from event_streaming_service_spark.queries import REGISTRY, _load_all
from event_streaming_service_spark.session import get_spark

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
RUNS = int(os.environ.get("PROFILE_RUNS", "2"))
WARM = os.environ.get("PROFILE_WARM", "0") == "1"


def main() -> None:
    names = sys.argv[1:]
    _load_all()
    os.environ.setdefault("SPARK_DRIVER_MEMORY", "32g")
    spark = get_spark("profile", cpus=CPUS,
                      shuffle_partitions=max(CPUS, 32))
    # bench parity: use the splittable rewrite like bench.py does
    if os.environ.get("SPARK_GRAFT_NO_SPLIT", "0") != "1":
        from event_streaming_service_spark.sources.fixtures import (
            prepare_splittable)
        sf_dir = prepare_splittable(
            SF, str(Path(__file__).resolve().parent.parent / ".bench_cache"))
    else:
        sf_dir = SF
    for name in names:
        # warmup
        REGISTRY[name].builder(spark, sf_dir).write.format(
            "noop").mode("overwrite").save()
        if not WARM:
            spark.catalog.clearCache()
        bb, be, bt = float("inf"), float("inf"), float("inf")
        for _ in range(RUNS):
            t0 = time.perf_counter()
            df = REGISTRY[name].builder(spark, sf_dir)
            t1 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            t2 = time.perf_counter()
            bb = min(bb, t1 - t0)
            be = min(be, t2 - t1)
            bt = min(bt, t2 - t0)
            if not WARM:
                spark.catalog.clearCache()
        if WARM:
            spark.catalog.clearCache()
        print(f"PROFILE {name}: build={bb:.3f}s exec={be:.3f}s "
              f"total={bt:.3f}s", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
