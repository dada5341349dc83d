"""Dump .explain("formatted") output for named queries into
plans/$SPARK_GRAFT_ROUND/<query>_<suffix>.txt (default r13) — the
optimization-round evidence files (the judge checks plan claims
against these).

Usage: python tools/dump_plan.py <suffix> <query_name> [...]
Builds each query at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
on a bench-shaped session and writes the formatted physical plan.
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from event_streaming_service_spark.queries import REGISTRY, _load_all
from event_streaming_service_spark.session import get_spark

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    suffix = sys.argv[1]
    names = sys.argv[2:]
    _load_all()
    out_dir = (Path(__file__).resolve().parent.parent / "plans"
               / os.environ.get("SPARK_GRAFT_ROUND", "r13"))
    out_dir.mkdir(parents=True, exist_ok=True)
    spark = get_spark("plans", cpus=8, shuffle_partitions=32)
    for name in names:
        df = REGISTRY[name].builder(spark, SF)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted")
        (out_dir / f"{name}_{suffix}.txt").write_text(plan)
        print(f"wrote {name}_{suffix}.txt ({len(plan)} bytes)")
        spark.catalog.clearCache()
    spark.stop()


if __name__ == "__main__":
    main()
