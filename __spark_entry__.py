"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash -> CORRECTNESS_r{N}.json).

All real logic lives in event_streaming_service_spark/; this module is
a thin adapter over its query registry.
"""

from __future__ import annotations

import os
import tempfile
import zipfile
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from event_streaming_service_spark import queries as _registry

_SHIPPED: set[str] = set()


def _ship_package(spark: SparkSession) -> None:
    """Make `event_streaming_service_spark` importable on executors.

    The grading driver inserts this repo on ITS OWN sys.path only;
    Python workers it spawns inherit neither that nor its cwd, so any
    closure cloudpickle serializes BY REFERENCE (a module-level
    function, class, or constant from this package) would die with
    ModuleNotFoundError worker-side. Zip the package once per
    SparkContext and addPyFile it — workers put shipped zips on their
    sys.path. Worker closures are also kept self-contained (nested
    helpers, module-object captures only); this is the backstop.
    """
    sc = spark.sparkContext
    app_id = sc.applicationId
    if app_id in _SHIPPED:
        return
    pkg_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "event_streaming_service_spark")
    zip_path = os.path.join(tempfile.gettempdir(),
                            f"ess_spark_pkg_{os.getpid()}.zip")
    if not os.path.exists(zip_path):
        with zipfile.ZipFile(zip_path, "w") as zf:
            for root, _dirs, files in os.walk(pkg_dir):
                for fn in files:
                    if fn.endswith(".py"):
                        full = os.path.join(root, fn)
                        rel = os.path.relpath(full,
                                              os.path.dirname(pkg_dir))
                        zf.write(full, rel)
    sc.addPyFile(zip_path)
    _SHIPPED.add(app_id)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the per-topic
    EventStatistics record (SURVEY.md A5) — scan -> derive coordinates ->
    grouped aggregation."""
    _ship_package(spark)
    q = _registry.all_queries()["topic_statistics"]
    return q(spark, "/root/testdata/sf0.001")


def _wrap(fn: Callable[[SparkSession, str], DataFrame]
          ) -> Callable[[SparkSession, str], DataFrame]:
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        _ship_package(spark)
        return fn(spark, sf_dir)
    run.__doc__ = fn.__doc__
    return run


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md section 2."""
    return {name: _wrap(fn) for name, fn in _registry.all_queries().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle SQL per query; omitted keys get rows-only checks."""
    return _registry.all_oracles()
