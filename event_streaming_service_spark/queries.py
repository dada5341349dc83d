"""Central query registry: every driver-verifiable operator lives here.

Each entry pairs a Spark DataFrame builder `(spark, sf_dir) -> DataFrame`
with the ANSI-SQL oracle DuckDB runs on the same parquet files. The
driver (see __spark_entry__.py) compares row count + schema +
order-insensitive value hash, so:

  * every computed column is aliased identically on both sides;
  * double aggregates go through exact decimal sums (stats.dsum) so the
    result does not depend on partitioning / addition order;
  * ranked or limited results use total-order deterministic tiebreaks.

Modules register their queries at import time via @register.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class QuerySpec:
    name: str
    builder: QueryFn
    oracle: str | None  # None => driver runs a rows-only check
    doc: str = ""
    tags: tuple[str, ...] = field(default=())


REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None = None, doc: str = "",
             tags: tuple[str, ...] = ()) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = QuerySpec(name, fn, oracle, doc or (fn.__doc__ or ""), tags)
        return fn
    return deco


def all_queries() -> dict[str, QueryFn]:
    _load_all()
    return {name: spec.builder for name, spec in REGISTRY.items()}


def all_oracles() -> dict[str, str]:
    _load_all()
    return {name: spec.oracle for name, spec in REGISTRY.items()
            if spec.oracle is not None}


_LOADED = False


def _load_all() -> None:
    """Import every module that registers queries (idempotent)."""
    global _LOADED
    if _LOADED:
        return
    from event_streaming_service_spark import query_defs  # noqa: F401

    _LOADED = True
