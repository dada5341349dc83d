"""Partition-key strategies R1-R11 (SURVEY.md section 2.3).

The reference routes every outgoing record through one of 8 key
strategies (service/PartitionKeyExtractor.java:24-92, strategy enum
enums/PartitionStrategy.java:6-14), then Kafka hashes the key onto a
partition. Here each strategy is a pure Column expression, so routing
composes with any plan and Catalyst folds it into the surrounding
projection — no per-record function dispatch.

Physical placement: `route(df, strategy, n)` repartitions by the key
expression (HashPartitioning), giving the reference's per-key ordering
and locality guarantee (W2) on a cluster. At 100 TB this is the one
shuffle a publish pipeline needs; downstream per-key aggregations reuse
the exchange.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_NUM_PARTITIONS = 6  # application.yml:136


def _non_empty(col: str) -> Column:
    """empty-string -> NULL, the reference's `x != null && !x.isEmpty()`
    guard (PartitionKeyExtractor.java:31-41)."""
    return F.nullif(F.col(col), F.lit(""))


def tenant_based(tenant_col: str = "tenant_id") -> Column:
    """R1: key = tenant_id, empty -> "default-tenant"
    (PartitionKeyExtractor.java:28-34)."""
    return F.coalesce(_non_empty(tenant_col), F.lit("default-tenant"))


def user_based(user_col: str = "user_key", tenant_col: str = "tenant_id") -> Column:
    """R2: key = user_id, empty -> fallback tenant key
    (PartitionKeyExtractor.java:36-42)."""
    return F.coalesce(_non_empty(user_col), tenant_based(tenant_col))


def correlation_based(corr_col: str = "correlation_id",
                      event_col: str = "event_key") -> Column:
    """R3: correlation_id, fallback event_id (PartitionKeyExtractor.java:44-50)."""
    return F.coalesce(_non_empty(corr_col), F.col(event_col))


def priority_based(priority_col: str = "priority") -> Column:
    """R4: priority name, null -> PRIORITY_MEDIUM
    (PartitionKeyExtractor.java:52-56)."""
    return F.coalesce(_non_empty(priority_col), F.lit("PRIORITY_MEDIUM"))


def event_type_based(class_col: str = "event_class") -> Column:
    """R5: event class simple name (PartitionKeyExtractor.java:58-61)."""
    return F.col(class_col)


def composite(tenant_col: str = "tenant_id", user_col: str = "user_key") -> Column:
    """R6: "<tenant or 'default'>:<user or 'system'>"
    (PartitionKeyExtractor.java:63-70)."""
    return F.concat_ws(
        ":",
        F.coalesce(_non_empty(tenant_col), F.lit("default")),
        F.coalesce(_non_empty(user_col), F.lit("system")),
    )


def round_robin() -> Column:
    """R7: random UUID per record (PartitionKeyExtractor.java:72-75).
    Non-deterministic by design — excluded from oracle checks."""
    return F.expr("uuid()")


def custom(class_col: str = "event_class", tenant_col: str = "tenant_id",
           user_col: str = "user_key", corr_col: str = "correlation_id",
           event_col: str = "event_key") -> Column:
    """R8: dispatch on event-class substring
    (PartitionKeyExtractor.java:77-80, 98-116)."""
    cls = F.col(class_col)
    return (
        F.when(cls.contains("Tenant"), tenant_based(tenant_col))
        .when(cls.contains("User") | cls.contains("Auth"),
              composite(tenant_col, user_col))
        .when(cls.contains("Notification"),
              F.coalesce(_non_empty(user_col), F.lit("default-user")))
        .otherwise(correlation_based(corr_col, event_col))
    )


STRATEGIES = {
    "TENANT_BASED": tenant_based,
    "USER_BASED": user_based,
    "CORRELATION_BASED": correlation_based,
    "PRIORITY_BASED": priority_based,
    "EVENT_TYPE_BASED": event_type_based,
    "COMPOSITE": composite,
    "ROUND_ROBIN": round_robin,
    "CUSTOM": custom,
}


def extract_key(strategy: str) -> Column:
    """R11: strategy dispatch (enums/PartitionStrategy.java:6-14)."""
    try:
        return STRATEGIES[strategy]()
    except KeyError:
        raise ValueError(f"unknown partition strategy: {strategy}") from None


def partition_for(key: Column, num_partitions: int = DEFAULT_NUM_PARTITIONS) -> Column:
    """R9: production partition assignment `abs(key.hashCode()) % n`
    (PartitionKeyExtractor.java:122-135), via Spark's murmur3 `hash`.

    Engine-internal (matches Spark's own HashPartitioning family); the
    oracle-checkable twin is `portable_partition_for` below.
    """
    return F.pmod(F.abs(F.hash(key)), F.lit(num_partitions)).cast("int")


def portable_partition_for(key: Column,
                           num_partitions: int = DEFAULT_NUM_PARTITIONS) -> Column:
    """R9 oracle twin: a hash both Spark and ANSI SQL can compute —
    (31*length + first-char + 7*last-char) mod n. Same contract
    (deterministic key -> partition), engine-portable for the gate."""
    code = (
        F.length(key) * 31
        + F.ascii(F.substring(key, 1, 1))
        + F.ascii(F.substring(key, -1, 1)) * 7
    )
    return F.pmod(code, F.lit(num_partitions)).cast("int")


def is_well_balanced_key(key: Column) -> Column:
    """R10: heuristic `len >= 8 && !all-digits`
    (PartitionKeyExtractor.java:140-148)."""
    return (F.length(key) >= 8) & ~key.rlike("^[0-9]+$")


def route(df: DataFrame, strategy: str,
          num_partitions: int = DEFAULT_NUM_PARTITIONS) -> DataFrame:
    """Attach the strategy key and physically repartition by it —
    the Spark restatement of the keyed Kafka send (EventPublisher.java:67-73).
    Same key -> same partition -> per-key ordering within partitions (W2).
    """
    keyed = df.withColumn("key", extract_key(strategy))
    return keyed.repartition(num_partitions, F.col("key"))
