"""Declarative routing rules P8 (SURVEY.md section 2.2).

The reference models rules as data — sourceTopic, targetTopic, a SQL-ish
condition string, a partition strategy, and a transformations map
(model/EventRoutingRule.java:16-24) — but ships no evaluator. Spark IS
the evaluator: `F.expr(condition)` hands the condition to Catalyst's
parser/optimizer, transformations become withColumns, and the strategy
key comes from operators/routing. A rule is therefore compiled into the
plan (constant-folded, pushed down) rather than interpreted per record.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from event_streaming_service_spark.operators import routing


@dataclass
class EventRoutingRule:
    """model/EventRoutingRule.java:16-24."""

    source_topic: str
    target_topic: str
    condition: str                      # SQL boolean over the event columns
    partition_strategy: str = "TENANT_BASED"
    transformations: dict[str, str] = field(default_factory=dict)  # col -> SQL expr


def apply_rule(df: DataFrame, rule: EventRoutingRule) -> DataFrame:
    """Filter by the rule condition, apply transformations, stamp the
    target topic and the strategy routing key."""
    out = df.filter(F.expr(rule.condition))
    for col, expr in rule.transformations.items():
        out = out.withColumn(col, F.expr(expr))
    out = out.withColumn("target_topic", F.lit(rule.target_topic))
    if rule.partition_strategy != "NONE":
        out = out.withColumn("key", routing.extract_key(rule.partition_strategy))
    return out


def fan_out_rules(df: DataFrame, rules: list[EventRoutingRule]
                  ) -> dict[str, DataFrame]:
    """One shared scan, one filtered/transformed branch per rule —
    the subscription dispatch (model/EventSubscription.java:15-24)."""
    return {r.target_topic: apply_rule(df, r) for r in rules}
