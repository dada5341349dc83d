"""Dataset profiling: per-column summary statistics in one distributed
pass — the "what is in this table" primitive every ingestion pipeline
runs before trusting 100 TB of new parquet (null rates, cardinalities,
ranges, value lengths).

The reference exposes per-topic counters only (reference:
service/EventStatisticsService.java, service/TopicManagementService.java
describe paths); column-level profiling is the data-lake analogue of
its topic `describe`, extended to the LLM-pipeline brief's curation
needs (schema drift detection, junk-column triage before training
runs).

Design notes (100 TB):

* The table unpivots to (col_name, value) via one JVM-side
  `explode(array(struct...))` — a xN row multiplication, the standard
  profiling trade; the alternative (one agg per column) rescans the
  table N times. Values canonicalize to strings ONCE, with numerics
  carrying a parallel double sort key so min/max order numerically.
* Distinct counting NEVER runs count(distinct) into a per-column
  reducer (N groups = N hot reducers at scale). Instead: stage 1
  aggregates at (col_name, value) grain — partial map-side combine
  absorbs the heavy hitters — and stage 2 reduces the distinct-value
  frame, so every metric is an associative fold of stage-1 rows and
  both shuffles are well-spread.
* All metrics are exact integers / single pinned divisions — no float
  accumulation, so the profile is reproducible cross-engine.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _canonical(col: Column, dtype: str) -> tuple[Column, Column]:
    """(string form, numeric sort key) for one column, spelled so
    DuckDB produces byte-identical strings: bigints via CAST, doubles
    via integer micro-units, timestamps via yyyy-MM-dd HH:mm:ss
    rendering."""
    if dtype in ("bigint", "int", "smallint", "tinyint"):
        return col.cast("string"), col.cast("double")
    if dtype == "double":
        micro = F.floor(col * F.lit(1e6) + F.lit(0.5)).cast("bigint")
        return micro.cast("string"), micro.cast("double")
    if dtype in ("timestamp", "timestamp_ntz"):
        # epoch-ms of the RENDERED wall clock, truncated to the second
        # (matching the string form), via pure field arithmetic — no
        # session-tz round trip, so nonexistent-local-time DST edges
        # cannot shift the key
        ms = (F.unix_date(F.to_date(col)).cast("bigint")
              * F.lit(86_400_000)
              + F.hour(col) * F.lit(3_600_000)
              + F.minute(col) * F.lit(60_000)
              + F.second(col) * F.lit(1_000))
        return F.date_format(col, "yyyy-MM-dd HH:mm:ss"), ms.cast("double")
    return col.cast("string"), F.lit(None).cast("double")


def profile(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """One row per profiled column: n_rows, n_null, n_distinct
    (non-null), lexicographic min/max of the canonical string, numeric
    min/max where the type orders numerically, and avg canonical
    length pinned at 6 dp."""
    cols = columns or df.columns
    legs = []
    for c in cols:
        dtype = df.schema[c].dataType.simpleString()
        s, k = _canonical(F.col(c), dtype)
        legs.append(F.struct(F.lit(c).alias("col_name"),
                             s.alias("val"), k.alias("num")))
    exploded = df.select(F.explode(F.array(*legs)).alias("e")).select(
        F.col("e.col_name").alias("col_name"),
        F.col("e.val").alias("val"), F.col("e.num").alias("num"))

    per_value = (exploded
                 .groupBy("col_name", "val")
                 .agg(F.count(F.lit(1)).alias("cnt"),
                      F.min("num").alias("num")))
    return (per_value
            .groupBy("col_name")
            .agg(F.sum("cnt").alias("n_rows"),
                 F.sum(F.when(F.col("val").isNull(), F.col("cnt"))
                       .otherwise(F.lit(0))).alias("n_null"),
                 F.count(F.col("val")).alias("n_distinct"),
                 F.min("val").alias("min_str"),
                 F.max("val").alias("max_str"),
                 F.min("num").alias("min_num"),
                 F.max("num").alias("max_num"),
                 F.round(F.sum(F.length("val").cast("bigint")
                               * F.col("cnt")).cast("double")
                         / F.sum(F.when(F.col("val").isNotNull(),
                                        F.col("cnt")).otherwise(F.lit(0)))
                         .cast("double"), 6).alias("avg_len")))


def quality_rules(df: DataFrame, rules: dict[str, Column]) -> DataFrame:
    """Declarative data-quality rule evaluation (the dbt-test / Great
    Expectations shape): each rule is a VIOLATION predicate; the
    report is one row per rule with checked/violation counts and an
    exact integer-ppm violation rate.

    All rules over one table evaluate in a SINGLE scan + aggregate
    (one conditional sum per rule inside the same hash agg — adding a
    rule adds a column, not a pass), then the 1-row wide aggregate
    unpivots to the (rule, counts) report grain with stack(). NULL
    predicates count as non-violations on both engines (WHEN cond
    THEN 1 ELSE 0). Cross-table rules (FK orphans) are their own
    join-shaped legs — see the query composition."""
    names = list(rules)
    aggs = [F.count(F.lit(1)).alias("__n")]
    for i, name in enumerate(names):
        aggs.append(F.sum(F.when(rules[name], 1).otherwise(0))
                    .cast("bigint").alias(f"__v{i}"))
    wide = df.agg(*aggs)
    stack_expr = ", ".join(f"'{n}', __v{i}" for i, n in enumerate(names))
    return (wide.select(
        F.expr(f"stack({len(names)}, {stack_expr})")
        .alias("rule", "n_violations"),
        F.col("__n").alias("n_checked"))
        .select("rule", "n_checked", "n_violations",
                F.expr("CAST(n_violations * 1000000 DIV n_checked"
                       " AS BIGINT)").alias("violation_ppm")))


def fk_orphan_rule(child: DataFrame, parent: DataFrame,
                   child_key: str, parent_key: str,
                   rule: str) -> DataFrame:
    """Referential-integrity leg of the quality report: rows of
    `child` whose key has no match in `parent`. One anti-join at key
    grain; the parent side reduces to distinct keys first so the
    probe is key-domain-sized (broadcastable for dimension tables)."""
    n = child.agg(F.count(F.lit(1)).alias("n_checked"))
    orphans = (child.select(F.col(child_key))
               .join(parent.select(F.col(parent_key).alias(child_key))
                     .distinct(),
                     child_key, "left_anti")
               .agg(F.count(F.lit(1)).cast("bigint")
                    .alias("n_violations")))
    return (n.crossJoin(orphans)
            .select(F.lit(rule).alias("rule"), "n_checked",
                    "n_violations",
                    F.expr("CAST(n_violations * 1000000 DIV n_checked"
                           " AS BIGINT)").alias("violation_ppm")))
