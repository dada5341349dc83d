"""Table-profiling query: per-column summary statistics over `orders`
and `documents` (operators/profiling.py) — the ingestion-time "column
describe" the data-lake side of the engine runs before trusting a new
drop of parquet.

The oracle spells out the identical canonicalization per column
(bigint CAST, double micro-units, timestamp second-truncated render)
as one UNION ALL unpivot + one grouped aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from event_streaming_service_spark.operators import profiling
from event_streaming_service_spark.queries import register
from event_streaming_service_spark.sources import tables

_D = "CAST(NULL AS DOUBLE)"


def _legs() -> str:
    specs = [
        ("orders", "o_orderkey", "bigint"),
        ("orders", "o_custkey", "bigint"),
        ("orders", "o_orderstatus", "varchar"),
        ("orders", "o_totalprice", "double"),
        ("orders", "o_orderdate", "timestamp"),
        ("orders", "o_orderpriority", "varchar"),
        ("documents", "doc_id", "bigint"),
        ("documents", "text", "varchar"),
        ("documents", "lang", "varchar"),
        ("documents", "source", "varchar"),
        ("documents", "n_chars", "bigint"),
    ]
    out = []
    for tbl, c, t in specs:
        name = f"'{tbl}.{c}'"
        if t == "bigint":
            val, num = f"CAST({c} AS VARCHAR)", f"CAST({c} AS DOUBLE)"
        elif t == "double":
            micro = f"CAST(FLOOR({c} * 1e6 + 0.5) AS BIGINT)"
            val, num = f"CAST({micro} AS VARCHAR)", f"CAST({micro} AS DOUBLE)"
        elif t == "timestamp":
            val = f"strftime({c}, '%Y-%m-%d %H:%M:%S')"
            num = f"CAST(epoch_ms(date_trunc('second', {c})) AS DOUBLE)"
        else:
            val, num = c, _D
        out.append(f"SELECT {name} AS col_name, {val} AS val, "
                   f"{num} AS num FROM {tbl}")
    return "\nUNION ALL\n".join(out)


@register(
    "table_profile_surface",
    oracle=f"""
    WITH unpivoted AS (
        {_legs()}
    )
    SELECT col_name,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CASE WHEN val IS NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_null,
           CAST(COUNT(DISTINCT val) AS BIGINT) AS n_distinct,
           MIN(val) AS min_str, MAX(val) AS max_str,
           MIN(num) AS min_num, MAX(num) AS max_num,
           ROUND(CAST(SUM(len(val)) AS DOUBLE)
                 / CAST(COUNT(val) AS DOUBLE), 6) AS avg_len
    FROM unpivoted GROUP BY col_name
    """,
    tags=("profiling", "A8"),
)
def q_table_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column profiles for orders + documents in one surface: exact
    null/distinct counts, canonical min/max, pinned avg length. The
    distinct count pre-aggregates at (column, value) grain so no
    single-column reducer ever sees the raw table (see operator
    docstring for the 100 TB shape)."""
    orders = tables.load_table(spark, sf_dir, "orders")
    docs = tables.load_table(spark, sf_dir, "documents")
    po = profiling.profile(orders).withColumn(
        "col_name", F.concat(F.lit("orders."), F.col("col_name")))
    pd_ = profiling.profile(docs).withColumn(
        "col_name", F.concat(F.lit("documents."), F.col("col_name")))
    return po.unionByName(pd_)


@register(
    "data_quality_report",
    oracle="""
    SELECT 'orders_status_domain' AS rule,
           CAST(COUNT(*) AS BIGINT) AS n_checked,
           CAST(SUM(CASE WHEN o_orderstatus NOT IN ('O','F','P')
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_violations,
           CAST(SUM(CASE WHEN o_orderstatus NOT IN ('O','F','P')
                         THEN 1 ELSE 0 END) * 1000000 // COUNT(*)
                AS BIGINT) AS violation_ppm
    FROM orders
    UNION ALL
    SELECT 'orders_price_positive', CAST(COUNT(*) AS BIGINT),
           CAST(SUM(CASE WHEN NOT (o_totalprice > 0) THEN 1 ELSE 0
                    END) AS BIGINT),
           CAST(SUM(CASE WHEN NOT (o_totalprice > 0) THEN 1 ELSE 0
                    END) * 1000000 // COUNT(*) AS BIGINT)
    FROM orders
    UNION ALL
    SELECT 'orders_price_upper_guard', CAST(COUNT(*) AS BIGINT),
           CAST(SUM(CASE WHEN o_totalprice > 450000 THEN 1 ELSE 0
                    END) AS BIGINT),
           CAST(SUM(CASE WHEN o_totalprice > 450000 THEN 1 ELSE 0
                    END) * 1000000 // COUNT(*) AS BIGINT)
    FROM orders
    UNION ALL
    SELECT 'customer_acctbal_nonneg', CAST(COUNT(*) AS BIGINT),
           CAST(SUM(CASE WHEN c_acctbal < 0 THEN 1 ELSE 0 END)
                AS BIGINT),
           CAST(SUM(CASE WHEN c_acctbal < 0 THEN 1 ELSE 0 END)
                * 1000000 // COUNT(*) AS BIGINT)
    FROM customer
    UNION ALL
    SELECT 'customer_name_present', CAST(COUNT(*) AS BIGINT),
           CAST(SUM(CASE WHEN c_name IS NULL OR length(c_name) = 0
                         THEN 1 ELSE 0 END) AS BIGINT),
           CAST(SUM(CASE WHEN c_name IS NULL OR length(c_name) = 0
                         THEN 1 ELSE 0 END) * 1000000 // COUNT(*)
                AS BIGINT)
    FROM customer
    UNION ALL
    SELECT 'events_value_in_range', CAST(COUNT(*) AS BIGINT),
           CAST(SUM(CASE WHEN value IS NULL OR value < 0
                         OR value > 1000000 THEN 1 ELSE 0 END)
                AS BIGINT),
           CAST(SUM(CASE WHEN value IS NULL OR value < 0
                         OR value > 1000000 THEN 1 ELSE 0 END)
                * 1000000 // COUNT(*) AS BIGINT)
    FROM events
    UNION ALL
    SELECT 'events_props_k_bound', CAST(COUNT(*) AS BIGINT),
           CAST(SUM(CASE WHEN CAST(json_extract_string(props, '$.k')
                                   AS INTEGER) > 75
                         THEN 1 ELSE 0 END) AS BIGINT),
           CAST(SUM(CASE WHEN CAST(json_extract_string(props, '$.k')
                                   AS INTEGER) > 75
                         THEN 1 ELSE 0 END) * 1000000 // COUNT(*)
                AS BIGINT)
    FROM events
    UNION ALL
    SELECT 'orders_custkey_fk',
           (SELECT CAST(COUNT(*) AS BIGINT) FROM orders),
           (SELECT CAST(COUNT(*) AS BIGINT) FROM orders o
            WHERE NOT EXISTS (SELECT 1 FROM customer c
                              WHERE c.c_custkey = o.o_custkey)),
           (SELECT CAST(COUNT(*) AS BIGINT) FROM orders o
            WHERE NOT EXISTS (SELECT 1 FROM customer c
                              WHERE c.c_custkey = o.o_custkey))
           * 1000000 // (SELECT COUNT(*) FROM orders)
    """,
    tags=("profiling", "quality", "data-quality", "P3", "A8"),
)
def q_data_quality_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative quality-rule report over three tables + one FK
    orphan leg: domain, range, null/empty, JSON-field-bound, and
    referential rules, each with exact integer-ppm violation rates;
    all rules on a table share one scan
    (operators/profiling.py:quality_rules / fk_orphan_rule)."""
    orders = tables.load_table(spark, sf_dir, "orders")
    cust = tables.load_table(spark, sf_dir, "customer")
    ev = tables.load_table(spark, sf_dir, "events")
    r_orders = profiling.quality_rules(orders, {
        "orders_status_domain":
            ~F.col("o_orderstatus").isin("O", "F", "P"),
        "orders_price_positive": ~(F.col("o_totalprice") > 0),
        "orders_price_upper_guard": F.col("o_totalprice") > 450000,
    })
    r_cust = profiling.quality_rules(cust, {
        "customer_acctbal_nonneg": F.col("c_acctbal") < 0,
        "customer_name_present":
            F.col("c_name").isNull() | (F.length("c_name") == 0),
    })
    r_ev = profiling.quality_rules(ev, {
        "events_value_in_range":
            F.col("value").isNull() | (F.col("value") < 0)
            | (F.col("value") > 1_000_000),
        "events_props_k_bound":
            F.get_json_object("props", "$.k").cast("int") > 75,
    })
    r_fk = profiling.fk_orphan_rule(orders, cust, "o_custkey",
                                    "c_custkey", "orders_custkey_fk")
    return (r_orders.unionByName(r_cust).unionByName(r_ev)
            .unionByName(r_fk))
