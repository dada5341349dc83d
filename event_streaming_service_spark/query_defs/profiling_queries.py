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
