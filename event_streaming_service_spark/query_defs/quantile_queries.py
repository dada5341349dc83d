"""Exact-quantile queries (operators/quantiles.py): order statistics
with no full sort, verified against a row_number() oracle."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from event_streaming_service_spark.operators.quantiles import exact_quantiles
from event_streaming_service_spark.queries import register
from event_streaming_service_spark.sources import tables

QS = [0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99]


def _quantile_oracle() -> str:
    legs = []
    for q in QS:
        legs.append(f"""
        SELECT CAST({q} AS DOUBLE) AS q, r.rk, tot.n, r.v AS value
        FROM ranked r, tot
        WHERE r.rk = GREATEST(1, CAST(CEIL(CAST({q} AS DOUBLE) * tot.n)
                                      AS BIGINT))""")
    union = " UNION ALL ".join(legs)
    return f"""
    WITH ranked AS (
        SELECT l_extendedprice AS v,
               row_number() OVER (ORDER BY l_extendedprice) AS rk
        FROM lineitem WHERE l_extendedprice IS NOT NULL),
    tot AS (
        SELECT CAST(COUNT(l_extendedprice) AS BIGINT) AS n FROM lineitem)
    {union}
    """


@register(
    "exact_price_quantiles",
    oracle=_quantile_oracle(),
    doc="",
    tags=("quantiles", "A7"),
)
def q_exact_price_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 1st-99th percentiles of l_extendedprice by iterative
    histogram refinement: bounded-size aggregates locate each rank's
    value envelope, a tiny exact rank finishes — no full sort, no full
    shuffle, yet bit-identical to the oracle's row_number() scan (see
    operators/quantiles.py). The oracle pays the total sort this
    operator exists to avoid."""
    li = tables.load_table(spark, sf_dir, "lineitem")
    return exact_quantiles(li, "l_extendedprice", QS)
