r"""Skyline + index-construction queries: per-brand Pareto frontier
over `part` (operators/skyline.py) and inverted-index materialization
over `documents` (operators/text.py:inverted_index).

The skyline oracle is the INDEPENDENT quadratic definition (NOT
EXISTS a dominator) rather than a transliteration of the window
algorithm, so the prefix-max implementation is checked against the
semantics, not against itself.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from event_streaming_service_spark.operators import skyline, text
from event_streaming_service_spark.queries import register
from event_streaming_service_spark.sources import tables


@register(
    "pareto_frontier_parts",
    oracle="""
    WITH pts AS (
        SELECT p_brand,
               CAST(FLOOR(p_retailprice * 100 + 0.5) AS BIGINT)
                   AS price_cents,
               CAST(p_size AS BIGINT) AS p_size_v,
               COUNT(*) AS n_items
        FROM part GROUP BY 1, 2, 3)
    SELECT p_brand, price_cents, p_size_v, n_items
    FROM pts a
    WHERE NOT EXISTS (
        SELECT 1 FROM pts b
        WHERE b.p_brand = a.p_brand
          AND b.price_cents <= a.price_cents
          AND b.p_size_v >= a.p_size_v
          AND (b.price_cents < a.price_cents
               OR b.p_size_v > a.p_size_v))
    """,
    tags=("skyline", "O4", "tpch"),
)
def q_pareto_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-brand price/size skyline of the part catalog: the parts no
    same-brand part beats on both price (cheaper) and size (bigger).
    Two windows per group, no quadratic pass — the oracle IS the
    quadratic definition."""
    part = tables.load_table(spark, sf_dir, "part")
    pts = part.select(
        "p_brand",
        F.floor(F.col("p_retailprice") * 100 + F.lit(0.5))
        .cast("bigint").alias("price_cents"),
        F.col("p_size").cast("bigint").alias("p_size_v"))
    return skyline.pareto_frontier(pts, "price_cents", "p_size_v",
                                   group_cols=["p_brand"])


@register(
    "inverted_index_terms",
    oracle=r"""
    WITH tok AS (
        SELECT term, doc_id, COUNT(*) AS tf
        FROM (SELECT doc_id,
                     unnest(list_filter(
                         string_split_regex(text, '\s+'),
                         t -> t <> '')) AS term
              FROM documents)
        GROUP BY term, doc_id)
    SELECT term, CAST(COUNT(*) AS BIGINT) AS df,
           CAST(SUM(tf) AS BIGINT) AS cf,
           array_to_string(
               list_slice(list(doc_id ORDER BY doc_id), 1, 20), ',')
               AS postings
    FROM tok GROUP BY term
    HAVING COUNT(*) >= 2
    """,
    tags=("text", "token-count", "inverted-index", "listagg"),
)
def q_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialized inverted index over documents: per-term exact
    df/cf plus the first 20 postings in doc-id order (capped so
    stopword rows stay bounded)."""
    docs = tables.load_table(spark, sf_dir, "documents")
    return text.inverted_index(docs, min_df=2, postings_cap=20)
