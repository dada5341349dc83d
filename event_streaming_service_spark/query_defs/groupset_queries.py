"""GROUPING SETS + embedding-centroid queries: the explicit
multi-grain aggregation surface (complementing the cube/pivot forms
in stats_queries) and the per-label prototype aggregation over
`embeddings` (operators/similarity.py:label_centroids).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from event_streaming_service_spark.operators import similarity
from event_streaming_service_spark.queries import register
from event_streaming_service_spark.sources import tables


@register(
    "orders_grouping_sets",
    oracle="""
    SELECT o_orderpriority, o_orderstatus,
           CAST(GROUPING(o_orderpriority, o_orderstatus) AS BIGINT)
               AS grouping_id,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT))
                AS BIGINT) AS total_cents
    FROM orders
    GROUP BY GROUPING SETS ((o_orderpriority, o_orderstatus),
                            (o_orderpriority), (o_orderstatus), ())
    """,
    tags=("A6", "grouping-sets"),
)
def q_orders_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS over orders: the four grains
    (priority x status, each alone, grand total) in one Expand-based
    pass with the engine's grouping_id disambiguating rows — the
    multi-grain report the reference's per-topic counters would need
    four queries for. Cents sums are exact bigints at every grain."""
    orders = tables.load_table(spark, sf_dir, "orders")
    cents = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)) \
             .cast("bigint")
    return (orders
            .groupingSets(
                [["o_orderpriority", "o_orderstatus"],
                 ["o_orderpriority"], ["o_orderstatus"], []],
                "o_orderpriority", "o_orderstatus")
            .agg(F.grouping_id().cast("bigint").alias("grouping_id"),
                 F.count(F.lit(1)).alias("n_orders"),
                 F.sum(cents).alias("total_cents")))


@register(
    "embedding_centroids_by_label",
    oracle="""
    WITH exploded AS (
        SELECT label,
               unnest(list_transform(
                   range(1, len(embedding) + 1),
                   i -> struct_pack(dim := i, val := embedding[i])))
                   AS u
        FROM embeddings)
    SELECT CAST(label AS BIGINT) AS label,
           CAST(u.dim AS BIGINT) AS dim,
           CAST(COUNT(*) AS BIGINT) AS n_vectors,
           ROUND(CAST(SUM(CAST(FLOOR(CAST(u.val AS DOUBLE) * 1e6 + 0.5)
                                AS BIGINT)) AS DOUBLE)
                 / CAST(COUNT(*) AS DOUBLE) / 1e6, 9) AS centroid
    FROM exploded
    GROUP BY label, u.dim
    """,
    tags=("similarity", "dedup-embedding", "ann-ivf-input"),
)
def q_embedding_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label 64-dim centroids in long form with exact micro-unit
    sums — the prototype refresh feeding the IVF coarse quantizer."""
    emb = tables.load_table(spark, sf_dir, "embeddings")
    out = similarity.label_centroids(emb)
    return out.select(F.col("label").cast("bigint").alias("label"),
                      F.col("dim").cast("bigint").alias("dim"),
                      "n_vectors", "centroid")
