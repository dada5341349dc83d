"""MMR diverse-retrieval query (operators/mmr.py): candidate top-C by
relevance, then the greedy diversity rerank — integer-pinned so the
recursive-CTE oracle replays the walk exactly."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from event_streaming_service_spark.operators import mmr
from event_streaming_service_spark.queries import register
from event_streaming_service_spark.sources import tables

MMR_QUERY_ID = 0
MMR_K = 10
MMR_N_CAND = 50


@register(
    "mmr_diverse_topk",
    oracle=mmr.mmr_select_sql(MMR_QUERY_ID, MMR_K, MMR_N_CAND),
    tags=("similarity", "ann-baseline", "mmr", "2.12-mmr"),
)
def q_mmr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal Marginal Relevance top-10 for query vector 0 over the
    top-50 relevance candidates: distributed candidate cosine + top-C,
    in-engine C^2 pairwise cosines, exact integer greedy walk
    (operators/mmr.py)."""
    emb = tables.load_table(spark, sf_dir, "embeddings")
    return mmr.mmr_select(emb, MMR_QUERY_ID, MMR_K, MMR_N_CAND)
