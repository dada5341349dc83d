"""Hybrid-retrieval rank fusion (round 7, third wave): RRF over a
lexical BM25 ranking and a term-overlap ranking of the same document
corpus — the two-ranker shape of a production hybrid search stack
(swap the second ranker for embedding cosine and nothing changes).

Both rankings are total-ordered (score DESC, doc_id) row_numbers, so
the fused integer arithmetic (1e6 DIV (60 + rank), summed exactly) is
bit-identical in DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from event_streaming_service_spark.operators import retrieval, text
from event_streaming_service_spark.operators.linkage import global_rank
from event_streaming_service_spark.queries import register
from event_streaming_service_spark.query_defs.lm_queries import (
    _TERMS_SQL,
    _TOK,
    BM25_TERMS,
)
from event_streaming_service_spark.sources import tables


@register(
    "rrf_fused_topk",
    oracle=f"""
    WITH tok AS ({_TOK}),
    dl AS (SELECT doc_id, COUNT(*) AS dl FROM tok GROUP BY doc_id),
    st AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
                  CAST(SUM(dl) AS BIGINT) AS total_dl
           FROM dl),
    tf AS (SELECT doc_id, tok, COUNT(*) AS tf FROM tok
           WHERE tok IN ({_TERMS_SQL}) GROUP BY doc_id, tok),
    df AS (SELECT tok, COUNT(*) AS df FROM tf GROUP BY tok),
    sc AS (
        SELECT tf.doc_id,
               CAST(FLOOR(
                   LN((CAST(n_docs AS DOUBLE) - CAST(df AS DOUBLE)
                       + 0.5) / (CAST(df AS DOUBLE) + 0.5) + 1.0)
                   * ((CAST(tf AS DOUBLE) * 2.2)
                      / (CAST(tf AS DOUBLE)
                         + 1.2 * (0.25 + (0.75 * CAST(dl AS DOUBLE))
                                  / (CAST(total_dl AS DOUBLE)
                                     / CAST(n_docs AS DOUBLE)))))
                   * 1e6 + 0.5) AS BIGINT) AS m
        FROM tf JOIN df USING (tok) JOIN dl USING (doc_id), st),
    bm25 AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_terms_hit,
                    CAST(SUM(m) AS BIGINT) AS bm25_micro
             FROM sc GROUP BY doc_id),
    rank_a AS (SELECT doc_id,
                      ROW_NUMBER() OVER (ORDER BY bm25_micro DESC,
                                         n_terms_hit DESC, doc_id)
                          AS rank
               FROM bm25),
    ovl AS (SELECT doc_id,
                   CAST(COUNT(DISTINCT tok) AS BIGINT) AS n_terms,
                   CAST(COUNT(*) AS BIGINT) AS n_hits
            FROM tok WHERE tok IN ({_TERMS_SQL}) GROUP BY doc_id),
    rank_b AS (SELECT doc_id,
                      ROW_NUMBER() OVER (ORDER BY n_terms DESC,
                                         n_hits DESC, doc_id) AS rank
               FROM ovl),
    contrib AS (
        SELECT doc_id, 1000000 // (60 + rank) AS c FROM rank_a
        UNION ALL
        SELECT doc_id, 1000000 // (60 + rank) AS c FROM rank_b)
    SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_rankers,
           CAST(SUM(c) AS BIGINT) AS rrf_micro
    FROM contrib GROUP BY doc_id
    ORDER BY rrf_micro DESC, doc_id LIMIT 20
    """,
    tags=("text", "bm25", "retrieval", "similarity"),
)
def q_rrf_fused_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocal Rank Fusion of a BM25 ranking and a term-overlap
    ranking over the fixed query-term set; integer DIV contributions
    (operators/retrieval.py:rrf_fuse)."""
    docs = tables.load_table(spark, sf_dir, "documents")
    # ranks come from linkage.global_rank (range-partition + prefix
    # offsets), not a partition-less row_number window — no
    # single-task global sort at any corpus size; DESC orders ride
    # as negated columns since global_rank sorts ascending.
    bm25 = text.bm25_scores(docs, BM25_TERMS)
    rank_a = global_rank(
        bm25.select("doc_id",
                    (-F.col("bm25_micro")).alias("__n1"),
                    (-F.col("n_terms_hit")).alias("__n2")),
        ["__n1", "__n2", "doc_id"]).select("doc_id", "rank")
    tok = docs.select(
        F.col("doc_id"),
        F.explode(text.tokens(F.col("text"))).alias("tok"))
    ovl = (tok.where(F.col("tok").isin(list(BM25_TERMS)))
           .groupBy("doc_id")
           .agg(F.countDistinct("tok").alias("n_terms"),
                F.count(F.lit(1)).alias("n_hits")))
    rank_b = global_rank(
        ovl.select("doc_id",
                   (-F.col("n_terms")).alias("__n1"),
                   (-F.col("n_hits")).alias("__n2")),
        ["__n1", "__n2", "doc_id"]).select("doc_id", "rank")
    return retrieval.rrf_fuse([rank_a, rank_b], top_n=20)
