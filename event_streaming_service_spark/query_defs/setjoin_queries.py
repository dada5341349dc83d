r"""Prefix-filtered set-similarity join query over `documents`
(operators/setjoin.py). The oracle is the NAIVE all-shared-token
quadratic join — independent of the prefix filter — so the filter's
exactness guarantee (no false negatives) is what the hash check
verifies, not a reimplementation of it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from event_streaming_service_spark.operators import setjoin
from event_streaming_service_spark.queries import register
from event_streaming_service_spark.sources import tables

T_NUM, T_DEN = 7, 10


@register(
    "set_similarity_pairs",
    oracle=rf"""
    WITH tok AS (
        SELECT DISTINCT doc_id, tok FROM (
            SELECT doc_id,
                   unnest(list_transform(
                       range(1, len(t) - 1),
                       i -> t[i] || ' ' || t[i + 1] || ' ' || t[i + 2]))
                       AS tok
            FROM (SELECT doc_id,
                         list_filter(string_split_regex(text, '\s+'),
                                     x -> x <> '') AS t
                  FROM documents))),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM tok GROUP BY doc_id),
    ov AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               COUNT(*) AS overlap
        FROM tok a JOIN tok b
          ON a.tok = b.tok AND a.doc_id < b.doc_id
        GROUP BY 1, 2)
    SELECT doc_a, doc_b, CAST(overlap AS BIGINT) AS overlap,
           CAST(sa.n + sb.n - overlap AS BIGINT) AS union_size,
           ROUND(CAST(overlap AS DOUBLE)
                 / CAST(sa.n + sb.n - overlap AS DOUBLE), 6) AS jaccard
    FROM ov
    JOIN sizes sa ON sa.doc_id = doc_a
    JOIN sizes sb ON sb.doc_id = doc_b
    WHERE overlap * {T_DEN} >= (sa.n + sb.n - overlap) * {T_NUM}
    """,
    tags=("dedup-jaccard", "ppjoin", "similarity"),
)
def q_set_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All document pairs with 3-shingle-set Jaccard >= 0.7 via the
    prefix filter (rarest-shingles-first candidate keys; exact integer
    accept test) — same answer as the naive shared-shingle join, a
    candidate set bounded by rare-shingle frequencies. Shingles (not
    unigrams): the fixture's 31-word vocabulary makes whole-doc
    unigram Jaccard a near-clique (5.1M pairs at sf0.1), while the
    27k-shingle space is selective (~256 pairs) — the same reason
    production near-dup joins operate on shingles."""
    docs = tables.load_table(spark, sf_dir, "documents")
    return setjoin.set_similarity_join(docs, threshold_num=T_NUM,
                                       threshold_den=T_DEN, shingle_n=3)
