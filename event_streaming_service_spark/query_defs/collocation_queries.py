r"""Collocation query: top bigrams by PMI over `documents`
(operators/text.py:bigram_pmi) — the corpus-statistics step of
vocabulary induction, with the identical probability arithmetic
(left-associated double multiply, ln, 9 dp round) spelled out in the
DuckDB oracle so the float path is pinned cross-engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from event_streaming_service_spark.operators import text
from event_streaming_service_spark.queries import register
from event_streaming_service_spark.sources import tables

PMI_MIN_COUNT = 5
PMI_TOP_N = 50


@register(
    "bigram_pmi_top",
    oracle=rf"""
    WITH toks AS (
        SELECT list_filter(string_split_regex(text, '\s+'),
                           t -> t <> '') AS t
        FROM documents),
    uni AS (
        SELECT tok, COUNT(*) AS c
        FROM (SELECT unnest(t) AS tok FROM toks) GROUP BY tok),
    tot AS (SELECT CAST(SUM(c) AS BIGINT) AS n_tok FROM uni),
    big AS (
        SELECT u.w1 AS w1, u.w2 AS w2, COUNT(*) AS c_xy
        FROM (SELECT unnest(list_transform(
                  range(1, len(t)),
                  i -> struct_pack(w1 := t[i], w2 := t[i + 1]))) AS u
              FROM toks)
        GROUP BY 1, 2),
    btot AS (SELECT CAST(SUM(c_xy) AS BIGINT) AS n_big FROM big)
    SELECT w1, w2, c_xy AS pair_count,
           ROUND(LN((CAST(c_xy AS DOUBLE) * n_tok * n_tok)
                    / (CAST(n_big AS DOUBLE) * ux.c * uy.c)), 9) AS pmi
    FROM big
    JOIN uni ux ON big.w1 = ux.tok
    JOIN uni uy ON big.w2 = uy.tok, tot, btot
    WHERE c_xy >= {PMI_MIN_COUNT}
    ORDER BY pmi DESC, w1, w2
    LIMIT {PMI_TOP_N}
    """,
    tags=("text", "collocation", "pmi"),
)
def q_bigram_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-50 collocations by PMI (min pair count 5): one cached
    tokenization pass, unigram/bigram hash aggregates, broadcast
    vocabulary joins, TakeOrdered on the rounded score."""
    docs = tables.load_table(spark, sf_dir, "documents")
    return text.bigram_pmi(docs, "text", min_count=PMI_MIN_COUNT,
                           top_n=PMI_TOP_N)
