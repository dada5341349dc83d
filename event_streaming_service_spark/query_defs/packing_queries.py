"""Sequence-packing query over `documents` (SURVEY.md section 2.12):
greedy token-budget packing verified against a recursive-CTE oracle
that walks the identical doc order with the identical overflow rule.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from event_streaming_service_spark.operators import packing
from event_streaming_service_spark.queries import register
from event_streaming_service_spark.sources import tables

TOKEN_BUDGET = 150
N_SHARDS = 8

# content-hash shard twin of packing.shard_of (28-bit md5 prefix —
# pattern-free, string-id-safe, and identical in both engines)
_SHARD = ("CAST('0x' || SUBSTRING(md5(CAST(doc_id AS VARCHAR)), 1, 7)"
          f" AS BIGINT) % {N_SHARDS}")

_ORACLE = f"""
WITH RECURSIVE toks AS (
    SELECT doc_id,
           CAST({_SHARD} AS INTEGER) AS shard,
           len(list_filter(string_split_regex(text, '\\s+'),
                           t -> t <> '')) AS n_tokens,
           ROW_NUMBER() OVER (PARTITION BY {_SHARD}
                              ORDER BY doc_id) AS seq
    FROM documents
),
-- the greedy walk is inherently sequential per shard: each step's bin
-- depends on the running fill, so the oracle recurses doc-by-doc
-- (breadth = shards, depth = docs per shard)
walk(shard, seq, doc_id, n_tokens, bin_id, fill) AS (
    SELECT shard, seq, doc_id, n_tokens, CAST(0 AS BIGINT), n_tokens
    FROM toks WHERE seq = 1
    UNION ALL
    SELECT t.shard, t.seq, t.doc_id, t.n_tokens,
           CASE WHEN w.fill > 0 AND w.fill + t.n_tokens > {TOKEN_BUDGET}
                THEN w.bin_id + 1 ELSE w.bin_id END,
           CASE WHEN w.fill > 0 AND w.fill + t.n_tokens > {TOKEN_BUDGET}
                THEN t.n_tokens ELSE w.fill + t.n_tokens END
    FROM walk w JOIN toks t ON t.shard = w.shard AND t.seq = w.seq + 1
)
SELECT doc_id, shard, n_tokens, bin_id,
       n_tokens > {TOKEN_BUDGET} AS oversize
FROM walk
"""


@register(
    "seq_packing",
    oracle=_ORACLE,
    tags=("packing", "2.12-packing", "2.11"),
)
def q_seq_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy sequence packing into {TOKEN_BUDGET}-token context
    windows, 8-way sharded: one shuffle on the shard key, then a
    linear Arrow-batched walk per shard (the rule is sequential within
    a shard by construction — bin boundaries depend on every prior
    doc — and embarrassingly parallel across shards)."""
    docs = tables.load_table(spark, sf_dir, "documents")
    return packing.pack_sequences(docs, TOKEN_BUDGET, N_SHARDS)
