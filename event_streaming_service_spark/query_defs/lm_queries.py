"""Language-model-flavored text scoring (round 7): token entropy,
unigram-LM log-likelihood, BM25 retrieval scores, n-gram novelty.

Float discipline: every logarithm is a single float op on
exact-integer operands, pinned to integer micro/nano units with
floor(x·scale + 0.5) BEFORE any cross-row sum — so no aggregation
order can drift a hash. Ratios are truncating integer division
(Spark DIV == DuckDB // on every sign).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from event_streaming_service_spark.operators import text
from event_streaming_service_spark.queries import register
from event_streaming_service_spark.sources import tables

_TOK = (r"SELECT doc_id, tok FROM (SELECT doc_id,"
        r" unnest(string_split_regex(text, '\s+')) AS tok"
        r" FROM documents) WHERE tok <> ''")

BM25_TERMS = ("join", "hash", "scan", "window", "stream")
_TERMS_SQL = ", ".join(f"'{t}'" for t in BM25_TERMS)


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tables.load_table(spark, sf_dir, "documents")


@register(
    "token_entropy_per_doc",
    oracle=f"""
    WITH tc AS (
        SELECT doc_id, tok, COUNT(*) AS c FROM ({_TOK})
        GROUP BY doc_id, tok),
    per AS (
        SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_tokens,
               CAST(COUNT(*) AS BIGINT) AS n_distinct_tokens,
               CAST(SUM(c * CAST(FLOOR(LN(CAST(c AS DOUBLE)) * 1e9
                                       + 0.5) AS BIGINT))
                    AS BIGINT) AS s
        FROM tc GROUP BY doc_id)
    SELECT doc_id, n_tokens, n_distinct_tokens,
           ROUND(LN(CAST(n_tokens AS DOUBLE))
                 - (CAST(s AS DOUBLE) / 1.0e9)
                   / CAST(n_tokens AS DOUBLE), 6) AS entropy
    FROM per
    """,
    tags=("text", "quality", "entropy", "token-count"),
)
def q_token_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon entropy of each doc's token distribution (ln(c) pinned
    to integer nano-nats before the exact bigint fold)."""
    return text.token_entropy(_docs(spark, sf_dir))


@register(
    "unigram_lm_scores",
    oracle=f"""
    WITH tok AS ({_TOK}),
    v AS (SELECT tok, COUNT(*) AS c FROM tok GROUP BY tok),
    t AS (SELECT CAST(SUM(c) AS BIGINT) AS n_total FROM v),
    lm AS (SELECT tok,
                  CAST(FLOOR((LN(CAST(c AS DOUBLE))
                              - LN(CAST(n_total AS DOUBLE))) * 1e6
                             + 0.5) AS BIGINT) AS lp
           FROM v, t)
    SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
           CAST(SUM(lp) AS BIGINT) AS total_logprob_micro,
           CAST(CAST(SUM(lp) AS BIGINT) // COUNT(*) AS BIGINT)
               AS avg_logprob_micro
    FROM tok JOIN lm USING (tok) GROUP BY doc_id
    """,
    tags=("text", "lm", "quality", "token-count"),
)
def q_unigram_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-trained unigram LM log-likelihood per document — the
    cheapest perplexity proxy for curriculum ranking."""
    return text.unigram_lm_scores(_docs(spark, sf_dir))


@register(
    "bm25_doc_scores",
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
        FROM tf JOIN df USING (tok) JOIN dl USING (doc_id), st)
    SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_terms_hit,
           CAST(SUM(m) AS BIGINT) AS bm25_micro
    FROM sc GROUP BY doc_id
    """,
    tags=("text", "bm25", "tfidf", "token-count"),
)
def q_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Okapi BM25 (k1=1.2, b=0.75) of every document against a fixed
    query-term set; per-term scores pinned to micro-units before the
    exact per-doc sum."""
    return text.bm25_scores(_docs(spark, sf_dir), BM25_TERMS)


@register(
    "ngram_novelty_ratio",
    oracle=r"""
    WITH s AS (
        SELECT doc_id, unnest(list_distinct(list_transform(
                   range(1, greatest(len(toks) - 3, 1)),
                   i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
                        || ' ' || toks[i+3] || ' ' || toks[i+4])))
                   AS shingle
        FROM (SELECT doc_id,
                     list_filter(string_split_regex(text, '\s+'),
                                 t -> t <> '') AS toks
              FROM documents)
        WHERE len(toks) >= 5),
    f AS (SELECT doc_id, shingle,
                 MIN(doc_id) OVER (PARTITION BY shingle) AS first_doc
          FROM s)
    SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_shingles,
           CAST(COUNT(*) FILTER (first_doc < doc_id) AS BIGINT)
               AS n_seen_before,
           CAST((COUNT(*) - COUNT(*) FILTER (first_doc < doc_id))
                * 1000000 // COUNT(*) AS BIGINT) AS novelty_ppm
    FROM f GROUP BY doc_id
    """,
    tags=("text", "fingerprint", "dedup-jaccard", "novelty"),
)
def q_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc 5-gram novelty vs all earlier documents (ingestion
    order by id): exact ppm of shingles first seen here."""
    return text.ngram_novelty(_docs(spark, sf_dir), n=5)
