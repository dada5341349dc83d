"""Rolling-hash winnowing fingerprint queries
(operators/fingerprint.py): per-document fingerprint digests and the
shared-fingerprint near-duplicate pair join. The oracle reproduces the
numpy kernel's exact int64 arithmetic via windowed linear combinations
(winnow_grams_sql), so the whole chars -> gram hash -> winnow -> set
chain is hash-checked cross-engine."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from event_streaming_service_spark.operators import fingerprint
from event_streaming_service_spark.queries import register
from event_streaming_service_spark.sources import tables

MIN_SHARED = 2
MAX_DF = 50  # MOSS "too common to matter" document-frequency cap


@register(
    "winnow_fingerprint_stats",
    oracle=f"""
    WITH {fingerprint.winnow_grams_sql()}
    SELECT d.doc_id,
           CAST(COALESCE(g.n_grams, 0) AS BIGINT) AS n_grams,
           CAST(COALESCE(f.n_fp, 0) AS BIGINT) AS n_fp,
           CAST(COALESCE(f.fp_sum, 0) AS BIGINT) AS fp_sum,
           CAST(f.fp_min AS BIGINT) AS fp_min,
           CAST(f.fp_max AS BIGINT) AS fp_max
    FROM documents d
    LEFT JOIN (SELECT doc_id, count(*) AS n_grams
               FROM grams GROUP BY doc_id) g USING (doc_id)
    LEFT JOIN (SELECT doc_id, count(*) AS n_fp, sum(fp) AS fp_sum,
                      min(fp) AS fp_min, max(fp) AS fp_max
               FROM fps GROUP BY doc_id) f USING (doc_id)
    """,
    tags=("fingerprint", "dedup-fingerprint", "text", "2.12-fingerprint"),
)
def q_winnow_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowed rolling-hash fingerprints per document (MOSS): char
    8-gram polynomial hashes, window-4 minima, distinct-set digest.
    One Arrow mapInPandas pass, no shuffle (see
    operators/fingerprint.py)."""
    docs = tables.load_table(spark, sf_dir, "documents")
    return fingerprint.winnow_stats(docs)


@register(
    "winnow_shared_pairs",
    oracle=f"""
    WITH {fingerprint.winnow_grams_sql()},
    rare AS (
        SELECT f.doc_id, f.fp
        FROM fps f
        JOIN (SELECT fp FROM fps GROUP BY fp
              HAVING count(*) <= {MAX_DF}) r USING (fp)),
    sizes AS (SELECT doc_id, count(*) AS n_fp FROM rare GROUP BY doc_id),
    pairs AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               CAST(count(*) AS BIGINT) AS n_shared
        FROM rare a JOIN rare b
          ON a.fp = b.fp AND a.doc_id < b.doc_id
        GROUP BY a.doc_id, b.doc_id
        HAVING count(*) >= {MIN_SHARED})
    SELECT p.id_a, p.id_b, p.n_shared,
           CAST(sa.n_fp AS BIGINT) AS n_fp_a,
           CAST(sb.n_fp AS BIGINT) AS n_fp_b,
           CAST(p.n_shared * 1000000
                // (sa.n_fp + sb.n_fp - p.n_shared) AS BIGINT)
               AS jaccard_ppm
    FROM pairs p
    JOIN sizes sa ON sa.doc_id = p.id_a
    JOIN sizes sb ON sb.doc_id = p.id_b
    """,
    tags=("fingerprint", "dedup-fingerprint", "dedup-jaccard",
          "2.12-fingerprint"),
)
def q_winnow_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate candidate pairs by shared winnowed fingerprints:
    inverted-index self-join on the fingerprint value (posting-list
    candidates, never |docs|^2), exact fingerprint-set Jaccard in
    truncated ppm."""
    docs = tables.load_table(spark, sf_dir, "documents")
    return fingerprint.shared_fp_pairs(docs, MIN_SHARED, MAX_DF)
