"""Embedding-quantization query (operators/quantize.py): SQ8 over the
`embeddings` fixture with the full codebook assignment pinned by an
integer checksum and the reconstruction error by an order-independent
max — every float step mirrored literally in the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from event_streaming_service_spark.operators import quantize
from event_streaming_service_spark.queries import register
from event_streaming_service_spark.sources import tables


@register(
    "embedding_quantize_int8",
    oracle="""
    WITH dims AS (
        SELECT pos, MIN(CAST(val AS DOUBLE)) AS mn,
               MAX(CAST(val AS DOUBLE)) AS mx
        FROM (SELECT unnest(embedding) AS val,
                     generate_subscripts(embedding, 1) AS pos
              FROM embeddings)
        GROUP BY pos),
    stats AS (
        SELECT list(mn ORDER BY pos) AS mns,
               list(mx ORDER BY pos) AS mxs
        FROM dims),
    q AS (
        SELECT vec_id, embedding, mns, mxs,
               list_transform(range(1, len(embedding) + 1), i ->
                   CASE WHEN mxs[i] > mns[i]
                        THEN CAST(FLOOR((CAST(embedding[i] AS DOUBLE)
                                         - mns[i]) * 254.0
                                        / (mxs[i] - mns[i]) + 0.5)
                                  AS INTEGER) - 127
                        ELSE 0 END) AS qv
        FROM embeddings, stats)
    SELECT vec_id,
           CAST(list_sum(list_transform(qv, x -> abs(x))) AS BIGINT)
               AS q_l1,
           ROUND(list_max(list_transform(
               range(1, len(qv) + 1), i ->
                   abs(CASE WHEN mxs[i] > mns[i]
                            THEN mns[i] + (qv[i] + 127)
                                 * (mxs[i] - mns[i]) / 254.0
                            ELSE mns[i] END
                       - CAST(embedding[i] AS DOUBLE)))), 9)
               AS max_abs_err
    FROM q
    """,
    tags=("similarity", "quantize", "embedding"),
)
def q_embedding_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global-envelope int8 scalar quantization of all 64-dim fixture
    embeddings: one tiny stats shuffle + one broadcast pass."""
    emb = tables.load_table(spark, sf_dir, "embeddings")
    return quantize.scalar_quantize_int8(emb)


@register(
    "embedding_gram_matrix",
    oracle="""
    WITH q AS (
        SELECT vec_id, i,
               CAST(FLOOR(CAST(embedding[i] AS DOUBLE) * 1000 + 0.5)
                    AS BIGINT) AS qv
        FROM (SELECT vec_id, embedding,
                     unnest(range(1, len(embedding) + 1)) AS i
              FROM embeddings))
    SELECT a.i, b.i AS j,
           CAST(SUM(a.qv * b.qv) AS BIGINT) AS gram
    FROM q a JOIN q b ON a.vec_id = b.vec_id AND a.i <= b.i
    GROUP BY a.i, b.i
    """,
    tags=("similarity", "quantize", "embedding", "linalg",
          "udf-kernel"),
)
def q_embedding_gram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact quantized Gram matrix over the embedding corpus
    (operators/quantize.py:gram_matrix): per-partition BLAS Q^T Q
    tree-aggregate, d*(d+1)/2 upper-triangle rows out. The oracle
    pays the explode + self-join shape (n_vecs * d^2/2 pairs) the
    kernel exists to avoid."""
    emb = tables.load_table(spark, sf_dir, "embeddings")
    return quantize.gram_matrix(emb)


from event_streaming_service_spark.operators import pca  # noqa: E402


@register(
    "pca_pc1_scores",
    oracle=pca.pc1_oracle_sql(dim=64, rounds=8),
    tags=("similarity", "quantize", "embedding", "linalg",
          "udf-kernel", "iterative"),
)
def q_pca_pc1_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-principal-axis score per embedding
    (operators/pca.py:pc1_power_scores): 8 rounds of exact
    fixed-point power iteration on the integer Gram matrix (the
    gram_matrix tree-aggregate kernel; the iteration itself runs
    driver-side over the collected 64x64 grid — bounded,
    data-independent), then one literal-eigenvector projection per
    vector. Everything integer: milli-quantized components, exact
    matvec, truncating 1e6-fixed-point rescale — the oracle unrolls
    the identical 8 rounds over a HUGEINT grid."""
    emb = tables.load_table(spark, sf_dir, "embeddings")
    return pca.pc1_power_scores(emb, rounds=8)
