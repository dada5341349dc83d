"""Multimodal-column queries (SURVEY.md section 2.12): binary payload
plumbing with typed metadata; decode stubbed (no codec libs in the
container), byte-level features and frame-sampling plumbing real."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from event_streaming_service_spark.operators import multimodal
from event_streaming_service_spark.queries import register
from event_streaming_service_spark.sources import tables


def _media(spark: SparkSession, sf_dir: str) -> DataFrame:
    return multimodal.attach_payload(
        tables.load_table(spark, sf_dir, "documents"))


@register(
    "multimodal_binary_metadata",
    oracle="""
    SELECT doc_id,
           octet_length(encode(text)) AS n_bytes,
           md5(text) AS payload_md5,
           ascii(SUBSTRING(text, 1, 1)) AS head_byte,
           CAST(doc_id % 64 + 16 AS INTEGER) AS width,
           CAST(doc_id % 48 + 16 AS INTEGER) AS height
    FROM documents
    """,
    tags=("multimodal",),
)
def q_multimodal_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary payload + typed metadata: byte length, content hash, and
    media dimensions — all JVM-side column ops over the binary column."""
    m = _media(spark, sf_dir)
    return m.select(
        "doc_id",
        F.length("payload").alias("n_bytes"),
        F.md5("payload").alias("payload_md5"),
        F.ascii(F.decode(F.substring("payload", 1, 1), "utf-8")).alias("head_byte"),
        F.col("media.width").alias("width"),
        F.col("media.height").alias("height"))


@register(
    "multimodal_frame_sample",
    oracle="""
    SELECT doc_id, unnest(range(0, CAST(doc_id % 30 + 1 AS INTEGER), 10))
               AS frame_idx,
           CAST(doc_id % 64 + 16 AS INTEGER) AS width,
           CAST(doc_id % 48 + 16 AS INTEGER) AS height
    FROM documents
    """,
    tags=("multimodal", "frame-sample"),
)
def q_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling: one row per sampled frame index (explode AFTER
    the sampling filter, so only kept frames materialize)."""
    out = multimodal.sample_frames(_media(spark, sf_dir), every_nth=10)
    return out.select("doc_id", out.frame_idx.cast("bigint").alias("frame_idx"),
                      "width", "height")


@register(
    "multimodal_features_stub",
    oracle=None,  # mapInPandas plumbing; deterministic but Python-side
    tags=("multimodal", "decode-stub"),
)
def q_features_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads
    (mapInPandas; the codec call is the stubbed step)."""
    return multimodal.extract_features(_media(spark, sf_dir))


@register(
    "multimodal_resize_plan",
    oracle="""
    WITH dims AS (
        SELECT doc_id,
               CAST(doc_id % 64 + 16 AS INTEGER) AS width,
               CAST(doc_id % 48 + 16 AS INTEGER) AS height
        FROM documents
    )
    SELECT doc_id, width, height,
           CAST(GREATEST(1, FLOOR(width * LEAST(1.0, 224.0 / width,
                                                224.0 / height)))
                AS INTEGER) AS target_w,
           CAST(GREATEST(1, FLOOR(height * LEAST(1.0, 224.0 / width,
                                                 224.0 / height)))
                AS INTEGER) AS target_h,
           CAST(GREATEST(1, FLOOR(width * LEAST(1.0, 224.0 / width,
                                                224.0 / height)))
                * GREATEST(1, FLOOR(height * LEAST(1.0, 224.0 / width,
                                                   224.0 / height)))
                * 3 AS BIGINT) AS target_bytes_rgb8
    FROM dims
    """,
    tags=("multimodal",),
)
def q_resize_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize planning: aspect-preserving fit into 224x224 without
    upscale — pure metadata arithmetic, no decode, so output-size
    accounting for a 100 TB resample job costs one narrow scan."""
    return multimodal.resize_plan(_media(spark, sf_dir))


@register(
    "multimodal_resize_stub",
    oracle=None,  # mapInPandas resample plumbing; codec call stubbed
    tags=("multimodal", "decode-stub"),
)
def q_resize_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The resample step itself as Arrow-batched plumbing (stub fake:
    payload clamped to the planned output size)."""
    return multimodal.resize_stub(_media(spark, sf_dir))
