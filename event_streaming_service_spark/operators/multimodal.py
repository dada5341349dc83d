"""Multimodal column plumbing (SURVEY.md section 2.12).

Image/audio/video payloads are opaque `binary` columns with a typed
metadata struct; decode / feature-extract / resize / frame-sample run
as Arrow-batched Pandas UDFs over `mapInPandas`. The decode step needs
codec libraries that are not in this container, so it is STUBBED
behind `decode_stub` (clearly marked NotImplementedError for real
codecs, deterministic byte-level features otherwise) — the Spark-side
plumbing (schema, batching, partitioning, UDF signatures) is real and
tested.

Scale notes: binary payloads ride the normal columnar path (parquet
binary + Arrow batches); mapInPandas processes whole record batches so
per-row Python overhead is amortized; frame sampling explodes rows
*after* the filter so only sampled frames materialize.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_METADATA = T.StructType([
    T.StructField("media_type", T.StringType()),
    T.StructField("codec", T.StringType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("n_frames", T.IntegerType()),
])


def attach_payload(docs: DataFrame, id_col: str = "doc_id",
                   text_col: str = "text") -> DataFrame:
    """Synthesize an opaque binary payload + typed metadata from the
    documents fixture (the real pipeline reads these from parquet
    binary columns; the schema contract is identical)."""
    payload = F.encode(F.col(text_col), "utf-8")
    meta = F.struct(
        F.lit("image").alias("media_type"),
        F.lit("fake-rgb8").alias("codec"),
        (F.pmod(F.col(id_col), F.lit(64)) + 16).cast("int").alias("width"),
        (F.pmod(F.col(id_col), F.lit(48)) + 16).cast("int").alias("height"),
        (F.pmod(F.col(id_col), F.lit(30)) + 1).cast("int").alias("n_frames"),
    )
    return docs.select(id_col, payload.alias("payload"), meta.alias("media"))


FEATURE_SCHEMA = (
    "doc_id bigint, n_bytes int, head_byte int, byte_sum_mod bigint, "
    "width int, height int"
)


def extract_features(media_df: DataFrame, codec_libs_available: bool = False
                     ) -> DataFrame:
    """Decode + feature-extract via mapInPandas (Arrow batches).

    With real codec libraries this would decode `payload` per
    media.codec and emit model features; the container has none, so
    requesting a real decode raises NotImplementedError and the default
    path computes deterministic byte-level features (real computation,
    real batch shape — only the codec call is faked).
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if codec_libs_available:
                raise NotImplementedError(
                    "real image/audio decode needs codec libs not present "
                    "in this container (PIL/ffmpeg); plug them in here")
            payloads = pdf["payload"]
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "n_bytes": payloads.map(len).astype("int32"),
                "head_byte": payloads.map(
                    lambda b: b[0] if len(b) else -1).astype("int32"),
                "byte_sum_mod": payloads.map(
                    lambda b: sum(b) % 1_000_003).astype("int64"),
                "width": pdf["media"].map(lambda m: m["width"]).astype("int32"),
                "height": pdf["media"].map(lambda m: m["height"]).astype("int32"),
            })

    return media_df.mapInPandas(batches, FEATURE_SCHEMA)


def resize_plan(media_df: DataFrame, max_w: int = 224, max_h: int = 224
                ) -> DataFrame:
    """Aspect-preserving fit into (max_w, max_h), never upscaling:
    scale = min(1, max_w/w, max_h/h); target dims floor to >= 1 px.

    The dimension planning is pure JVM-side arithmetic on the metadata
    struct (codegen'd, SQL-oracle-able, no Python); only the pixel
    resample itself touches payload bytes — see resize_stub. Splitting
    the two means the planner can drive batch-size / output-size
    accounting for 100 TB jobs without decoding anything.
    """
    w, h = F.col("media.width"), F.col("media.height")
    scale = F.least(F.lit(1.0), F.lit(max_w) / w, F.lit(max_h) / h)
    return media_df.select(
        "doc_id", w.alias("width"), h.alias("height"),
        F.greatest(F.lit(1), F.floor(w * scale)).cast("int").alias("target_w"),
        F.greatest(F.lit(1), F.floor(h * scale)).cast("int").alias("target_h"),
        (F.greatest(F.lit(1), F.floor(w * scale))
         * F.greatest(F.lit(1), F.floor(h * scale)) * 3)
        .cast("bigint").alias("target_bytes_rgb8"),
    )


RESIZE_SCHEMA = "doc_id bigint, target_w int, target_h int, n_bytes int"


def resize_stub(media_df: DataFrame, max_w: int = 224, max_h: int = 224,
                codec_libs_available: bool = False) -> DataFrame:
    """The pixel-resample step as mapInPandas plumbing: real batch
    shape, real planned dimensions; the actual decode+resample raises
    until codec libs exist (deterministic byte-slice fake otherwise)."""

    planned = resize_plan(media_df, max_w, max_h).join(
        media_df.select("doc_id", "payload"), "doc_id")

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if codec_libs_available:
                raise NotImplementedError(
                    "real resample needs PIL/ffmpeg; plug the decode + "
                    "interpolation in here")
            n = (pdf["target_w"] * pdf["target_h"] * 3).astype("int64")
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "target_w": pdf["target_w"],
                "target_h": pdf["target_h"],
                # fake: clamp payload to the planned output size
                "n_bytes": [min(len(b), int(m))
                            for b, m in zip(pdf["payload"], n)],
            })

    return planned.mapInPandas(batches, RESIZE_SCHEMA)


def sample_frames(media_df: DataFrame, every_nth: int = 10) -> DataFrame:
    """Frame sampling: explode one row per sampled frame index — the
    row-multiplying step runs AFTER filtering so only kept frames
    materialize. Decode of the sampled frame is the stubbed step."""
    idx = F.sequence(F.lit(0), F.col("media.n_frames") - 1, F.lit(every_nth))
    return (
        media_df
        .withColumn("frame_idx", F.explode(idx))
        .select("doc_id", "frame_idx", "media.width", "media.height")
    )
