"""Multimodal column plumbing (SURVEY.md section 2.12).

Image/audio/video payloads are opaque `binary` columns with a typed
metadata struct; decode / feature-extract / resize / frame-sample run
as Arrow-batched Pandas UDFs over `mapInPandas`.

PNG decode is REAL (round-4): functions/png_codec.py implements the
full container — chunk CRCs, zlib inflate, all five scanline filters —
with nothing but the stdlib, so `attach_png_payload` /
`extract_features_png` / `resize_png` below are byte-exact operators
whose channel statistics an independent SQL oracle reproduces. Only
formats that genuinely need external codec libraries absent from this
container (JPEG, audio, video frames) remain STUBBED behind
`codec_libs_available` (clearly marked NotImplementedError).

Scale notes: binary payloads ride the normal columnar path (parquet
binary + Arrow batches); mapInPandas processes whole record batches so
per-row Python overhead is amortized; one image-decode is the unit of
parallel work; frame sampling explodes rows *after* the filter so only
sampled frames materialize.
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


# ---- real PNG path (functions/png_codec.py) -------------------------

# Deterministic synthetic image: pixel(x, y, c) =
#   (doc_id % 128) + (x % 32) + (y % 32) + 10*c     (max 209, fits u8)
# Every term is integer arithmetic an ANSI-SQL oracle reproduces
# exactly, and the x/y gradients + per-channel offset make the image
# non-constant so the PNG filters do real work.
PNG_PIXEL_BASE_MOD = 128
PNG_GRADIENT_MOD = 32
PNG_CHANNEL_STEP = 10


def _png_dims(doc_id: int) -> tuple[int, int]:
    return int(doc_id) % 64 + 16, int(doc_id) % 48 + 16  # (w, h)


def _png_pixels(doc_id: int) -> "np.ndarray":
    import numpy as np

    w, h = _png_dims(doc_id)
    base = int(doc_id) % PNG_PIXEL_BASE_MOD
    xg = np.arange(w) % PNG_GRADIENT_MOD
    yg = np.arange(h) % PNG_GRADIENT_MOD
    plane = base + np.add.outer(yg, xg)          # (h, w)
    chans = np.arange(3) * PNG_CHANNEL_STEP
    return (plane[:, :, None] + chans[None, None, :]).astype("uint8")


def attach_png_payload(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Fixture prep for the real-decode path: one genuine PNG per
    document (encoded by the pure-stdlib codec, deterministic gradient
    pixels derived from the doc id) plus the typed metadata struct.
    Production replaces this with a parquet binary column scan; the
    schema contract downstream is identical."""
    from event_streaming_service_spark.functions import png_codec

    out_schema = ("doc_id bigint, payload binary,"
                  " media struct<media_type:string,codec:string,"
                  "width:int,height:int,n_frames:int>")

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids = pdf[id_col].astype("int64")
            rows = []
            for doc_id in ids:
                w, h = _png_dims(doc_id)
                rows.append({
                    "doc_id": doc_id,
                    "payload": png_codec.encode_png(_png_pixels(doc_id)),
                    "media": {"media_type": "image", "codec": "png",
                              "width": w, "height": h, "n_frames": 1},
                })
            yield pd.DataFrame(rows)

    return docs.select(id_col).mapInPandas(batches, out_schema)


PNG_FEATURE_SCHEMA = (
    "doc_id bigint, width int, height int, "
    "ch0_sum bigint, ch1_sum bigint, ch2_sum bigint, "
    "px_min int, px_max int"
)


def extract_features_png(media_df: DataFrame) -> DataFrame:
    """REAL image feature extraction: decode the PNG payload (CRC
    checks, inflate, unfilter) and emit exact per-channel integer sums
    and the pixel range — numbers an independent SQL oracle recomputes
    from the pixel formula, proving the decode is byte-exact end to
    end. Dimensions come from the DECODED header, not the metadata
    struct, so a payload/metadata mismatch surfaces as a hash break."""
    from event_streaming_service_spark.functions import png_codec

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                arr = png_codec.decode_png(bytes(payload))
                h, w, _ = arr.shape
                sums = arr.reshape(-1, 3).sum(axis=0, dtype="int64")
                rows.append((int(doc_id), w, h,
                             int(sums[0]), int(sums[1]), int(sums[2]),
                             int(arr.min()), int(arr.max())))
            yield pd.DataFrame(rows, columns=[
                "doc_id", "width", "height", "ch0_sum", "ch1_sum",
                "ch2_sum", "px_min", "px_max"])

    return media_df.mapInPandas(batches, PNG_FEATURE_SCHEMA)


PNG_RESIZE_SCHEMA = (
    "doc_id bigint, width int, height int, target_w int, target_h int, "
    "ch0_sum bigint, ch1_sum bigint, ch2_sum bigint, out_bytes int"
)


def resize_png(media_df: DataFrame, target_w: int, target_h: int
               ) -> DataFrame:
    """REAL resample: decode, nearest-neighbor resize to
    (target_w, target_h) — integer index math `src = (dst*size)//target`
    an SQL oracle reproduces — re-encode, and emit the resized
    channel sums plus the re-encoded size. The decode→resample→encode
    chain exercises the whole codec both directions per row."""
    from event_streaming_service_spark.functions import png_codec

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                arr = png_codec.decode_png(bytes(payload))
                h, w, _ = arr.shape
                small = png_codec.resize_nearest(arr, target_w, target_h)
                sums = small.reshape(-1, 3).sum(axis=0, dtype="int64")
                out = png_codec.encode_png(small)
                rows.append((int(doc_id), w, h, target_w, target_h,
                             int(sums[0]), int(sums[1]), int(sums[2]),
                             len(out)))
            yield pd.DataFrame(rows, columns=[
                "doc_id", "width", "height", "target_w", "target_h",
                "ch0_sum", "ch1_sum", "ch2_sum", "out_bytes"])

    return media_df.mapInPandas(batches, PNG_RESIZE_SCHEMA)


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
