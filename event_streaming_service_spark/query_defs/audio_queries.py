"""Audio-column queries: REAL WAV decode (SURVEY.md section 2.12,
"multimodal columns" — audio leg).

Each document carries a genuine RIFF/PCM16 WAV (pure-stdlib codec,
functions/wav_codec.py) with deterministic samples

    sample(i, ch) = ((doc_id % 97) * 31 + i*7 + ch*13) % 2048 - 1024

so an independent SQL oracle regenerates every sample arithmetically
and aggregates the same exact integers the real decoder produces — a
single flipped byte anywhere in the encode→chunk-walk→decode chain
breaks the hash. Mono/stereo alternates by doc parity, exercising the
channel-deinterleave path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from event_streaming_service_spark.operators import multimodal
from event_streaming_service_spark.queries import register
from event_streaming_service_spark.sources import tables

_PARAMS = """
    params AS (
        SELECT doc_id,
               CAST(doc_id % 800 + 100 AS BIGINT) AS n_frames,
               CAST(1 + doc_id % 2 AS BIGINT) AS n_ch
        FROM documents)
"""

_SAMPLE_V = "((doc_id % 97) * 31 + i * 7 + ch * 13) % 2048 - 1024"


def _wav(spark: SparkSession, sf_dir: str) -> DataFrame:
    return multimodal.attach_wav_payload(
        tables.load_table(spark, sf_dir, "documents"))


@register(
    "audio_features_wav",
    oracle=f"""
    WITH {_PARAMS},
    frames AS (SELECT doc_id, n_frames, n_ch,
                      unnest(range(0, n_frames)) AS i
               FROM params),
    samp AS (SELECT doc_id, n_frames, n_ch, i, ch, {_SAMPLE_V} AS v
             FROM (SELECT *, unnest(range(0, n_ch)) AS ch FROM frames)),
    zc AS (
        SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_zero_cross FROM (
            SELECT doc_id, (v < 0) AS neg,
                   LAG(v < 0) OVER (PARTITION BY doc_id ORDER BY i) AS pneg
            FROM samp WHERE ch = 0)
        WHERE pneg IS NOT NULL AND neg <> pneg
        GROUP BY doc_id)
    SELECT s.doc_id,
           CAST(8000 AS INTEGER) AS sample_rate,
           CAST(MAX(s.n_ch) AS INTEGER) AS n_channels,
           MAX(s.n_frames) AS n_frames,
           MAX(s.n_frames) * 1000.0 / 8000 AS duration_ms,
           CAST(SUM(CASE WHEN ch = 0 THEN v END) AS BIGINT) AS ch0_sum,
           CAST(SUM(CASE WHEN ch = 1 THEN v END) AS BIGINT) AS ch1_sum,
           CAST(SUM(CASE WHEN ch = 0 THEN v * v END) AS BIGINT)
               AS ch0_sumsq,
           CAST(MIN(v) AS INTEGER) AS samp_min,
           CAST(MAX(v) AS INTEGER) AS samp_max,
           COALESCE(MAX(z.n_zero_cross), 0) AS n_zero_cross
    FROM samp s LEFT JOIN zc z USING (doc_id)
    GROUP BY s.doc_id
    """,
    tags=("multimodal", "decode-wav", "audio"),
)
def q_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio decode + feature extraction: RIFF chunk walk, PCM16
    deinterleave, then exact integer statistics (per-channel sums,
    channel-0 energy, sample range, zero crossings). Rate/channels/
    frame count come from the DECODED header, not the metadata."""
    return multimodal.extract_features_wav(_wav(spark, sf_dir))


@register(
    "audio_resample_wav",
    oracle=f"""
    WITH {_PARAMS},
    outs AS (SELECT doc_id, n_frames, n_ch,
                    (n_frames * 4000) // 8000 AS out_n
             FROM params),
    idx AS (SELECT doc_id, n_frames, n_ch, out_n,
                   unnest(range(0, out_n)) AS j
            FROM outs),
    src AS (SELECT *, (j * n_frames) // out_n AS i FROM idx),
    samp AS (SELECT doc_id, n_frames, n_ch, out_n, ch, {_SAMPLE_V} AS v
             FROM (SELECT *, unnest(range(0, n_ch)) AS ch FROM src))
    SELECT doc_id, MAX(n_frames) AS n_frames, MAX(out_n) AS out_frames,
           CAST(4000 AS INTEGER) AS out_rate,
           CAST(SUM(CASE WHEN ch = 0 THEN v END) AS BIGINT) AS ch0_sum,
           CAST(SUM(CASE WHEN ch = 1 THEN v END) AS BIGINT) AS ch1_sum,
           CAST(44 + MAX(out_n) * MAX(n_ch) * 2 AS INTEGER) AS out_bytes
    FROM samp GROUP BY doc_id
    """,
    tags=("multimodal", "decode-wav", "audio"),
)
def q_audio_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL resample: decode, nearest-neighbor decimate 8 kHz → 4 kHz
    (src = (dst * n) // out_n, reproduced by the oracle), re-encode.
    out_bytes is checkable too — a canonical PCM16 WAV is exactly
    44 + frames * channels * 2 bytes."""
    return multimodal.resample_wav(_wav(spark, sf_dir), target_rate=4000)


@register(
    "audio_fingerprint_dupes",
    oracle=f"""
    WITH {_PARAMS},
    ts AS (SELECT doc_id, n_frames, unnest(range(0, 64)) AS t
           FROM params),
    samp AS (SELECT doc_id, t,
                    ((doc_id % 97) * 31 + ((t * n_frames) // 64) * 7)
                        % 2048 - 1024 AS s
             FROM ts),
    bits AS (
        SELECT a.doc_id, a.t,
               CASE WHEN b.s > a.s THEN 1 ELSE 0 END AS bit
        FROM samp a JOIN samp b
          ON b.doc_id = a.doc_id AND b.t = a.t + 1
        WHERE a.t < 63),
    bytes AS (
        SELECT doc_id, t // 8 AS j,
               CAST(SUM(bit * (1 << CAST(t % 8 AS INTEGER)))
                    AS INTEGER) AS byte
        FROM bits GROUP BY doc_id, t // 8),
    hashes AS (
        SELECT doc_id, string_agg(printf('%02x', byte), '' ORDER BY j)
                   AS afp
        FROM bytes GROUP BY doc_id)
    SELECT afp, CAST(COUNT(*) AS BIGINT) AS n_clips,
           CAST(MIN(doc_id) AS BIGINT) AS min_doc_id
    FROM hashes GROUP BY afp
    """,
    tags=("multimodal", "audio", "decode-wav", "dedup-exact"),
)
def q_audio_fingerprint_dupes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Acoustic near-dup groups: REAL WAV decode, channel-0 decimation
    to 64 points, sign-of-derivative bit fingerprint, grouped by
    fingerprint — the audio arm of the dedup family. The oracle
    regenerates the waveform arithmetically and rebuilds the identical
    hex fingerprint in SQL."""
    from pyspark.sql import functions as F

    fp = multimodal.audio_fingerprint_wav(_wav(spark, sf_dir))
    return (fp.groupBy("afp")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_clips"),
                 F.min("doc_id").cast("bigint").alias("min_doc_id")))
