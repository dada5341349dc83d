"""Deterministic-sampling queries over `documents` (SURVEY.md
section 2.12): the training-data-mixture surface — downsample dominant
languages, keep rare ones, and draw fixed per-source quotas — with the
identical content-hash draw verified in SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from event_streaming_service_spark.operators import sampling
from event_streaming_service_spark.queries import register
from event_streaming_service_spark.sources import tables

# language-mixture reweighting: downsample the dominant language hard,
# keep rare languages in full; strata absent from the map (es, zh) use
# the default — exercising map hit, map miss, and the 1.0 edge
LANG_RATES = {"en": 0.25, "fr": 1.0}
LANG_DEFAULT_RATE = 0.5

# fixed per-source quotas: under-subscribed (25-row sources vs quota
# 40) and over-subscribed (quota 8) strata plus the default
SOURCE_QUOTAS = {"src0": 8, "src1": 40}
SOURCE_DEFAULT_QUOTA = 3

_HASH = sampling.sample_hash_sql("doc_id")


def _rate_case(col: str, rates: dict[str, float], default: float) -> str:
    whens = " ".join(
        f"WHEN '{s}' THEN {int(r * sampling.HASH_SPACE)}"
        for s, r in sorted(rates.items()))
    return (f"CASE {col} {whens} "
            f"ELSE {int(default * sampling.HASH_SPACE)} END")


def _quota_case(col: str, quotas: dict[str, int], default: int) -> str:
    whens = " ".join(
        f"WHEN '{s}' THEN {n}" for s, n in sorted(quotas.items()))
    return f"CASE {col} {whens} ELSE {default} END"


@register(
    "sampling_surface",
    oracle=f"""
    SELECT 'rate' AS kind, doc_id, lang AS stratum
    FROM documents
    WHERE {_HASH} < {_rate_case("lang", LANG_RATES, LANG_DEFAULT_RATE)}
    UNION ALL
    SELECT 'quota', doc_id, source
    FROM (
        SELECT doc_id, source,
               ROW_NUMBER() OVER (PARTITION BY source
                                  ORDER BY {_HASH}, doc_id) AS rk
        FROM documents)
    WHERE rk <= {_quota_case("source", SOURCE_QUOTAS, SOURCE_DEFAULT_QUOTA)}
    """,
    tags=("sampling", "2.12-sampling"),
)
def q_sampling_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic corpus sampling, both modes in one result:
    `rate` rows — per-language mixture reweighting (hash-threshold
    Bernoulli, stateless filter); `quota` rows — fixed per-source draw
    (rank-by-hash within stratum). Content-derived hashes make the
    sample reproducible across runs, partitionings, and engines —
    which is exactly what `DataFrame.sample` cannot promise."""
    docs = tables.load_table(spark, sf_dir, "documents")
    rate_leg = (
        sampling.stratified_sample(docs, LANG_RATES, "lang",
                                   default_rate=LANG_DEFAULT_RATE)
        .select(F.lit("rate").alias("kind"), "doc_id",
                F.col("lang").alias("stratum")))
    quota_leg = (
        sampling.quota_sample(docs, SOURCE_QUOTAS, "source",
                              default_quota=SOURCE_DEFAULT_QUOTA)
        .select(F.lit("quota").alias("kind"), "doc_id",
                F.col("source").alias("stratum")))
    return rate_leg.unionByName(quota_leg)


WEIGHTED_N = 200


@register(
    "weighted_sample_by_length",
    oracle=f"""
    SELECT doc_id, lang, source, n_chars, samp_key FROM (
        SELECT doc_id, lang, source, n_chars,
               ROUND(POW((CAST('0x' || SUBSTRING(md5(CAST(doc_id AS VARCHAR)),
                                                 1, 7) AS BIGINT) + 1.0)
                         / 268435456.0,
                         1.0 / CAST(n_chars AS DOUBLE)), 12) AS samp_key,
               ROW_NUMBER() OVER (
                   ORDER BY ROUND(POW((CAST('0x' ||
                       SUBSTRING(md5(CAST(doc_id AS VARCHAR)), 1, 7)
                       AS BIGINT) + 1.0) / 268435456.0,
                       1.0 / CAST(n_chars AS DOUBLE)), 12) DESC,
                            doc_id) AS rk
        FROM documents)
    WHERE rk <= {WEIGHTED_N}
    """,
    tags=("sampling", "2.12-sampling", "weighted"),
)
def q_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-weighted deterministic sample (Efraimidis-Spirakis A-Res,
    content-hash randomness): longer documents are proportionally more
    likely to be drawn — the mixture-reweighting primitive. Global
    top-n runs as TakeOrdered (per-partition partial top-n), never a
    full sort."""
    docs = tables.load_table(spark, sf_dir, "documents").drop("text")
    return sampling.weighted_sample(docs, WEIGHTED_N, "n_chars")

NEYMAN_N = 100


@register(
    "neyman_stratified_sample",
    oracle=f"""
    WITH stats AS (
        SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_h,
               CAST(SUM(n_chars) AS BIGINT) AS sx,
               CAST(SUM(n_chars * n_chars) AS BIGINT) AS sxx
        FROM documents GROUP BY lang),
    alloc AS (
        SELECT lang, n_h,
               CAST(FLOOR(sqrt(CAST(n_h * sxx - sx * sx AS DOUBLE)))
                    AS BIGINT) AS w_h
        FROM stats),
    alloc2 AS (
        SELECT lang, n_h, w_h, SUM(w_h) OVER () AS sum_w FROM alloc),
    alloc3 AS (
        SELECT lang, n_h, w_h,
               CAST(LEAST(n_h, GREATEST(
                   1, {NEYMAN_N} * w_h // GREATEST(sum_w, 1)))
                    AS BIGINT) AS alloc_n
        FROM alloc2),
    ranked AS (
        SELECT lang, doc_id,
               CAST(ROW_NUMBER() OVER (PARTITION BY lang
                                       ORDER BY {_HASH}, doc_id)
                    AS BIGINT) AS pick_rank
        FROM documents)
    SELECT r.lang, r.doc_id, r.pick_rank, a.n_h, a.w_h, a.alloc_n
    FROM ranked r JOIN alloc3 a USING (lang)
    WHERE r.pick_rank <= a.alloc_n
    """,
    tags=("sampling", "2.12-sampling", "stratified"),
)
def q_neyman_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified sample with Neyman (optimal) allocation over
    document length per language
    (operators/sampling.py:neyman_stratified_sample): allocation
    weight sqrt(N_h * sum(x^2) - (sum x)^2) = N_h * stddev_h as an
    exact integer discriminant, truncating-DIV budget split, and
    content-hash pick order inside each stratum — high-variance
    strata earn more of the 100-row budget."""
    docs = tables.load_table(spark, sf_dir, "documents").drop("text")
    return sampling.neyman_stratified_sample(
        docs, "lang", "n_chars", "doc_id", total_n=NEYMAN_N)
