"""Coverage-consolidation surfaces (round-4 rotation, second wave).

Same driver-budget mechanics as governance_surface: the driver
verifies the first 50 registry entries, so single-purpose anchors that
are already multi-round hash-green fold into union surfaces that keep
their operator-family tags inside the budget, freeing slots for
queries that have never received a driver row (here: the queries
completing the 22/22 TPC-H suite). Each leg delegates to the SAME
builder and the SAME oracle SQL the standalone query uses — this is
coverage consolidation, not reimplementation; the standalone queries
stay registered and locally gated.

Scale: unions are append-only (no shuffle across legs); each leg keeps
its own documented plan shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# Import the leg modules FIRST so their @register calls have populated
# REGISTRY before we read their oracle SQL back out of it.
from event_streaming_service_spark.query_defs import (  # noqa: F401
    dedup_queries,
    similarity_queries,
    text_queries,
)
from event_streaming_service_spark.queries import REGISTRY, register


def _leg_oracle(name: str) -> str:
    return REGISTRY[name].oracle


def _NS() -> F.Column:
    return F.lit(None).cast("string")


def _NB() -> F.Column:
    return F.lit(None).cast("bigint")


@register(
    "corpus_fingerprint_surface",
    oracle=f"""
    SELECT 'exact' AS kind, doc_id, fingerprint AS s1,
           CAST(canonical_id AS VARCHAR) AS s2, n_copies AS n
    FROM ({_leg_oracle('dedup_exact_canonical')})
    UNION ALL
    SELECT 'simhash', doc_id, NULL, NULL, simhash
    FROM ({_leg_oracle('simhash_portable')})
    UNION ALL
    SELECT 'fp', doc_id, fp_exact, fp_token_set, NULL
    FROM ({_leg_oracle('doc_fingerprints')})
    """,
    tags=("dedup-exact", "dedup-simhash", "fingerprint", "text"),
)
def q_corpus_fingerprint_surface(spark: SparkSession,
                                 sf_dir: str) -> DataFrame:
    """Exact-dedup canonical mapping + portable SimHash + document
    fingerprints in one union surface — the per-document identity
    panel a dedup pipeline derives before any pair joins. Three
    independent single-shuffle (or shuffle-free) legs over the same
    documents scan."""
    exact = dedup_queries.q_dedup_exact(spark, sf_dir).select(
        F.lit("exact").alias("kind"), "doc_id",
        F.col("fingerprint").alias("s1"),
        F.col("canonical_id").cast("string").alias("s2"),
        F.col("n_copies").cast("bigint").alias("n"))
    sim = dedup_queries.q_simhash_portable(spark, sf_dir).select(
        F.lit("simhash").alias("kind"), "doc_id",
        _NS().alias("s1"), _NS().alias("s2"),
        F.col("simhash").cast("bigint").alias("n"))
    fp = text_queries.q_doc_fingerprints(spark, sf_dir).select(
        F.lit("fp").alias("kind"), "doc_id",
        F.col("fp_exact").alias("s1"),
        F.col("fp_token_set").alias("s2"), _NB().alias("n"))
    return exact.unionByName(sim).unionByName(fp)


@register(
    "ann_cosine_surface",
    oracle=f"""
    SELECT 'brute' AS kind, query_id AS id_a, neighbor_id AS id_b,
           cosine, rank
    FROM ({_leg_oracle('cosine_topk_bruteforce')})
    UNION ALL
    SELECT 'lsh', query_id, neighbor_id, cosine, rank
    FROM ({_leg_oracle('ann_lsh_cosine')})
    UNION ALL
    SELECT 'pairs', id_a, id_b, cosine, NULL
    FROM ({_leg_oracle('embedding_near_dup_pairs')})
    """,
    tags=("similarity", "ann-baseline", "ann-lsh", "dedup-embedding"),
)
def q_ann_cosine_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k (the exactness baseline), LSH-bucketed
    approximate top-k (the scale path), and threshold near-dup pairs in
    one union surface. Legs keep their documented dispatch: zero-job
    Arrow matrix builds below the broadcast cap, bucket equi-joins
    above it."""
    brute = similarity_queries.q_cosine_topk(spark, sf_dir).select(
        F.lit("brute").alias("kind"),
        F.col("query_id").alias("id_a"),
        F.col("neighbor_id").alias("id_b"), "cosine", "rank")
    lsh = similarity_queries.q_ann_lsh(spark, sf_dir).select(
        F.lit("lsh").alias("kind"),
        F.col("query_id").alias("id_a"),
        F.col("neighbor_id").alias("id_b"), "cosine", "rank")
    pairs = similarity_queries.q_embedding_near_dups(spark, sf_dir).select(
        F.lit("pairs").alias("kind"), "id_a", "id_b", "cosine",
        F.lit(None).cast("int").alias("rank"))
    return brute.unionByName(lsh).unionByName(pairs)
