"""Maximal Marginal Relevance (MMR) diverse top-k selection
(Carbonell & Goldstein, SIGIR'98): greedily pick k results trading
query relevance against redundancy with what is already picked,

    score(c) = lambda * rel(c) - (1 - lambda) * max_{s in S} sim(c, s).

The retrieval-pipeline shape at 100 TB is two-stage:

  1. CANDIDATES, distributed: relevance cosine over the full corpus
     (brute force here; IVF/PQ/LSH from operators/similarity.py, pq.py
     at scale) folded to the top-C by TakeOrderedAndProject — per-
     partition top-C then a driver merge, never a global sort.
  2. RERANK, bounded: the greedy MMR walk is inherently sequential in
     k, so it runs on the C candidates only — C^2 pairwise cosines are
     computed IN-ENGINE (the same F.aggregate fold every other cosine
     query uses, so cross-engine float equality is inherited), then the
     walk itself touches only exact micro-unit INTEGERS collected into
     bounded driver state (C + C^2 rows — the same bounded-collect rule
     as membership.bloom_build).

Determinism: relevance and pairwise similarities are pinned to integer
micro-units (floor(round(cos, 6) * 1e6 + 0.5)) BEFORE the walk; the
walk compares the single integer key score * 2^32 + (2^32 - 1 - id)
(higher score first, then smaller id), so selection order is exact in
every engine — the oracle replays the identical integers in a
recursive CTE.

No reference counterpart; extends SURVEY.md section 2.12's similarity
family with the diversity-rerank member every retrieval/RAG pipeline
runs after ANN.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from event_streaming_service_spark.operators import similarity

MMR_LAMBDA_NUM = 7   # lambda = 0.7 as the exact rational 7/10
MMR_LAMBDA_DEN = 10
TIE_SHIFT = 1 << 32


def _micro(col) -> F.Column:
    return F.floor(F.round(col, 6) * 1e6 + F.lit(0.5)).cast("bigint")


def mmr_select(vectors: DataFrame, query_id: int, k: int, n_cand: int,
               id_col: str = "vec_id", vec_col: str = "embedding"
               ) -> DataFrame:
    """Greedy MMR over the top-n_cand candidates by relevance to the
    vector with id query_id. Returns (rank, vec_id, rel_micro,
    mmr_score_scaled) — score is in lambda-denominator-scaled micro
    units: 7 * rel_micro - 3 * max_sim_micro."""
    spark = vectors.sparkSession
    v = vectors.select(F.col(id_col).alias("vid"),
                       similarity.as_double(F.col(vec_col)).alias("vec"))
    q = v.filter(F.col("vid") == query_id).select(
        F.col("vec").alias("qvec"))
    rel = (
        v.filter(F.col("vid") != query_id).crossJoin(F.broadcast(q))
        .select(F.col("vid"),
                _micro(similarity.cosine(F.col("vec"), F.col("qvec")))
                .alias("rel_micro"),
                F.col("vec"))
        .orderBy(F.col("rel_micro").desc(), F.col("vid"))
        .limit(n_cand)
    )
    rel.persist()
    try:
        cand = [(r["vid"], r["rel_micro"])
                for r in rel.select("vid", "rel_micro").collect()]
        a = rel.select(F.col("vid").alias("ia"), F.col("vec").alias("va"))
        b = rel.select(F.col("vid").alias("ib"), F.col("vec").alias("vb"))
        sim_rows = (
            a.join(b, F.col("ia") < F.col("ib"))
            .select("ia", "ib",
                    _micro(similarity.cosine(F.col("va"), F.col("vb")))
                    .alias("sim_micro"))
            .collect()
        )
    finally:
        rel.unpersist()
    sims: dict[tuple[int, int], int] = {}
    for r in sim_rows:
        sims[(r["ia"], r["ib"])] = r["sim_micro"]
        sims[(r["ib"], r["ia"])] = r["sim_micro"]

    picked: list[tuple[int, int, int, int]] = []  # rank, id, rel, score
    pset: list[int] = []
    rel_by_id = dict(cand)
    remaining = [c for c, _ in cand]
    for step in range(1, min(k, len(remaining)) + 1):
        best_key, best = None, None
        for c in remaining:
            max_sim = max((sims[(c, s)] for s in pset), default=0)
            score = (MMR_LAMBDA_NUM * rel_by_id[c]
                     - (MMR_LAMBDA_DEN - MMR_LAMBDA_NUM) * max_sim)
            key = score * TIE_SHIFT + (TIE_SHIFT - 1 - c)
            if best_key is None or key > best_key:
                best_key, best = key, (c, score)
        c, score = best
        picked.append((step, c, rel_by_id[c], score))
        pset.append(c)
        remaining.remove(c)
    return spark.createDataFrame(
        picked, "rank bigint, vec_id bigint, rel_micro bigint, "
                "mmr_score_scaled bigint")


def mmr_select_sql(query_id: int, k: int, n_cand: int,
                   rel_name: str = "embeddings") -> str:
    """The identical walk as a recursive CTE: same micro-pinned
    integers, same score * 2^32 + (2^32 - 1 - id) selection key
    expressed as ORDER BY score DESC, id LIMIT 1."""
    lam, lam_c = MMR_LAMBDA_NUM, MMR_LAMBDA_DEN - MMR_LAMBDA_NUM
    cos = ("list_dot_product({a}, {b}) / (sqrt(list_dot_product({a}, {a}))"
           " * sqrt(list_dot_product({b}, {b})))")
    rel_cos = cos.format(a="v.vec", b="q.vec")
    sim_cos = cos.format(a="x.vec", b="y.vec")
    return f"""
    WITH RECURSIVE
    v AS (SELECT vec_id AS vid, CAST(embedding AS DOUBLE[]) AS vec
          FROM {rel_name}),
    q AS (SELECT vec FROM v WHERE vid = {query_id}),
    cand AS (
        SELECT v.vid,
               CAST(FLOOR(ROUND({rel_cos}, 6) * 1e6 + 0.5) AS BIGINT)
                   AS rel_micro,
               v.vec
        FROM v, q WHERE v.vid <> {query_id}
        ORDER BY rel_micro DESC, v.vid LIMIT {n_cand}),
    sims AS (
        SELECT x.vid AS ia, y.vid AS ib,
               CAST(FLOOR(ROUND({sim_cos}, 6) * 1e6 + 0.5) AS BIGINT)
                   AS sim_micro
        FROM cand x JOIN cand y ON x.vid <> y.vid),
    mmr(step, picked, rel_micro, score, pset) AS (
        (SELECT CAST(1 AS BIGINT), vid, rel_micro,
                CAST({lam} * rel_micro AS BIGINT), [vid]
         FROM cand ORDER BY rel_micro DESC, vid LIMIT 1)
        UNION ALL
        SELECT step + 1, id,
               (SELECT rel_micro FROM cand WHERE vid = t.id),
               CAST({lam} * (SELECT rel_micro FROM cand WHERE vid = t.id)
                    - {lam_c} * COALESCE(
                        (SELECT MAX(sim_micro) FROM sims
                         WHERE ia = t.id AND list_contains(t.pset, ib)),
                        0) AS BIGINT),
               list_append(t.pset, t.id)
        FROM (
            SELECT m.step, m.pset,
                   (SELECT c.vid FROM cand c
                    WHERE NOT list_contains(m.pset, c.vid)
                    ORDER BY {lam} * c.rel_micro
                             - {lam_c} * COALESCE(
                                 (SELECT MAX(s.sim_micro) FROM sims s
                                  WHERE s.ia = c.vid
                                    AND list_contains(m.pset, s.ib)), 0)
                             DESC, c.vid
                    LIMIT 1) AS id
            FROM mmr m WHERE m.step < {k}) t
        WHERE t.id IS NOT NULL)
    SELECT step AS rank, picked AS vec_id, rel_micro,
           score AS mmr_score_scaled
    FROM mmr"""
