"""Semantic-clustering queries over `embeddings` (SemDeDup-style
full-vector k-means — operators/kmeans.py). The oracle unrolls the
fixed integer-Lloyd rounds in SQL exactly like pq_trained_topk does
for its one per-subspace round: every round is seeds -> integer-L2
argmin assignment -> exact member sums -> floor-divided centroid
update, all over the shared SQ8 quantization prefix."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from event_streaming_service_spark.operators import kmeans
from event_streaming_service_spark.queries import register
from event_streaming_service_spark.query_defs.pq_queries import _QUANT
from event_streaming_service_spark.sources import tables

_KM_K = 8       # clusters
_KM_ROUNDS = 2  # integer Lloyd rounds
_DIM = 64       # fixture embedding width


def _kmeans_oracle(n_clusters: int, rounds: int, dim: int) -> str:
    """Unrolled fixed-round k-means CTE chain (the pq_trained_topk
    device, full-vector): DuckDB reproduces Python floor division as
    (s - pmod(s, n)) // n; empty clusters COALESCE to their previous
    centroid; the final grouped report is exact integer arithmetic."""
    l2 = (f"CAST(list_sum(list_transform(range(1, {dim} + 1), i -> "
          f"CAST(q.qv[i] - s.cv[i] AS BIGINT)"
          f" * (q.qv[i] - s.cv[i]))) AS BIGINT)")
    parts = [
        f"""seeds0 AS (
        SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS k, qv AS cv
        FROM (SELECT vec_id, qv FROM q ORDER BY vec_id
              LIMIT {n_clusters}))""",
        f"pos AS (SELECT unnest(range(1, {dim} + 1)) AS i)",
    ]
    for r in range(rounds):
        parts += [
            f"""dist{r} AS (
            SELECT q.vec_id, s.k, {l2} AS d FROM q, seeds{r} s)""",
            f"""asg{r} AS (
            SELECT vec_id, k FROM (
                SELECT vec_id, k,
                       ROW_NUMBER() OVER (PARTITION BY vec_id
                                          ORDER BY d, k) AS rn
                FROM dist{r}) WHERE rn = 1)""",
            f"""upd{r} AS (
            SELECT a.k, pos.i,
                   CAST(SUM(CAST(q.qv[pos.i] AS BIGINT)) AS BIGINT) AS s,
                   CAST(COUNT(*) AS BIGINT) AS n
            FROM asg{r} a JOIN q USING (vec_id), pos
            GROUP BY a.k, pos.i)""",
            f"""newv{r} AS (
            SELECT sp.k, sp.i,
                   COALESCE(CAST((u.s - ((u.s % u.n + u.n) % u.n)) // u.n
                                 AS INTEGER),
                            sp.old_val) AS val
            FROM (SELECT s.k, pos.i, s.cv[pos.i] AS old_val
                  FROM seeds{r} s, pos) sp
            LEFT JOIN upd{r} u ON u.k = sp.k AND u.i = sp.i)""",
            f"""seeds{r + 1} AS (
            SELECT k, list(val ORDER BY i) AS cv
            FROM newv{r} GROUP BY k)""",
        ]
    parts += [
        f"""distF AS (
        SELECT q.vec_id, s.k, {l2} AS d FROM q, seeds{rounds} s)""",
        """asgF AS (
        SELECT vec_id, k, d FROM (
            SELECT vec_id, k, d,
                   ROW_NUMBER() OVER (PARTITION BY vec_id
                                      ORDER BY d, k) AS rn
            FROM distF) WHERE rn = 1)""",
        "tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_total FROM asgF)",
    ]
    body = ",\n    ".join(parts)
    return f"""
    WITH {_QUANT},
    {body}
    SELECT CAST(k AS INTEGER) AS cluster_id,
           CAST(COUNT(*) AS BIGINT) AS n_members,
           CAST(COUNT(*) * 1000000 // MAX(n_total) AS BIGINT)
               AS share_ppm,
           CAST(SUM(d) AS BIGINT) AS inertia,
           CAST(SUM(d) // COUNT(*) AS BIGINT) AS mean_point_inertia
    FROM asgF, tot GROUP BY k ORDER BY cluster_id
    """


@register(
    "kmeans_embedding_clusters",
    oracle=_kmeans_oracle(_KM_K, _KM_ROUNDS, _DIM),
    tags=("similarity", "quantize", "lloyd", "embedding", "clustering"),
)
def q_kmeans_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style semantic clustering: 2 full-vector integer Lloyd
    rounds over the SQ8 embeddings (operators/kmeans.py — pq.py's
    train_codebook at m_sub=1), then a per-cluster balance/inertia
    report: member count, exact-ppm corpus share, exact BIGINT
    inertia, floor-divided mean point inertia. The report is what a
    within-cluster dedup stage gates its fan-out on."""
    emb = tables.load_table(spark, sf_dir, "embeddings")
    return kmeans.kmeans_cluster_report(emb, n_clusters=_KM_K,
                                        rounds=_KM_ROUNDS)
