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


def _kmeans_chain(n_clusters: int, rounds: int, dim: int) -> str:
    """Unrolled fixed-round k-means CTE chain (the pq_trained_topk
    device, full-vector), ending in asgF (vec_id, k, d) — the final
    assignment with its exact squared-L2. DuckDB reproduces Python
    floor division as (s - pmod(s, n)) // n; empty clusters COALESCE
    to their previous centroid. Shared by the report and the SemDeDup
    pair oracle."""
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
    ]
    body = ",\n    ".join(parts)
    return f"""WITH {_QUANT},
    {body}"""


def _kmeans_oracle(n_clusters: int, rounds: int, dim: int) -> str:
    """Per-cluster balance/inertia report over the shared chain."""
    return f"""
    {_kmeans_chain(n_clusters, rounds, dim)},
    tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_total FROM asgF)
    SELECT CAST(k AS INTEGER) AS cluster_id,
           CAST(COUNT(*) AS BIGINT) AS n_members,
           CAST(COUNT(*) * 1000000 // MAX(n_total) AS BIGINT)
               AS share_ppm,
           CAST(SUM(d) AS BIGINT) AS inertia,
           CAST(SUM(d) // COUNT(*) AS BIGINT) AS mean_point_inertia
    FROM asgF, tot GROUP BY k ORDER BY cluster_id
    """


def _semdedup_oracle(n_clusters: int, rounds: int, dim: int,
                     threshold_ppb: int) -> str:
    """SemDeDup second stage over the shared chain: within-cluster
    pairs (vec_a < vec_b), exact BIGINT dot products, ONE pinned 9dp
    cosine, integer-ppb threshold spelled as the same double on both
    engines."""
    dot = ("CAST(list_sum(list_transform(range(1, {dim} + 1), i -> "
           "CAST({a}[i] AS BIGINT) * {b}[i])) AS BIGINT)")
    dab = dot.format(dim=dim, a="a.qv", b="b.qv")
    daa = dot.format(dim=dim, a="a.qv", b="a.qv")
    dbb = dot.format(dim=dim, a="b.qv", b="b.qv")
    return f"""
    {_kmeans_chain(n_clusters, rounds, dim)},
    m AS (SELECT asgF.vec_id, asgF.k, q.qv
          FROM asgF JOIN q USING (vec_id)),
    pairs AS (
        SELECT a.k AS cluster_id, a.vec_id AS vec_a,
               b.vec_id AS vec_b,
               ROUND(CAST({dab} AS DOUBLE)
                     / (SQRT(CAST({daa} AS DOUBLE))
                        * SQRT(CAST({dbb} AS DOUBLE))), 9)
                   AS cosine_9dp
        FROM m a JOIN m b ON a.k = b.k AND a.vec_id < b.vec_id)
    SELECT CAST(cluster_id AS INTEGER) AS cluster_id, vec_a, vec_b,
           cosine_9dp
    FROM pairs
    WHERE cosine_9dp >= {threshold_ppb} / 1000000000.0
    ORDER BY cluster_id, vec_a, vec_b
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


_SD_T_PPB = 400_000_000  # the fixture corpus' top ~1% within-cluster


@register(
    "semdedup_pairs",
    oracle=_semdedup_oracle(_KM_K, _KM_ROUNDS, _DIM, _SD_T_PPB),
    tags=("similarity", "dedup-embedding", "embedding", "clustering"),
)
def q_semdedup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup second stage (operators/kmeans.py:semdedup_pairs):
    within each of the 8 trained clusters, vector pairs whose
    9dp-pinned SQ8 cosine clears the 0.4 threshold — the semantic
    near-dup detector whose quadratic fan-out the cluster granularity
    bounds (and whose hot-cluster risk kmeans_embedding_clusters'
    balance report gates)."""
    emb = tables.load_table(spark, sf_dir, "embeddings")
    return kmeans.semdedup_pairs(emb, n_clusters=_KM_K,
                                 rounds=_KM_ROUNDS,
                                 threshold_ppb=_SD_T_PPB)


_IVF_K = 10
_IVF_CELLS = 16
_IVF_PROBE = 4
_IVF_QMOD = 125


def _ivf_trained_oracle(n_cells: int, n_probe: int, k: int,
                        query_mod: int, dim: int) -> str:
    """IVF over trained cells: the shared 1-round Lloyd chain gives
    seeds1 (trained centroids) and asgF (every vector's cell); each
    query ranks the centroids by the same integer L2, probes n_probe
    cells, and candidates rerank by the exact BIGINT dot product.
    Zero float operations end to end."""
    l2q = (f"CAST(list_sum(list_transform(range(1, {dim} + 1), i -> "
           f"CAST(qq.qv[i] - s.cv[i] AS BIGINT)"
           f" * (qq.qv[i] - s.cv[i]))) AS BIGINT)")
    dot = (f"CAST(list_sum(list_transform(range(1, {dim} + 1), i -> "
           f"CAST(qq.qv[i] AS BIGINT) * nv.qv[i])) AS BIGINT)")
    return f"""
    {_kmeans_chain(n_cells, 1, dim)},
    qq AS (SELECT vec_id AS query_id, qv FROM q
           WHERE vec_id % {query_mod} = 0),
    qcells AS (
        SELECT query_id, cell FROM (
            SELECT qq.query_id, s.k AS cell,
                   ROW_NUMBER() OVER (PARTITION BY qq.query_id
                                      ORDER BY {l2q}, s.k) AS rn
            FROM qq, seeds1 s) WHERE rn <= {n_probe}),
    cand AS (
        SELECT DISTINCT query_id, a.vec_id AS neighbor_id
        FROM qcells JOIN asgF a ON a.k = qcells.cell
        WHERE a.vec_id <> query_id),
    scored AS (
        SELECT cand.query_id, cand.neighbor_id, {dot} AS dot_score
        FROM cand
        JOIN qq ON qq.query_id = cand.query_id
        JOIN q nv ON nv.vec_id = cand.neighbor_id)
    SELECT query_id, neighbor_id, dot_score, rank FROM (
        SELECT query_id, neighbor_id, dot_score,
               CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                                       ORDER BY dot_score DESC,
                                                neighbor_id)
                    AS INTEGER) AS rank
        FROM scored
    ) WHERE rank <= {k}
    """


@register(
    "ivf_trained_topk",
    oracle=_ivf_trained_oracle(_IVF_CELLS, _IVF_PROBE, _IVF_K,
                               _IVF_QMOD, _DIM),
    tags=("similarity", "ann-ivf", "quantize", "lloyd"),
)
def q_ivf_trained_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF over TRAINED cells (operators/kmeans.py:ivf_trained_topk):
    one integer-Lloyd round refines the coarse quantizer (the FAISS
    training step ivf_cosine_topk's sampled cells skip), vectors
    Arrow-assign by integer L2, queries probe their 4 nearest trained
    centroids, candidates rerank by the exact BIGINT dot product —
    an ANN pipeline with no float op anywhere."""
    emb = tables.load_table(spark, sf_dir, "embeddings")
    return kmeans.ivf_trained_topk(emb, k=_IVF_K, n_cells=_IVF_CELLS,
                                   n_probe=_IVF_PROBE, rounds=1,
                                   query_mod=_IVF_QMOD)
