"""Principal-component scores by exact integer power iteration.

The dominant eigenvector of the (uncentered) second-moment matrix
X^T X is the axis embeddings vary most along — the first step of PCA
whitening, the classic embedding-drift/outlier readout, and the
projection axis cheap 1-D pre-filters (range partitioning, coarse
ANN pruning) ride on.

Exactness device: the whole pipeline is INTEGER. Components quantize
to milli-units (the proven gram_matrix device), the Gram matrix is an
exact int64 fold, and each power-iteration round keeps the vector in
1e6 fixed point:

    u = G v                      (exact integer matvec)
    v' = u * 1e6 DIV max|u|      (truncating toward zero, both engines)

so after R rounds the iterate — and every per-vector projection
score — is a pure integer function of the data, bit-equal in ANSI
SQL (the oracle unrolls the R rounds over a HUGEINT grid).

Scale shape: the corpus is touched exactly twice — once by the Gram
tree-aggregate (operators/quantize.gram_matrix: per-partition BLAS
Q^T Q, d*(d+1)/2 partial rows out, nothing row-grain shuffles) and
once by the final projection, a pure codegen'd expression against the
LITERAL eigenvector (64 bigints — the codebook-collect convention).
The iteration itself runs driver-side over the collected d x d Gram
(2,080 upper-triangle values at d=64 — bounded, data-independent
size), in exact Python ints: no per-round Spark jobs at all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from event_streaming_service_spark.operators.quantize import (
    GRAM_SCALE,
    gram_matrix,
)


def _power_iterate(gram: dict[tuple[int, int], int], dim: int,
                   rounds: int) -> list[int]:
    """Exact fixed-point power iteration on a dense integer Gram
    (1-based upper-triangle dict). Truncating (toward-zero) rescale
    each round — the DIV both engines share; Python's floor-division
    applies to the absolute value so negatives truncate, not floor."""
    g = [[0] * dim for _ in range(dim)]
    for (i, j), val in gram.items():
        g[i - 1][j - 1] = val
        g[j - 1][i - 1] = val
    v = [1_000_000] * dim
    for _ in range(rounds):
        u = [sum(g[i][j] * v[j] for j in range(dim))
             for i in range(dim)]
        m = max(max(abs(x) for x in u), 1)
        v = [(abs(x) * 1_000_000 // m) * (1 if x >= 0 else -1)
             for x in u]
    return v


def pc1_power_scores(emb: DataFrame, rounds: int = 8,
                     id_col: str = "vec_id",
                     vec_col: str = "embedding") -> DataFrame:
    """First-principal-axis score per vector: dot(q, v_R) where q is
    the milli-quantized embedding and v_R the fixed-point power
    iterate after `rounds` rounds (any R gives a deterministic,
    hash-checkable projection; R=8 is converged for well-separated
    spectra). Output: (vec_id, pc1_score bigint), every input row.

    Cites reference scope: the reference has no linear-algebra
    operator; this extends the LLM-pipeline surface (SURVEY.md
    embedding analytics) on the engine's own Gram kernel."""
    rows = gram_matrix(emb, vec_col=vec_col).collect()
    gram = {(int(r["i"]), int(r["j"])): int(r["gram"]) for r in rows}
    dim = max(j for _, j in gram) if gram else 0
    if dim == 0:
        return emb.select(F.col(id_col).alias(id_col)).limit(0) \
            .withColumn("pc1_score", F.lit(0).cast("long"))
    v = _power_iterate(gram, dim, rounds)

    vlit = F.array(*[F.lit(int(x)).cast("long") for x in v])
    q = F.transform(
        F.col(vec_col),
        lambda x: F.floor(x.cast("double") * F.lit(GRAM_SCALE)
                          + F.lit(0.5)).cast("long"))
    score = F.aggregate(
        F.zip_with(q, vlit, lambda a, b: a * b),
        F.lit(0).cast("long"), lambda acc, x: acc + x)
    return emb.select(F.col(id_col), score.alias("pc1_score"))


def pc1_oracle_sql(dim: int, rounds: int = 8,
                   table: str = "embeddings",
                   id_col: str = "vec_id",
                   vec_col: str = "embedding") -> str:
    """DuckDB twin of pc1_power_scores: the Gram by explode+self-join
    (the shape the Spark kernel exists to avoid — affordable at
    sf0.01), then `rounds` unrolled fixed-point rounds over a HUGEINT
    grid, then the literal projection via the final 64-row vector."""
    ctes = [f"""q AS (
        SELECT {id_col}, i,
               CAST(FLOOR(CAST({vec_col}[i] AS DOUBLE) * 1000 + 0.5)
                    AS BIGINT) AS qv
        FROM (SELECT {id_col}, {vec_col},
                     unnest(range(1, len({vec_col}) + 1)) AS i
              FROM {table}))""",
            f"""gf AS MATERIALIZED (
        SELECT a.i, b.i AS j,
               CAST(SUM(a.qv * b.qv) AS HUGEINT) AS gram
        FROM q a JOIN q b ON a.{id_col} = b.{id_col}
        GROUP BY a.i, b.i)""",
            f"""v0 AS (
        SELECT unnest(range(1, {dim} + 1)) AS i,
               CAST(1000000 AS HUGEINT) AS val)"""]
    for r in range(1, rounds + 1):
        ctes.append(f"""u{r} AS MATERIALIZED (
        SELECT gf.i, CAST(SUM(gf.gram * v.val) AS HUGEINT) AS u
        FROM gf JOIN v{r - 1} v ON v.i = gf.j
        GROUP BY gf.i)""")
        ctes.append(f"""v{r} AS MATERIALIZED (
        SELECT i, u * 1000000 // (SELECT GREATEST(MAX(ABS(u)), 1)
                                  FROM u{r}) AS val
        FROM u{r})""")
    joined = ",\n    ".join(ctes)
    return f"""
    WITH {joined}
    SELECT q.{id_col},
           CAST(SUM(q.qv * v.val) AS BIGINT) AS pc1_score
    FROM q JOIN v{rounds} v USING (i)
    GROUP BY q.{id_col}
    """
