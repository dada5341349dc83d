"""Similarity search over embeddings (SURVEY.md section 2.12):
brute-force cosine top-k (the exactness baseline) and an LSH-bucketed
approximate variant (the scale path).

Scale design: brute force is O(Q x N) — correct for small query sets /
reranking; the LSH variant hashes vectors into sign-pattern buckets
with deterministic hyperplanes so candidate generation is an equi-join
on the bucket key (sub-linear probe per query at 100 TB, standard
recall/latency trade).

All vector math is `F.aggregate`/`F.zip_with` column expressions over
array<double> — JVM-side, no Python serialization per row.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def as_double(vec: Column) -> Column:
    return F.transform(vec, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Sequential left-fold dot product — the element order is the array
    order, so the float result is reproducible run-to-run and matches a
    sequential SQL implementation."""
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, x: acc + x)


def l2_norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def cosine_topk(queries: DataFrame, corpus: DataFrame, k: int,
                id_col: str = "vec_id", vec_col: str = "embedding",
                max_broadcast_rows: int = 200_000) -> DataFrame:
    """Brute-force cosine top-k: for every query vector, the k nearest
    corpus vectors (self excluded). Cosine is rounded to 6 decimals
    before ranking so order (and the driver hash) is immune to last-ulp
    float noise; ties break on corpus id.

    Same BLAS kernel as cosine_near_dup_pairs: broadcast corpus matrix,
    one matmul per Arrow batch, per-row top-k by (-cosine, neighbor_id)
    — the F.aggregate fold is interpreted per element and ~40x slower.
    Corpora beyond one broadcast tile: per-tile top-k then a global
    re-rank of k*n_tiles candidates (same kernel, bounded memory).
    """
    import numpy as np
    import pandas as pd

    rows = (corpus.select(id_col, as_double(F.col(vec_col)).alias("v"))
            .orderBy(id_col).collect())
    if len(rows) > max_broadcast_rows:
        raise ValueError("corpus exceeds single-tile broadcast bound; "
                         "tile per docstring")
    ids = np.array([r[0] for r in rows], dtype=np.int64)
    mat = np.array([r[1] for r in rows], dtype=np.float64)
    norms = np.sqrt((mat * mat).sum(axis=1))
    spark = corpus.sparkSession
    b = spark.sparkContext.broadcast((ids, mat, norms))

    def score(batches):
        cids, cmat, cnorms = b.value
        for pdf in batches:
            if not len(pdf):
                continue
            q = np.array(list(pdf["v"]), dtype=np.float64)
            qids = pdf["qid"].to_numpy()
            qnorms = np.sqrt((q * q).sum(axis=1))
            sims = np.round((q @ cmat.T) / np.outer(qnorms, cnorms), 6)
            out = []
            for i in range(len(qids)):
                mask = cids != qids[i]
                order = np.lexsort((cids[mask], -sims[i][mask]))[:k]
                sel_ids = cids[mask][order]
                sel_sims = sims[i][mask][order]
                out.append(pd.DataFrame({
                    "query_id": qids[i], "neighbor_id": sel_ids,
                    "cosine": sel_sims,
                    "rank": np.arange(1, len(sel_ids) + 1, dtype=np.int32)}))
            yield pd.concat(out, ignore_index=True)

    from event_streaming_service_spark.operators.text import fan_out

    q_side = fan_out(queries.select(F.col(id_col).alias("qid"),
                                    as_double(F.col(vec_col)).alias("v")))
    return q_side.mapInPandas(
        score, "query_id long, neighbor_id long, cosine double, rank int")


def _hyperplanes(dim: int, n_planes: int) -> list[list[float]]:
    """Deterministic pseudo-random unit hyperplanes (no RNG state: a
    fixed trigonometric lattice, identical on every run/driver)."""
    planes = []
    for p in range(n_planes):
        row = [math.cos(0.7 * (p + 1) * (i + 1) + 0.31 * (p + 1))
               for i in range(dim)]
        norm = math.sqrt(sum(x * x for x in row)) or 1.0
        planes.append([x / norm for x in row])
    return planes


def lsh_bucket(vec: Column, dim: int, n_planes: int = 8) -> Column:
    """Sign-pattern bucket id in [0, 2^n_planes): bit p set iff
    vec . plane_p >= 0."""
    bucket = F.lit(0)
    for p, plane in enumerate(_hyperplanes(dim, n_planes)):
        plane_col = F.array(*[F.lit(x) for x in plane])
        bucket = bucket + F.when(dot(vec, plane_col) >= 0,
                                 F.lit(1 << p)).otherwise(0)
    return bucket


def ann_cosine_topk(queries: DataFrame, corpus: DataFrame, k: int, dim: int,
                    n_planes: int = 8, multiprobe: int = 1,
                    id_col: str = "vec_id",
                    vec_col: str = "embedding") -> DataFrame:
    """Approximate top-k: candidates share the LSH bucket, then exact
    cosine rerank within the bucket.

    `multiprobe=1` additionally probes every bucket at Hamming
    distance 1 from the query's bucket (the standard recall knob:
    near neighbors most often differ by one marginal hyperplane sign).
    Corpus rows are bucketed ONCE; only query rows fan out, so the
    probe cost is n_planes extra lookups per query — negligible against
    a 100 TB corpus side. Recall is tested against the brute-force
    baseline in pytest."""
    q = queries.select(F.col(id_col).alias("query_id"),
                       as_double(F.col(vec_col)).alias("qv"))
    c = corpus.select(F.col(id_col).alias("neighbor_id"),
                      as_double(F.col(vec_col)).alias("cv"))
    base_bucket = lsh_bucket(F.col("qv"), dim, n_planes)
    if multiprobe >= 1:
        probes = F.array(F.lit(0), *[F.lit(1 << p) for p in range(n_planes)])
        qb = (q.withColumn("__b0", base_bucket)
              .withColumn("__flip", F.explode(probes))
              .withColumn("bucket", F.col("__b0").bitwiseXOR(F.col("__flip")))
              .drop("__b0", "__flip"))
    else:
        qb = q.withColumn("bucket", base_bucket)
    cb = c.withColumn("bucket", lsh_bucket(F.col("cv"), dim, n_planes))
    scored = (
        qb.join(cb, "bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        # a pair can surface through several probe buckets — dedupe before
        # scoring so ranks stay unique
        .dropDuplicates(["query_id", "neighbor_id"])
        .withColumn("cosine", F.round(cosine(F.col("qv"), F.col("cv")), 6))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def cosine_near_dup_pairs(vectors: DataFrame, threshold: float,
                          id_col: str = "vec_id",
                          vec_col: str = "embedding",
                          max_broadcast_rows: int = 200_000) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (id_a < id_b, cosine >=
    threshold) — the embedding leg of the dedup family.

    Block nested loop with a BLAS inner kernel: the corpus is collected
    into one broadcast float64 matrix and each Arrow batch of rows is
    scored against it with a single matmul. Spark's array fold
    (F.aggregate) is interpreted per element — ~40x slower for all-pairs
    — and a cross join would ship both vectors per pair; here only ids
    and above-threshold cosines ever materialize.

    At 100 TB the corpus side is block-partitioned (tile the matrix,
    one broadcast per tile, union the tiles) — same kernel, bounded
    memory; max_broadcast_rows guards the single-tile assumption.
    The LSH/IVF buckets above remain the sub-quadratic candidate path.
    """
    import numpy as np
    import pandas as pd

    rows = (vectors.select(id_col, as_double(F.col(vec_col)).alias("v"))
            .orderBy(id_col).collect())
    if len(rows) > max_broadcast_rows:
        raise ValueError(
            f"corpus {len(rows)} rows exceeds single-tile broadcast bound; "
            "tile the corpus (see docstring)")
    ids = np.array([r[0] for r in rows], dtype=np.int64)
    mat = np.array([r[1] for r in rows], dtype=np.float64)
    norms = np.sqrt((mat * mat).sum(axis=1))
    spark = vectors.sparkSession
    b_ids = spark.sparkContext.broadcast(ids)
    b_mat = spark.sparkContext.broadcast(mat)
    b_norms = spark.sparkContext.broadcast(norms)

    def score(batches):
        cids, cmat, cnorms = b_ids.value, b_mat.value, b_norms.value
        for pdf in batches:
            q = np.array(list(pdf["v"]), dtype=np.float64)
            qids = pdf["qid"].to_numpy()
            qnorms = np.sqrt((q * q).sum(axis=1))
            sims = (q @ cmat.T) / np.outer(qnorms, cnorms)
            sims = np.round(sims, 6)
            qi, ci = np.nonzero((sims >= threshold)
                                & (qids[:, None] < cids[None, :]))
            yield pd.DataFrame({"id_a": qids[qi], "id_b": cids[ci],
                                "cosine": sims[qi, ci]})

    from event_streaming_service_spark.operators.text import fan_out

    # single-row-group fixture files would feed ONE Arrow stream / one
    # Python worker; rebalance so every core runs the matmul kernel
    q_side = fan_out(vectors.select(F.col(id_col).alias("qid"),
                                    as_double(F.col(vec_col)).alias("v")))
    return q_side.mapInPandas(score, "id_a long, id_b long, cosine double")


def ivf_cosine_topk(queries: DataFrame, corpus: DataFrame, k: int,
                    n_cells: int = 16, n_probe: int = 4,
                    id_col: str = "vec_id",
                    vec_col: str = "embedding") -> DataFrame:
    """IVF (inverted-file) approximate top-k: corpus vectors are
    assigned to their nearest centroid cell once; a query probes its
    n_probe nearest cells and reranks exactly inside them.

    Centroids are the first n_cells corpus vectors (deterministic "init
    step" of k-means — one Lloyd round would refine them with the same
    plan shape: broadcast centroids, argmin assign, mean per cell).
    Probe cost at scale: n_probe/n_cells of the corpus per query, as an
    equi-join on cell id — no cross product.
    """
    cents = (corpus.orderBy(id_col).limit(n_cells)
             .select(F.monotonically_increasing_id().alias("cell"),
                     as_double(F.col(vec_col)).alias("centroid")))
    cents = F.broadcast(cents)

    def assign(df, vec, keep, n_cells_kept):
        scored = (df.crossJoin(cents)
                  .withColumn("sim", cosine(vec, F.col("centroid")))
                  .withColumn("rnk", F.row_number().over(
                      Window.partitionBy(*keep).orderBy(
                          F.col("sim").desc(), F.col("cell"))))
                  .filter(F.col("rnk") <= n_cells_kept))
        return scored.select(*keep, "cell")

    c = corpus.select(F.col(id_col).alias("neighbor_id"),
                      as_double(F.col(vec_col)).alias("cv"))
    q = queries.select(F.col(id_col).alias("query_id"),
                       as_double(F.col(vec_col)).alias("qv"))
    c_cells = assign(c, F.col("cv"), ["neighbor_id", "cv"], 1)
    q_cells = assign(q, F.col("qv"), ["query_id", "qv"], n_probe)
    scored = (q_cells.join(c_cells, "cell")
              .filter(F.col("query_id") != F.col("neighbor_id"))
              .dropDuplicates(["query_id", "neighbor_id"])
              .withColumn("cosine",
                          F.round(cosine(F.col("qv"), F.col("cv")), 6)))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "neighbor_id", "cosine", "rank"))
