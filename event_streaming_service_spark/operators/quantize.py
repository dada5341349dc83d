"""Embedding compression: global per-dimension scalar quantization to
int8 — the storage/ANN-recall trade every 100 TB embedding corpus
makes before indexing (FAISS's SQ8; Jegou et al.'s PQ is the
vector-grouped refinement).

Two scans, both cheap:
  1. per-dimension min/max — posexplode fans each vector into
     (pos, val) rows, but the partial aggregate collapses them to
     n_dims rows PER PARTITION before the (tiny) shuffle;
  2. quantize — the n_dims stat arrays ride a single-row broadcast
     join, and the per-vector transform is one codegen'd
     higher-order-function pass, no Python.

The quantizer is exactly reproducible cross-engine: all arithmetic is
double with a fixed association order, the rounding is floor(x + 0.5)
(the repo's engine-agnostic half-up — both engines' ROUND differ on
negative halves), and the reported reconstruction error uses max over
dimensions (order-independent), never a float sum.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

QLEVELS = 254.0  # symmetric int8 range: quantized q in [-127, 127]


def dim_stats(emb: DataFrame, vec_col: str) -> DataFrame:
    """Single-row frame with `mns`/`mxs` double arrays: the global
    per-dimension envelope, in dimension order."""
    dims = (emb.select(F.posexplode(vec_col).alias("pos", "val"))
            .groupBy("pos")
            .agg(F.min(F.col("val").cast("double")).alias("mn"),
                 F.max(F.col("val").cast("double")).alias("mx")))
    return dims.agg(
        F.transform(F.array_sort(F.collect_list(F.struct("pos", "mn"))),
                    lambda x: x["mn"]).alias("mns"),
        F.transform(F.array_sort(F.collect_list(F.struct("pos", "mx"))),
                    lambda x: x["mx"]).alias("mxs"))


def quantize_codes(emb: DataFrame, vec_col: str = "embedding",
                   id_col: str = "vec_id") -> DataFrame:
    """(id, qv) with the int8 code ARRAY itself (same arithmetic as
    scalar_quantize_int8, which reports integrity stats instead) —
    the integer representation downstream integer-exact operators
    (product quantization) build on."""
    stats = dim_stats(emb, vec_col)

    def mn(i: Column) -> Column:
        return F.element_at(F.col("mns"), i + 1)

    def mx(i: Column) -> Column:
        return F.element_at(F.col("mxs"), i + 1)

    qv = F.transform(
        F.col(vec_col),
        lambda v, i: F.when(
            mx(i) > mn(i),
            F.floor((v.cast("double") - mn(i)) * F.lit(QLEVELS)
                    / (mx(i) - mn(i)) + F.lit(0.5)).cast("int") - 127)
        .otherwise(F.lit(0)))
    return (emb.join(F.broadcast(stats))
            .select(F.col(id_col), qv.alias("qv")))


def scalar_quantize_int8(emb: DataFrame, vec_col: str = "embedding",
                         id_col: str = "vec_id") -> DataFrame:
    """Quantize each vector against the global per-dim envelope and
    report exact integrity stats per vector:

      q_i     = floor((v_i - mn_i) * 254 / (mx_i - mn_i) + 0.5) - 127
                (0 where the dimension is constant)
      q_l1    = sum_i |q_i|               -- integer, exact
      max_abs_err = max_i |dequant(q_i) - v_i|  (9 dp)

    max (not sum) keeps the float column order-independent; q_l1 is
    the integer checksum that pins the full codebook assignment.
    """
    stats = dim_stats(emb, vec_col)

    def mn(i: Column) -> Column:
        return F.element_at(F.col("mns"), i + 1)

    def mx(i: Column) -> Column:
        return F.element_at(F.col("mxs"), i + 1)

    qv = F.transform(
        F.col(vec_col),
        lambda v, i: F.when(
            mx(i) > mn(i),
            F.floor((v.cast("double") - mn(i)) * F.lit(QLEVELS)
                    / (mx(i) - mn(i)) + F.lit(0.5)).cast("int") - 127)
        .otherwise(F.lit(0)))

    with_q = (emb.join(F.broadcast(stats))
              .withColumn("__q", qv))
    # dequantization error needs (v_i, q_i, mn_i, mx_i) together:
    # transform with index over the original vector, element_at into
    # __q and the envelope arrays keeps all four aligned.
    errs = F.transform(
        F.col(vec_col),
        lambda v, i: F.abs(
            F.when(mx(i) > mn(i),
                   mn(i) + (F.element_at(F.col("__q"), i + 1) + 127)
                   * (mx(i) - mn(i)) / F.lit(QLEVELS))
            .otherwise(mn(i))
            - v.cast("double")))
    return (with_q
            .select(F.col(id_col),
                    F.aggregate("__q", F.lit(0).cast("bigint"),
                                lambda acc, x: acc + F.abs(x))
                    .alias("q_l1"),
                    F.round(F.array_max(errs), 9).alias("max_abs_err")))


GRAM_SCALE = 1000.0  # milli-unit quantization for the exact Gram fold


def gram_matrix(emb: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Exact Gram matrix G = Q^T Q over milli-unit-quantized embeddings
    — the covariance/PCA/linear-probe building block every embedding
    pipeline computes before a projection: q_d = floor(v_d * 1000 +
    0.5) per component (double arithmetic, identical in numpy, the
    JVM, and the SQL oracle), then all products and sums are exact
    int64. Returns the upper triangle as (i, j, gram) rows, 1-based,
    d*(d+1)/2 of them.

    Scale shape: the classic one-pass TREE AGGREGATE — each partition
    folds its Arrow batches into ONE (d, d) int64 accumulator (a BLAS
    Q^T Q per batch), emits d*(d+1)/2 partial rows, and a single hash
    agg over n_partitions * that many tiny rows produces the result.
    Nothing row-grain ever shuffles: 100 TB of vectors reduce to
    (partitions x 2080) rows at d=64. The naive SQL shape — explode to
    (vec, i, val) and self-join on vec — shuffles n_vecs * d rows and
    pairs them to n_vecs * d^2/2; that asymmetry is the point of the
    kernel (the oracle pays it at sf0.01 where it is affordable)."""
    import numpy as np
    import pandas as pd

    def part(batches):
        acc = None
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            q = np.floor(x * GRAM_SCALE + 0.5).astype(np.int64)
            g = q.T @ q
            acc = g if acc is None else acc + g
        if acc is None:
            return
        iu, ju = np.triu_indices(acc.shape[0])
        yield pd.DataFrame({"i": (iu + 1).astype("int32"),
                            "j": (ju + 1).astype("int32"),
                            "part": acc[iu, ju]})

    partials = emb.select(vec_col).mapInPandas(
        part, "i int, j int, part bigint")
    return (partials.groupBy("i", "j")
            .agg(F.sum("part").cast("bigint").alias("gram")))
