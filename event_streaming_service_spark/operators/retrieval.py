"""Rank-fusion retrieval operators (round-7 third wave of the
SURVEY.md section-2.12 surface): combining heterogeneous rankers
(lexical BM25, embedding cosine, term overlap, ...) into one result
list — the standard front door of a hybrid RAG retrieval stack.

No reference counterpart (the reference is event plumbing). Exactness
convention: reciprocal-rank contributions are pure integer arithmetic
(1e6 DIV (k + rank)), so fused scores hash bit-for-bit across engines
— no float ever enters the pipeline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def rrf_fuse(rankings: list[DataFrame], id_col: str = "doc_id",
             k: int = 60, top_n: int = 20) -> DataFrame:
    """Reciprocal Rank Fusion (Cormack, Clarke & Buettcher 2009):
    each input ranking contributes 1/(k + rank) for every candidate
    it ranks; candidates absent from a ranking simply contribute
    nothing (union-of-candidates semantics, the standard behaviour).
    k=60 is the published constant.

    Each input DataFrame must carry (id_col, rank) with rank a
    dense/unique 1-based total order — build it with row_number over
    a deterministic (score DESC, id) window so ties can't reorder
    across engines. Contributions are integer micro-units
    (1_000_000 DIV (k + rank)), summed exactly.

    Plan shape for 100 TB: one union of the (id, contrib)
    projections, one hash aggregate on the id, and a
    TakeOrderedAndProject for the top_n — ranker cardinality (the
    windowed rank computation) dominates; the fusion itself is a
    single cheap shuffle at candidate grain."""
    contribs = [
        r.select(F.col(id_col),
                 F.expr(f"CAST(1000000 DIV ({k} + rank) AS BIGINT)")
                 .alias("__c"))
        for r in rankings]
    unioned = contribs[0]
    for c in contribs[1:]:
        unioned = unioned.unionByName(c)
    return (unioned
            .groupBy(id_col)
            .agg(F.count(F.lit(1)).alias("n_rankers"),
                 F.sum("__c").alias("rrf_micro"))
            .orderBy(F.col("rrf_micro").desc(), F.col(id_col))
            .limit(top_n))
