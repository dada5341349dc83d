"""Rolling-hash document fingerprinting with winnowing (Schleimer,
Wilkerson & Aiken, "Winnowing: Local Algorithms for Document
Fingerprinting", SIGMOD'03 — the MOSS algorithm).

Per document: polynomial rolling hashes over character k-grams, then a
sliding window of w consecutive gram hashes keeps each window's MINIMUM
hash. The selected set ("fingerprints") is position-robust: any shared
substring of length >= k + w - 1 between two documents is guaranteed to
contribute at least one COMMON fingerprint, so near-duplicate /
plagiarism detection reduces to an equi-join on the fingerprint value —
never a quadratic text comparison.

Scale shape (100 TB):
  * Fingerprinting is embarrassingly parallel — one pass over each
    document inside a `mapInPandas` Arrow batch, O(n_chars) work and
    O(1) extra state per doc, no shuffle. The numpy kernel vectorizes
    the rolling hash as a sliding-window dot product (the
    higher-order-lambda expression equivalent evaluates interpreted
    per element — see the r5 PQ finding).
  * Pair generation is an inverted-index self-join keyed on the
    fingerprint value (the same sub-quadratic posting-list shape as
    operators/setjoin.py); candidate volume is bounded by fingerprint
    frequency, not by |docs|^2. A production corpus additionally caps
    ubiquitous fingerprints (boilerplate) exactly like
    text.inverted_index caps stopword postings — the cap keeps every
    pair that shares any NON-ubiquitous region.

All arithmetic is exact int64 (hash < 2^31; per-term products
< 2^21 * 2^31 = 2^52, k = 8 summands < 2^55), so ANSI SQL reproduces
the kernel bit-for-bit: DuckDB `unicode()` == Python `ord()` on every
code point, and the gram hash is a plain windowed linear combination.

No reference counterpart (the reference streams Kafka events; SURVEY.md
section 2.12's dedup family gains the fingerprinting member the brief
lists as "document fingerprinting (rolling hash)").
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

K_GRAM = 8          # character k-gram width
WINNOW_W = 4        # winnowing window: guarantee length k + w - 1 = 11
FP_BASE = 1_000_003  # polynomial base
FP_P = 2_147_483_647  # modulus 2^31 - 1 (prime)

# POW[j] = FP_BASE^j mod FP_P; gram hash at char position i (1-based) is
#   h_i = sum_{j=0..k-1} code(c_{i+j}) * POW[k-1-j]  mod FP_P
POW = [pow(FP_BASE, j, FP_P) for j in range(K_GRAM)]


def _doc_fingerprints(text: str, k: int, w: int) -> np.ndarray:
    """Distinct winnowed fingerprints of one document (sorted array).

    Vectorized: char codes -> sliding-window dot with the power vector
    -> mod P -> sliding-window min -> unique. Exact int64 throughout.
    """
    if len(text) < k:
        return np.empty(0, dtype=np.int64)
    codes = np.fromiter(map(ord, text), dtype=np.int64, count=len(text))
    win = np.lib.stride_tricks.sliding_window_view(codes, k)
    powvec = np.array(POW[::-1], dtype=np.int64)
    hashes = (win @ powvec) % FP_P
    if hashes.shape[0] < w:
        return np.empty(0, dtype=np.int64)
    mins = np.lib.stride_tricks.sliding_window_view(hashes, w).min(axis=1)
    return np.unique(mins)


def winnow_stats(docs: DataFrame, id_col: str = "doc_id",
                 text_col: str = "text", k: int = K_GRAM,
                 w: int = WINNOW_W) -> DataFrame:
    """Per-document fingerprint summary: gram count, fingerprint count,
    and an order-insensitive digest (sum / min / max of the distinct
    fingerprint set). One mapInPandas pass, no shuffle."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"n_grams": [], "n_fp": [], "fp_sum": [],
                   "fp_min": [], "fp_max": []}
            for text in pdf[text_col]:
                text = text or ""
                n_grams = max(len(text) - k + 1, 0)
                fps = _doc_fingerprints(text, k, w)
                out["n_grams"].append(n_grams)
                out["n_fp"].append(len(fps))
                out["fp_sum"].append(int(fps.sum()) if len(fps) else 0)
                out["fp_min"].append(int(fps.min()) if len(fps) else None)
                out["fp_max"].append(int(fps.max()) if len(fps) else None)
            res = pd.DataFrame({id_col: pdf[id_col]})
            for c in ("n_grams", "n_fp", "fp_sum"):
                res[c] = pd.Series(out[c], dtype="int64", index=pdf.index)
            for c in ("fp_min", "fp_max"):
                res[c] = pd.Series(out[c], dtype="Int64", index=pdf.index)
            yield res

    id_type = docs.schema[id_col].dataType.simpleString()
    return docs.select(id_col, text_col).mapInPandas(
        kernel,
        schema=(f"{id_col} {id_type}, n_grams bigint, n_fp bigint, "
                f"fp_sum bigint, fp_min bigint, fp_max bigint"))


def winnow_fingerprints(docs: DataFrame, id_col: str = "doc_id",
                        text_col: str = "text", k: int = K_GRAM,
                        w: int = WINNOW_W) -> DataFrame:
    """Exploded (doc_id, fp) rows — the inverted-index input. Distinct
    per document by construction (np.unique in the kernel)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, fps = [], []
            for doc_id, text in zip(pdf[id_col], pdf[text_col]):
                doc_fps = _doc_fingerprints(text or "", k, w)
                ids.extend([doc_id] * len(doc_fps))
                fps.extend(doc_fps.tolist())
            yield pd.DataFrame({id_col: pd.Series(ids, dtype=object),
                                "fp": pd.Series(fps, dtype="int64")})

    id_type = docs.schema[id_col].dataType.simpleString()
    return docs.select(id_col, text_col).mapInPandas(
        kernel, schema=f"{id_col} {id_type}, fp bigint")


def shared_fp_pairs(docs: DataFrame, min_shared: int = 2,
                    max_df: int = 50,
                    id_col: str = "doc_id", text_col: str = "text",
                    k: int = K_GRAM, w: int = WINNOW_W) -> DataFrame:
    """Document pairs sharing >= min_shared RARE winnowed fingerprints
    (document frequency <= max_df), with the exact Jaccard of their
    rare-fingerprint SETS in truncated ppm.

    The df cap is MOSS's own "ignore overly common fingerprints" rule:
    a fingerprint present in more than max_df documents is boilerplate
    and carries no dedup signal, but WOULD contribute df^2 candidate
    pairs — the cap is what makes the posting-list join provably
    sub-quadratic (candidates <= max_df * |fps|) instead of just
    heuristically so.

    Plan: fingerprint explode (no shuffle) -> df count + cap (one
    aggregate on fp, reused by the self-join shuffle) -> self equi-join
    on fp -> pair aggregation -> join per-doc rare-set sizes back for
    the union denominator."""
    # all_fps is the Python winnowing kernel's output and feeds two
    # consumers (the df aggregate and the rare join); fps feeds three
    # (per-doc sizes + both self-join legs). Unpinned, Catalyst re-ran
    # the mapInPandas kernel once per downstream consumer — 8
    # MapInPandas nodes in the sf0.1 plan (guide §4: never recompute
    # the JVM->Python boundary). Cache lifecycle: query lifetime.
    all_fps = winnow_fingerprints(docs, id_col, text_col, k, w).persist()
    rare_vals = (all_fps.groupBy("fp").count()
                 .filter(F.col("count") <= max_df).select("fp"))
    fps = all_fps.join(rare_vals, "fp").persist()
    sizes = fps.groupBy(id_col).agg(F.count("*").alias("n_fp"))
    a = fps.alias("a")
    b = fps.alias("b")
    pairs = (
        a.join(b, (F.col(f"a.fp") == F.col(f"b.fp"))
               & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")))
        .groupBy(F.col(f"a.{id_col}").alias("id_a"),
                 F.col(f"b.{id_col}").alias("id_b"))
        .agg(F.count("*").alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )
    sa = sizes.select(F.col(id_col).alias("id_a"),
                      F.col("n_fp").alias("n_fp_a"))
    sb = sizes.select(F.col(id_col).alias("id_b"),
                      F.col("n_fp").alias("n_fp_b"))
    return (
        pairs.join(sa, "id_a").join(sb, "id_b")
        .select(
            "id_a", "id_b", "n_shared", "n_fp_a", "n_fp_b",
            F.expr("CAST(n_shared * 1000000 DIV "
                   "(n_fp_a + n_fp_b - n_shared) AS BIGINT)")
            .alias("jaccard_ppm"))
    )


def winnow_grams_sql(k: int = K_GRAM, w: int = WINNOW_W,
                     docs_rel: str = "documents") -> str:
    """CTE prefix reproducing the kernel in ANSI SQL: chars ->
    windowed-linear-combination gram hashes -> winnow window minima ->
    distinct (doc_id, fp). Shared by the stats and pairs oracles so the
    constants can never drift between them."""
    lead_terms = " + ".join(
        (f"code * {POW[k - 1]}" if j == 0
         else f"lead(code, {j}) OVER w * {POW[k - 1 - j]}")
        for j in range(k))
    return f"""
    chars AS (
        SELECT doc_id, n_chars, CAST(t.i AS BIGINT) AS i,
               CAST(unicode(substring(text, CAST(t.i AS INT), 1))
                    AS BIGINT) AS code
        FROM {docs_rel}, unnest(generate_series(1, n_chars)) AS t(i)),
    grams AS (
        SELECT doc_id, i, ({lead_terms}) % {FP_P} AS h
        FROM chars
        WINDOW w AS (PARTITION BY doc_id ORDER BY i)
        QUALIFY i <= n_chars - {k - 1}),
    gn AS (
        SELECT doc_id, i, h,
               row_number() OVER (PARTITION BY doc_id ORDER BY i) AS rn,
               count(*) OVER (PARTITION BY doc_id) AS n_grams
        FROM grams),
    wins AS (
        SELECT doc_id,
               min(h) OVER (PARTITION BY doc_id ORDER BY i
                            ROWS BETWEEN CURRENT ROW
                            AND {w - 1} FOLLOWING) AS fp
        FROM gn
        QUALIFY rn <= n_grams - {w - 1}),
    fps AS (SELECT DISTINCT doc_id, fp FROM wins)"""
