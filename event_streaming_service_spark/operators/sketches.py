"""Sketch-accelerated operators: candidate generation by a mergeable
summary, then EXACT verification — approximate machinery, exact
answers.

The pattern (used across the repo: LSH pairs -> exact Jaccard, ANN
buckets -> exact rerank) applied here to frequent items: a per-
partition Misra-Gries summary proposes a bounded candidate set, then
one semi-filtered exact count confirms. The result is bit-identical to
the naive global GROUP BY, so it carries a plain SQL oracle — but at
100 TB it never shuffles the full key domain:

  naive:  shuffle |distinct keys| rows (billions for token domains)
  here:   scan 1 emits <= k rows PER PARTITION (the MG summaries,
          collected into a broadcast); scan 2 semi-joins against that
          broadcast (map-side filter, no shuffle of misses) and
          shuffles only the surviving candidate keys (<= k * P rows).

Correctness of the candidate superset does not depend on sketch
accuracy: if an item's GLOBAL count exceeds n/k then by pigeonhole its
LOCAL count exceeds n_p/k in at least one partition, and Misra-Gries
with k counters provably retains every item whose local count exceeds
local_n/k. Every true heavy hitter therefore reaches verification;
false candidates are discarded by the exact count. (Misra & Gries
1982; mergeability per Agarwal et al., "Mergeable Summaries", PODS'12.)

No reference counterpart (the reference's statistics are plain
aggregates); this extends SURVEY.md section 2.12's text-analysis
family with the sketch layer a 100 TB token-frequency job needs.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from event_streaming_service_spark.operators.dedup import (
    _HASH_P,
    HASH_AS,
    HASH_BS,
    portable_token_hash,
)


def mg_summaries(items: DataFrame, col: str, k: int) -> DataFrame:
    """Per-partition Misra-Gries summaries: at most 2k candidate values
    per partition — guaranteed to include every value whose local
    frequency exceeds (partition size / k) — plus ONE null-valued row
    carrying the partition's exact row count, so the caller gets the
    global total from the same scan (a heavy-hitter query needs it for
    the n/k threshold; without it the data would pay a third scan).

    Arrow-batched: counting inside each batch is a C-speed
    value_counts; the Python dict only ever holds <= 2k entries (the
    decrement step runs when it overflows), so per-row Python work is
    O(1) amortized regardless of partition size.
    """

    def summarize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict[object, int] = {}
        n_rows = 0
        for pdf in batches:
            n_rows += len(pdf)
            for value, cnt in pdf[col].value_counts().items():
                cnt = int(cnt)
                if value in counters:
                    counters[value] += cnt
                else:
                    counters[value] = cnt
                    if len(counters) > 2 * k:
                        # batch decrement: drop the (len-k)-th smallest
                        # count from everyone; amortizes the classic
                        # one-at-a-time MG step over Arrow batches while
                        # keeping the "every local item > n_p/k
                        # survives" guarantee: dec is the (k+1)-th
                        # largest count, so >= k+1 counters lose dec
                        # each — every decrement op removes >= (k+1)*dec
                        # counted mass. Counted mass <= n_p, so any one
                        # item's cumulative loss sum(dec) <= n_p/(k+1)
                        # < n_p/k — strictly less than a true local
                        # heavy hitter's count, which stays positive
                        dec = sorted(counters.values())[len(counters) - k - 1]
                        counters = {v: c - dec for v, c in counters.items()
                                    if c > dec}
        # dtype=object, not inference: a list of ints + None infers
        # float64, silently rounding int64 keys above 2^53 — object
        # passes Python ints to Arrow exactly
        yield pd.DataFrame({
            col: pd.Series(list(counters.keys()) + [None], dtype=object),
            "n": pd.Series([None] * len(counters) + [n_rows],
                           dtype="Int64"),
        })

    # carry the column's OWN type through the summary: forcing string
    # here would make the later semi-join compare e.g. bigint keys to
    # strings through lossy double casts, silently missing hitters
    # above 2^53
    col_type = items.schema[col].dataType.simpleString()
    return items.mapInPandas(summarize, f"{col} {col_type}, n bigint")


def misra_gries_candidates(items: DataFrame, col: str, k: int) -> DataFrame:
    """Distinct MG candidate values across all partitions (see
    mg_summaries) — a bounded superset of every value with global
    frequency above count(*)/k."""
    return (mg_summaries(items, col, k)
            .filter(F.col(col).isNotNull()).select(col).distinct())


def heavy_hitters_exact(items: DataFrame, col: str, k: int) -> DataFrame:
    """Values whose global frequency strictly exceeds count(*)/k, with
    EXACT counts — identical to the naive global GROUP BY ... HAVING,
    verified by a plain SQL oracle.

    Plan: ONE sketch scan emits the MG summaries AND the per-partition
    row counts (cached — the frame is <= (2k+1) * P rows); the second
    scan semi-joins the broadcast candidates (map-side filter) and
    exact-counts only the surviving keys. Threshold compare is integer
    (cnt * k > n; no division, so no engine can disagree on the
    boundary). Two scans of `items`, no full-domain shuffle.
    """
    summ = mg_summaries(items, col, k).cache()
    candidates = summ.filter(F.col(col).isNotNull()).select(col).distinct()
    total = summ.filter(F.col(col).isNull()).agg(F.sum("n").alias("__n"))
    counts = (items.join(F.broadcast(candidates), col, "left_semi")
              .groupBy(col).agg(F.count("*").alias("cnt")))
    return (counts.crossJoin(F.broadcast(total))
            .filter(F.col("cnt") * k > F.col("__n"))
            .select(col, "cnt",
                    (F.col("cnt") * 1.0 / F.col("__n")).alias("share")))


CMS_DEPTH = 4
CMS_WIDTH = 2048


def _cms_pairs(col: str, depth: int, width: int) -> Column:
    """array<struct<seed,bucket>> of a value's count-min coordinates.

    Bucket_i(x) = ((a_i * h(x) + b_i) mod P) mod width with h(x) the
    28-bit portable md5 hash and (a_i, b_i) the repo-wide universal
    hash family — a_i * h + b_i < 2^31 * 2^28 + 2^31 < 2^60, so the
    arithmetic is exact int64 in every engine (same bound analysis as
    operators/dedup.py) and the sketch is bit-identical wherever it is
    computed, which is what lets a plain SQL oracle rebuild it.
    """
    hx = portable_token_hash(F.col(col))
    return F.array(*[
        F.struct(
            F.lit(i).alias("seed"),
            ((F.lit(HASH_AS[i]) * hx + F.lit(HASH_BS[i]))
             % F.lit(_HASH_P) % F.lit(width)).alias("bucket"))
        for i in range(depth)])


def cms_table(items: DataFrame, col: str, depth: int = CMS_DEPTH,
              width: int = CMS_WIDTH) -> DataFrame:
    """Count-min sketch (Cormode & Muthukrishnan 2005) as a
    (seed, bucket, c) frame: depth x width counters, each the exact sum
    of frequencies hashing to that cell.

    Scale: the explode emits depth rows per item but the groupBy
    partial-aggregates map-side down to <= depth*width rows per task
    BEFORE the shuffle — the exchange moves at most
    depth * width * partitions counter rows regardless of input size
    (the sketch is a mergeable summary; merging IS the shuffle-reduce).
    The result is <= depth*width rows: broadcastable by construction.
    """
    return (items.select(F.explode(_cms_pairs(col, depth, width)).alias("sb"))
            .groupBy(F.col("sb.seed").alias("seed"),
                     F.col("sb.bucket").alias("bucket"))
            .agg(F.count("*").alias("c")))


def cms_estimates(keys: DataFrame, col: str, sketch: DataFrame,
                  depth: int = CMS_DEPTH,
                  width: int = CMS_WIDTH) -> DataFrame:
    """Point-frequency estimates for `keys` from a cms_table sketch:
    est(x) = min_i sketch[i, bucket_i(x)] — the classic count-min
    upper bound (never under-counts; over-counts by collided mass).

    The sketch side is broadcast (<= depth*width rows), so the probe is
    a map-side join on the keys frame — no shuffle of the key domain.
    An absent (seed, bucket) cell means nothing hashed there: its count
    is 0, hence the left join + coalesce.
    """
    probe = (keys.select(col,
                         F.explode(_cms_pairs(col, depth, width)).alias("sb"))
             .select(col, F.col("sb.seed").alias("seed"),
                     F.col("sb.bucket").alias("bucket")))
    return (probe.join(F.broadcast(sketch), ["seed", "bucket"], "left")
            .groupBy(col)
            .agg(F.min(F.coalesce(F.col("c"), F.lit(0))).alias("est")))


def zorder_key(cols: list[Column], bits: int = 16) -> Column:
    """Z-order (Morton) key: interleave the low `bits` bits of each
    column expression — the multi-dimensional clustering key behind
    parquet data skipping on more than one filter column.

    Built as a JVM-side expression tree (shifts + masks composed in a
    Python loop, evaluated entirely in codegen — no UDF): writing a
    100 TB table with repartitionByRange(zorder_key(...)) followed by a
    within-partition sort gives every file a tight min/max envelope in
    EVERY interleaved dimension, so a selective filter on any of them
    prunes row groups. Callers clamp/scale inputs into [0, 2^bits).

    len(cols) * bits must fit in the 63 non-sign bits of a long: bit 63
    would flip the sign (breaking range ordering) and the JVM wraps
    shift counts mod 64 above that (silently colliding bit positions),
    so an oversized request fails loudly here instead.
    """
    n = len(cols)
    if n * bits > 63:
        raise ValueError(
            f"{n} cols x {bits} bits = {n * bits} interleaved bits "
            f"exceeds a long's 63 value bits; lower `bits`")
    acc = F.lit(0).cast("long")
    for b in range(bits):
        for i, c in enumerate(cols):
            bit = F.shiftright(c.cast("long"), b).bitwiseAND(F.lit(1))
            acc = acc + F.shiftleft(bit, b * n + i)
    return acc
