"""Portable distinct-count sketches: HyperLogLog and KMV (K-Minimum
Values / bottom-k theta sketch), both with deterministic md5-derived
hashes so every register / minimum is cross-engine reproducible and the
full sketch arithmetic carries an exact SQL oracle.

Why sketches at 100 TB: COUNT(DISTINCT key) shuffles the entire
distinct key domain (billions of rows for user/token domains). Both
sketches here are MERGEABLE summaries (Agarwal et al., "Mergeable
Summaries", PODS'12):

  * HLL (Flajolet et al., AofA'07): the register table is a 256-row
    aggregate — `groupBy(idx).agg(max(rho))` runs with map-side partial
    aggregation, so each executor ships at most 256 rows regardless of
    input size.
  * KMV (Bar-Yossef et al., RANDOM'02): per-partition k-smallest
    distinct hashes (bounded local state, computed inside an Arrow
    kernel), merged by a union + global k-smallest over <= k*P
    survivor rows. The k-th smallest distinct hash h_k estimates
    distinct = (k-1) * H / h_k for hash space H.

Determinism: the production variant swaps the md5 prefix for
xxhash64 (JVM-native, ~10x cheaper) — same plan shape, engine-specific
values. The md5 prefix (48 bits < 2^53) makes every intermediate an
exact BIGINT in Spark, DuckDB and numpy alike, which is what lets the
driver hash-compare the SKETCH ITSELF, not just a tolerance band.

The single floating step (the alpha_m bias constant and the ln() of the
linear-counting branch) follows the repo's pinned-micro rule: both
engines evaluate the identical double expression and floor(x*1e6+0.5)
into integer micro-units before any further arithmetic.

No reference counterpart (the reference counts with plain aggregates);
extends SURVEY.md section 2.12's sketch layer alongside Misra-Gries /
CMS / Bloom (operators/sketches.py, membership.py).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

HLL_P_BITS = 8
HLL_M = 1 << HLL_P_BITS          # 256 registers
HASH_BITS = 48                   # 12 hex chars of md5 -> < 2^53 exact
W_BITS = HASH_BITS - HLL_P_BITS  # 40 value bits -> rho in [1, 41]
RHO_MAX = W_BITS + 1
# S is kept as the exact integer sum of 2^(RHO_MAX - rho): rho lies in
# [1, RHO_MAX], so every term is a non-negative power of two (registers
# never hit contribute the rho=0 term 2^RHO_MAX). The true HLL harmonic
# sum is S / 2^RHO_MAX, hence NUM = alpha_m * m^2 * 2^RHO_MAX —
# precomputed in Python so both engines consume ONE identical double
# literal (m^2 * 2^41 = 2^57 is exactly representable).
HLL_ALPHA = 0.7213 / (1.0 + 1.079 / HLL_M)
HLL_SCALE = 1 << RHO_MAX
HLL_NUM = HLL_ALPHA * HLL_M * HLL_M * float(HLL_SCALE)

KMV_K = 64
KMV_SPACE = 1 << HASH_BITS


def portable_hash48(col: Column) -> Column:
    """48-bit integer hash via md5 prefix — identical in Spark, ANSI
    SQL, and Python (tests). 48 bits keeps every product/sum below
    2^63 and the value itself below 2^53 (double-exact)."""
    return F.conv(F.substring(F.md5(col.cast("string")), 1, 12),
                  16, 10).cast("bigint")


def portable_hash48_sql(expr: str) -> str:
    return (f"CAST('0x' || SUBSTRING(md5(CAST({expr} AS VARCHAR)), 1, 12)"
            f" AS BIGINT)")


def hll_registers(df: DataFrame, col: Column) -> DataFrame:
    """(idx, rho) -> 256-row register table: idx = h mod m, rho = one
    plus the number of leading zeros of the remaining W_BITS value bits
    (bit length via base-2 string length — exact, no log2 ulp risk).
    Map-side combine makes this a constant-size shuffle."""
    h = portable_hash48(col)
    w = (h - (h % HLL_M)) / HLL_M  # h >= 0: truncation == floor
    return (
        df.select((h % HLL_M).alias("idx"),
                  w.cast("bigint").alias("w"))
        .select("idx",
                F.when(F.col("w") == 0, F.lit(RHO_MAX))
                .otherwise(F.lit(RHO_MAX)
                           - F.length(F.conv(F.col("w").cast("string"),
                                             10, 2)))
                .alias("rho"))
        .groupBy("idx").agg(F.max("rho").alias("max_rho"))
    )


def hll_summary(df: DataFrame, col: Column) -> DataFrame:
    """One-row HLL summary with the full estimator: raw estimate
    NUM / S where S = sum_j 2^(RHO_MAX - rho_j) (a dyadic-rational sum
    kept as an exact BIGINT; empty registers contribute 2^RHO_MAX), plus
    the small-range linear-counting branch m*ln(m/V) the real algorithm
    switches to when raw <= 2.5m and V > 0."""
    regs = hll_registers(df, col)
    pow2 = F.pow(F.lit(2.0), F.lit(RHO_MAX) - F.col("max_rho"))
    agg = regs.agg(
        F.count("*").alias("m_hit"),
        F.sum(pow2.cast("bigint")).alias("s_hit"),
    )
    m = F.lit(HLL_M)
    v_zero = (m - F.col("m_hit")).cast("bigint")
    s_scaled = (F.col("s_hit")
                + v_zero * F.lit(HLL_SCALE)).cast("bigint")
    raw = F.lit(HLL_NUM) / s_scaled.cast("double")
    lc = F.when(v_zero > 0,
                m.cast("double") * F.log(m.cast("double")
                                         / v_zero.cast("double")))
    est = F.when((raw <= F.lit(2.5 * HLL_M)) & (v_zero > 0), lc
                 ).otherwise(raw)
    return agg.select(
        m.cast("bigint").alias("m"),
        v_zero.alias("v_zero"),
        s_scaled.alias("s_scaled"),
        F.floor(raw * 1e6 + F.lit(0.5)).cast("bigint")
        .alias("raw_est_micro"),
        F.floor(est * 1e6 + F.lit(0.5)).cast("bigint")
        .alias("est_micro"),
    )


def hll_summary_sql(expr: str, rel: str) -> str:
    """The identical estimator as one SQL statement."""
    h = portable_hash48_sql(expr)
    return f"""
    WITH hx AS (SELECT {h} AS h FROM {rel}),
    rr AS (SELECT h % {HLL_M} AS idx,
                  (h - (h % {HLL_M})) // {HLL_M} AS w
           FROM hx),
    regs AS (
        SELECT idx,
               MAX(CASE WHEN w = 0 THEN {RHO_MAX}
                        ELSE {RHO_MAX} - length(bin(w)) END) AS max_rho
        FROM rr GROUP BY idx),
    agg AS (
        SELECT COUNT(*) AS m_hit,
               CAST(SUM(CAST(2 ** ({RHO_MAX} - max_rho) AS BIGINT))
                    AS BIGINT) AS s_hit
        FROM regs),
    s AS (
        SELECT CAST({HLL_M} - m_hit AS BIGINT) AS v_zero,
               CAST(s_hit + ({HLL_M} - m_hit) * {HLL_SCALE}
                    AS BIGINT) AS s_scaled
        FROM agg)
    SELECT CAST({HLL_M} AS BIGINT) AS m, v_zero, s_scaled,
           CAST(FLOOR({HLL_NUM!r} / CAST(s_scaled AS DOUBLE) * 1e6 + 0.5)
                AS BIGINT) AS raw_est_micro,
           CAST(FLOOR(CASE WHEN {HLL_NUM!r} / CAST(s_scaled AS DOUBLE)
                                <= {2.5 * HLL_M} AND v_zero > 0
                      THEN {HLL_M} * ln({HLL_M} / CAST(v_zero AS DOUBLE))
                      ELSE {HLL_NUM!r} / CAST(s_scaled AS DOUBLE)
                      END * 1e6 + 0.5) AS BIGINT) AS est_micro
    FROM s"""


def kmv_per_group(df: DataFrame, group_col: str, col: Column,
                  k: int = KMV_K) -> DataFrame:
    """Per-group KMV: the k smallest DISTINCT 48-bit hashes per group,
    folded to (group, n_kept, kth_hash, est_distinct).

    Scale path: an Arrow kernel keeps a bounded per-group set of the
    k smallest distinct local hashes (state <= |groups| * k per
    partition, independent of row count), then the union of partition
    summaries — at most k * P rows per group — is merged by one
    ordinary window rank (kmv_per_group_detail). No full distinct
    shuffle ever happens.

    Estimator: distinct ~= (k-1) * H / h_k (truncating integer divide,
    exact and identical in both engines); when a group holds fewer
    than k distinct hashes the sketch IS the exact distinct set and
    the estimate is n_kept."""
    merged = kmv_per_group_detail(df, group_col, col, k)
    return (
        merged.groupBy(group_col)
        .agg(F.count("*").alias("n_kept"),
             F.max("h").alias("kth_hash"))
        .select(group_col, "n_kept", "kth_hash",
                F.when(F.col("n_kept") < k, F.col("n_kept"))
                .otherwise(F.expr(f"{(k - 1) * KMV_SPACE} DIV kth_hash"))
                .cast("bigint").alias("est_distinct"))
    )


def kmv_per_group_sql(expr: str, group_col: str, rel: str,
                      k: int = KMV_K) -> str:
    h = portable_hash48_sql(expr)
    return f"""
    WITH hx AS (SELECT DISTINCT {group_col} AS g, {h} AS h FROM {rel}),
    ranked AS (
        SELECT g, h,
               row_number() OVER (PARTITION BY g ORDER BY h) AS rn
        FROM hx QUALIFY rn <= {k})
    SELECT g AS {group_col},
           CAST(COUNT(*) AS BIGINT) AS n_kept,
           MAX(h) AS kth_hash,
           CAST(CASE WHEN COUNT(*) < {k} THEN COUNT(*)
                ELSE {(k - 1) * KMV_SPACE} // MAX(h) END AS BIGINT)
               AS est_distinct
    FROM ranked GROUP BY g"""


def kmv_intersection(df: DataFrame, group_col: str, col: Column,
                     group_a: str, group_b: str,
                     k: int = KMV_K) -> DataFrame:
    """Theta-sketch set intersection (the DataSketches A-and-B
    operation): estimate |distinct(A) ∩ distinct(B)| from the two
    groups' bottom-k sketches alone — never intersecting the full
    domains.

    theta = min(kth_min_A, kth_min_B); every retained hash below theta
    is a uniform sample of the union domain, so

        |A ∩ B| ~= |{h : h in sketch_A ∩ sketch_B, h < theta}|
                   * H / theta          (H = hash space size)

    computed here as exact integers (truncating DIV). When either
    group holds fewer than k distinct hashes its sketch IS the exact
    set and theta degrades gracefully to the other side's bound.
    Returns one row: (n_common_below_theta, theta_hash, est_intersection)
    — the caller joins the exact intersection alongside if wanted.

    Scale shape: each sketch is the bounded kmv_per_group kernel; the
    intersection itself touches <= 2k driver-free rows (a join of two
    k-row frames)."""
    sketches = kmv_per_group_detail(df, group_col, col, k)
    a = sketches.filter(F.col(group_col) == group_a)
    b = sketches.filter(F.col(group_col) == group_b)
    bounds = (a.groupBy().agg(F.max("h").alias("kth_a"),
                              F.count(F.lit(1)).alias("n_a"))
              .crossJoin(b.groupBy().agg(F.max("h").alias("kth_b"),
                                         F.count(F.lit(1)).alias("n_b")))
              .select(F.least("kth_a", "kth_b").alias("theta_hash"),
                      "n_a", "n_b"))
    common = (a.select(F.col("h"))
              .join(b.select(F.col("h")), "h")
              .crossJoin(F.broadcast(bounds))
              .filter(F.col("h") <= F.col("theta_hash"))
              .groupBy("theta_hash")
              .agg(F.count(F.lit(1)).alias("n_common_below_theta")))
    return (bounds.join(common, "theta_hash", "left")
            .select(
                F.coalesce("n_common_below_theta", F.lit(0))
                .cast("bigint").alias("n_common_below_theta"),
                "theta_hash",
                F.expr(f"CAST(COALESCE(n_common_below_theta, 0)"
                       f" * {KMV_SPACE} DIV theta_hash AS BIGINT)")
                .alias("est_intersection")))


def kmv_per_group_detail(df: DataFrame, group_col: str, col: Column,
                         k: int = KMV_K) -> DataFrame:
    """The per-group bottom-k sketch as (group, h) rows — the
    mergeable representation set operations consume (kmv_per_group
    folds the same frame to its summary)."""
    from pyspark.sql import Window as W

    def local_topk(batches):
        import numpy as np
        state: dict[object, object] = {}
        for pdf in batches:
            for g, vals in pdf.groupby("g", sort=False)["h"]:
                batch_u = np.unique(vals.to_numpy())[:k]
                prev = state.get(g)
                state[g] = (batch_u if prev is None
                            else np.union1d(prev, batch_u)[:k])
        gs, hs = [], []
        for g, arr in state.items():
            gs.extend([g] * len(arr))
            hs.extend(arr.tolist())
        yield pd.DataFrame({"g": pd.Series(gs, dtype=object),
                            "h": pd.Series(hs, dtype="int64")})

    g_type = df.schema[group_col].dataType.simpleString()
    local = (df.select(F.col(group_col).alias("g"),
                       portable_hash48(col).alias("h"))
             .mapInPandas(local_topk, schema=f"g {g_type}, h bigint"))
    w = W.partitionBy("g").orderBy("h")
    return (local.dropDuplicates(["g", "h"])
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= k)
            .select(F.col("g").alias(group_col), "h"))
