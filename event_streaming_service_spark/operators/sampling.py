"""Deterministic sampling for training-data pipelines (SURVEY.md
section 2.12 extension surface): uniform hash sampling, per-stratum
rate sampling, and per-stratum quota (top-n) sampling.

Why not `DataFrame.sample`: its Bernoulli draw is seeded per
PARTITION, so the selected set changes whenever partitioning changes
(repartition, AQE coalesce, task retry) — unacceptable for a corpus
that must be reproducible across runs and clusters. Hash sampling
derives the draw from row CONTENT (`md5(key)`), so the sample is a
pure function of the data: stable under retries, identical on any
engine, and consistent across tables (sampling `documents` and a
sidecar table by the same key keeps them joinable).

Scale:
  * rate sampling is a stateless filter — no shuffle, fully pushed
    into the scan stage, and composes with partition pruning;
  * stratum rates come from a broadcast map (strata are low-cardinality
    metadata like language/source — never event-grain);
  * quota sampling ranks within strata, shuffling only on the stratum
    key. A mega-stratum skews that shuffle; `two_phase=True` is the
    fix — derive an over-selecting per-stratum hash threshold from
    hash uniformity, filter map-side, exact-rank only the small
    survivor set, with a detected-undershoot fallback that keeps the
    result bit-identical to the one-phase form.

The 28-bit md5-prefix hash reuses the portable construction from
operators/dedup.py (`portable_token_hash`) so Spark and any ANSI-SQL
engine agree bit-for-bit; production can swap xxhash64 for speed at
the cost of SQL portability.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from event_streaming_service_spark.operators.dedup import (
    portable_token_hash,
    portable_token_hash_sql,
)

# hash values are uniform over [0, 2^28); rates map to a threshold on
# that range. DENOM as a power of two keeps the threshold arithmetic
# exact for rates expressed in 1/2^28 units.
HASH_SPACE = 1 << 28


def sample_hash(key: Column) -> Column:
    """Uniform 28-bit content hash of the (stringified) sampling key."""
    return portable_token_hash(key.cast("string"))


def sample_hash_sql(key_expr: str) -> str:
    return portable_token_hash_sql(f"CAST({key_expr} AS VARCHAR)")


def deterministic_sample(df: DataFrame, rate: float,
                         key_col: str = "doc_id") -> DataFrame:
    """Keep rows whose key hashes below rate * 2^28 — a content-stable
    Bernoulli(rate) sample."""
    thr = int(rate * HASH_SPACE)
    return df.filter(sample_hash(F.col(key_col)) < thr)


def stratified_sample(df: DataFrame, rates: dict[str, float],
                      stratum_col: str, key_col: str = "doc_id",
                      default_rate: float = 0.0) -> DataFrame:
    """Per-stratum rate sampling (e.g. keep 100% of rare languages, 5%
    of English): each row keeps iff hash(key) < rate[stratum] * 2^28.
    The stratum->threshold map rides a broadcast join; rows in strata
    absent from `rates` use `default_rate`."""
    spark = df.sparkSession
    thr = spark.createDataFrame(
        [(s, int(r * HASH_SPACE)) for s, r in sorted(rates.items())],
        f"{stratum_col} string, __thr bigint")
    default_thr = int(default_rate * HASH_SPACE)
    return (df.join(F.broadcast(thr), stratum_col, "left")
            .filter(sample_hash(F.col(key_col))
                    < F.coalesce("__thr", F.lit(default_thr)))
            .drop("__thr"))


def quota_sample(df: DataFrame, quotas: dict[str, int],
                 stratum_col: str, key_col: str = "doc_id",
                 default_quota: int = 0,
                 two_phase: bool = False,
                 safety: float = 2.0,
                 stratum_counts: dict[str | None, int] | None = None,
                 ) -> DataFrame:
    """Exactly-n per stratum (when the stratum has >= n rows): rank by
    the content hash (ties on key) within each stratum and keep
    rank <= quota — a deterministic 'random n' that never oversamples
    small strata the way independent Bernoulli draws can.

    `two_phase=True` is the mega-stratum scale path (identical result):
    the one-phase form window-sorts EVERY row of a stratum on one
    executor, which a billion-row stratum cannot do. Phase 1 computes
    per-stratum counts (a partial-aggregating groupBy — tiny, strata
    are low-cardinality metadata) and derives an over-selecting hash
    threshold from hash uniformity (quota/n * 2^28 * safety); the
    pre-filter then drops all but ~safety*quota rows per stratum
    MAP-SIDE, and the exact rank runs on that small survivor set.
    Because both phases order by the same (hash, key), the top-quota
    set is unchanged whenever the threshold captures at least
    min(quota, n) survivors; the rare density-fluctuation undershoot is
    detected by a survivor count and those strata (and only those)
    fall back to the exact one-phase rank, so the result is equal to
    the one-phase form BY CONSTRUCTION, not just in expectation.

    `stratum_counts` (two-phase only): callers that already hold
    per-stratum row counts — from profiling, table statistics, or a
    prior aggregation — pass them here (keyed by stratum value, None
    for the NULL stratum) and phase 1's full-scan count job is skipped
    entirely, leaving ONE blocking action (the survivor count). The
    counts feed only the over-selecting threshold estimate, and the
    undershoot fallback re-ranks any stratum whose survivors come up
    short, so a stale or approximate count can cost speed, never
    correctness — EXCEPT that a stratum omitted from the map gets NO
    pre-filter at all (its threshold coalesces to the full hash space,
    keeping every row for the exact rank — see the inline comment at
    the coalesce), so omission costs speed, never rows.
    """
    spark = df.sparkSession
    q = spark.createDataFrame(
        [(s, n) for s, n in sorted(quotas.items())],
        f"{stratum_col} string, __quota int")
    w = Window.partitionBy(stratum_col).orderBy(
        sample_hash(F.col(key_col)), F.col(key_col))

    def exact_rank(frame: DataFrame) -> DataFrame:
        return (frame.join(F.broadcast(q), stratum_col, "left")
                .withColumn("__rk", F.row_number().over(w))
                .filter(F.col("__rk")
                        <= F.coalesce("__quota", F.lit(default_quota)))
                .drop("__quota", "__rk"))

    if not two_phase:
        return exact_rank(df)

    # NULL strata are a real group (missing source/language metadata):
    # the one-phase window partitions them together and the left join
    # gives them default_quota, so the two-phase plumbing must too.
    # All driver-side bookkeeping and the threshold join key go through
    # a non-null sentinel (join keys never match on NULL); the sentinel
    # column is internal and dropped before ranking.
    _NULL_KEY = "\x00__null_stratum__"
    skey = F.coalesce(F.col(stratum_col), F.lit(_NULL_KEY))
    if stratum_counts is not None:
        counts = {(_NULL_KEY if s is None else s): n
                  for s, n in stratum_counts.items()}
    else:
        counts = {r[0]: r[1] for r in
                  df.groupBy(skey.alias("__sk"))
                  .agg(F.count("*").alias("__n")).collect()}
    thr_rows = []
    need = {}
    for s, n in sorted(counts.items()):
        quota = default_quota if s == _NULL_KEY else quotas.get(s, default_quota)
        need[s] = min(quota, n)
        if quota <= 0:
            thr_rows.append((s, 0))
        elif quota >= n:
            thr_rows.append((s, HASH_SPACE))
        else:
            thr_rows.append(
                (s, min(HASH_SPACE,
                        int(HASH_SPACE * quota * safety / n) + 1)))
    thr = spark.createDataFrame(thr_rows, "__sk string, __pre bigint")
    # a stratum absent from `counts` (possible only with caller-provided
    # stratum_counts) keeps ALL its rows — no pre-filter — so the exact
    # rank below still yields the correct quota for it; defaulting to 0
    # would silently drop it without tripping the deficiency check
    survivors = (df.withColumn("__sk", skey)
                 .join(F.broadcast(thr), "__sk", "left")
                 .filter(sample_hash(F.col(key_col))
                         < F.coalesce("__pre", F.lit(HASH_SPACE)))
                 .drop("__pre")
                 # consumed by the count below AND the final rank; freed
                 # by the session (callers running many samples per
                 # session should clearCache between them)
                 .cache())
    got = {r[0]: r[1] for r in
           survivors.groupBy("__sk").agg(F.count("*").alias("__n"))
           .collect()}
    deficient = [s for s, m in need.items() if got.get(s, 0) < m]
    picked = exact_rank(
        (survivors.filter(~F.col("__sk").isin(deficient))
         if deficient else survivors).drop("__sk"))
    if deficient:
        # density fluctuation undershot the threshold for these strata
        # (probability ~exp(-quota*(safety-1)^2/3) each): re-rank them
        # exactly from the full frame — correctness never depends on
        # the estimate, only the fast path does
        picked = picked.unionByName(
            exact_rank(df.filter(skey.isin(deficient))))
    return picked


def weighted_sample(df: DataFrame, n: int, weight_col: str,
                    key_col: str = "doc_id") -> DataFrame:
    """Deterministic weighted sampling without replacement (the
    Efraimidis-Spirakis A-Res scheme): each row draws u = uniform(0,1)
    from its content hash and scores key = u^(1/weight); the top-n keys
    are the sample. Inclusion probability is proportional to weight —
    the standard primitive for mixture reweighting (sample long docs /
    underrepresented sources more often) — and, because u comes from
    the content hash, the selected set is a pure function of the data:
    stable under repartition, retries, and engines.

    Scale: one projection + a global top-n via orderBy(...).limit(n),
    which plans as TakeOrderedAndProject — partial top-n per partition,
    a tiny merge on the driver, no full sort and no single-partition
    window. The score rounds to 12 dp before ranking: pow()
    implementations differ across engines in the last ulp, and the
    rounding (12 orders above ulp noise, far below any real score gap
    on a 2^28 hash domain) pins the order; remaining exact ties break
    on the key column.

    Weights must be strictly positive and non-NULL: weight 0 would
    divide to Infinity, NULL would silently drop the row from ranking,
    and a negative weight inverts the preference — all semantically
    wrong, so the score expression fails loudly instead (raise_error
    inside the expression itself, so Catalyst cannot prune the check).
    """
    wcol = F.col(weight_col).cast("double")
    u = (sample_hash(F.col(key_col)) + 1.0) / float(HASH_SPACE)
    score = F.when(
        wcol.isNull() | (wcol <= 0),
        F.raise_error(F.concat(
            F.lit(f"weighted_sample: {weight_col} must be > 0 and"
                  " non-NULL, got "),
            F.coalesce(wcol.cast("string"), F.lit("NULL")),
        )).cast("double"),
    ).otherwise(F.round(F.pow(u, 1.0 / wcol), 12))
    return (df.withColumn("samp_key", score)
            .orderBy(F.col("samp_key").desc(), F.col(key_col))
            .limit(n))


def neyman_stratified_sample(df: DataFrame, stratum_col: str,
                             value_col: str, key_col: str,
                             total_n: int = 100) -> DataFrame:
    """Stratified sampling with NEYMAN (optimal) allocation: the
    per-stratum sample size is proportional to N_h * S_h (stratum
    size x stratum standard deviation — Neyman 1934), which minimizes
    the variance of the stratified mean estimator at a fixed total
    budget. The survey-sampling upgrade of quota_sample's fixed
    quotas: high-variance strata earn more of the budget.

    Engine-exact arithmetic: with the population stddev,
        N_h * S_h = sqrt(N_h * sum(x^2) - (sum x)^2)
    — the allocation weight is the floor-sqrt of an exact bigint
    discriminant (identical IEEE sqrt below 2^53 in both engines; the
    caller's value column must keep N_h * sum(x^2) under 2^53, which
    integer char/token counts do by orders of magnitude). Allocation
        n_h = min(N_h, max(1, total_n * w_h DIV sum_w))
    is truncating-DIV integer math; every stratum keeps at least one
    row. Selection inside a stratum is deterministic content-hash
    order (md5, key asc tiebreak) — the same content-stable reservoir
    contract as the other samplers in this module.

    Scale shape: one stats aggregate to stratum grain (tiny), a
    strata-bounded window for sum_w, one rank window per stratum for
    the pick order, and a broadcast join of the allocation — the
    stratum-key shuffle is the only data-sized exchange."""
    v = F.col(value_col).cast("long")
    stats = (df.groupBy(stratum_col)
             .agg(F.count(F.lit(1)).cast("long").alias("n_h"),
                  F.sum(v).cast("long").alias("__sx"),
                  F.sum(v * v).cast("long").alias("__sxx")))
    disc = (F.col("n_h") * F.col("__sxx")
            - F.col("__sx") * F.col("__sx"))
    alloc = (stats
             .withColumn("w_h", F.floor(F.sqrt(disc.cast("double")))
                         .cast("long"))
             .withColumn("__sum_w",
                         F.sum("w_h").over(Window.partitionBy()))
             .withColumn("alloc_n", F.least(
                 F.col("n_h"),
                 F.greatest(F.lit(1).cast("long"), F.expr(
                     f"{total_n} * w_h DIV greatest(__sum_w, 1)")))
                 .cast("long")))
    wr = Window.partitionBy(stratum_col).orderBy(
        sample_hash(F.col(key_col)), F.col(key_col))
    ranked = (df.select(stratum_col, key_col)
              .withColumn("pick_rank",
                          F.row_number().over(wr).cast("long")))
    return (ranked
            .join(F.broadcast(alloc.select(stratum_col, "n_h", "w_h",
                                           "alloc_n")),
                  stratum_col)
            .where(F.col("pick_rank") <= F.col("alloc_n"))
            .select(stratum_col, key_col, "pick_rank", "n_h", "w_h",
                    "alloc_n"))
