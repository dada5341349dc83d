"""Skew handling: salted two-phase aggregation.

The fixture's hot keys are real (5 event types over 100k+ rows: every
key is hot). AQE's skew-join splitting handles joins; for aggregations
over few-but-huge keys, salting splits each key into SALT subkeys so
the partial aggregate fans across SALT * n_keys reducers, then a second
(tiny) aggregate folds the salt back out. Results are identical to the
direct aggregation — the oracle checks exactly that — and the shuffle
skew disappears.

When to use at 100 TB: groupBy cardinality below ~10x the executor
count with non-associative-unfriendly distribution. For associative
aggregates Spark's partial aggregation already absorbs most skew
map-side; salting matters once per-key partial states are large
(collect_list/distinct-style) or keys are few enough to idle the
cluster. The operator exists so pipelines can opt in per aggregation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_SALT = 16


def salted_sum_count(df: DataFrame, key_cols: list[str],
                     sum_cols: dict[str, Column],
                     salt: int = DEFAULT_SALT,
                     salt_cols: list[str] | None = None) -> DataFrame:
    """Two-phase salted aggregation for sum/count family aggregates.

    sum_cols maps output name -> the EXPRESSION to sum (exact integer /
    decimal expressions recommended; see functions/money.py).

    The salt is derived from ROW CONTENT (`salt_cols`, default: every
    column), never from monotonically_increasing_id or rand: a
    nondeterministic grouping key re-salts rows to different reducers
    when a task is retried after a shuffle-fetch failure, double-counting
    or dropping them. xxhash64 of stable columns gives the same spread
    and is replay-stable. Pass a unique column (e.g. event_id) as
    salt_cols when one exists — hashing one column is cheaper than all.
    """
    src = [F.col(c) for c in (salt_cols if salt_cols else df.columns)]
    salted = df.withColumn("__salt", F.pmod(F.xxhash64(*src), F.lit(salt)))
    phase1 = (salted.groupBy(*key_cols, "__salt")
              .agg(F.count("*").alias("__n"),
                   *[F.sum(expr).alias(f"__s_{name}")
                     for name, expr in sum_cols.items()]))
    return (phase1.groupBy(*key_cols)
            .agg(F.sum("__n").alias("n"),
                 *[F.sum(f"__s_{name}").alias(name) for name in sum_cols]))


def key_skew_profile(df: DataFrame, key_col: str, top_n: int = 10
                     ) -> DataFrame:
    """Shuffle-key skew diagnostics: the top_n heaviest keys with their
    exact share and hot-factor (key count vs the all-keys average) in
    truncated ppm — the profile a 100 TB job runs BEFORE choosing salt
    factors / AQE skew thresholds for a join or aggregation key.

    Plan: one map-side-combined count per key, a 1-row global summary
    joined back broadcast, TakeOrderedAndProject for the top_n — the
    key domain is shuffled once at (key) grain and nothing else moves.
    hot_x_avg_ppm = cnt * n_keys * 1e6 DIV total: >> 1e6 means the key
    is that many times hotter than average (the salt-factor signal)."""
    counts = df.groupBy(F.col(key_col).alias("key")).agg(
        F.count(F.lit(1)).alias("cnt"))
    totals = counts.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum("cnt").alias("total"))
    return (
        counts.crossJoin(F.broadcast(totals))
        .select(
            "key", "cnt",
            F.expr("CAST(cnt * 1000000 DIV total AS BIGINT)")
            .alias("share_ppm"),
            F.expr("CAST(cnt * n_keys * 1000000 DIV total AS BIGINT)")
            .alias("hot_x_avg_ppm"),
            F.col("n_keys").cast("bigint").alias("n_keys"))
        .orderBy(F.col("cnt").desc(), F.col("key"))
        .limit(top_n)
    )
