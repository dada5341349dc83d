"""Skyline / Pareto-frontier queries: the points no other point beats
on BOTH dimensions (minimize one, maximize the other) — the classic
OLAP "best tradeoffs" operator (Borzsony/Kossmann/Stocker, ICDE 2001)
the reference's counter statistics cannot express.

Dominance (2-D, min `min_col`, max `max_col`): point B dominates A iff
B.min <= A.min AND B.max >= A.max AND the pair differs in at least one
coordinate. The frontier is every input point not dominated by any
other. Coincident points do not dominate each other, so a frontier
coordinate's full multiplicity survives (reported as `n_items`).

Design notes (100 TB):

* The input first collapses to DISTINCT coordinate pairs with counts —
  a hash aggregate with map-side combine, so the frontier math runs on
  the coordinate grid, never the raw rows.
* Frontier membership needs only two facts per point: the best
  `max_col` among STRICTLY cheaper points, and the best among
  same-price points. Grouped skylines get both from two windows
  partitioned by the group key (parallel across groups).
* The GLOBAL skyline's "strictly cheaper" scan is a prefix-max over a
  total order — naively a single-partition window. The scale path
  splits it: bucket by price range, aggregate per-bucket maxima
  (B rows), prefix-max THOSE (trivial), broadcast back, and run the
  within-bucket window partitioned by bucket — the textbook
  distributed prefix-scan, no single-partition pass over the data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _survivors(pts: DataFrame, min_col: str, max_col: str,
               lower_max: F.Column, same_parts: list[str]) -> DataFrame:
    """Apply the two dominance facts: beat every strictly-cheaper
    point, and be the best at your own price."""
    w_same = Window.partitionBy(*same_parts, min_col)
    best_same = F.max(max_col).over(w_same)
    return (pts
            .withColumn("__lower", lower_max)
            .withColumn("__same", best_same)
            .where((F.col("__lower").isNull()
                    | (F.col(max_col) > F.col("__lower")))
                   & (F.col(max_col) == F.col("__same")))
            .drop("__lower", "__same"))


def pareto_frontier(df: DataFrame, min_col: str, max_col: str,
                    group_cols: list[str] | None = None,
                    n_buckets: int = 64) -> DataFrame:
    """2-D skyline: minimize `min_col`, maximize `max_col`, optionally
    within groups. Both dimension columns must be integral (callers
    quantize money to cents first — exactness is what makes the result
    oracle-checkable). Output: group cols + the two dimensions +
    `n_items` (input multiplicity of that coordinate)."""
    groups = list(group_cols or [])
    pts = (df.groupBy(*groups, min_col, max_col)
           .agg(F.count(F.lit(1)).alias("n_items")))

    if groups:
        w_lower = (Window.partitionBy(*groups).orderBy(min_col)
                   .rangeBetween(Window.unboundedPreceding, -1))
        return _survivors(pts, min_col, max_col,
                          F.max(max_col).over(w_lower), groups)

    # global skyline: distributed prefix-max over the price order
    bounds = pts.agg(F.min(min_col).alias("__lo"),
                     F.max(min_col).alias("__hi"))
    b = (F.when(F.col("__hi") == F.col("__lo"), F.lit(0))
         .otherwise(F.floor((F.col(min_col) - F.col("__lo"))
                            * F.lit(n_buckets)
                            / (F.col("__hi") - F.col("__lo") + 1)))
         .cast("bigint"))
    bucketed = (pts.crossJoin(F.broadcast(bounds))
                .withColumn("__b", b).drop("__lo", "__hi"))
    per_bucket = (bucketed.groupBy("__b")
                  .agg(F.max(max_col).alias("__bmax")))
    w_prefix = (Window.orderBy("__b")
                .rowsBetween(Window.unboundedPreceding, -1))
    prefix = per_bucket.select(
        "__b", F.max("__bmax").over(w_prefix).alias("__pmax"))
    w_in_bucket = (Window.partitionBy("__b").orderBy(min_col)
                   .rangeBetween(Window.unboundedPreceding, -1))
    lower_max = F.greatest(
        F.coalesce(F.max(max_col).over(w_in_bucket),
                   F.col("__pmax")),
        F.coalesce(F.col("__pmax"),
                   F.max(max_col).over(w_in_bucket)))
    return (_survivors(bucketed.join(F.broadcast(prefix), "__b", "left"),
                       min_col, max_col, lower_max, ["__b"])
            .drop("__b", "__pmax"))
