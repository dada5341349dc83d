"""Record linkage: sorted-neighborhood blocked fuzzy matching.

Entity resolution for a 100 TB ingest — "is this record the same
entity as one we already hold, modulo typos?" — cannot run the naive
all-pairs edit-distance join (quadratic). The classic fix is the
sorted-neighborhood method (Hernandez & Stolfo, SIGMOD '95): sort ALL
records (both sides together) by the match key, slide a fixed window
of w positions, and compare only pairs inside the window. Candidates
drop from |L|x|R| to (|L|+|R|) x w, and the expensive predicate
(Levenshtein here) runs only on candidates.

No reference counterpart (the reference routes records by exact keys
only — service/PartitionKeyExtractor.java); this extends the dedup
family (SURVEY.md section 2.12) from content-hash equality to
approximate string identity.

Scale design:
* The global sort is a RANGE repartition + per-partition sort — never
  a single-partition window. Global ranks are reconstructed as
  partition-offset + local row_number: one tiny per-partition count
  (collected: #partitions rows), then a window PARTITIONED by the
  physical partition id — every partition ranks its own rows.
  Range boundaries are sampled (nondeterministic), but the rank they
  produce is the deterministic total order by (name, side, key) —
  boundary placement cannot change a row's global position.
* The w-neighbor self-join is an EQUI-join: the left side explodes
  offsets 1..w onto its rank, so Spark hash-partitions both sides on
  the rank value — no nested-loop, no range-join fallback. Fan-out is
  exactly w, chosen small (the method's premise: true matches sort
  near each other).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def global_rank(df: DataFrame, order_cols: list[str],
                num_partitions: int = 32) -> DataFrame:
    """Attach a deterministic global 1-based `rank` by `order_cols`
    (which must be a total order — include a unique tiebreak) without
    ever shuffling all rows to one task.

    repartitionByRange puts each task a contiguous key range;
    row_number inside each task plus the exclusive prefix sum of task
    sizes (a #partitions-row collect) is the global row_number.

    The ranged frame is localCheckpoint-ed BEFORE the sizes collect:
    RangePartitioner derives its boundaries from a bounded reservoir
    sample whose seed varies per job, so without pinning, the sizes
    job and the downstream rank job can land DIFFERENT boundaries
    (observed: 15k rows -> ~200 duplicate ranks) — the bug only
    stays hidden while the input is small enough for the sample to
    cover it completely. Checkpointing materializes one partitioning
    that both jobs then share.
    """
    ranged = (df.repartitionByRange(num_partitions,
                                    *[F.col(c) for c in order_cols])
              .withColumn("__pid", F.spark_partition_id())
              .localCheckpoint())
    sizes = {r["__pid"]: r["cnt"] for r in
             ranged.groupBy("__pid").agg(F.count(F.lit(1)).alias("cnt"))
             .collect()}
    offsets, acc = {}, 0
    for pid in sorted(sizes):
        offsets[pid] = acc
        acc += sizes[pid]
    off_map = F.create_map(*[F.lit(v) for kv in sorted(offsets.items())
                             for v in kv])
    w = Window.partitionBy("__pid").orderBy(*order_cols)
    return (ranged
            .withColumn("rank", F.row_number().over(w)
                        + off_map[F.col("__pid")])
            .drop("__pid"))


def sorted_neighborhood_pairs(left: DataFrame, right: DataFrame,
                              key_col: str, name_col: str,
                              window: int, max_dist: int,
                              num_partitions: int = 32) -> DataFrame:
    """Cross-side fuzzy match pairs via one sorted pass.

    Inputs: two frames with (`key_col`, `name_col`). Output: one row
    per (left key, right key) pair whose names sit within `window`
    positions of each other in the combined sort order AND within
    Levenshtein distance `max_dist`. Columns: left_key, right_key,
    left_name, right_name, dist.

    Recall contract (inherent to the method, stated honestly): a true
    pair whose names sort further than `window` positions apart is
    missed. Callers pick the sort key so matches cluster — standard
    practice is multi-pass SNM over different key orderings, which is
    just a union of this operator over transforms.
    """
    tagged = (left.select(F.lit("L").alias("side"),
                          F.col(key_col).cast("long").alias("key"),
                          F.col(name_col).alias("name"))
              .unionByName(
                  right.select(F.lit("R").alias("side"),
                               F.col(key_col).cast("long").alias("key"),
                               F.col(name_col).alias("name"))))
    ranked = global_rank(tagged, ["name", "side", "key"],
                         num_partitions=num_partitions)

    probe = (ranked
             .withColumn("__d", F.explode(F.sequence(F.lit(1),
                                                     F.lit(window))))
             .withColumn("__target", F.col("rank") + F.col("__d"))
             .select(F.col("side").alias("side_a"),
                     F.col("key").alias("key_a"),
                     F.col("name").alias("name_a"),
                     F.col("__target")))
    base = ranked.select(F.col("side").alias("side_b"),
                         F.col("key").alias("key_b"),
                         F.col("name").alias("name_b"),
                         F.col("rank").alias("__target"))
    pairs = (probe.join(base, "__target")
             .where(F.col("side_a") != F.col("side_b"))
             .withColumn("dist", F.levenshtein("name_a", "name_b"))
             .where(F.col("dist") <= max_dist))
    # normalize orientation: L keys first regardless of sort position
    return pairs.select(
        F.when(F.col("side_a") == "L", F.col("key_a"))
         .otherwise(F.col("key_b")).alias("left_key"),
        F.when(F.col("side_a") == "L", F.col("key_b"))
         .otherwise(F.col("key_a")).alias("right_key"),
        F.when(F.col("side_a") == "L", F.col("name_a"))
         .otherwise(F.col("name_b")).alias("left_name"),
        F.when(F.col("side_a") == "L", F.col("name_b"))
         .otherwise(F.col("name_a")).alias("right_name"),
        "dist")
