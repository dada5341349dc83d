"""Snapshot diff: classify every key of two table versions as added,
removed, changed, or unchanged — the reconciliation operator behind
CDC validation, backfill audits, and "what did this pipeline rerun
actually change" reviews (the dbt snapshot / datafold-style diff),
and the natural companion to scd.py's SCD2 merge (scd2_apply writes
history; table_diff EXPLAINS a rerun by reading two versions).

Design notes (100 TB):

* One full-outer hash join on the key — the minimum any diff must
  shuffle — with change detection as a codegen'd comparison of the
  tracked columns (null-safe <=> so NULL -> value and value -> NULL
  count as changes, not as matches).
* The per-side content digest is computed BEFORE the join from the
  tracked columns only, so the join carries two hashes + the key, not
  the full row width; wide tables diff at key+digest cost. Callers
  wanting the changed VALUES join the delta keys back to either side
  (bounded by the change count, not the table size).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def table_diff(old: DataFrame, new: DataFrame, key_cols: list[str],
               tracked_cols: list[str]) -> DataFrame:
    """One row per key present in either version: (key...,
    change_kind in added|removed|changed|unchanged, old_digest,
    new_digest). Digests are md5 over the canonicalized tracked
    columns (NULL distinguished from the string 'null' by a length
    prefix)."""
    def digest(df: DataFrame) -> F.Column:
        parts = []
        for c in tracked_cols:
            s = F.col(c).cast("string")
            parts.append(F.concat(
                F.coalesce(F.length(s).cast("string"), F.lit("-")),
                F.lit(":"), F.coalesce(s, F.lit(""))))
        return F.md5(F.concat_ws("|", *parts))

    o = old.select(*key_cols, digest(old).alias("old_digest"))
    n = new.select(*key_cols, digest(new).alias("new_digest"))
    joined = o.join(n, key_cols, "full_outer")
    kind = (F.when(F.col("old_digest").isNull(), F.lit("added"))
            .when(F.col("new_digest").isNull(), F.lit("removed"))
            .when(F.col("old_digest") == F.col("new_digest"),
                  F.lit("unchanged"))
            .otherwise(F.lit("changed")))
    return joined.select(*key_cols, kind.alias("change_kind"),
                         "old_digest", "new_digest")
