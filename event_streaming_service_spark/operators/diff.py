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


def merge_changelog(base: DataFrame, changelog: DataFrame,
                    key_col: str, seq_cols: list[str], op_col: str,
                    val_col: str, base_val_col: str) -> DataFrame:
    """CDC MERGE apply (the lakehouse MERGE INTO / upsert kernel):
    fold a changelog of keyed I/U/D operations onto a base snapshot,
    latest op per key winning by the (seq_cols, ...) total order, and
    classify every key:

        unchanged    key only in base
        updated      key in both, last op U -> value replaced
        deleted      key in both, last op D -> leaves the snapshot
        inserted     key only in changelog, last op U
        noop_delete  key only in changelog, last op D (audited, not
                     applied -- emitting it keeps the apply decision
                     cross-engine-checkable instead of silent)

    Returns the audit grain (key, action, old value, new value);
    the post-merge snapshot is exactly the rows with action IN
    ('unchanged','updated','inserted') projected to (key, new).

    Plan shape for 100 TB: one window at key grain over the changelog
    (the only sort), then one full-outer join base vs last-op on the
    merge key -- the classic CDC compaction: cost is the join shuffle,
    and both sides arrive already reduced to key grain. seq_cols MUST
    total-order ops within a key (include a unique id) or "latest"
    is ambiguous."""
    from pyspark.sql import Window

    w = (Window.partitionBy(key_col)
         .orderBy(*[F.col(c).desc() for c in seq_cols]))
    last = (changelog
            .withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .select(F.col(key_col).alias("__k"),
                    F.col(op_col).alias("__op"),
                    F.col(val_col).alias("__new")))
    b = base.select(F.col(key_col).alias("__bk"),
                    F.col(base_val_col).alias("__old"))
    j = b.join(last, b["__bk"] == last["__k"], "full_outer")
    action = (
        F.when(F.col("__k").isNull(), F.lit("unchanged"))
        .when(F.col("__bk").isNull() & (F.col("__op") == "D"),
              F.lit("noop_delete"))
        .when(F.col("__bk").isNull(), F.lit("inserted"))
        .when(F.col("__op") == "D", F.lit("deleted"))
        .otherwise(F.lit("updated")))
    val_type = changelog.schema[val_col].dataType
    new_val = (
        F.when(F.col("__op") == "D", F.lit(None).cast(val_type))
        .when(F.col("__op").isNull(), F.col("__old"))
        .otherwise(F.col("__new")))
    return (j.select(
        F.coalesce(F.col("__bk"), F.col("__k")).alias(key_col),
        action.alias("action"),
        F.col("__old").alias("old_val"),
        new_val.alias("new_val")))


def ivm_delta_join(base_a: DataFrame, delta_a: DataFrame,
                   base_b: DataFrame, delta_b: DataFrame,
                   key: str) -> DataFrame:
    """Incremental view maintenance for a JOIN view (the delta-join
    algebra every streaming-SQL engine implements; incremental_rollup
    is the aggregate sibling): with a materialized V = A JOIN B and
    insert deltas dA, dB, the maintained view is

        V' = V  UNION ALL  dA JOIN B  UNION ALL  A JOIN dB
                UNION ALL  dA JOIN dB

    — disjoint by construction for insert-only deltas, so UNION ALL,
    never a dedup. Returns the maintained view rows (all four terms).

    Scale shape: THE point of IVM — the base join is reused, not
    recomputed, and each delta term joins a delta-sized frame against
    one base side, so the deltas are explicitly broadcast (daily
    deltas are small by definition; the base sides never reshuffle).
    A recompute touches |A|+|B| rows; maintenance touches
    |dA|+|dB| + matched base rows."""
    v = base_a.join(base_b, key)
    da_b = F.broadcast(delta_a).join(base_b, key)
    a_db = base_a.join(F.broadcast(delta_b), key)
    da_db = delta_a.join(F.broadcast(delta_b), key)
    return (v.unionByName(da_b)
            .unionByName(a_db)
            .unionByName(da_db))
