"""Broadcast Bloom-filter membership: build a bit-packed filter over a
keyed corpus in one aggregation, probe it MAP-SIDE from any other
frame as a pure codegen expression.

The 100 TB use case is delta-vs-index pruning: an incremental-dedup
probe joins today's batch against yesterday's multi-billion-row
fingerprint index, but the overwhelming majority of new documents
match nothing — a Bloom filter over the index fingerprints
(m/8 bytes, e.g. 2^27 bits = 16 MiB for ~10^7 keys at ~1% fp) rides
the broadcast path and eliminates non-members BEFORE the join, so the
shuffle carries only true matches plus the small false-positive rate.
No false negatives ever: a key whose every bit is set MIGHT be a
member; a key with any bit clear is DEFINITELY not — so downstream
exact joins see a superset of the true matches and results are
bit-identical with or without the filter (which is what lets a plain
SQL oracle verify the pruned pipeline).

Hashing is the repo-wide portable universal family over the 28-bit
md5-prefix hash (operators/dedup.py bound analysis: a*h + b < 2^60, no
int64 overflow in any engine), so the oracle can rebuild the exact
same bit positions in SQL. Spark 3.3+ ships an internal
bloom_filter_agg for runtime join pruning, but it is not a public
PySpark surface and its hash is engine-specific — this explicit
variant is portable and oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from event_streaming_service_spark.operators.dedup import (
    _HASH_P,
    HASH_AS,
    HASH_BS,
    portable_token_hash,
)

BLOOM_M_BITS = 1 << 18  # fixture-scale default; 2^27+ at production
BLOOM_HASHES = 4


def _positions(key: Column, m_bits: int, n_hashes: int) -> Column:
    """array<bigint> of the key's bit positions (one per hash seed)."""
    hx = portable_token_hash(key)
    return F.array(*[
        (F.lit(HASH_AS[i]) * hx + F.lit(HASH_BS[i]))
        % F.lit(_HASH_P) % F.lit(m_bits)
        for i in range(n_hashes)])


def bloom_build(keys: DataFrame, key: Column,
                m_bits: int = BLOOM_M_BITS,
                n_hashes: int = BLOOM_HASHES) -> list[int]:
    """Build the filter: returns the dense list of m_bits/64 packed
    words (python ints, sign-preserving for bit 63).

    One pass over `keys`: explode the n_hashes positions, pack each
    into (word index, single-bit mask), and bit_or-aggregate per word —
    partial aggregation collapses each task's contribution to
    <= m_bits/64 rows before the shuffle, and the collect is bounded by
    m_bits/64 rows (16 MiB of longs at 2^30 bits) regardless of corpus
    size. The variable-distance shifts go through SQL `shiftleft`,
    whose expression form takes a column shift count (the PySpark
    wrapper only accepts literals).
    """
    words = (keys.select(F.explode(_positions(key, m_bits, n_hashes))
                         .alias("p"))
             .select(F.shiftright(F.col("p"), 6).alias("w"),
                     F.expr("shiftleft(CAST(1 AS BIGINT), "
                            "CAST(p % 64 AS INT))").alias("bit"))
             .groupBy("w").agg(F.expr("bit_or(bit)").alias("word"))
             .collect())
    dense = [0] * (m_bits >> 6)
    for r in words:
        dense[int(r["w"])] = int(r["word"])
    return dense


def bloom_probe(df: DataFrame, key: Column, words: list[int],
                m_bits: int = BLOOM_M_BITS,
                n_hashes: int = BLOOM_HASHES,
                out_col: str = "bloom_candidate") -> DataFrame:
    """Append boolean `out_col`: true iff every hash position's bit is
    set (possible member), false on any clear bit (definite
    non-member).

    The filter words ride as ONE array literal attached to the plan
    (broadcast with the task binaries); each probe is n_hashes
    element_at + shift + mask steps, evaluated inside whole-stage
    codegen — no join, no shuffle, no Python. Arithmetic shiftright is
    fine for bit 63: sign fill only affects bits above the one the
    `& 1` inspects.
    """
    probed = (df.withColumn("__bloom_words", F.lit(words))
              .withColumn("__bloom_pos", _positions(key, m_bits, n_hashes)))
    conds = []
    for i in range(n_hashes):
        conds.append(F.expr(
            f"(shiftright(element_at(__bloom_words, "
            f"CAST(shiftright(__bloom_pos[{i}], 6) AS INT) + 1), "
            f"CAST(__bloom_pos[{i}] % 64 AS INT)) & 1) = 1"))
    hit = conds[0]
    for c in conds[1:]:
        hit = hit & c
    return (probed.withColumn(out_col, hit)
            .drop("__bloom_words", "__bloom_pos"))
