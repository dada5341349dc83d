"""Bloom-filter membership (operators/membership.py): no false
negatives ever, false positives bounded, bit packing matches a pure
python reference."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from event_streaming_service_spark.operators import membership
from event_streaming_service_spark.operators.dedup import (
    _HASH_P, HASH_AS, HASH_BS)


def _py_positions(key: str, m_bits: int, n_hashes: int) -> list[int]:
    import hashlib
    h = int(hashlib.md5(key.encode()).hexdigest()[:7], 16)
    return [((HASH_AS[i] * h + HASH_BS[i]) % _HASH_P) % m_bits
            for i in range(n_hashes)]


def test_no_false_negatives_and_packing_matches_reference(spark):
    members = [f"member-{i}" for i in range(400)]
    df = spark.createDataFrame(pd.DataFrame({"k": members})).repartition(8)
    m_bits, n_hashes = 1 << 14, 4
    words = membership.bloom_build(df, F.col("k"), m_bits, n_hashes)

    # python reference filter over the same hash family
    ref = [0] * (m_bits >> 6)
    for k in members:
        for p in _py_positions(k, m_bits, n_hashes):
            ref[p >> 6] |= 1 << (p & 63)
    # spark packs into SIGNED longs; compare modulo 2^64
    assert [w % (1 << 64) for w in words] == ref

    probed = membership.bloom_probe(df, F.col("k"), words, m_bits, n_hashes)
    assert probed.filter(~F.col("bloom_candidate")).count() == 0


def test_non_members_mostly_rejected(spark):
    members = spark.createDataFrame(
        pd.DataFrame({"k": [f"in-{i}" for i in range(200)]}))
    words = membership.bloom_build(members, F.col("k"), 1 << 16, 4)
    others = spark.createDataFrame(
        pd.DataFrame({"k": [f"out-{i}" for i in range(500)]}))
    fp = (membership.bloom_probe(others, F.col("k"), words, 1 << 16, 4)
          .filter(F.col("bloom_candidate")).count())
    # 200 keys in 65536 bits: per-probe load ~1.2%, fp ~ (load)^4 ~ 0
    assert fp <= 2


def test_high_bit_positions_pack_into_sign_bit_safely(spark):
    """Keys landing on bit 63 of a word produce a negative long; the
    probe's arithmetic shift must still read the bit correctly."""
    # tiny filter: 64 bits = 1 word; brute-force a key hitting bit 63
    m_bits, n_hashes = 64, 1
    key = None
    for i in range(10000):
        cand = f"probe-{i}"
        if _py_positions(cand, m_bits, n_hashes)[0] == 63:
            key = cand
            break
    assert key is not None
    df = spark.createDataFrame(pd.DataFrame({"k": [key]}))
    words = membership.bloom_build(df, F.col("k"), m_bits, n_hashes)
    assert words[0] < 0  # bit 63 set -> negative signed long
    probed = membership.bloom_probe(df, F.col("k"), words, m_bits, n_hashes)
    assert probed.first()["bloom_candidate"] is True
