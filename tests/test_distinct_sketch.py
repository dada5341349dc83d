"""Portable HLL / KMV sketches: python-reference parity for the hash
and register arithmetic, estimator sanity, and the bounded-state merge
property of the KMV kernel."""

from __future__ import annotations

import hashlib
import math

from pyspark.sql import functions as F

from event_streaming_service_spark.operators import distinct_sketch as ds


def _h48(value) -> int:
    return int(hashlib.md5(str(value).encode()).hexdigest()[:12], 16)


def _ref_hll(values) -> dict:
    regs: dict[int, int] = {}
    for v in set(values):
        h = _h48(v)
        idx, w = h % ds.HLL_M, h // ds.HLL_M
        rho = ds.RHO_MAX if w == 0 else ds.RHO_MAX - w.bit_length()
        regs[idx] = max(regs.get(idx, 0), rho)
    s = sum(1 << (ds.RHO_MAX - r) for r in regs.values())
    v_zero = ds.HLL_M - len(regs)
    s += v_zero * ds.HLL_SCALE
    raw = ds.HLL_NUM / s
    est = (ds.HLL_M * math.log(ds.HLL_M / v_zero)
           if raw <= 2.5 * ds.HLL_M and v_zero > 0 else raw)
    return {"v_zero": v_zero, "s_scaled": s,
            "raw_est_micro": math.floor(raw * 1e6 + 0.5),
            "est_micro": math.floor(est * 1e6 + 0.5)}


def test_hll_matches_reference_and_is_accurate(spark):
    n = 700
    df = spark.range(n).select(F.col("id").alias("k"))
    got = ds.hll_summary(df, F.col("k")).collect()[0].asDict()
    ref = _ref_hll(range(n))
    for key, val in ref.items():
        assert got[key] == val, key
    # estimator quality: within 15% at 700 distinct / 256 registers
    assert abs(got["est_micro"] / 1e6 - n) < 0.15 * n


def test_hll_duplicates_do_not_move_registers(spark):
    a = spark.range(300).select(F.col("id").alias("k"))
    b = a.union(a).union(a)
    ra = ds.hll_summary(a, F.col("k")).collect()[0]
    rb = ds.hll_summary(b, F.col("k")).collect()[0]
    assert ra.asDict() == rb.asDict()


def test_kmv_per_group_exact_merge(spark):
    # 2 groups x 400 distinct keys, heavily duplicated and shuffled
    # across partitions: the merged bottom-k must equal the true
    # k smallest distinct hashes computed in pure python.
    rows = [(g, i % 400) for g in ("a", "b") for i in range(2000)]
    df = spark.createDataFrame(rows, "g string, k bigint").repartition(7)
    out = {r["g"]: r for r in
           ds.kmv_per_group(df, "g", F.col("k")).collect()}
    for g in ("a", "b"):
        hashes = sorted({_h48(i) for i in range(400)})
        kth = hashes[ds.KMV_K - 1]
        assert out[g]["n_kept"] == ds.KMV_K
        assert out[g]["kth_hash"] == kth
        est = (ds.KMV_K - 1) * ds.KMV_SPACE // kth
        assert out[g]["est_distinct"] == est
        assert abs(est - 400) < 0.5 * 400  # loose sanity band at k=64


def test_kmv_small_group_is_exact(spark):
    df = spark.createDataFrame([("a", i) for i in range(10)],
                               "g string, k bigint")
    r = ds.kmv_per_group(df, "g", F.col("k")).collect()[0]
    assert r["n_kept"] == 10
    assert r["est_distinct"] == 10


def test_kmv_intersection_planted_overlap(spark):
    """Groups A = {0..399}, B = {200..599}: true intersection 200.
    The sketch estimate must match the pure-python replay of the same
    theta arithmetic exactly, and land within a loose band of 200."""
    from pyspark.sql import functions as F
    rows = ([("A", i) for i in range(400)]
            + [("B", i) for i in range(200, 600)]) * 3
    df = spark.createDataFrame(rows, "g string, k bigint").repartition(5)
    out = ds.kmv_intersection(df, "g", F.col("k"), "A", "B").collect()[0]
    ha = sorted({_h48(i) for i in range(400)})[:ds.KMV_K]
    hb = sorted({_h48(i) for i in range(200, 600)})[:ds.KMV_K]
    theta = min(ha[-1], hb[-1])
    common = len({h for h in ha if h <= theta} & {h for h in hb
                                                 if h <= theta})
    assert out["theta_hash"] == theta
    assert out["n_common_below_theta"] == common
    assert out["est_intersection"] == common * ds.KMV_SPACE // theta
    assert abs(out["est_intersection"] - 200) < 150
