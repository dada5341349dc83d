"""Round-8 operator tests: suffix-automaton LRS, GIF feature kernels,
transformWithState running profile."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from event_streaming_service_spark.operators import multimodal, text


def test_lrs_automaton_vs_bruteforce_fuzz():
    import random

    def brute(seq, cap):
        best, grams = 0, set()
        for n in range(1, min(cap, len(seq) - 1) + 1 if seq else 0):
            seen, dup = {}, set()
            for i in range(len(seq) - n + 1):
                g = tuple(seq[i:i + n])
                seen[g] = seen.get(g, 0) + 1
                if seen[g] == 2:
                    dup.add(g)
            if dup:
                best, grams = n, dup
        return (best, len(grams)) if best else (0, 0)

    rng = random.Random(1234)
    for _ in range(500):
        seq = [rng.randrange(rng.randint(1, 6))
               for _ in range(rng.randint(0, 40))]
        cap = rng.choice([3, 5, 24])
        assert text._suffix_automaton_lrs(seq, cap) == brute(seq, cap)
    assert text._suffix_automaton_lrs([7] * 100, 24) == (24, 1)
    assert text._suffix_automaton_lrs([7] * 100, 200) == (99, 1)
    assert text._suffix_automaton_lrs([], 24) == (0, 0)
    assert text._suffix_automaton_lrs([1, 2, 3], 24) == (0, 0)


def test_lrs_stats_known_docs(spark):
    docs = spark.createDataFrame(
        [(1, "a b c a b c d"),       # 'a b c' repeats -> lrs 3
         (2, "x y z"),               # all distinct -> 0
         (3, "q q q q"),             # 'q q q' repeats (overlap) -> 3
         (4, ""),                    # empty
         (5, "u v u w v u")],        # 'u' x3, 'v' x2; 'v u' repeats -> 2
        "doc_id bigint, text string")
    out = {r["doc_id"]: r for r in
           text.lrs_stats(docs).collect()}
    assert (out[1]["lrs_len"], out[1]["n_max_grams"]) == (3, 1)
    assert (out[2]["lrs_len"], out[2]["n_max_grams"]) == (0, 0)
    assert (out[3]["lrs_len"], out[3]["n_max_grams"]) == (3, 1)
    assert (out[4]["n_tokens"], out[4]["lrs_len"]) == (0, 0)
    assert (out[5]["lrs_len"], out[5]["n_max_grams"]) == (2, 1)
    # cap binds: 10x 'a' with cap 4 -> length-4 repeat, one distinct
    capped = text.lrs_stats(
        spark.createDataFrame([(9, " ".join("a" * 10).strip())],
                              "doc_id bigint, text string"),
        cap=4).collect()[0]
    assert (capped["lrs_len"], capped["n_max_grams"]) == (4, 1)


def test_gif_features_match_formula(spark):
    docs = spark.createDataFrame([(i,) for i in (0, 5, 17, 100)],
                                 "doc_id bigint")
    media = multimodal.attach_gif_payload(docs)
    rows = {r["doc_id"]: r
            for r in multimodal.extract_features_gif(media).collect()}
    for d in (0, 5, 17, 100):
        w, h, nc, _ = multimodal._gif_shape(d)
        idx = (d + np.add.outer(3 * np.arange(h), np.arange(w))) % nc
        pal = multimodal._gif_palette(d, nc).astype("int64")
        rgb = pal[idx]
        r = rows[d]
        assert (r["width"], r["height"]) == (w, h)
        assert r["n_colors_used"] == len(np.unique(idx))
        for c in range(3):
            assert r[f"ch{c}_sum"] == int(rgb[..., c].sum())


def test_gif_video_frames_and_deltas(spark):
    docs = spark.createDataFrame([(7,)], "doc_id bigint")
    media = multimodal.attach_gif_payload(docs, animated=True)
    out = (multimodal.video_frame_stats_gif(media)
           .orderBy("frame_idx").collect())
    w, h, nc, nf = multimodal._gif_shape(7)
    assert len(out) == nf
    frames, pal = multimodal._gif_frames(7)
    rgb = pal[frames].astype("int64")
    for f, r in enumerate(out):
        assert r["ch0_sum"] == int(rgb[f, ..., 0].sum())
        want = int(np.abs(rgb[f] - rgb[f - 1]).sum()) if f else 0
        assert r["diff_sum"] == want
    assert out[1]["diff_sum"] > 0  # palette rotation moves pixels


def test_running_profile_stream_matches_batch(spark, tmp_path):
    """transformWithState (state-v2): multi-batch stream == batch
    window twin, all three state variables carrying across batches.

    Skips when the `protobuf` package is absent: PySpark's
    TransformWithStateInPySpark state server speaks protobuf between
    the JVM and the Python driver worker, so the API cannot
    initialize without it (same env gate as the spark-protobuf jar
    parity test — the operator itself is complete)."""
    pytest.importorskip(
        "google.protobuf",
        reason="transformWithState state server needs protobuf")
    from event_streaming_service_spark.streaming import stateful

    pdf = pd.DataFrame({
        "event_id": range(1, 13),
        "ts": pd.to_datetime([f"2024-01-01 00:{m:02d}:00"
                              for m in range(1, 13)]),
        "user_id": [1, 2, 1, 1, 2, 1, 2, 1, 2, 1, 1, 2],
        "event_type": ["a", "a", "b", "a", "b", "b",
                       "a", "c", "c", "a", "b", "a"],
        "value": [1.25, 2.0, 0.5, 3.75, 1.0, 2.25,
                  0.75, 4.0, 1.5, 2.5, 0.25, 3.0],
        "props": [""] * 12,
    })
    src = str(tmp_path / "src")
    import os

    # two part files with increasing mtimes -> two micro-batches in
    # time order (the _stream_src device)
    spark.createDataFrame(pdf[:6]).coalesce(1).write.parquet(src)
    spark.createDataFrame(pdf[6:]).coalesce(1).write.mode(
        "append").parquet(src)
    parts = sorted(p for p in os.listdir(src) if p.startswith("part-"))
    base = max(os.stat(os.path.join(src, p)).st_mtime for p in parts)
    for i, p in enumerate(parts):
        os.utime(os.path.join(src, p), (base + i + 1, base + i + 1))

    key = "spark.sql.streaming.stateStore.providerClass"
    prev = spark.conf.get(key, None)
    spark.conf.set(key, "org.apache.spark.sql.execution.streaming."
                        "state.RocksDBStateStoreProvider")
    try:
        stream = (spark.readStream.schema(
            "event_id bigint, ts timestamp, user_id bigint,"
            " event_type string, value double, props string")
            .option("maxFilesPerTrigger", 1).parquet(src))
        q = (stateful.running_profile_stream(stream)
             .writeStream.format("memory").queryName("trp")
             .outputMode("append").trigger(availableNow=True).start())
        assert q.awaitTermination(120)
        got = {r["event_id"]: r for r in spark.table("trp").collect()}
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)

    # batch twin
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    first = (F.row_number().over(
        Window.partitionBy("user_id", "event_type")
        .orderBy("ts", "event_id")) == 1).cast("int")
    want = (spark.createDataFrame(pdf)
            .withColumn("cents",
                        F.floor(F.col("value") * 100 + 0.5))
            .withColumn("n_events", F.row_number().over(w).cast("long"))
            .withColumn("n_types_seen",
                        F.sum(first).over(w).cast("int"))
            .withColumn("last3_cents_sum",
                        F.sum("cents").over(w.rowsBetween(-2, 0))))
    for r in want.collect():
        g = got[r["event_id"]]
        assert (g["n_events"], g["n_types_seen"],
                g["last3_cents_sum"]) == \
            (r["n_events"], r["n_types_seen"], r["last3_cents_sum"]), \
            r["event_id"]
    assert len(got) == 12


def test_aho_corasick_vs_naive_fuzz():
    import random

    from event_streaming_service_spark.operators.text import (
        _aho_corasick)

    def naive(txt, pats):
        total, seen, first = 0, set(), 0
        for pi, p in enumerate(pats):
            start = 0
            while True:
                j = txt.find(p, start)
                if j < 0:
                    break
                total += 1
                seen.add(pi)
                if first == 0 or j + 1 < first:
                    first = j + 1
                start = j + 1  # overlapping occurrences count
        return total, len(seen), first

    def ac(txt, pats):
        goto, fail, out = _aho_corasick(list(pats))
        plens = [len(p) for p in pats]
        s, n, seen, first = 0, 0, set(), 0
        for i, ch in enumerate(txt):
            while s and ch not in goto[s]:
                s = fail[s]
            s = goto[s].get(ch, 0)
            if out[s]:
                n += len(out[s])
                for pi in out[s]:
                    seen.add(pi)
                    st = i - plens[pi] + 2
                    if first == 0 or st < first:
                        first = st
        return n, len(seen), first

    rng = random.Random(99)
    for _ in range(800):
        alpha = "ab" if rng.random() < 0.5 else "abc"
        txt = "".join(rng.choice(alpha)
                      for _ in range(rng.randint(0, 60)))
        pats = list({"".join(rng.choice(alpha)
                             for _ in range(rng.randint(1, 5)))
                     for _ in range(rng.randint(1, 6))})
        assert ac(txt, pats) == naive(txt, pats), (txt, pats)


def test_blocklist_patterns_are_border_free():
    # the oracle's replace() device counts NON-overlapping matches;
    # border-free patterns make that equal the automaton's
    # all-occurrences count — pin the invariant on the shipped list
    from event_streaming_service_spark.query_defs.text_queries import (
        BLOCKLIST_PATTERNS)

    for p in BLOCKLIST_PATTERNS:
        assert not any(p[:k] == p[-k:] for k in range(1, len(p))), p


def test_multi_pattern_scan_known(spark):
    from event_streaming_service_spark.operators.text import (
        multi_pattern_scan)

    docs = spark.createDataFrame(
        [(1, "xx fast table yy key agg zz key agg"),
         (2, "clean text here"),
         (3, "key aggkey agg")],   # adjacent occurrences
        "doc_id bigint, text string")
    out = {r["doc_id"]: r for r in multi_pattern_scan(
        docs, ("fast table", "key agg")).collect()}
    assert (out[1]["n_matches"], out[1]["n_patterns"],
            out[1]["first_pos"]) == (3, 2, 4)
    assert (out[2]["n_matches"], out[2]["n_patterns"],
            out[2]["first_pos"]) == (0, 0, 0)
    assert (out[3]["n_matches"], out[3]["n_patterns"],
            out[3]["first_pos"]) == (2, 1, 1)


def test_interval_coverage_known(spark):
    from event_streaming_service_spark.operators.windows import (
        interval_coverage)

    rows = [
        # key 1: [1,3] + [2,5] overlap; [5,6] touches (start == max
        # end -> merges); [8,9] separate -> 2 islands, 6 + 2 days
        (1, "2024-01-01", "2024-01-03"),
        (1, "2024-01-02", "2024-01-05"),
        (1, "2024-01-05", "2024-01-06"),
        (1, "2024-01-08", "2024-01-09"),
        # key 2: nested interval does not extend the island
        (2, "2024-02-01", "2024-02-10"),
        (2, "2024-02-03", "2024-02-04"),
    ]
    df = (spark.createDataFrame(rows, "k bigint, s string, e string")
          .select("k", F.to_date("s").alias("s"),
                  F.to_date("e").alias("e")))
    out = {r["k"]: r for r in
           interval_coverage(df, "k", "s", "e").collect()}
    assert (out[1]["n_intervals"], out[1]["n_islands"],
            out[1]["covered_days"], out[1]["max_island_days"]) \
        == (4, 2, 8, 6)
    assert (out[2]["n_intervals"], out[2]["n_islands"],
            out[2]["covered_days"], out[2]["max_island_days"]) \
        == (2, 1, 10, 10)


def test_cusum_known_sequence(spark):
    from event_streaming_service_spark.operators.anomaly import (
        cusum_alerts)

    # k=100, h=250: cents 400,50,50,400,400 ->
    # S: 300, 250, 200, 500, 800 -> above at S=300 (cross #1), back
    # to <=250 at S=250, cross #2 at S=500, stays above at 800
    rows = [(1, f"2024-01-01 00:0{i}:00", i + 1, v)
            for i, v in enumerate([4.0, 0.5, 0.5, 4.0, 4.0])]
    df = (spark.createDataFrame(
        rows, "user_id bigint, ts string, event_id bigint, value double")
        .withColumn("ts", F.to_timestamp("ts")))
    out = cusum_alerts(df, "user_id", "ts", "value",
                       k_cents=100, h_cents=250,
                       tiebreak_col="event_id").collect()
    assert len(out) == 1
    r = out[0]
    assert (r["n_events"], r["n_alerts"], r["max_cusum_cents"],
            r["first_alert_id"]) == (5, 2, 800, 1)


def test_psi_identical_halves_near_zero(spark):
    from event_streaming_service_spark.operators.anomaly import psi_drift

    # the same 40 values in both periods -> every p == q -> every
    # term is floor(0 + 0.5) = 0 and PSI == 0 exactly
    rows = [(float(v), p) for v in range(0, 400, 10) for p in (0, 1)]
    df = spark.createDataFrame(rows, "value double, p int")
    out = psi_drift(df.withColumn("g", F.lit("t")), "g", "value",
                    F.col("p") == 1)
    got = out.collect()
    assert len(got) == 10  # dense bin spine
    assert all(r["term_nano"] == 0 and r["psi_nano"] == 0 for r in got)
    assert sum(r["cnt_a"] for r in got) == 40


def test_psi_shifted_distribution_positive(spark):
    from event_streaming_service_spark.operators.anomaly import psi_drift

    # period A all in bin 0, period B all in bin 9 -> large PSI
    rows = [(10.0, 0)] * 30 + [(480.0, 1)] * 30
    df = (spark.createDataFrame(rows, "value double, p int")
          .withColumn("g", F.lit("t")))
    got = psi_drift(df, "g", "value", F.col("p") == 1).collect()
    psi = got[0]["psi_nano"]
    assert all(r["psi_nano"] == psi for r in got)
    assert psi > 4_000_000_000  # PSI > 4.0 nats — massive shift


def test_gram_matrix_tiny_exact(spark):
    from event_streaming_service_spark.operators.quantize import (
        gram_matrix)

    emb = spark.createDataFrame(
        [(1, [0.001, 0.002, -0.003]),
         (2, [0.004, -0.005, 0.006])],
        "vec_id bigint, embedding array<double>")
    got = {(r["i"], r["j"]): r["gram"]
           for r in gram_matrix(emb).collect()}
    # quantized rows: (1, 2, -3) and (4, -5, 6)
    q = [(1, 2, -3), (4, -5, 6)]
    for i in range(3):
        for j in range(i, 3):
            want = sum(v[i] * v[j] for v in q)
            assert got[(i + 1, j + 1)] == want
    assert len(got) == 6


def test_resize_gif_matches_index_map(spark):
    docs = spark.createDataFrame([(13,)], "doc_id bigint")
    media = multimodal.attach_gif_payload(docs)
    r = multimodal.resize_gif(media, 24, 24).collect()[0]
    w, h, nc, _ = multimodal._gif_shape(13)
    xs = (np.arange(24) * w) // 24
    ys = (np.arange(24) * h) // 24
    idx = (13 + np.add.outer(3 * ys, xs)) % nc
    rgb = multimodal._gif_palette(13, nc).astype("int64")[idx]
    assert (r["width"], r["height"]) == (w, h)
    for c in range(3):
        assert r[f"ch{c}_sum"] == int(rgb[..., c].sum())
    assert r["out_bytes"] > 0


def test_ivm_delta_join_reconstructs_full_join(spark):
    from event_streaming_service_spark.operators.diff import (
        ivm_delta_join)

    a = spark.createDataFrame(
        [(k, k * 10) for k in range(1, 21)], "k bigint, va bigint")
    b = spark.createDataFrame(
        [(k, k * 100) for k in range(1, 21) if k % 3 != 1],
        "k bigint, vb bigint")
    got = ivm_delta_join(
        a.filter(F.col("k") % 4 != 0), a.filter(F.col("k") % 4 == 0),
        b.filter(F.col("k") % 5 != 0), b.filter(F.col("k") % 5 == 0),
        "k")
    want = a.join(b, "k")
    assert sorted(map(tuple, got.collect())) \
        == sorted(map(tuple, want.collect()))
    assert got.count() == b.count()  # keys unique per side here


def test_wl_roles_distinguish_structure(spark):
    from event_streaming_service_spark.operators.graph import wl_roles

    # star 0-(1..4) plus path 10-11-12: spokes share a role, the path
    # ends share a role, and all five structural classes separate
    edges = spark.createDataFrame(
        [(0, i) for i in range(1, 5)] + [(10, 11), (11, 12)],
        "a bigint, b bigint")
    out = {r["a"]: r for r in wl_roles(edges).collect()}
    spokes = {out[i]["wl_role"] for i in range(1, 5)}
    assert len(spokes) == 1                      # all spokes same role
    assert out[10]["wl_role"] == out[12]["wl_role"]   # path ends same
    assert out[0]["wl_role"] != out[11]["wl_role"]    # hub != middle
    assert out[1]["wl_role"] != out[10]["wl_role"]    # spoke != end
    # deg-1 nodes split by CONTEXT, which is what WL adds over degree
    assert out[0]["deg"] == 4 and out[11]["deg"] == 2


def test_auc_binary_known_values(spark):
    from event_streaming_service_spark.operators.analytics import (
        auc_binary)

    # key 1: perfect separation -> AUC 1.0; key 2: perfect inversion
    # -> 0.0; key 3: pos {2, 3} vs neg {1, 2} -> pairs: 3 wins + one
    # tie at 0.5 over 4 pairs = 0.875; key 4: single class -> omitted
    rows = ([(1, i, float(i), "p" if i >= 3 else "n")
             for i in range(1, 5)]
            + [(2, i, float(i), "n" if i >= 3 else "p")
               for i in range(1, 5)]
            + [(3, 1, 1.0, "n"), (3, 2, 2.0, "p"),
               (3, 3, 2.0, "n"), (3, 4, 3.0, "p")]
            + [(4, 1, 1.0, "p"), (4, 2, 2.0, "p")])
    df = spark.createDataFrame(
        rows, "k bigint, event_id bigint, value double, lbl string")
    out = {r["k"]: r for r in auc_binary(
        df, "k", "value", F.col("lbl") == "p").collect()}
    assert out[1]["auc_ppm"] == 1_000_000
    assert out[2]["auc_ppm"] == 0
    assert out[3]["auc_ppm"] == 875_000
    assert 4 not in out


def test_quantile_normalize_pools_distributions(spark):
    from event_streaming_service_spark.operators.analytics import (
        quantile_normalize)

    # group a: 1..5 (cents 100..500); group b: shifted+scaled
    # 101..105; after normalization both map onto the pooled sorted
    # values at the same relative positions
    rows = ([(i, "a", float(i)) for i in range(1, 6)]
            + [(10 + i, "b", 100.0 + i) for i in range(1, 6)])
    df = spark.createDataFrame(rows, "event_id bigint, g string, value double")
    out = quantile_normalize(df, "g", "value", "event_id").collect()
    by_grp = {}
    for r in out:
        by_grp.setdefault(r["g"], []).append(r["qnorm_cents"])
    # equal group sizes: both groups land the identical pooled profile
    assert sorted(by_grp["a"]) == sorted(by_grp["b"])
    pooled = sorted([100, 200, 300, 400, 500,
                     10100, 10200, 10300, 10400, 10500])
    # r=1 -> pooled idx 1; r=5 -> idx 1+(4*9)//4 = 10 (max)
    assert min(by_grp["a"]) == pooled[0]
    assert max(by_grp["a"]) == pooled[9]


def test_u_shaped_attribution_credit_math(spark):
    from event_streaming_service_spark.operators.analytics import (
        u_shaped_attribution)

    # user 1: touches t1..t5 then a purchase -> 40/20/40 with
    # 200000 DIV 3 = 66666 each and remainder 2 folded into first;
    # user 2: one touch -> 100%; user 3: conversion before any touch
    # -> no row; same-ms touch as the conversion must NOT count
    rows = ([(i, 1, f"2024-01-01 00:0{i}:00", "view") for i in range(1, 6)]
            + [(6, 1, "2024-01-01 00:06:00", "purchase"),
               (7, 2, "2024-01-01 01:00:00", "click"),
               (8, 2, "2024-01-01 01:01:00", "purchase"),
               (9, 3, "2024-01-01 02:00:00", "purchase"),
               (10, 3, "2024-01-01 02:00:00", "view")])
    df = (spark.createDataFrame(
        rows, "event_id bigint, user_id bigint, ts string, event_type string")
        .withColumn("ts", F.to_timestamp("ts")))
    out = {r["conversion_id"]: r for r in u_shaped_attribution(
        df, "user_id", "ts", "event_type", "purchase",
        ["view", "click"]).collect()}
    r1 = out[6]
    assert (r1["n_touches"], r1["first_touch_id"],
            r1["last_touch_id"]) == (5, 1, 5)
    assert (r1["first_ppm"], r1["last_ppm"],
            r1["middle_each_ppm"]) == (400_002, 400_000, 66_666)
    assert r1["first_ppm"] + r1["last_ppm"] \
        + 3 * r1["middle_each_ppm"] == 1_000_000
    r2 = out[8]
    assert (r2["n_touches"], r2["first_ppm"], r2["last_ppm"]) \
        == (1, 1_000_000, 0)
    assert 9 not in out  # same-ms view never counts, no prior touch


def test_holt_linear_known_sequence(spark):
    from event_streaming_service_spark.operators.anomaly import (
        holt_linear)

    # alpha=0.5, gamma=0.25 over x = 1, 3, 5 (all dyadic -> exact):
    # l1=1, b1=0; l2=.5*3+.5*1=2, b2=.25*1+0=.25;
    # l3=.5*5+.5*2.25=3.625, b3=.25*1.625+.75*.25=.59375
    rows = [(i, 1, f"2024-01-01 00:0{i}:00", float(2 * i - 1))
            for i in (1, 2, 3)]
    df = (spark.createDataFrame(
        rows, "event_id bigint, user_id bigint, ts string, value double")
        .withColumn("ts", F.to_timestamp("ts")))
    out = {r["event_id"]: r for r in holt_linear(
        df, "user_id", "ts", "value", 0.5, 0.25, "event_id").collect()}
    assert (out[1]["level6"], out[1]["trend6"]) == (1.0, 0.0)
    assert (out[2]["level6"], out[2]["trend6"]) == (2.0, 0.25)
    assert (out[3]["level6"], out[3]["trend6"]) == (3.625, 0.59375)


def test_average_precision_known(spark):
    from event_streaming_service_spark.operators.analytics import (
        average_precision)

    # ranked desc by score: labels (1, 0, 1, 0) ->
    # AP = (1/1 + 2/3) / 2 = 5/6 -> ppm floor((1e6 + 666666)/2)
    rows = [(1, 1, 4.0, "p"), (1, 2, 3.0, "n"),
            (1, 3, 2.0, "p"), (1, 4, 1.0, "n")]
    df = spark.createDataFrame(
        rows, "k bigint, event_id bigint, value double, lbl string")
    r = average_precision(df, "k", "value",
                          F.col("lbl") == "p", "event_id").collect()[0]
    assert (r["n_pos"], r["n_rows"]) == (2, 4)
    assert r["ap_ppm"] == (1_000_000 + 666_666) // 2


def test_calibration_bins_perfectly_calibrated(spark):
    from event_streaming_service_spark.operators.analytics import (
        calibration_bins)

    # score 100 (conf 200000 ppm) with exactly 20% positives and
    # score 400 (conf 800000 ppm) with 80% -> ECE 0
    rows = ([(100.0, "p")] * 2 + [(100.0, "n")] * 8
            + [(400.0, "p")] * 8 + [(400.0, "n")] * 2)
    df = spark.createDataFrame(rows, "value double, lbl string")
    out = calibration_bins(df, "value", F.col("lbl") == "p")
    got = {r["bin"]: r for r in out.collect()}
    assert got[2]["rate_ppm"] == 200_000
    assert got[2]["conf_ppm"] == 200_000
    assert got[8]["rate_ppm"] == 800_000
    assert all(r["ece_ppm"] == 0 for r in got.values())


def test_chi2_independence_known_2x2(spark):
    from event_streaming_service_spark.operators.anomaly import (
        chi2_independence)

    # 2x2 table [[10, 20], [20, 10]]: margins 30/30, N=60,
    # E=15 everywhere, term = 25/15 per cell, chi2 = 100/15
    rows = ([("a", "x")] * 10 + [("a", "y")] * 20
            + [("b", "x")] * 20 + [("b", "y")] * 10)
    df = spark.createDataFrame(rows, "r string, c string")
    out = chi2_independence(df, F.col("r"), F.col("c")).collect()
    import math
    term = math.floor(25 / 15 * 1e6 + 0.5)
    assert len(out) == 4
    for r in out:
        assert r["expected_micro"] == 15_000_000
        assert r["term_micro"] == term
        assert r["chi2_micro"] == 4 * term
        assert r["dof"] == 1
