"""Edge-case unit tests for the round-7 third-wave operators (the
driver oracle covers the fixture-scale happy path; these pin boundary
semantics)."""

from __future__ import annotations

from event_streaming_service_spark.operators import analytics


def _baskets(spark, rows):
    return spark.createDataFrame(rows, "b long, i long")


def test_association_rules_exact_ppm(spark):
    rows = [(1, 1), (1, 2), (1, 3),
            (2, 1), (2, 2),
            (3, 1), (3, 2), (3, 4),
            (4, 3), (4, 4),
            (5, 3), (5, 4)]
    out = analytics.association_rules(
        _baskets(spark, rows), "b", "i",
        min_pair_count=2, top_n=10).collect()
    assert [(r["item_a"], r["item_b"]) for r in out] == [(1, 2), (3, 4)]
    r12, r34 = out
    # N=5; cnt(1)=cnt(2)=3; pair(1,2)=3 -> lift = 3*5e6 // 9 = 1666666
    assert r12["support_ppm"] == 600_000
    assert r12["conf_ab_ppm"] == 1_000_000
    assert r12["lift_ppm"] == 1_666_666
    # cnt(3)=cnt(4)=3; pair(3,4)=2 -> lift = 2*5e6 // 9 = 1111111
    assert r34["support_ppm"] == 400_000
    assert r34["conf_ab_ppm"] == 666_666
    assert r34["conf_ba_ppm"] == 666_666
    assert r34["lift_ppm"] == 1_111_111
    # duplicate (basket, item) rows must not inflate counts
    out2 = analytics.association_rules(
        _baskets(spark, rows + rows), "b", "i",
        min_pair_count=2, top_n=10).collect()
    assert [(r["item_a"], r["item_b"], r["lift_ppm"]) for r in out2] == \
        [(r["item_a"], r["item_b"], r["lift_ppm"]) for r in out]


def test_seasonal_anomaly_exact_threshold(spark):
    import datetime
    from event_streaming_service_spark.operators import anomaly

    # five Mondays, hour 10: counts [10,10,10,10,30] -> only the 30
    # crosses 1.5 population sigmas (4*80^2 > 9*1600); a two-day cell
    # can NEVER flag (max deviation is exactly 1 sigma).
    rows = []
    eid = 0
    for day, n in [("2024-01-01", 10), ("2024-01-08", 10),
                   ("2024-01-15", 10), ("2024-01-22", 10),
                   ("2024-01-29", 30)]:
        for i in range(n):
            rows.append((eid, datetime.datetime.fromisoformat(
                f"{day} 10:{i:02d}:00"),))
            eid += 1
    # a 2-observation cell (Tuesdays hour 3) with wild swing: no flag
    for day, n in [("2024-01-02", 1), ("2024-01-09", 59)]:
        for i in range(n):
            rows.append((eid, datetime.datetime.fromisoformat(
                f"{day} 03:{i:02d}:00"),))
            eid += 1
    ev = spark.createDataFrame(rows, "event_id long, ts timestamp")
    out = anomaly.seasonal_count_anomalies(ev, "ts").collect()
    assert len(out) == 1
    r = out[0]
    assert (str(r["event_date"])[:10], r["hr"], r["cnt"]) == \
        ("2024-01-29", 10, 30)


def test_doc_chunks_window_arithmetic(spark):
    from event_streaming_service_spark.operators import text as T

    def doc(i, n):
        return (i, " ".join(f"w{j}" for j in range(n)))

    docs = spark.createDataFrame(
        [doc(1, 64), doc(2, 65), doc(3, 112), doc(4, 113), (5, "  ")],
        "doc_id long, text string")
    out = T.doc_chunks(docs, size=64, stride=48).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(
            (r["chunk_id"], r["start_tok"], r["n_tokens"]))
    for k in by_doc:
        by_doc[k].sort()
    assert by_doc[1] == [(0, 1, 64)]
    assert by_doc[2] == [(0, 1, 64), (1, 49, 17)]
    assert by_doc[3] == [(0, 1, 64), (1, 49, 64)]
    assert by_doc[4] == [(0, 1, 64), (1, 49, 64), (2, 97, 17)]
    # whitespace-only doc: one empty chunk, not zero rows
    assert by_doc[5] == [(0, 1, 0)]


def test_group_split_audit_no_leaks(spark):
    from event_streaming_service_spark.operators import curation

    docs = spark.createDataFrame(
        [(i, f"src{i % 6}", 100 + i) for i in range(60)],
        "doc_id long, source string, n_chars long")
    out = curation.group_split_audit(docs, "source",
                                     weight_col="n_chars").collect()
    assert sum(r["n_rows"] for r in out) == 60
    assert sum(r["n_groups"] for r in out) == 6
    assert all(r["leaky_groups"] == 0 for r in out)
    assert sum(r["total_weight"] for r in out) == sum(
        100 + i for i in range(60))


def test_rrf_fuse_integer_contributions(spark):
    from event_streaming_service_spark.operators import retrieval

    a = spark.createDataFrame([(1, 1), (2, 2), (3, 3)],
                              "doc_id long, rank long")
    b = spark.createDataFrame([(2, 1), (3, 2), (4, 3)],
                              "doc_id long, rank long")
    out = retrieval.rrf_fuse([a, b], top_n=10).collect()
    got = [(r["doc_id"], r["n_rankers"], r["rrf_micro"]) for r in out]
    # 1e6 DIV 61 = 16393, 62 -> 16129, 63 -> 15873
    assert got == [(2, 2, 16393 + 16129),
                   (3, 2, 15873 + 16129),
                   (1, 1, 16393),
                   (4, 1, 15873)]


def test_merge_changelog_actions(spark):
    from event_streaming_service_spark.operators import diff

    base = spark.createDataFrame(
        [(1, 100), (2, 200), (3, 300)], "k long, bal long")
    # key 1: U then D (D latest) -> deleted; key 2: D then U -> updated
    # key 4: insert; key 5: delete-of-absent -> noop_delete
    log = spark.createDataFrame(
        [(1, "U", 111, 1, 1), (1, "D", None, 2, 2),
         (2, "D", None, 1, 3), (2, "U", 222, 2, 4),
         (4, "U", 444, 1, 5),
         (5, "D", None, 1, 6)],
        "k long, op string, v long, seq long, id long")
    out = {r["k"]: r for r in diff.merge_changelog(
        base, log, "k", ["seq", "id"], "op", "v", "bal").collect()}
    assert (out[1]["action"], out[1]["new_val"]) == ("deleted", None)
    assert (out[2]["action"], out[2]["old_val"],
            out[2]["new_val"]) == ("updated", 200, 222)
    assert (out[3]["action"], out[3]["new_val"]) == ("unchanged", 300)
    assert (out[4]["action"], out[4]["old_val"],
            out[4]["new_val"]) == ("inserted", None, 444)
    assert (out[5]["action"], out[5]["new_val"]) == ("noop_delete", None)
    assert len(out) == 5


def test_merge_changelog_string_values(spark):
    # ADVICE r7: the deleted-row NULL was hardcoded cast("long"),
    # silently tying the kernel to integer value columns. It must
    # now follow the changelog value column's actual type.
    from event_streaming_service_spark.operators import diff

    base = spark.createDataFrame([(1, "alpha")], "k long, name string")
    log = spark.createDataFrame(
        [(1, "D", None, 1), (2, "U", "beta", 2)],
        "k long, op string, v string, seq long")
    out = diff.merge_changelog(base, log, "k", ["seq"], "op", "v", "name")
    assert dict(out.dtypes)["new_val"] == "string"
    rows = {r["k"]: r for r in out.collect()}
    assert (rows[1]["action"], rows[1]["new_val"]) == ("deleted", None)
    assert (rows[2]["action"], rows[2]["new_val"]) == ("inserted", "beta")


def test_global_rank_bijective_beyond_sample_size(spark):
    # RangePartitioner's reservoir sample covers ~640 rows at 32
    # partitions; 15k rows exposed the cross-job boundary drift this
    # regression pins (duplicate/missing ranks before the fix).
    from pyspark.sql import functions as F

    from event_streaming_service_spark.operators.linkage import (
        global_rank,
    )

    df = spark.range(15000).select(
        (F.col("id") * 2654435761 % 100000).alias("v"),
        F.col("id").alias("tb"))
    r = global_rank(df, ["v", "tb"])
    agg = r.agg(F.count("*").alias("n"),
                F.countDistinct("rank").alias("d"),
                F.min("rank").alias("mn"),
                F.max("rank").alias("mx")).collect()[0]
    assert (agg["n"], agg["d"], agg["mn"], agg["mx"]) == \
        (15000, 15000, 1, 15000)


def test_dyadic_quantile_sketch_envelope(spark):
    from pyspark.sql import functions as F

    from event_streaming_service_spark.operators import quantiles as Q

    # values 1..1000 (0 filtered out): p50 k=500 -> exact 500 in
    # bucket 8 ([256, 511]); p99 k=990 -> bucket 9 ([512, 1023])
    df = spark.range(0, 1001).select(F.col("id").alias("v"),
                                     F.col("id").alias("tb"))
    out = {r["q_permille"]: r for r in Q.dyadic_quantile_sketch(
        df, "v", "tb", q_permilles=(500, 990)).collect()}
    p50 = out[500]
    assert (p50["k"], p50["exact_val"]) == (500, 500)
    assert (p50["est_lo"], p50["est_hi"]) == (256, 511)
    assert p50["within_lo"] and p50["within_hi"]
    p99 = out[990]
    assert (p99["k"], p99["exact_val"]) == (990, 990)
    assert (p99["est_lo"], p99["est_hi"]) == (512, 1023)


def test_kcore_peel_cascade(spark):
    from event_streaming_service_spark.operators import graph

    # triangle {1,2,3} + a pendant chain 3-4-5: 2-core must peel 5
    # then 4 (cascade needs 2 rounds), keeping exactly the triangle.
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5)], "a long, b long")
    out = {r["node"]: r["deg_in_core"]
           for r in graph.kcore_peel(edges, k=2, rounds=4).collect()}
    assert out == {1: 2, 2: 2, 3: 2}
    # k=3 wipes it (no 3-core in a triangle-with-tail)
    assert graph.kcore_peel(edges, k=3, rounds=4).count() == 0
    # rounds too small to cascade: after ONE round only 5 is gone
    one = {r["node"]: r["deg_in_core"]
           for r in graph.kcore_peel(edges, k=2, rounds=1).collect()}
    assert one == {1: 2, 2: 2, 3: 3, 4: 1}


def test_quality_rules_single_scan_counts(spark):
    from pyspark.sql import functions as F

    from event_streaming_service_spark.operators import profiling

    df = spark.createDataFrame(
        [(1, 5), (2, -1), (3, 200), (4, None)], "k long, v int")
    out = {r["rule"]: r for r in profiling.quality_rules(df, {
        "v_nonneg": F.col("v") < 0,
        "v_upper": F.col("v") > 100,
        "v_present": F.col("v").isNull(),
    }).collect()}
    assert out["v_nonneg"]["n_violations"] == 1
    assert out["v_upper"]["n_violations"] == 1
    assert out["v_present"]["n_violations"] == 1
    # NULL predicate (NULL < 0) counts as NON-violation, so ppm uses
    # the full checked count
    assert all(r["n_checked"] == 4 for r in out.values())
    assert out["v_nonneg"]["violation_ppm"] == 250_000


def test_fk_orphan_rule(spark):
    from event_streaming_service_spark.operators import profiling

    child = spark.createDataFrame([(1,), (2,), (9,)], "ck long")
    parent = spark.createDataFrame([(1,), (2,), (3,)], "pk long")
    r = profiling.fk_orphan_rule(child, parent, "ck", "pk",
                                 "fk").collect()[0]
    assert (r["n_checked"], r["n_violations"]) == (3, 1)
    assert r["violation_ppm"] == 333_333


def test_merge_rollup_lineage(spark):
    from event_streaming_service_spark.operators import stats

    base = spark.createDataFrame([("a", 10, 100), ("b", 5, 50)],
                                 "k string, n long, s long")
    delta = spark.createDataFrame([("a", 3, 30), ("c", 1, 10)],
                                  "k string, n long, s long")
    out = {r["k"]: r for r in stats.merge_rollup(
        base, delta, ["k"], ["n", "s"]).collect()}
    assert (out["a"]["n"], out["a"]["s"]) == (13, 130)
    assert (out["a"]["n_from_base"], out["a"]["n_from_delta"]) == (1, 1)
    assert (out["b"]["n"], out["b"]["n_from_delta"]) == (5, 0)
    assert (out["c"]["n"], out["c"]["n_from_base"]) == (1, 0)


def test_winsorized_stats_exact_caps(spark):
    from pyspark.sql import functions as F

    from event_streaming_service_spark.operators import quantiles as Q

    df = spark.range(1, 101).select(F.col("id").alias("v"),
                                    F.col("id").alias("tb"))
    r = Q.winsorized_stats(df, "v", "tb", lo_permille=50,
                           hi_permille=950).collect()[0]
    # N=100: klo=5 -> cap 5 (rows 1-4 clamp up), khi=95 -> cap 95
    # (rows 96-100 clamp down)
    assert (r["lo_cap"], r["hi_cap"]) == (5, 95)
    assert (r["n_capped_low"], r["n_capped_high"]) == (4, 5)
    assert r["sum_raw"] == 5050
    assert r["sum_winsorized"] == (5050
                                   + (5 * 4 - (1 + 2 + 3 + 4))
                                   - ((96 + 97 + 98 + 99 + 100)
                                      - 95 * 5))


def test_personalized_pagerank_seed_mass(spark):
    from event_streaming_service_spark.operators import graph

    # a--b undirected, seed = a, 2 iterations, hand-computed nanos:
    # it1: a = 150e6 (teleport, seed only), b = floor(1e9 * .85)
    # it2: a = 150e6 + floor(850e6 * .85), b = floor(150e6 * .85)
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "a")], "src string, dst string")
    out = {r["node"]: r["rank_nano"] for r in graph.pagerank(
        edges, iterations=2, seeds=["a"]).collect()}
    assert out == {"a": 150_000_000 + 722_500_000,
                   "b": 127_500_000}
    # uniform PageRank unchanged by the new param default
    out_u = {r["node"]: r["rank_nano"] for r in graph.pagerank(
        edges, iterations=1).collect()}
    assert out_u == {"a": 150_000_000 + 850_000_000,
                     "b": 150_000_000 + 850_000_000}


def test_cluster_survivors_quality_argmax(spark):
    from event_streaming_service_spark.operators import dedup

    clusters = spark.createDataFrame(
        [(1, 1, 3), (2, 1, 3), (3, 1, 3),   # cluster of 3
         (7, 7, 1)],                        # singleton
        "doc_id long, cluster_id long, cluster_size long")
    quality = spark.createDataFrame(
        [(1, 10), (2, 99), (3, 99), (7, 5)], "doc_id long, q long")
    out = {r["doc_id"]: r for r in dedup.cluster_survivors(
        clusters, quality, "q").collect()}
    # quality tie between 2 and 3 -> smallest id (2) survives
    assert out[2]["is_survivor"] and not out[3]["is_survivor"]
    assert not out[1]["is_survivor"]
    assert out[1]["best_doc_id"] == 2 and out[1]["best_quality"] == 99
    assert out[7]["is_survivor"] and out[7]["best_doc_id"] == 7


def test_rfm_quintile_directions(spark):
    import datetime

    from pyspark.sql import functions as F

    from event_streaming_service_spark.operators import analytics

    rows = []
    # customer 1: recent, frequent, big spender -> 111
    for d in [25, 26, 27, 28]:
        rows.append((1, datetime.datetime(2024, 1, d), 9000))
    # customer 2: old single small order -> worst on all axes
    rows.append((2, datetime.datetime(2024, 1, 1), 100))
    # three middling customers
    for k, d, amt in [(3, 10, 500), (4, 15, 700), (5, 20, 900)]:
        rows.append((k, datetime.datetime(2024, 1, d), amt))
    df = spark.createDataFrame(rows, "k long, ts timestamp, amt long")
    out = {r["k"]: r for r in analytics.rfm_segments(
        df, "k", "ts", F.col("amt")).collect()}
    assert out[1]["segment"] == "111"
    # frequency is ALL-tied at 1 below customer 1, and equal-count
    # buckets split ties by the key tiebreak — customer 2 lands in
    # f-quintile 2 (rank 2 of 5), not 5; recency/monetary are
    # distinct values so it bottoms out there
    assert out[2]["segment"] == "525"
    assert out[5]["f_q"] == 5
    assert out[1]["recency_days"] == 0
    assert out[2]["recency_days"] == 27


def test_rake_keyphrases_hand_scored(spark):
    from event_streaming_service_spark.operators import text as T

    docs = spark.createDataFrame(
        [(1, "Deep learning of deep networks."), (2, "deep!")],
        "doc_id long, text string")
    out = T.rake_keyphrases(docs, min_len=2, max_len=4,
                            top_n=10).collect()
    got = {r["phrase"]: (r["n_occurrences"], r["score_milli"])
           for r in out}
    # word stats: deep freq=3 deg=2+2+1=5 -> 1666; learning/networks
    # freq=1 deg=2 -> 2000 each
    assert got == {"deep learning": (1, 3666),
                   "deep networks": (1, 3666)}
    # tie broken by phrase string: learning < networks
    assert [r["phrase"] for r in out] == ["deep learning",
                                          "deep networks"]


def test_info_gain_perfect_split(spark):
    from pyspark.sql import functions as F

    from event_streaming_service_spark.operators import analytics

    # label == (v <= 50): threshold 50 separates perfectly ->
    # ig == parent entropy; threshold 100 splits nothing -> ig == 0
    df = spark.range(1, 101).select(F.col("id").alias("v"),
                                    (F.col("id") <= 50).alias("y"))
    out = {r["threshold"]: r for r in analytics.info_gain_splits(
        df, F.col("v"), F.col("y"), (50, 100)).collect()}
    r50 = out[50]
    # H(50/100) = ln 2 -> 693147 micro
    assert r50["h_parent_micro"] == 693147
    assert r50["h_left_micro"] == 0 and r50["h_right_micro"] == 0
    assert r50["ig_micro"] == 693147
    r100 = out[100]
    assert r100["n_left"] == 100
    assert r100["ig_micro"] == 0


def test_weekly_wow_and_ltv_shapes(spark):
    import datetime

    from pyspark.sql import functions as F

    from event_streaming_service_spark import queries
    queries._load_all()
    # smoke on the tiny fixture: lag/ppm and the cohort cumsum hold
    # their defining identities
    sf = "/root/testdata/sf0.001"
    wow = queries.REGISTRY["weekly_revenue_wow"].builder(
        spark, sf).collect()
    for r in wow:
        if r["prev_cents"] is not None:
            assert r["delta_cents"] == r["revenue_cents"] - r["prev_cents"]
    ltv = queries.REGISTRY["ltv_by_cohort_month"].builder(
        spark, sf).collect()
    by_cohort = {}
    for r in sorted(ltv, key=lambda x: (x["cohort_m"], x["age_months"])):
        acc = by_cohort.get(r["cohort_m"], 0) + r["revenue_cents"]
        by_cohort[r["cohort_m"]] = acc
        assert r["cum_revenue_cents"] == acc
