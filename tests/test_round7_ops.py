"""Edge-case unit tests for the round-7 operators (the driver oracle
covers the fixture-scale happy path; these pin the boundary semantics
the oracles can't easily reach)."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from event_streaming_service_spark.operators import analytics, text, windows


def _ev(spark, rows):
    return spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_type string, event_id long")


def _t(s):
    return datetime.datetime.fromisoformat(s)


def test_activity_streaks_islands(spark):
    rows = [(1, _t(f"2024-01-0{d} 10:00:00"), "x", i)
            for i, d in enumerate([1, 2, 3, 5, 6])] + [
        (1, _t("2024-01-09 10:00:00"), "x", 99),
        # two events same day must count once
        (1, _t("2024-01-09 23:00:00"), "y", 100),
        (2, _t("2024-01-01 00:00:00"), "x", 101)]
    out = {r["user_id"]: r for r in
           analytics.activity_streaks(_ev(spark, rows), "user_id",
                                      "ts").collect()}
    assert out[1]["active_days"] == 6
    assert out[1]["n_streaks"] == 3
    assert out[1]["longest_streak_days"] == 3
    assert out[2]["active_days"] == 1
    assert out[2]["n_streaks"] == 1


def test_rate_limit_caps_per_calendar_hour(spark):
    rows = ([(1, _t(f"2024-01-01 10:{m:02d}:00"), "x", m)
             for m in range(7)]               # 7 in hour 10 -> drop 2
            + [(1, _t("2024-01-01 11:00:00"), "x", 50)])  # new hour
    out = analytics.rate_limit_counts(
        _ev(spark, rows), "user_id", "ts", per_hour=5,
        order_tiebreak="event_id").collect()[0]
    assert (out["n_events"], out["n_kept"], out["n_dropped"]) == (8, 6, 2)


def test_mode_per_key_tie_breaks_on_value(spark):
    rows = [(1, _t("2024-01-01 00:00:00"), t, i)
            for i, t in enumerate(["b", "b", "a", "a", "c"])]
    out = analytics.mode_per_key(_ev(spark, rows), "user_id",
                                 "event_type").collect()[0]
    assert (out["mode_value"], out["mode_count"]) == ("a", 2)


def test_abc_boundary_is_strict(spark):
    # before == 70% of total must be class B (strict <), and the
    # integer comparison means no float cumsum can flip it
    rev = spark.createDataFrame(
        [(1, 70), (2, 20), (3, 10)], "item long, revenue_units long")
    out = {r["abc_class"]: r for r in analytics.abc_classification(
        rev, "item", "revenue_units").collect()}
    assert out["A"]["n_items"] == 1 and out["A"]["class_revenue"] == 70
    assert out["B"]["n_items"] == 1 and out["B"]["class_revenue"] == 20
    assert out["C"]["n_items"] == 1


def test_abc_nondefault_share_rounds_not_truncates(spark):
    # 0.57 * 100 floats to 56.999...; int() truncation shifted the A/B
    # boundary to 56% (ADVICE r7). round() keeps the declared 57%.
    rev = spark.createDataFrame(
        [(1, 56), (2, 1), (3, 43)], "item long, revenue_units long")
    out = {r["abc_class"]: r for r in analytics.abc_classification(
        rev, "item", "revenue_units", a_share=0.57).collect()}
    # cum_before for item 3 (rev 1 after sort desc: 56, 43, 1) -- sort
    # is (56, 43, 1): item 2 has before=99 -> C; item 3 (43) before=56
    # < 57 -> A under round(), B under truncation.
    assert out["A"]["n_items"] == 2 and out["A"]["class_revenue"] == 99


def test_new_key_growth_cumulative(spark):
    rows = [(1, _t("2024-01-01 05:00:00"), "x", 1),
            (1, _t("2024-01-03 05:00:00"), "x", 2),   # not new on day 3
            (2, _t("2024-01-03 05:00:00"), "x", 3)]
    out = sorted(analytics.new_key_growth(
        _ev(spark, rows), "user_id", "ts").collect(),
        key=lambda r: r["first_day"])
    assert [(r["new_keys"], r["cumulative_keys"]) for r in out] \
        == [(1, 1), (1, 2)]


def test_rolling_time_sum_window_excludes_older(spark):
    rows = [(1, _t("2024-01-01 00:00:00"), "x", 1),
            (1, _t("2024-01-05 00:00:00"), "x", 2),
            (1, _t("2024-01-20 00:00:00"), "x", 3)]
    df = _ev(spark, rows).withColumn("u", F.lit(10).cast("long"))
    out = {r["event_id"]: r["s"] for r in windows.rolling_time_sum(
        df, "user_id", "ts", F.col("u"), 7 * 86_400_000, "s")
        .select("event_id", "s").collect()}
    assert out[1] == 10          # alone
    assert out[2] == 20          # includes day 1 (within 7d, inclusive)
    assert out[3] == 10          # both others aged out


def test_ngram_novelty_full_repeat_scores_zero(spark):
    docs = spark.createDataFrame(
        [(1, "a b c d e f"), (2, "a b c d e f"), (3, "q r s t u v")],
        "doc_id long, text string")
    out = {r["doc_id"]: r for r in
           text.ngram_novelty(docs, n=5).collect()}
    assert out[1]["novelty_ppm"] == 1_000_000
    assert out[2]["novelty_ppm"] == 0
    assert out[3]["novelty_ppm"] == 1_000_000
    assert out[2]["n_seen_before"] == out[2]["n_shingles"] == 2


def test_unigram_lm_equal_tokens_equal_scores(spark):
    # two docs with identical token multisets must score identically;
    # a rarer-token doc must score lower (more negative)
    docs = spark.createDataFrame(
        [(1, "x x y"), (2, "y x x"), (3, "z x x")],
        "doc_id long, text string")
    out = {r["doc_id"]: r for r in
           text.unigram_lm_scores(docs).collect()}
    assert out[1]["total_logprob_micro"] == out[2]["total_logprob_micro"]
    assert out[3]["total_logprob_micro"] < out[1]["total_logprob_micro"]
    assert out[1]["n_tokens"] == 3


def test_bm25_prefers_rarer_term(spark):
    docs = spark.createDataFrame(
        [(1, "common common rare"), (2, "common common common"),
         (3, "common filler filler")],
        "doc_id long, text string")
    out = {r["doc_id"]: r for r in
           text.bm25_scores(docs, ("common", "rare")).collect()}
    # doc 1 hits the rare term -> must outscore the common-only docs
    assert out[1]["n_terms_hit"] == 2
    assert out[1]["bm25_micro"] > out[2]["bm25_micro"]
    assert out[1]["bm25_micro"] > out[3]["bm25_micro"]


def test_token_entropy_degenerate_doc_is_zero(spark):
    docs = spark.createDataFrame(
        [(1, "a a a a"), (2, "a b c d")], "doc_id long, text string")
    out = {r["doc_id"]: r for r in text.token_entropy(docs).collect()}
    assert out[1]["entropy"] == 0.0
    # uniform 4-token doc: ln(4) ~ 1.386294
    assert abs(out[2]["entropy"] - 1.386294) < 1e-6


def test_proto_wire_negative_int_roundtrips(spark):
    from event_streaming_service_spark.sources import proto_wire

    meta = spark.createDataFrame(
        [(1, "e1", "", "svc", -3, "t1", "u1", 0, -1)],
        "eid long, event_id string, correlation_id string,"
        " source_service string, version int, tenant_id string,"
        " user_id string, priority int, retry_count int")
    enc = proto_wire.encode_metadata_column(meta, out_col="wire")
    dec = proto_wire.decode_metadata_column(enc, "wire").collect()[0]
    # proto3 two's-complement negatives survive; zeros/empties default
    assert dec["version"] == -3 and dec["retry_count"] == -1
    assert dec["priority"] == 0 and dec["correlation_id"] == ""
    row = enc.select("wire").collect()[0]["wire"]
    # a negative int32 costs a 10-byte varint on the wire
    assert len(row) > 20
