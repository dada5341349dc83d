"""bigram_pmi semantics: counts, PMI arithmetic, top-n determinism,
and the TakeOrdered/broadcast plan shape."""

from __future__ import annotations

import contextlib
import io
import math

from event_streaming_service_spark.operators import text


def _docs(spark, rows):
    return spark.createDataFrame([(i, t) for i, t in enumerate(rows)],
                                 "doc_id long, text string")


def test_bigram_pmi_counts_and_score(spark):
    # corpus: 'x y' always adjacent (high PMI), 'a' everywhere (low)
    docs = _docs(spark, ["x y a", "x y a", "x y a", "a x y", "a a x y"])
    out = {(r["w1"], r["w2"]): r for r in
           text.bigram_pmi(docs, min_count=2, top_n=10).collect()}
    assert out[("x", "y")]["pair_count"] == 5
    # hand-computed: n_tok = 16, n_big = 11, c_x = 5, c_y = 5
    expect = round(math.log((5 * 16.0 * 16) / (11.0 * 5 * 5)), 9)
    assert out[("x", "y")]["pmi"] == expect
    # min_count filters rare pairs
    assert ("y", "a") in out  # appears 3 times
    assert all(r["pair_count"] >= 2 for r in out.values())


def test_bigram_pmi_single_token_docs_are_safe(spark):
    docs = _docs(spark, ["solo", "", "  ", "pair up"])
    rows = text.bigram_pmi(docs, min_count=1, top_n=10).collect()
    assert {(r["w1"], r["w2"]) for r in rows} == {("pair", "up")}


def test_bigram_pmi_plan_broadcasts_vocab_and_takes_ordered(spark):
    docs = _docs(spark, ["a b c", "b c d"])
    out = text.bigram_pmi(docs, min_count=1, top_n=5)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain("formatted")
    plan = buf.getvalue()
    assert "TakeOrderedAndProject" in plan, plan
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan
