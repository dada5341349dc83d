"""SQ8 quantizer semantics: error bound, constant dimensions, codegen
plan (no Python, single-row broadcast)."""

from __future__ import annotations

import contextlib
import io

from event_streaming_service_spark.operators import quantize


def _emb(spark, vecs):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>")


def test_quantize_error_bounded_by_half_step(spark):
    vecs = [[0.0, 10.0, -5.0], [1.0, 20.0, 5.0], [0.5, 15.0, 0.0]]
    out = quantize.scalar_quantize_int8(_emb(spark, vecs)).collect()
    assert len(out) == 3
    # per-dim ranges: 1.0, 10.0, 10.0 -> half-step = range/254/2
    max_half_step = 10.0 / 254.0 / 2.0
    for r in out:
        assert r["max_abs_err"] <= max_half_step + 1e-9


def test_quantize_constant_dimension_is_exact_zero_code(spark):
    vecs = [[7.5, 1.0], [7.5, 2.0]]
    out = {r["vec_id"]: r for r in
           quantize.scalar_quantize_int8(_emb(spark, vecs)).collect()}
    # dim 0 constant: q = 0 contributes nothing to l1; dequant = mn
    # exactly, so the error on that dim is 0 — l1 comes from dim 1
    # alone (codes -127 and 127)
    assert out[0]["q_l1"] == 127 and out[1]["q_l1"] == 127
    assert out[0]["max_abs_err"] == 0.0  # both dims exact at extremes


def test_quantize_plan_no_python_single_broadcast(spark):
    df = quantize.scalar_quantize_int8(_emb(spark, [[1.0, 2.0]]))
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert "EvalPython" not in plan, plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan, plan
