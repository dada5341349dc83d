"""Bench-harness contract (VERDICT r10 item #1): the driver-facing
rotation must stay inside the ~3600 s external kill, every name must
be registered, and the full list must stay the superset BENCH_FULL.json
is refreshed from."""

from __future__ import annotations

import json
import os

from bench import BENCH_QUERIES_FULL, BENCH_ROTATION, _ROTATION_DROPS
from event_streaming_service_spark.queries import REGISTRY, _load_all

_load_all()

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_all_bench_names_registered():
    missing = [n for n in BENCH_QUERIES_FULL if n not in REGISTRY]
    assert not missing, f"bench names not registered: {missing}"
    assert len(set(BENCH_QUERIES_FULL)) == len(BENCH_QUERIES_FULL)


def test_rotation_is_full_minus_drops():
    assert set(BENCH_ROTATION) == set(BENCH_QUERIES_FULL) - _ROTATION_DROPS
    # drops must name real entries (a typo would silently keep a row)
    stray = _ROTATION_DROPS - set(BENCH_QUERIES_FULL)
    assert not stray, f"rotation drops not in the full list: {stray}"


def test_rotation_fits_the_driver_kill_window():
    """Wall model calibrated on the r11 dry run (120 names -> 1960 s,
    rc=0) and the r9/r10 driver runs: wall ~= 14 x best-sum +
    3.5 s/query + 120 s. Project the rotation's cost from the
    BENCH_FULL minima (1.2 s default for unmeasured names) and keep a
    >= 15% margin under the ~3600 s external kill. If this fails,
    grow _ROTATION_DROPS — do NOT ship a list that can time out."""
    path = os.path.join(REPO, "BENCH_FULL.json")
    timings = json.load(open(path))["queries"]
    best_sum = sum(timings.get(n, 1.2) for n in BENCH_ROTATION)
    projected = 14 * best_sum + 3.5 * len(BENCH_ROTATION) + 120
    assert projected < 3600 * 0.85, (
        f"projected driver-bench wall {projected:.0f}s too close to "
        f"the 3600s kill (best-sum {best_sum:.0f}s over "
        f"{len(BENCH_ROTATION)} names)")


def test_full_record_matches_full_list():
    """BENCH_FULL.json must be a refresh of the CURRENT full list
    (the r10 verdict flagged a one-round-stale record)."""
    path = os.path.join(REPO, "BENCH_FULL.json")
    rec = json.load(open(path))
    assert rec.get("list") == "full"
    assert set(rec["queries"]) == set(BENCH_QUERIES_FULL), (
        "BENCH_FULL.json row set does not match BENCH_QUERIES_FULL — "
        "rerun SPARK_GRAFT_BENCH_FULL=1 python bench.py")


# Queue names registered but not yet in the full bench list. This is
# a DEFERRAL ledger, not a parking lot (ADVICE r11: the only
# disclosure used to live in prose): a name may sit here only between
# its registration and the next BENCH_FULL refresh, which must fold it
# into BENCH_QUERIES_FULL and empty this set.
BENCH_DEFERRED: set[str] = set()
# (empty since the r12 BENCH_FULL refresh folded in the two r11
# deferrals and all three r12 registrations)


def test_every_queued_query_is_benchmarked():
    """Every PENDING_ROTATION name (= every newly added operator) must
    have a row in the full bench list or sit in the explicit
    BENCH_DEFERRED ledger above — ADVICE r11: hard_negative_topk and
    split_leakage_near_dup were registered after the r11 BENCH_FULL
    generation and only prose disclosed the missing rows. The broader
    BENCH_QUERIES_FULL membership stays curated (headline-paired rows);
    this guard is about NEW work never being measured."""
    from event_streaming_service_spark.queries import PENDING_ROTATION

    unbenched = (set(PENDING_ROTATION) - set(BENCH_QUERIES_FULL)
                 - BENCH_DEFERRED)
    assert not unbenched, (
        f"queued queries with no bench row: {sorted(unbenched)}")
    stale = BENCH_DEFERRED & set(BENCH_QUERIES_FULL)
    assert not stale, f"deferred names already benched: {sorted(stale)}"
    ghost = BENCH_DEFERRED - set(REGISTRY)
    assert not ghost, f"deferred names not registered: {sorted(ghost)}"
