"""Driver-budget coverage: the first 50 queries the driver sees must
cover every SURVEY.md section-2 operator tag and every LLM-pipeline
operator family (round-1 verdict: the driver records rows for exactly
the first 50 registry entries)."""

from __future__ import annotations

import re

from event_streaming_service_spark.queries import (
    PENDING_ROTATION, PRIORITY, REGISTRY, _load_all, all_oracles,
    all_queries, ordered_names,
)

_load_all()

DRIVER_BUDGET = 50

# Every kebab-case operator-family tag that must have a driver row.
# (ann-ivf sits just past the budget in _NEXT — oracle-backed since
# round 3 and covered by the in-repo gate replica; the similarity
# family's budget rows are ann-baseline + ann-lsh.)
REQUIRED_FAMILY_TAGS = {
    "dedup-exact", "dedup-jaccard", "dedup-minhash-lsh", "dedup-simhash",
    "dedup-embedding", "ann-baseline", "ann-lsh", "similarity",
    "multimodal", "frame-sample", "text", "tfidf", "token-count",
    "lang-id", "quality", "fingerprint", "streaming", "rollup",
    "window-frames", "listagg", "calendar", "tpch", "map-ops",
}


def test_priority_names_registered_and_unique():
    assert len(PRIORITY) == DRIVER_BUDGET
    assert len(set(PRIORITY)) == len(PRIORITY)
    missing = [n for n in PRIORITY if n not in REGISTRY]
    assert not missing, f"PRIORITY names not registered: {missing}"


def test_driver_order_starts_with_priority():
    names = ordered_names()
    assert tuple(names[:DRIVER_BUDGET]) == PRIORITY
    assert list(all_queries())[:DRIVER_BUDGET] == list(PRIORITY)
    # no dropped registrations
    assert set(names) == set(REGISTRY)
    # oracles iterate in the same driver order
    oracle_names = list(all_oracles())
    assert oracle_names == [n for n in names if REGISTRY[n].oracle is not None]


def test_budget_covers_every_operator_tag():
    in_budget = set()
    for name in ordered_names()[:DRIVER_BUDGET]:
        in_budget.update(REGISTRY[name].tags)

    all_tags = {t for spec in REGISTRY.values() for t in spec.tags}
    # section-2 operator ids: S1..S10, P1.., R.., A.., D.., J.., O.., W..,
    # and the 2.x family rows
    op_tags = {t for t in all_tags
               if re.fullmatch(r"[SPRADJOW]\d+|2\.\d+(-\w+)?", t)}
    missing_ops = op_tags - in_budget
    assert not missing_ops, f"section-2 tags outside driver budget: {missing_ops}"

    missing_families = REQUIRED_FAMILY_TAGS - in_budget
    assert not missing_families, (
        f"LLM operator families outside driver budget: {missing_families}")


def test_every_oracle_backed_query_is_driver_checked_or_was_green():
    """VERDICT r3 item #7: the never-driver-checked tail must stay
    empty. Every oracle-backed query either sits inside the 50-slot
    driver budget (gets a row this round) or is already hash-green in
    a prior round's CORRECTNESS file; only intrinsically rows-only
    queries may live outside both sets."""
    import glob
    import json
    import os

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    prior_green = set()
    for path in glob.glob(os.path.join(repo, "CORRECTNESS_r*.json")):
        for name, row in json.load(open(path)).items():
            if row.get("hash_match"):
                prior_green.add(name)

    in_budget = set(ordered_names()[:DRIVER_BUDGET])
    stranded = [
        name for name, spec in REGISTRY.items()
        if spec.oracle is not None
        and name not in in_budget and name not in prior_green
        and name not in PENDING_ROTATION
    ]
    assert not stranded, (
        f"oracle-backed queries that would never get a driver row: "
        f"{stranded}")


def test_pending_rotation_tail_is_bounded():
    """PENDING_ROTATION is the explicit, bounded queue of oracle-backed
    queries waiting for a driver slot (budget = 50, every slot taken by
    a never-verified query or a sole tag provider). It must stay small
    — next round's rotation drains it — and must not overlap the
    budget (a name in both would double-count a slot)."""
    # Round-5 rotation frees ~45 slots (every current PRIORITY entry
    # becomes prior-green once the round-4 driver run lands), so a
    # one-round queue of this size still drains entirely next round.
    assert len(PENDING_ROTATION) <= 25, (
        "pending tail too long — consolidate surfaces or rotate")
    assert not set(PENDING_ROTATION) & set(PRIORITY)
    missing = [n for n in PENDING_ROTATION if n not in REGISTRY]
    assert not missing, f"PENDING_ROTATION names not registered: {missing}"
    unbacked = [n for n in PENDING_ROTATION if REGISTRY[n].oracle is None]
    assert not unbacked, "rows-only queries belong in _NEXT, not here"
