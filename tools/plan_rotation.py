"""Plan the next round's 50-slot PRIORITY rotation.

Weighted greedy set cover over the operator tags the driver budget
must span (tests/test_priority.py): mandatory names (the pending
queue + any plan-changed re-verifications) take their slots first,
then oldest-green names fill remaining slots while keeping the
required tag set coverable. Prints the chosen 50, the leftover
backlog, and a feasibility check.

Usage: python tools/plan_rotation.py [mandatory names...]
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from event_streaming_service_spark.queries import (  # noqa: E402
    PENDING_ROTATION, REGISTRY, _load_all)
from tests.test_priority import REQUIRED_FAMILY_TAGS  # noqa: E402

BUDGET = 50
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def last_green() -> dict[str, int]:
    out: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        rnd = int(re.search(r"_r(\d+)", path).group(1))
        for name, row in json.load(open(path)).items():
            if row.get("hash_match"):
                out[name] = max(out.get(name, 0), rnd)
    return out


def required_tags() -> set[str]:
    all_tags = {t for spec in REGISTRY.values() for t in spec.tags}
    op = {t for t in all_tags
          if re.fullmatch(r"[SPRADJOW]\d+|2\.\d+(-\w+)?", t)}
    return op | REQUIRED_FAMILY_TAGS


OLD_ROUND = 4  # names whose last green is <= this are "backlog"


def plan(mandatory: list[str]) -> tuple[list[str], list[str]]:
    """Maximize backlog drain: (1) cover required tags with OLD
    (r<=OLD_ROUND) names via greedy max-cover, (2) cover the tags no
    old name carries with the fewest NEWER names, (3) fill every
    remaining slot with the oldest backlog names. Every slot not
    spent on a forced newer compressor drains the backlog."""
    _load_all()
    green = last_green()
    req = required_tags()
    chosen: list[str] = []
    for n in mandatory:
        if n not in REGISTRY:
            raise SystemExit(f"mandatory name not registered: {n}")
        if n not in chosen:
            chosen.append(n)
    covered = {t for n in chosen for t in REGISTRY[n].tags} & req

    pool = sorted(
        (n for n in green if n in REGISTRY and n not in chosen),
        key=lambda n: (green[n], n))
    old_pool = [n for n in pool if green[n] <= OLD_ROUND]
    new_pool = [n for n in pool if green[n] > OLD_ROUND]

    def tags_of(n):
        return set(REGISTRY[n].tags) & req

    # phase 1: tags NO old name carries must take newer providers —
    # pick the fewest such compressors first (oldest at equal gain)
    old_coverable = covered | {t for n in old_pool for t in tags_of(n)}
    forced = req - old_coverable
    while forced and len(chosen) < BUDGET:
        best = max((n for n in new_pool if n not in chosen),
                   key=lambda n: (len(tags_of(n) & forced),
                                  -green[n]), default=None)
        if best is None or not (tags_of(best) & forced):
            break
        chosen.append(best)
        covered |= tags_of(best)
        forced -= tags_of(best)

    # phase 2: greedy max-cover over OLD names for the rest
    while covered != req and len(chosen) < BUDGET:
        best = max((n for n in old_pool if n not in chosen),
                   key=lambda n: (len(tags_of(n) - covered),
                                  -green[n]), default=None)
        if best is None or not (tags_of(best) - covered):
            break
        chosen.append(best)
        covered |= tags_of(best)

    # phase 2b: anything still uncovered (old pool exhausted mid-way)
    while covered != req and len(chosen) < BUDGET:
        best = max((n for n in new_pool if n not in chosen),
                   key=lambda n: (len(tags_of(n) - covered),
                                  -green[n]), default=None)
        if best is None or not (tags_of(best) - covered):
            break
        chosen.append(best)
        covered |= tags_of(best)

    missing = req - covered
    if missing:
        raise SystemExit(f"INFEASIBLE: uncovered tags {sorted(missing)}")

    # phase 3: fill with the oldest backlog, then oldest overall
    for n in old_pool + new_pool:
        if len(chosen) >= BUDGET:
            break
        if n not in chosen:
            chosen.append(n)

    leftover = [n for n in pool if n not in chosen]
    return chosen, leftover


if __name__ == "__main__":
    mandatory = sys.argv[1:] or list(PENDING_ROTATION)
    green = last_green()
    chosen, leftover = plan(mandatory)
    print(f"# chosen {len(chosen)} (mandatory {len(mandatory)})")
    for n in chosen:
        print(f"  {n}  (last green r{green.get(n, 0)})")
    old_left = [n for n in leftover if green.get(n, 99) <= 4]
    print(f"# backlog still r<=4 after this plan: {len(old_left)}")
    for n in old_left:
        print(f"  {n}  r{green[n]}")
