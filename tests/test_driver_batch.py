"""DRIVER_BATCH composition invariants — no SparkSession needed.

The batch is a hand-rotated committed list (plans/queries.py); these
tests make the mistakes that list invites impossible to commit: a
typo'd entry name silently dropping a slot (_apply_driver_batch
ignores unknown names by design, so only a test catches it), a batch
over/under the driver's 50-slot window, duplicates wasting slots, and
a rotation that violates the standing staleness budget."""
from __future__ import annotations

import glob
import json
import os
import re

from helium_arango_etl_lite_spark.plans.queries import (
    DRIVER_BATCH,
    QUERIES,
    STALENESS_BUDGET_ROUNDS,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_batch_is_exactly_fifty_known_unique_names():
    assert len(DRIVER_BATCH) == 50
    unknown = [n for n in DRIVER_BATCH if n not in QUERIES]
    assert not unknown, f"typo'd batch entries: {unknown}"
    assert len(set(DRIVER_BATCH)) == len(DRIVER_BATCH)


def test_batch_leads_the_registry_order():
    assert list(QUERIES)[: len(DRIVER_BATCH)] == DRIVER_BATCH


def test_staleness_budget_holds_after_this_batch():
    """Replays tools/batch_staleness.py's budget arithmetic: assuming
    the committed batch runs next round, no already-verified entry may
    end up older than the declared budget."""
    last_round: dict[str, int] = {}
    rounds = []
    for path in glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")):
        m = re.search(r"r(\d+)", os.path.basename(path))
        if not m:
            continue
        rnd = int(m.group(1))
        rounds.append(rnd)
        try:
            rows = json.load(open(path))
        except (OSError, json.JSONDecodeError):
            continue
        for name in rows:
            if name in QUERIES:
                last_round[name] = max(rnd, last_round.get(name, 0))
    if not rounds:  # fresh clone without artifacts: nothing to assert
        return
    next_round = max(rounds) + 1
    batched = set(DRIVER_BATCH)
    over = [
        (next_round - r, n)
        for n, r in last_round.items()
        if n not in batched and next_round - r > STALENESS_BUDGET_ROUNDS
    ]
    assert not over, f"entries over the staleness budget: {sorted(over)}"


def test_budget_is_arithmetically_feasible():
    """The budget must cover a full rotation of the current catalog at
    50 slots/round — if the catalog outgrows budget*50 entries, either
    raise the budget in the same commit that adds the entries or stop
    adding entries (queries.py module docstring)."""
    assert len(QUERIES) <= STALENESS_BUDGET_ROUNDS * 50, (
        f"catalog {len(QUERIES)} entries exceeds what "
        f"{STALENESS_BUDGET_ROUNDS}-round budget x 50 slots can rotate"
    )
