"""DRIVER_BATCH rotation auditor.

The grading driver verifies only the first 50 ``queries()`` entries per
round (CORRECTNESS_r{N}.json), so ``plans/queries.py`` hand-rotates a
committed batch each round: new entries first, then the least-recently-
verified. This tool derives the rotation inputs from the artifacts:

* last round each catalog entry got a driver row (and pass/fail),
* entries never driver-verified,
* a suggested next batch: never-verified first, then stalest,
* and (round 11 onward) an ASSERTION of the standing staleness budget
  declared in ``plans/queries.py``: assuming the committed DRIVER_BATCH
  runs next round, no entry's newest driver row may end up older than
  ``STALENESS_BUDGET_ROUNDS``. Violations exit non-zero so a bad
  rotation cannot be committed silently.

Usage: python tools/batch_staleness.py [batch_size]
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from helium_arango_etl_lite_spark.plans.queries import (  # noqa: E402
    DRIVER_BATCH,
    QUERIES,
    STALENESS_BUDGET_ROUNDS,
)


def main() -> None:
    size = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    last_round: dict[str, int] = {}
    last_ok: dict[str, bool] = {}
    for path in sorted(glob.glob("CORRECTNESS_r*.json")):
        m = re.search(r"r(\d+)", os.path.basename(path))
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            rows = json.load(open(path))
        except Exception as e:  # noqa: BLE001
            print(f"warn: unreadable {path}: {e}")
            continue
        for name, row in rows.items():
            if name not in QUERIES:
                continue  # renamed/retired entries don't steer rotation
            last_round[name] = max(rnd, last_round.get(name, 0))
            if rnd == last_round[name]:
                last_ok[name] = bool(
                    row.get("rows_match")
                    and row.get("schema_match") is not False
                    and row.get("hash_match") is not False
                    and not row.get("err")
                )

    never = [n for n in QUERIES if n not in last_round]
    by_age = sorted(last_round, key=lambda n: (last_round[n], n))
    failing = [n for n, ok in last_ok.items() if not ok]

    print(f"catalog: {len(QUERIES)} entries; driver-verified ever: "
          f"{len(last_round)}; never: {len(never)}; latest-check FAILING: "
          f"{len(failing)}")
    if failing:
        for n in failing:
            print(f"  FAILING (r{last_round[n]}): {n}")
    if never:
        print("never driver-verified:")
        for n in never:
            marker = " (in current batch)" if n in DRIVER_BATCH[:size] else ""
            print(f"  {n}{marker}")

    ages: dict[int, int] = {}
    for n, r in last_round.items():
        ages[r] = ages.get(r, 0) + 1
    print("last-verified histogram: "
          + ", ".join(f"r{r}: {c}" for r, c in sorted(ages.items())))

    suggestion = (failing + never + by_age)[:size]
    current = DRIVER_BATCH[:size]
    if suggestion == current:
        print("current DRIVER_BATCH already matches the suggested rotation")
    else:
        print(f"\nsuggested next batch (size {size}; failing, then "
              f"never-verified, then stalest):")
        for n in suggestion:
            tag = f"r{last_round[n]}" if n in last_round else "never"
            print(f"  {tag:>6}  {n}")

    # ---- staleness-budget assertion (r10 verdict item 5) ---------------
    # The batch being composed runs in round max(seen)+1; after it runs,
    # every batched entry's newest row is that round and everything else
    # keeps its current newest row. The budget holds iff no entry's age
    # (next_round - newest_row) exceeds STALENESS_BUDGET_ROUNDS. Entries
    # never driver-verified AND not in the batch can't be aged from the
    # artifacts (their registration round isn't recorded) — reported as
    # warnings, not violations, but they must enter the next batch.
    next_round = max(
        (int(re.search(r"r(\d+)", os.path.basename(p)).group(1))
         for p in glob.glob("CORRECTNESS_r*.json")),
        default=0,
    ) + 1
    batched = set(DRIVER_BATCH[:size])
    violations = []
    for n in QUERIES:
        if n in batched or n not in last_round:
            continue
        age = next_round - last_round[n]
        if age > STALENESS_BUDGET_ROUNDS:
            violations.append((age, n))
    unaged = [n for n in QUERIES if n not in last_round and n not in batched]
    print(f"\nbudget check (round r{next_round}, budget "
          f"{STALENESS_BUDGET_ROUNDS} rounds): "
          f"{'VIOLATED' if violations else 'OK'}")
    for age, n in sorted(violations, reverse=True):
        print(f"  OVER BUDGET (age {age}): {n}")
    for n in unaged:
        print(f"  warn: never verified and not in batch — must lead the "
              f"r{next_round + 1} batch: {n}")

    # ---- growth-ceiling check (r12 verdict item 6) ---------------------
    # Steady-state capacity is size × budget entries; past it some entry
    # must exceed the budget no matter how the rotation is composed. Warn
    # while approaching (the committed per-round cap is ≤7 net additions),
    # hard-fail only at an actual overflow, which is unsatisfiable.
    capacity = size * STALENESS_BUDGET_ROUNDS
    print(f"growth ceiling: {len(QUERIES)} entries vs capacity "
          f"{capacity} ({size} slots x {STALENESS_BUDGET_ROUNDS} rounds)")
    if len(QUERIES) > capacity:
        print(f"  OVERFLOW: {len(QUERIES) - capacity} entries past "
              f"capacity — the budget is unsatisfiable; retire entries "
              f"or raise the budget explicitly")
        violations.append((0, "growth-ceiling-overflow"))
    elif len(QUERIES) + 7 > capacity:
        print(f"  warn: one more max-growth round (+7) would exceed "
              f"capacity — freeze growth now")
    if violations:
        sys.exit(1)


if __name__ == "__main__":
    main()
