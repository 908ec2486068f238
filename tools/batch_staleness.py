"""DRIVER_BATCH rotation auditor.

The grading driver verifies only the first 50 ``queries()`` entries per
round (CORRECTNESS_r{N}.json), so ``plans/queries.py`` hand-rotates a
committed batch each round: new entries first, then the least-recently-
verified. This tool derives the rotation inputs from the artifacts:

* last round each catalog entry got a driver row (and pass/fail),
* entries never driver-verified,
* a suggested next batch: never-verified first, then stalest.

Usage: python tools/batch_staleness.py [batch_size]
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from helium_arango_etl_lite_spark.plans.queries import DRIVER_BATCH, QUERIES  # noqa: E402


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


if __name__ == "__main__":
    main()
