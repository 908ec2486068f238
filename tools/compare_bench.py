"""Drift-normalized comparison of two bench.py result files.

Round 7 measured the SAME code+data walls drifting up to 4x across a
2 h window on the shared VM (SCALE_SOAK.md "host-clock honesty"), so a
raw BENCH_rN vs BENCH_rM delta conflates engine changes with host
speed. bench.py emits ``calib_sec`` — a fixed, data-free whole-stage-
codegen job — precisely so the comparison can divide it out:

    normalized_delta(q) = (new[q] / old[q]) / (new_calib / old_calib)

i.e. "how much did the query change relative to how much the host
changed". Older BENCH files (r1-r6) predate calib_sec; without it on
both sides the tool falls back to raw ratios and says so.

Usage: python tools/compare_bench.py OLD.json NEW.json [top_n]
"""

from __future__ import annotations

import json
import os
import re
import sys

# top-level scalar keys of the bench line — everything else matched by the
# tail regex is a per-query timing
_SCALAR_KEYS = {
    "value", "warm_total", "cold_total", "warm_total_r4_subset",
    "warm_total_r5_subset", "warm_total_r6_subset", "warm_total_r7_subset",
    "warm_total_r8_subset", "warm_total_r9_subset",
    "calib_sec", "calib_py_sec", "calib_state_sec", "n_ok", "n_errors",
    "sf", "partial_total", "queries_truncated_to",
    "norm_prev_shared_ratio", "norm_regressions_gt_1_25",
}


def recover_from_tail(tail: str) -> dict:
    """Best-effort parse of a TRUNCATED bench line (the driver captures
    only the last 2000 chars of stdout; round 7's full-detail line
    outgrew that and left parsed=null). Every '"name": number' pair is
    recoverable by regex — known scalar keys go top-level, the rest are
    per-query timings; a pair cut mid-name at the truncation point has
    no opening quote and is skipped rather than mis-keyed."""
    out: dict = {"queries": {}}
    for name, num in re.findall(r'"([A-Za-z0-9_]+)": (-?[0-9.]+)', tail):
        val = float(num)
        if name in _SCALAR_KEYS:
            out[name] = val
        else:
            out["queries"][name] = val
    return out


def main() -> None:
    if len(sys.argv) < 3:
        print(__doc__)
        raise SystemExit(2)

    def load(path: str) -> dict:
        d = json.load(open(path))
        # the driver's BENCH_r*.json wraps bench.py's line under "parsed"
        p = d.get("parsed", d)
        if p is None and isinstance(d.get("tail"), str):
            p = recover_from_tail(d["tail"])
            print(
                f"{path}: parsed=null, recovered "
                f"{len(p['queries'])} query timings from the tail capture"
            )
        # since round 8 the printed line is compact (top-15 queries) and
        # the full map lives in BENCH_DETAIL.json next to the bench run;
        # merge it when it is verifiably the SAME run (calib matches)
        ref = (p or {}).get("queries_detail_file")
        if ref:
            for cand in (
                os.path.join(os.path.dirname(os.path.abspath(path)), ref),
                os.path.join(os.path.dirname(os.path.dirname(
                    os.path.abspath(__file__))), ref),
            ):
                try:
                    det = json.load(open(cand))
                except (OSError, json.JSONDecodeError):
                    continue
                if det.get("calib_sec") == p.get("calib_sec") and det.get(
                    "warm_total"
                ) == p.get("warm_total"):
                    p = {**p, "queries": det.get("queries", p.get("queries"))}
                    print(f"{path}: merged full query map from {cand}")
                    break
        return p or {}

    old = load(sys.argv[1])
    new = load(sys.argv[2])
    top_n = int(sys.argv[3]) if len(sys.argv) > 3 else 10

    calib_ratio = None
    state_ratio = None
    if old.get("calib_state_sec") and new.get("calib_state_sec"):
        state_ratio = new["calib_state_sec"] / old["calib_state_sec"]
        print(
            f"calib_state: {old['calib_state_sec']:.2f}s -> "
            f"{new['calib_state_sec']:.2f}s (checkpoint/state-store "
            f"ratio {state_ratio:.2f}x — *_replay queries below are "
            f"divided by this, not the JVM ratio)"
        )
    if old.get("calib_sec") and new.get("calib_sec"):
        calib_ratio = new["calib_sec"] / old["calib_sec"]
        print(
            f"calib: {old['calib_sec']:.2f}s -> {new['calib_sec']:.2f}s "
            f"(host ratio {calib_ratio:.2f}x; query ratios below are "
            f"divided by this)"
        )
        if old.get("calib_py_sec") and new.get("calib_py_sec"):
            py_ratio = new["calib_py_sec"] / old["calib_py_sec"]
            print(
                f"calib_py: {old['calib_py_sec']:.2f}s -> "
                f"{new['calib_py_sec']:.2f}s (Python-worker host ratio "
                f"{py_ratio:.2f}x — read mapInPandas-bound queries "
                f"against this, not the JVM ratio)"
            )
    else:
        print(
            "calib_sec missing on one side — RAW ratios below include "
            "host drift (round 7 measured up to 4x); interpret with care"
        )

    oq, nq = old.get("queries", {}), new.get("queries", {})
    shared = sorted(set(oq) & set(nq))
    rows = []
    for q in shared:
        if oq[q] <= 0:
            continue
        ratio = nq[q] / oq[q]
        # the replay family's wall is dominated by checkpoint/state-store
        # I/O (its own drift axis); normalize it by calib_state_sec when
        # both sides carry one, else fall back to the JVM axis
        axis = state_ratio if ("_replay" in q and state_ratio) else calib_ratio
        if axis:
            ratio /= axis
        rows.append((ratio, q, oq[q], nq[q]))

    o_tot = sum(oq[q] for _, q, _, _ in rows)
    n_tot = sum(nq[q] for _, q, _, _ in rows)
    tot_ratio = (n_tot / o_tot) / (calib_ratio or 1.0) if o_tot else float("nan")
    label = "normalized" if calib_ratio else "raw"
    print(
        f"shared queries: {len(rows)}; total {o_tot:.1f}s -> {n_tot:.1f}s "
        f"({label} ratio {tot_ratio:.2f}x)"
    )

    rows.sort()
    print(f"\ntop {top_n} improvements ({label} ratio, old -> new sec):")
    for ratio, q, o, n in rows[:top_n]:
        print(f"  {ratio:5.2f}x  {q}  {o:.2f} -> {n:.2f}")
    print(f"\ntop {top_n} regressions:")
    for ratio, q, o, n in rows[: -top_n - 1 : -1]:
        print(f"  {ratio:5.2f}x  {q}  {o:.2f} -> {n:.2f}")


if __name__ == "__main__":
    main()
