"""Plan survey for the optimization round: capture .explain("formatted")
for every HEADLINE query and summarize plan-shape signals (Exchange count,
join strategies, Python-eval nodes, scan pushdown) into one JSON table.

Usage:
  python tools/plan_survey.py [--out plans/r13/_survey.json]
                              [--dump-dir plans/r13] [--suffix before]
                              [name1 name2 ...]

Explain only — nothing is executed, so this is cheap and safe to run
alongside other work. The per-query plan text lands in
<dump-dir>/<query>_<suffix>.txt (the judge-facing artifact) and the
summary JSON counts the signals the optimization guide says to look at
(guide section 7.2).
"""
from __future__ import annotations

import argparse
import io
import json
import os
import re
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from helium_arango_etl_lite_spark.plans.queries import QUERIES  # noqa: E402
from helium_arango_etl_lite_spark.session import get_spark  # noqa: E402

SIGNALS = {
    "exchanges": r"\bExchange\b",
    "hash_exchange": r"Exchange hashpartitioning",
    "range_exchange": r"Exchange rangepartitioning",
    "single_exchange": r"Exchange SinglePartition",
    "rr_exchange": r"Exchange RoundRobinPartitioning",
    "smj": r"\bSortMergeJoin\b",
    "bhj": r"\bBroadcastHashJoin\b",
    "shj": r"\bShuffledHashJoin\b",
    "bnlj": r"\bBroadcastNestedLoopJoin\b",
    "cartesian": r"\bCartesianProduct\b",
    "batch_eval_python": r"\bBatchEvalPython\b",
    "arrow_eval_python": r"\bArrowEvalPython\b",
    "map_in_pandas": r"\bMapInPandas\b|\bFlatMapGroupsInPandas\b|\bMapInArrow\b",
    "python_udtf": r"\bBatchEvalPythonUDTF\b|\bArrowEvalPythonUDTF\b",
    "sorts": r"\bSort \[",
    "window": r"\bWindow \[|\bRunningWindowFunction\b",
    "wscg": r"WholeStageCodegen",
    "scans": r"Scan parquet|BatchScan|Scan ExistingRDD|Scan json",
    "filesort_scan": r"Scan text",
}


def survey_text(txt: str) -> dict:
    out = {k: len(re.findall(p, txt)) for k, p in SIGNALS.items()}
    pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", txt)
    out["pushed_filters_nonempty"] = sum(1 for p in pushed if p.strip())
    out["pushed_filters_empty"] = sum(1 for p in pushed if not p.strip())
    schemas = re.findall(r"ReadSchema: struct<([^\n]*)", txt)
    out["read_schema_cols_max"] = max(
        (s.count(",") + 1 for s in schemas), default=0
    )
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=None)
    ap.add_argument("--dump-dir", default=None)
    ap.add_argument("--suffix", default="before")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="plan_survey")
    spark.sparkContext.setLogLevel("ERROR")

    # survey the bench's HEADLINE set by default
    import bench

    names = args.names or list(bench.HEADLINE)
    if args.dump_dir:
        os.makedirs(args.dump_dir, exist_ok=True)

    rows: dict[str, dict] = {}
    for name in names:
        try:
            df = QUERIES[name].spark_fn(spark, sf_dir)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            txt = buf.getvalue()
        except Exception as e:  # noqa: BLE001
            rows[name] = {"error": f"{type(e).__name__}: {e}"[:200]}
            continue
        rows[name] = survey_text(txt)
        if args.dump_dir:
            p = os.path.join(args.dump_dir, f"{name}_{args.suffix}.txt")
            with open(p, "w") as f:
                f.write(txt)
    if args.out:
        with open(args.out, "w") as f:
            json.dump(rows, f, indent=1, sort_keys=True)
    # compact console table: the shapes worth a second look
    flagged = {
        n: r
        for n, r in rows.items()
        if r.get("error")
        or r.get("cartesian")
        or r.get("bnlj")
        or r.get("batch_eval_python")
        or r.get("exchanges", 0) >= 4
    }
    for n, r in sorted(flagged.items()):
        print(n, json.dumps(r))
    print(f"surveyed {len(rows)} queries; flagged {len(flagged)}")


if __name__ == "__main__":
    main()
