"""Quick subset bench for optimization iteration: time the named queries
exactly the way bench.py does (same session factory, same noop-sink /
SMALL_OUTPUT collect methodology, same warm-up, min-of-2), print a JSON
map. Does NOT write BENCH_DETAIL.json — this is the inner measurement
loop, not the driver artifact.

Usage:
  python tools/bench_subset.py name1 name2 ...
  python tools/bench_subset.py --top N        # N most expensive from a
                                              # detail file (--detail PATH)
  python tools/bench_subset.py --runs 3 ...   # min-of-R instead of 2
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from helium_arango_etl_lite_spark.plans.queries import QUERIES  # noqa: E402
from helium_arango_etl_lite_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--top", type=int, default=0)
    ap.add_argument("--detail", default="BENCH_DETAIL.json")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    import bench

    names = list(args.names)
    if args.top:
        with open(args.detail) as f:
            d = json.load(f)
        names += [
            q
            for q, _ in sorted(d["queries"].items(), key=lambda kv: -kv[1])
            if q in QUERIES
        ][: args.top]

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="bench_subset")
    spark.sparkContext.setLogLevel("ERROR")
    QUERIES["topk_accounts"].spark_fn(spark, sf_dir).collect()
    spark.range(1_000).mapInPandas(lambda it: it, "id long").write.format(
        "noop"
    ).mode("overwrite").save()

    out: dict[str, float] = {}
    for name in names:
        fn = QUERIES[name].spark_fn
        walls = []
        for _ in range(args.runs):
            spark.sparkContext.setJobDescription(f"bench_subset:{name}")
            t0 = time.time()
            df = fn(spark, sf_dir)
            if name in bench.SMALL_OUTPUT:
                df.collect()
            else:
                df.write.format("noop").mode("overwrite").save()
            walls.append(time.time() - t0)
        out[name] = round(min(walls), 3)
        print(f"{name}: {out[name]} (all: {[round(w,2) for w in walls]})",
              file=sys.stderr, flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
