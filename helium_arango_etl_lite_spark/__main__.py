"""CLI: the follower service (see streaming/service.py).

    python -m helium_arango_etl_lite_spark --start 100 --end 160 \
        --out /tmp/graph --checkpoint /tmp/graph_ckpt
"""

from __future__ import annotations

import argparse
import json

from .session import get_spark
from .streaming.service import run_service


def main() -> None:
    p = argparse.ArgumentParser(description="helium graph follower (Spark)")
    p.add_argument("--endpoint", default="mock://chain")
    p.add_argument("--start", type=int, default=1)
    p.add_argument("--end", type=int, default=None)
    p.add_argument("--out", required=True)
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--batch-heights", type=int, default=32)
    p.add_argument("--timeout-s", type=float, default=None)
    p.add_argument("--inventory", default=None,
                   help="glob/dir of gateway_inventory_{height}.csv[.gz] "
                        "drops; refreshed into the hotspots table when "
                        "stale (reference follower.py:61-62)")
    args = p.parse_args()

    spark = get_spark(app_name="helium-follower")
    spark.sparkContext.setLogLevel("WARN")
    state = run_service(
        spark,
        out_dir=args.out,
        checkpoint_dir=args.checkpoint,
        endpoint=args.endpoint,
        start=args.start,
        end=args.end,
        batch_heights=args.batch_heights,
        timeout_s=args.timeout_s,
        inventory_glob=args.inventory,
    )
    print(json.dumps({"sync_state": state}))


if __name__ == "__main__":
    main()
