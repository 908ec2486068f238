"""Scale-soak the round-10 session-3 entries at x10/x100 of sf0.1.

Fixtures: /tmp/soak10c/x{10,100}/ holds id-offset copies of the sf0.1
events/customer/orders/lineitem/supplier tables (user_id/event_id/
c_custkey/o_orderkey/o_custkey/l_orderkey offset per copy so keys stay
unique and referential integrity holds; nation keys untouched so the
money-flow graph keeps its 25-node domain). Run:

    python tools/soak_round10c.py [x10|x100] [entry ...]
"""
from __future__ import annotations

import os
import sys
import time

import duckdb

sys.path.insert(0, "/root/repo")

SRC = "/root/testdata/sf0.1"
ROOT = "/tmp/soak10c"


def build(mult: int) -> str:
    out = f"{ROOT}/x{mult}"
    if os.path.exists(f"{out}/_done"):
        return out
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    copies = f"(SELECT unnest(generate_series(0, {mult - 1})) AS c)"
    off = "100000000"
    replaces = {
        "events": f"event_id + c * {off} AS event_id, "
                  f"user_id + c * {off} AS user_id",
        "customer": f"c_custkey + c * {off} AS c_custkey",
        "orders": f"o_orderkey + c * {off} AS o_orderkey, "
                  f"o_custkey + c * {off} AS o_custkey",
        "lineitem": f"l_orderkey + c * {off} AS l_orderkey",
        "documents": f"doc_id + c * {off} AS doc_id",
    }
    for name, rep in replaces.items():
        con.sql(
            f"COPY (SELECT * REPLACE ({rep}) "
            f"FROM '{SRC}/{name}.parquet', {copies}) "
            f"TO '{out}/{name}.parquet' (FORMAT PARQUET)"
        )
    for name in ("supplier", "region", "nation", "part", "embeddings"):
        src = f"{SRC}/{name}.parquet"
        if os.path.exists(src):
            con.sql(
                f"COPY (SELECT * FROM '{src}') TO '{out}/{name}.parquet' "
                "(FORMAT PARQUET)"
            )
    open(f"{out}/_done", "w").close()
    return out


def main() -> None:
    mults = [10, 100]
    names = [
        "cdc_apply", "window_rolling_median", "join_spatial_radius",
        "storage_bucket_join", "graph_resource_allocation",
        "stream_cdc_replay",
    ]
    args = sys.argv[1:]
    sel_m = [int(a[1:]) for a in args if a.startswith("x")]
    sel_n = [a for a in args if not a.startswith("x")]
    if sel_m:
        mults = sel_m
    if sel_n:
        names = sel_n

    from pyspark.sql import SparkSession

    from helium_arango_etl_lite_spark.plans.queries import QUERIES

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "48g")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    for mult in mults:
        d = build(mult)
        print(f"== x{mult} ({d})", flush=True)
        for name in names:
            if name == "stream_cdc_replay" and mult > 10:
                print(f"  {name}: skipped at x{mult} (driver-side "
                      "micro-batch writer is the fixture harness, not "
                      "the operator)", flush=True)
                continue
            t0 = time.time()
            n = QUERIES[name].spark_fn(spark, d).count()
            print(f"  {name}: {time.time() - t0:.1f} s, {n} rows",
                  flush=True)


if __name__ == "__main__":
    main()
