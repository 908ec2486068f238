"""Ad-hoc oracle check for a named subset of catalog entries (same
comparison as tools/driver_replica.py, vanilla local[8] session).

    python tools/check_entries.py entry1 entry2 ... [--sf /root/testdata/sf0.01]
"""
import importlib.util
import math
import sys
import time

import duckdb
from pyspark.sql import SparkSession

spec = importlib.util.spec_from_file_location("se", "/root/repo/__spark_entry__.py")
m = importlib.util.module_from_spec(spec)
spec.loader.exec_module(m)

args = sys.argv[1:]
SF = "/root/testdata/sf0.01"
if "--sf" in args:
    i = args.index("--sf")
    SF = args[i + 1]
    args = args[:i] + args[i + 2:]

spark = (
    SparkSession.builder.master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
qs, oracles = m.queries(), m.oracle_sql()
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def normalize(rows, columns):
    order = sorted(range(len(columns)), key=lambda i: columns[i])

    def render(v):
        if isinstance(v, bool):
            return str(bool(v))
        if isinstance(v, float):
            return "nan" if math.isnan(v) else repr(v)
        if v is None:
            return "NULL"
        return str(v)

    return sorted(tuple(render(r[i]) for i in order) for r in rows)


bad = []
for name in args:
    t0 = time.time()
    sdf = qs[name](spark, SF)
    srows = normalize([tuple(r) for r in sdf.collect()], sdf.columns)
    if name not in oracles:
        print(f"{name}: rows-only {len(srows)} ({time.time()-t0:.1f}s)", flush=True)
        continue
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    res = con.execute(oracles[name])
    dcols = [d[0] for d in res.description]
    drows = normalize(res.fetchall(), dcols)
    ok = sorted(sdf.columns) == sorted(dcols) and srows == drows
    if not ok:
        bad.append(name)
        if sorted(sdf.columns) != sorted(dcols):
            print("  cols:", sorted(sdf.columns), "vs", sorted(dcols))
        else:
            diff = [(a, b) for a, b in zip(srows, drows) if a != b][:3]
            print("  rows:", len(srows), "vs", len(drows), "first diffs:", diff)
    print(
        f"{name}: {'MATCH' if ok else 'MISMATCH'} rows={len(srows)}/{len(drows)} ({time.time()-t0:.1f}s)",
        flush=True,
    )
print("FAILED:", bad, flush=True)
sys.exit(1 if bad else 0)
