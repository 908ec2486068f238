"""Full driver replica at sf0.01 on a vanilla session: runs entry() then
every queries() entry (first 50 = the driver's batch, then the rest),
comparing against oracle_sql() via DuckDB exactly like the driver.

Usage: python tools/driver_replica.py [N | name1 name2 ...]
(a numeric arg limits to the first N entries; non-numeric args select
entries by name)."""
import importlib.util
import math
import sys
import time

import duckdb
from pyspark.sql import SparkSession

spec = importlib.util.spec_from_file_location("se", "/root/repo/__spark_entry__.py")
m = importlib.util.module_from_spec(spec)
spec.loader.exec_module(m)

spark = (
    SparkSession.builder.master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
print("entry rows:", m.entry(spark).count(), flush=True)

qs, oracles = m.queries(), m.oracle_sql()
SF = "/root/testdata/sf0.01"
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

if len(sys.argv) > 1 and not sys.argv[1].isdigit():
    unknown = [a for a in sys.argv[1:] if a not in qs]
    if unknown:
        sys.exit(f"unknown queries: {unknown}")
    selected = sys.argv[1:]
else:
    limit = int(sys.argv[1]) if len(sys.argv) > 1 else len(qs)
    selected = list(qs)[:limit]


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
for i, name in enumerate(selected):
    t0 = time.time()
    try:
        sdf = qs[name](spark, SF)
        srows = normalize([tuple(r) for r in sdf.collect()], sdf.columns)
    except Exception as e:
        bad.append(name)
        print(f"{i:3d} {name}: SPARK ERROR {e}", flush=True)
        continue
    if name not in oracles:
        print(f"{i:3d} {name}: rows-only {len(srows)} ({time.time()-t0:.1f}s)", flush=True)
        continue
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    try:
        res = con.execute(oracles[name])
        dcols = [d[0] for d in res.description]
        drows = normalize(res.fetchall(), dcols)
    except Exception as e:
        bad.append(name)
        print(f"{i:3d} {name}: ORACLE ERROR {e}", flush=True)
        continue
    ok = sorted(sdf.columns) == sorted(dcols) and srows == drows
    if not ok:
        bad.append(name)
    print(
        f"{i:3d} {name}: {'MATCH' if ok else 'MISMATCH'} rows={len(srows)}/{len(drows)} ({time.time()-t0:.1f}s)",
        flush=True,
    )

print("FAILED:", bad, flush=True)
