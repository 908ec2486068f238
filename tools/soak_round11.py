"""Scale-soak the round-11 entries at x10/x100 embedding corpora.

Fixtures: /tmp/soak_r11/emb{10,100}.parquet = 50k / 500k vectors,
dim 64, 64 clusters on the unit sphere (+0.25 noise) — the same recipe
as the round-9 ANN soak (SCALE_SOAK.md "graph-routed ANN at x10/x100"),
rebuilt deterministically (numpy default_rng(11)).

Soaks:

* k-center batching (r10 verdict item 4's "Done" row): pure Gonzalez
  (m=1) vs batched (m=8) at k=25 on the x10 corpus — scan counts are
  structural (k-1 = 24 vs ceil(24/8) = 3) and the walls show the ratio.
* persisted graph-ANN lifecycle: per-phase walls for build(old 90%) ->
  bucketed-table write -> incremental append (new 10%) -> read+route
  (100 queries), auto planes, soak dials (hops=4, beam=24).

Usage: python tools/soak_round11.py [x10|x100] [kcenter|persist ...]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")

ROOT = "/tmp/soak_r11"
DIM = 64
CLUSTERS = 64


def build_fixture(mult: int) -> str:
    out = f"{ROOT}/emb{mult}.parquet"
    if os.path.exists(out):
        return out
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(ROOT, exist_ok=True)
    n = 5_000 * mult
    rng = np.random.default_rng(11)
    centers = rng.normal(size=(CLUSTERS, DIM))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    v = centers[np.arange(n) % CLUSTERS] + 0.25 * rng.normal(
        size=(n, DIM)
    )
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(range(n), pa.int64()),
                "embedding": pa.array(
                    v.tolist(), pa.list_(pa.float64())
                ),
            }
        ),
        out,
    )
    return out


def main() -> None:
    mult = 10
    which = {"kcenter", "persist"}
    for a in sys.argv[1:]:
        if a.startswith("x"):
            mult = int(a[1:])
        else:
            which = {a} if which == {"kcenter", "persist"} else which | {a}
    path = build_fixture(mult)

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "48g")
        .getOrCreate()
    )
    emb = spark.read.parquet(path).repartition(64).cache()
    n = emb.count()
    print(f"fixture x{mult}: {n} vectors dim {DIM}", flush=True)

    if "kcenter" in which:
        from helium_arango_etl_lite_spark.operators.llm.similarity import (
            kcenter_coreset,
        )

        k = 25
        for m in (1, 8):
            t0 = time.time()
            res = kcenter_coreset(emb, k=k, m=m)
            rows = res.collect()
            wall = time.time() - t0
            scans = -(-(k - 1) // m)
            print(
                f"kcenter k={k} m={m}: {scans} scans, wall {wall:.1f} s, "
                f"radius(min maxsim)={min(r['maxsim'] for r in rows):.4f} "
                f"last pick maxsim={rows[-1]['maxsim']:.4f}",
                flush=True,
            )

    if "persist" in which:
        from helium_arango_etl_lite_spark.operators.llm.similarity import (
            build_route_graph, knn_join_bucketed, route_on_graph,
        )
        from helium_arango_etl_lite_spark.operators.storage import (
            write_bucketed,
        )
        from pyspark.sql import functions as F

        scratch = f"{ROOT}/persist_x{mult}"
        old = emb.filter(F.col("vec_id") % 10 != 0)
        new = emb.filter(F.col("vec_id") % 10 == 0)

        t0 = time.time()
        built = build_route_graph(old, edge_k=8, seeds=(7, 11), dim=DIM)
        n_edges = built.count()
        t_build = time.time() - t0

        t0 = time.time()
        write_bucketed(
            built, "soak_ann_edges", ["src"], num_buckets=32,
            sort_cols=["src"], mode="overwrite",
            path=os.path.join(scratch, "edges"),
        )
        emb.filter(F.col("vec_id") % max(1, n // 700) == 0).select(
            F.col("vec_id").alias("nid")
        ).write.mode("overwrite").parquet(os.path.join(scratch, "ent"))
        t_persist = time.time() - t0

        t0 = time.time()
        per_seed = [
            knn_join_bucketed(
                new, k=8, seed=s, dim=DIM, corpus=emb
            ).select(F.col("qid").alias("src"), F.col("nid").alias("dst"))
            for s in (7, 11)
        ]
        inc = per_seed[0].unionByName(per_seed[1])
        inc = inc.unionByName(
            inc.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        ).distinct()
        write_bucketed(
            inc, "soak_ann_edges", ["src"], num_buckets=32,
            sort_cols=["src"], mode="append",
            path=os.path.join(scratch, "edges"),
        )
        t_append = time.time() - t0

        t0 = time.time()
        routed = route_on_graph(
            emb, spark.table("soak_ann_edges"), k=5, hops=4, beam=24,
            n_entries=6, query_mod=max(1, n // 100), query_rem=0,
            entries=spark.read.parquet(os.path.join(scratch, "ent")),
        )
        n_routed = routed.count()
        t_route = time.time() - t0
        total_edges = spark.table("soak_ann_edges").count()
        print(
            f"persist x{mult}: build {t_build:.1f} s ({n_edges} edges) | "
            f"persist {t_persist:.1f} s | append {t_append:.1f} s "
            f"({total_edges - n_edges} inc edges) | read+route "
            f"{t_route:.1f} s ({n_routed} result rows)",
            flush=True,
        )

    spark.stop()


if __name__ == "__main__":
    main()
