"""Scale-soak the round-13 entries at x10/x100.

* ``lloyd``: lloyd_refine on the clustered embedding fixtures
  (/tmp/soak_r11/emb{10,100}.parquet — 50k/500k vectors, dim 64, 64
  planted clusters): refinement wall + cell-size max/median before and
  after one iteration. The clustered corpus is the case the refinement
  exists for (the sf tables are isotropic — least favourable); the max
  cell should shrink markedly while total assignment stays exact.

* ``pqtrain``: pq_train_blocks wall at x10/x100 (one O(n*codes)
  broadcast scoring pass + per-block bounded posexplode shuffles) plus
  the recall@5 delta seed-codebook vs trained on a ~100-query sample —
  the value measurement at fixture scale.

* ``histq`` / ``hll``: the two new batch=stream sketch replays run
  DIRECTLY as their registered entries against the x10/x100 table
  fixtures (/tmp/soak_r10c/x{mult} mirrors the sf table layout):
  3-micro-batch stateful replay wall vs the one-shot batch wall, with
  row-identical outputs asserted — the batch=stream contract holding
  at 10x/100x the driver volume, and state bounds (<= 128 bins;
  <= groups x 64 registers) verified on the emitted cells.

Usage: python tools/soak_round13.py [x10|x100] [lloyd|pqtrain|histq|hll ...]
"""
from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from soak_round10c import build as build_docs  # noqa: E402
from soak_round11 import build_fixture as build_emb  # noqa: E402

DIM = 64


def main() -> None:
    mult = 10
    default = {"lloyd", "pqtrain", "histq", "hll"}
    which = set(default)
    for a in sys.argv[1:]:
        if a.startswith("x"):
            mult = int(a[1:])
        else:
            which = {a} if which == default else which | {a}

    from pyspark.sql import SparkSession, Window
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "48g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    if "lloyd" in which or "pqtrain" in which:
        from helium_arango_etl_lite_spark.operators.llm.similarity import (
            _as_double, fixed_centroids, ivf_assign_cells, lloyd_refine,
        )

        path = build_emb(mult)
        emb = spark.read.parquet(path).repartition(64).cache()
        n = emb.count()
        print(f"embedding fixture x{mult}: {n} vectors dim {DIM}", flush=True)
        e = emb.select("vec_id", _as_double("embedding").alias("v"))
        seed = fixed_centroids(e, 32)

    def cell_stats(cents):
        sizes = (
            ivf_assign_cells(e, cents)
            .groupBy("cell")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        row = sizes.agg(
            F.max("n").alias("mx"),
            F.expr("percentile_approx(n, 0.5)").alias("med"),
            F.count("*").alias("nc"),
            F.sum("n").alias("tot"),
        ).collect()[0]
        return row

    if "lloyd" in which:
        before = cell_stats(seed)
        t0 = time.time()
        refined = lloyd_refine(e, seed, iters=1).localCheckpoint(eager=True)
        t_refine = time.time() - t0
        after = cell_stats(refined)
        print(
            f"lloyd x{mult}: refine wall {t_refine:.1f}s | seed "
            f"max/med={before.mx}/{before.med} -> lloyd1 "
            f"max/med={after.mx}/{after.med} (cells {before.nc}->"
            f"{after.nc}, n {before.tot}=={after.tot})",
            flush=True,
        )

    if "pqtrain" in which:
        from helium_arango_etl_lite_spark.operators.llm.similarity import (
            ivf_pq_adc_search, ivf_pq_encode, knn_join_sampled,
            pq_train_blocks,
        )
        from helium_arango_etl_lite_spark.plans.catalog_round5b import (
            _recall_overlay,
        )

        cb = (
            e.orderBy("vec_id").limit(8)
            .select(
                F.row_number().over(Window.orderBy("vec_id")).alias("code"),
                F.col("v").alias("cv"),
            )
        )
        t0 = time.time()
        tcb = pq_train_blocks(e, cb, n_blocks=4, dim=DIM).localCheckpoint(
            eager=True
        )
        t_train = time.time() - t0

        cents = lloyd_refine(e, fixed_centroids(e, 32), iters=1)
        cents = cents.localCheckpoint(eager=True)
        qmod = n // 100
        exact = knn_join_sampled(emb, k=5, sample_mod=qmod).select(
            "qid", "nid"
        ).localCheckpoint(eager=True)
        qs = e.select(
            F.col("vec_id").alias("qid"), F.col("v").alias("qv")
        ).filter(F.col("qid") % qmod == 0)
        recalls = {}
        for name, book in (("seed", cb), ("trained", tcb)):
            idx = ivf_pq_encode(e, cents, book, n_blocks=4, dim=DIM)
            ap = ivf_pq_adc_search(
                qs, idx, cents, book, dim=DIM, n_blocks=4, nprobe=2, topk=5
            ).select("qid", F.col("vec_id").alias("nid"))
            r = _recall_overlay(exact, ap).agg(
                F.round(F.avg("recall_at_k"), 4).alias("m")
            ).collect()[0]["m"]
            recalls[name] = r
        print(
            f"pqtrain x{mult}: train wall {t_train:.1f}s | recall@5 "
            f"(nprobe=2, {n // qmod} queries) seed={recalls['seed']} -> "
            f"trained={recalls['trained']}",
            flush=True,
        )

    if "histq" in which or "hll" in which:
        fixture = build_docs(mult)
        print(f"table fixture x{mult}: {fixture}", flush=True)

    if "histq" in which:
        from helium_arango_etl_lite_spark.plans.catalog_round5b import (
            agg_histogram_quantiles,
        )
        from helium_arango_etl_lite_spark.plans.catalog_round13 import (
            stream_quantiles_replay,
        )

        t0 = time.time()
        batch = sorted(map(tuple, agg_histogram_quantiles(
            spark, fixture
        ).collect()))
        t_batch = time.time() - t0
        t0 = time.time()
        stream = sorted(map(tuple, stream_quantiles_replay(
            spark, fixture
        ).collect()))
        t_stream = time.time() - t0
        assert stream == batch, "histq stream != batch at scale"
        print(
            f"histq x{mult}: batch {t_batch:.1f}s, 3-batch stateful "
            f"replay {t_stream:.1f}s, outputs identical ({len(batch)} "
            f"quantiles)",
            flush=True,
        )

    if "hll" in which:
        from helium_arango_etl_lite_spark.plans.catalog_round5 import (
            agg_hll_distinct,
        )
        from helium_arango_etl_lite_spark.plans.catalog_round13 import (
            stream_hll_replay,
        )

        t0 = time.time()
        batch = sorted(map(tuple, agg_hll_distinct(spark, fixture).collect()))
        t_batch = time.time() - t0
        t0 = time.time()
        stream = sorted(map(tuple, stream_hll_replay(
            spark, fixture
        ).collect()))
        t_stream = time.time() - t0
        assert stream == batch, "hll stream != batch at scale"
        print(
            f"hll x{mult}: batch {t_batch:.1f}s, 3-batch stateful replay "
            f"{t_stream:.1f}s, outputs identical ({len(batch)} groups)",
            flush=True,
        )


if __name__ == "__main__":
    main()
