"""Scale-soak the round-12 entries at x10/x100.

* ``ivfpq``: persisted IVF-PQ lifecycle on the round-11 embedding
  fixtures (/tmp/soak_r11/emb{10,100}.parquet — 50k/500k vectors,
  dim 64; shared builder). Phases timed separately: train+encode ->
  persist (partitioned-by-cell bucketed table + side tables) ->
  read-back ADC search of a 100-query batch -> a SECOND 100-query
  batch. The entry's economic claim is "search cost independent of
  build": batch 2 must cost ~batch 1, and neither re-runs training.

* ``cms``: streaming CMS heavy hitters on the soak10c document
  fixtures (id-offset copies of sf0.1 -> 50k/500k docs). Timed: the
  3-micro-batch stateful replay vs the one-shot batch sketch, plus the
  state bound (distinct cells <= depth*width) that makes the stream
  viable at any volume.

* ``sess``: out-of-order sessionization replay on the same document/
  event fixtures — the interval-merge state is bounded by per-user
  session count, so the replay wall should track event volume linearly.

Usage: python tools/soak_round12.py [x10|x100] [ivfpq|cms|sess ...]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")

from soak_round10c import build as build_docs  # noqa: E402
from soak_round11 import build_fixture as build_emb  # noqa: E402

DIM = 64


def main() -> None:
    mult = 10
    default = {"ivfpq", "cms", "sess", "nearest", "rfm"}
    which = set(default)
    for a in sys.argv[1:]:
        if a.startswith("x"):
            mult = int(a[1:])
        else:
            which = {a} if which == default else which | {a}

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "48g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    if "ivfpq" in which:
        from helium_arango_etl_lite_spark.operators.llm.similarity import (
            ivf_pq_adc_search, ivf_pq_build,
        )
        from helium_arango_etl_lite_spark.operators.storage import (
            write_bucketed,
        )

        path = build_emb(mult)
        emb = spark.read.parquet(path).repartition(64).cache()
        n = emb.count()
        print(f"ivfpq fixture x{mult}: {n} vectors dim {DIM}", flush=True)
        scratch = f"/tmp/soak_r12/ivfpq_x{mult}"

        t0 = time.time()
        index, cents, cb = ivf_pq_build(
            emb, num_centroids=32, n_blocks=4, n_codes=8, dim=DIM
        )
        index = index.localCheckpoint(eager=True)  # time encode here
        t_build = time.time() - t0

        t0 = time.time()
        write_bucketed(
            index, "soak_ivfpq_codes", ["vec_id"], num_buckets=8,
            sort_cols=["vec_id"], mode="overwrite",
            path=os.path.join(scratch, "codes"), partition_cols=["cell"],
        )
        cents.write.mode("overwrite").parquet(
            os.path.join(scratch, "centroids")
        )
        cb.write.mode("overwrite").parquet(os.path.join(scratch, "codebook"))
        t_persist = time.time() - t0

        codes_r = spark.table("soak_ivfpq_codes")
        cents_r = spark.read.parquet(os.path.join(scratch, "centroids"))
        cb_r = spark.read.parquet(os.path.join(scratch, "codebook"))

        # incremental ingest: encode a 10% batch against the READ-BACK
        # artifacts and append — the cost that must beat a rebuild
        from helium_arango_etl_lite_spark.operators.llm.similarity import (
            ivf_pq_encode,
        )

        new = emb.filter(F.col("vec_id") % 10 == 0).select(
            "vec_id", F.col("embedding").cast("array<double>").alias("v")
        )
        t0 = time.time()
        write_bucketed(
            ivf_pq_encode(new, cents_r, cb_r, n_blocks=4, dim=DIM),
            "soak_ivfpq_codes", ["vec_id"], num_buckets=8,
            sort_cols=["vec_id"], mode="append",
            path=os.path.join(scratch, "codes"), partition_cols=["cell"],
        )
        t_append = time.time() - t0
        print(
            f"ivfpq x{mult}: 10% ingest encode+append {t_append:.1f} s "
            f"(vs {t_build + t_persist:.1f} s full rebuild+persist)",
            flush=True,
        )

        qmod = max(1, n // 100)  # ~100 queries per batch
        walls = []
        for batch, rem in (("q1", 0), ("q2", 1)):
            qs = emb.select(
                F.col("vec_id").alias("qid"),
                F.col("embedding").cast("array<double>").alias("qv"),
            ).filter(F.col("qid") % qmod == rem)
            t0 = time.time()
            got = ivf_pq_adc_search(
                qs, codes_r, cents_r, cb_r, dim=DIM, n_blocks=4,
                nprobe=2, topk=5,
            ).count()
            walls.append(time.time() - t0)
            print(
                f"ivfpq x{mult} {batch}: {got} result rows, "
                f"wall {walls[-1]:.1f} s",
                flush=True,
            )
        print(
            f"ivfpq x{mult}: build+encode {t_build:.1f} s, persist "
            f"{t_persist:.1f} s, search {walls[0]:.1f} / {walls[1]:.1f} s "
            f"(batch2/batch1 = {walls[1] / walls[0]:.2f})",
            flush=True,
        )

    if "cms" in which:
        from helium_arango_etl_lite_spark.plans.queries import QUERIES

        sfd = build_docs(mult)
        n_docs = spark.read.parquet(f"{sfd}/documents.parquet").count()
        print(f"cms fixture x{mult}: {n_docs} docs", flush=True)

        t0 = time.time()
        stream_rows = QUERIES["stream_heavy_hitters_replay"].spark_fn(
            spark, sfd
        ).collect()
        t_stream = time.time() - t0
        t0 = time.time()
        batch_rows = QUERIES["llm_heavy_hitters_cms"].spark_fn(
            spark, sfd
        ).collect()
        t_batch = time.time() - t0
        same = [(r["token"], r["est_count"]) for r in stream_rows] == [
            (r["token"], r["est_count"]) for r in batch_rows
        ]
        print(
            f"cms x{mult}: stream replay {t_stream:.1f} s vs one-shot "
            f"batch {t_batch:.1f} s; outputs identical: {same}",
            flush=True,
        )

    if "sess" in which:
        from helium_arango_etl_lite_spark.plans.queries import QUERIES

        sfd = build_docs(mult)
        n_ev = spark.read.parquet(f"{sfd}/events.parquet").count()
        print(f"sess fixture x{mult}: {n_ev} events", flush=True)
        t0 = time.time()
        n_sess = QUERIES["stream_session_ooo_replay"].spark_fn(
            spark, sfd
        ).count()
        print(
            f"sess x{mult}: OOO replay {time.time() - t0:.1f} s, "
            f"{n_sess} sessions",
            flush=True,
        )

    if "nearest" in which or "rfm" in which:
        from helium_arango_etl_lite_spark.plans.queries import QUERIES

        sfd = build_docs(mult)
        for name, key in (
            ("join_asof_nearest", "nearest"),
            ("events_rfm_segments", "rfm"),
        ):
            if key not in which:
                continue
            t0 = time.time()
            QUERIES[name].spark_fn(spark, sfd).write.format(
                "noop"
            ).mode("overwrite").save()
            print(
                f"{key} x{mult}: {name} wall {time.time() - t0:.1f} s",
                flush=True,
            )

    spark.stop()


if __name__ == "__main__":
    main()
